"""MERGE/upsert + SCD2 history (operators/mutations.py) on planted frames:
every MERGE branch (update, insert, delete, order-tie precedence) and the
SCD2 run-collapse contract (intervals, versions, null states, sentinel)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from yellowrush_spark_ml_pipeline_spark.operators import mutations


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_merge_upsert_branches(spark):
    """One planted frame per MERGE branch: key 1 updated, key 2 untouched,
    key 3 deleted, key 4 inserted, key 5 updated-then-deleted,
    key 6 deleted-then-reinstated (latest op wins)."""
    target = spark.createDataFrame(
        [(k, f"old{k}", _ts(1), k) for k in (1, 2, 3, 5, 6)],
        "k int, v string, ts timestamp, id int",
    )
    updates = spark.createDataFrame(
        [
            (1, "new1", _ts(2), 101, "U"),
            (3, None, _ts(2), 103, "D"),
            (4, "new4", _ts(2), 104, "U"),
            (5, "new5", _ts(2), 105, "U"),
            (5, None, _ts(3), 205, "D"),
            (6, None, _ts(2), 106, "D"),
            (6, "back6", _ts(3), 206, "U"),
        ],
        "k int, v string, ts timestamp, id int, op string",
    )
    out = mutations.merge_upsert(
        target, updates, keys=["k"], order_col="ts", tiebreak_col="id", op_col="op"
    )
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "new1", 2: "old2", 4: "new4", 6: "back6"}
    assert out.columns == ["k", "v", "ts", "id"]


def test_merge_upsert_update_wins_order_tie(spark):
    """Same order value on both sides → the update's source precedence
    wins; among updates with identical order, highest tiebreak id wins."""
    target = spark.createDataFrame(
        [(1, "old", _ts(1), 1)], "k int, v string, ts timestamp, id int"
    )
    updates = spark.createDataFrame(
        [(1, "upd_lo", _ts(1), 50, "U"), (1, "upd_hi", _ts(1), 60, "U")],
        "k int, v string, ts timestamp, id int, op string",
    )
    out = mutations.merge_upsert(
        target, updates, keys=["k"], order_col="ts", tiebreak_col="id", op_col="op"
    )
    assert [r["v"] for r in out.collect()] == ["upd_hi"]


def test_merge_upsert_idempotent(spark):
    """Re-applying the same update batch is a no-op (backfill safety)."""
    target = spark.createDataFrame(
        [(k, f"old{k}", _ts(1), k) for k in range(20)],
        "k int, v string, ts timestamp, id int",
    )
    updates = spark.createDataFrame(
        [(k, f"new{k}", _ts(2), 100 + k, "D" if k % 5 == 0 else "U") for k in range(0, 30, 2)],
        "k int, v string, ts timestamp, id int, op string",
    )
    once = mutations.merge_upsert(
        target, updates, keys=["k"], order_col="ts", tiebreak_col="id", op_col="op"
    )
    twice = mutations.merge_upsert(
        once, updates, keys=["k"], order_col="ts", tiebreak_col="id", op_col="op"
    )
    assert sorted(once.collect()) == sorted(twice.collect())


def test_scd2_collapses_runs_with_intervals(spark):
    """a,a,b,b,a for one key → 3 versions with adjacent [from, to)
    intervals; a second single-state key stays one current row."""
    rows = [
        (1, "a", _ts(1), 1),
        (1, "a", _ts(2), 2),
        (1, "b", _ts(3), 3),
        (1, "b", _ts(4), 4),
        (1, "a", _ts(5), 5),
        (2, "x", _ts(1), 6),
    ]
    df = spark.createDataFrame(rows, "k int, state string, ts timestamp, id int")
    out = mutations.scd2_history(
        df, keys=["k"], order_col="ts", tracked_col="state", tiebreak_col="id"
    ).orderBy("k", "version")
    got = out.collect()
    k1 = [r for r in got if r["k"] == 1]
    assert [(r["state"], r["version"], r["is_current"]) for r in k1] == [
        ("a", 1, False), ("b", 2, False), ("a", 3, True)
    ]
    # intervals tile: each valid_to == next valid_from, last is the sentinel
    assert k1[0]["valid_to"] == k1[1]["valid_from"] == _ts(3)
    assert k1[1]["valid_to"] == k1[2]["valid_from"] == _ts(5)
    assert k1[2]["valid_to"] == dt.datetime(2100, 1, 1)
    (k2,) = [r for r in got if r["k"] == 2]
    assert (k2["version"], k2["is_current"]) == (1, True)


def test_scd2_null_state_is_real(spark):
    """null → a → null is three versions: null-safe change detection
    treats a null tracked value as a state, not a wildcard."""
    rows = [(1, None, _ts(1), 1), (1, "a", _ts(2), 2), (1, None, _ts(3), 3)]
    df = spark.createDataFrame(rows, "k int, state string, ts timestamp, id int")
    out = mutations.scd2_history(
        df, keys=["k"], order_col="ts", tracked_col="state", tiebreak_col="id"
    )
    assert [r["state"] for r in out.orderBy("version").collect()] == [None, "a", None]


def test_scd2_single_exchange_pair(spark, sf_oracle):
    """Plan shape: the two window passes share the key partitioning — the
    physical plan must not exceed two shuffle exchanges."""
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    ev = load_table(spark, sf_oracle, "events")
    out = mutations.scd2_history(
        ev, keys=["user_id"], order_col="ts", tracked_col="event_type",
        tiebreak_col="event_id",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_merge_matches_join_based_reference(spark, sf_oracle):
    """Equivalence oracle: the shuffle-once union MERGE equals a naive
    join-based MERGE (full outer target vs collapsed updates) on real
    events data."""
    from yellowrush_spark_ml_pipeline_spark.sources import load_table

    ev = (
        load_table(spark, sf_oracle, "events")
        .select("user_id", "event_type", "value", "ts", "event_id")
        .filter(F.col("user_id") < 40)
    )
    cutoff = F.lit("2024-01-16 00:00:00").cast("timestamp")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    target = (
        ev.filter(F.col("ts") < cutoff)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1").drop("rn")
    )
    upd = ev.filter(F.col("ts") >= cutoff).withColumn(
        "op", F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U"))
    )
    fast = mutations.merge_upsert(
        target, upd, keys=["user_id"], order_col="ts", tiebreak_col="event_id", op_col="op"
    )
    # naive reference: latest update per key; full outer join with target
    latest_upd = upd.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    joined = target.alias("t").join(
        latest_upd.alias("u"), on="user_id", how="full_outer"
    )
    ref = (
        joined.withColumn("_take_u", F.col("u.ts").isNotNull())
        .filter(~(F.col("_take_u") & (F.col("u.op") == "D")))
        .select(
            "user_id",
            *[
                F.when(F.col("_take_u"), F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
                for c in ("event_type", "value", "ts", "event_id")
            ],
        )
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, ref.collect()))
