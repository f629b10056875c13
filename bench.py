"""Benchmark harness (driver contract): times every registered query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization through the `noop` sink (all
columns computed, nothing collected to the driver), which is the honest
cost of the plan — `count()` would let Catalyst prune the payload columns.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1).rstrip(".")) if m else -1.0


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_suite(
    spark, entrymod, sf_dir: str, retime_under: float = 2.0
) -> tuple[dict[str, float], dict[str, str]]:
    """Time every registered query once; queries finishing under
    ``retime_under`` seconds are re-run twice more and the MEDIAN is
    reported, so sub-second plans aren't polluted by the ~1 s single-shot
    noise floor (scheduler jitter, GC, page cache) and regressions stay
    attributable to plan changes."""
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name, fn in entrymod.queries().items():
        try:
            samples: list[float] = []
            for _ in range(3):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                samples.append(time.perf_counter() - t0)
                if samples[0] >= retime_under:
                    break
            timings[name] = round(sorted(samples)[len(samples) // 2], 2)
        except Exception as exc:  # noqa: BLE001 — record, keep benching
            failures[name] = f"{type(exc).__name__}: {exc}"[:200]
    return timings, failures


def main() -> int:
    import __spark_entry__ as entrymod
    from yellowrush_spark_ml_pipeline_spark.session import get_spark

    spark = get_spark("yellowrush-bench")
    # Warm the JVM/codegen AND parquet-scan paths so the first measured
    # query isn't charged session startup or reader-class loading (region
    # is 5 rows — data-scale effects stay inside the measured queries).
    materialize(spark.range(1000).selectExpr("sum(id) as s"))
    materialize(spark.read.parquet(f"{SF_DIR}/region.parquet"))
    # Warm the Python-worker pool + Arrow path: workers are reused across
    # queries (spark.python.worker.reuse), so without this the first
    # pandas-UDF query alone is charged the whole pool spawn (~5 s).
    warm_df = spark.range(256).repartition(8)
    materialize(warm_df.mapInPandas(lambda it: it, warm_df.schema))

    timings, failures = run_suite(spark, entrymod, SF_DIR)
    total = round(sum(timings.values()), 3)

    # Two-point scaling curve: re-run the suite at a smaller SF and report
    # per-query time ratios. A query scaling linearly in data shows a ratio
    # <= the data ratio (fixed per-job overhead pulls it far below at these
    # sizes); anything ABOVE the data ratio is flagged super-linear.
    # Disable with SPARK_GRAFT_SCALING_DIR="".
    default_secondary = "/root/testdata/sf0.01" if "0.01" not in SF_DIR else ""
    scaling_dir = os.environ.get("SPARK_GRAFT_SCALING_DIR", default_secondary)
    scaling: dict | None = None
    if scaling_dir:
        sec_timings, sec_failures = run_suite(spark, entrymod, scaling_dir)
        data_ratio = _sf_from_dir(SF_DIR) / max(_sf_from_dir(scaling_dir), 1e-9)
        ratios = {
            q: round(timings[q] / max(sec_timings[q], 1e-3), 2)
            for q in timings
            if q in sec_timings
        }
        scaling = {
            "secondary_sf": _sf_from_dir(scaling_dir),
            "secondary_total": round(sum(sec_timings.values()), 3),
            "data_ratio": round(data_ratio, 2),
            "time_ratio": ratios,
            "superlinear": sorted(
                [q for q, r in ratios.items() if r > data_ratio]
            ),
        }
        if sec_failures:
            failures.update({f"scaling:{k}": v for k, v in sec_failures.items()})

    # Direct BASELINE.md comparison hook: the reference's only published
    # numbers are RF training time (70-80 s, 4-core/14 GB, 30% sample,
    # numTrees=30/maxDepth=8) and the model metrics. Time the same
    # reference-config fit on the preprocessed dataset here.
    baseline_cmp: dict[str, float] = {}
    try:
        from yellowrush_spark_ml_pipeline_spark.flows import preprocess_lineitem
        from yellowrush_spark_ml_pipeline_spark.ml import (
            evaluate_binary,
            train_classifier,
        )

        pre = preprocess_lineitem(spark, SF_DIR, encode=False)
        feats = [
            "ship_month",
            "ship_day_of_week",
            "ship_is_holiday",
            "l_quantity",
            "p_retailprice",
        ]
        t0 = time.perf_counter()
        model, _, test_df = train_classifier(
            pre, feats, "is_over_expected", sample_fraction=0.3
        )
        baseline_cmp["rf_train_sec"] = round(time.perf_counter() - t0, 3)
        metrics = evaluate_binary(model, test_df, "is_over_expected")
        baseline_cmp.update({k: round(v, 4) for k, v in metrics.items()})
    except Exception as exc:  # noqa: BLE001
        failures["baseline_rf"] = f"{type(exc).__name__}: {exc}"[:200]

    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "n_queries": len(timings),
        "baseline_comparison": baseline_cmp,
    }
    if scaling is not None:
        out["scaling"] = scaling
    if failures:
        out["failures"] = failures
    print(json.dumps(out), flush=True)
    # The driver's capture window keeps the TAIL of stdout; the full line
    # above can outgrow it (it did in round 3, losing the headline number).
    # Emit a compact summary as the FINAL line so truncation always
    # preserves the metrics that matter.
    summary = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": out["sf"],
        "n_queries": len(timings),
        "rf_train_sec": baseline_cmp.get("rf_train_sec"),
        "roc_auc": baseline_cmp.get("roc_auc"),
        "superlinear": scaling["superlinear"] if scaling else [],
        "n_failures": len(failures),
    }
    print(json.dumps(summary), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
