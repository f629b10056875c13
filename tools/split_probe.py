"""Split-run decomposition probe (r9 verdict ask #5) — prove the PLAN's
work is linear for the queries still carrying the bench's
``superlinear_sf2`` flag, by exploiting the sf2 dataset's construction:
it is 20 INDEPENDENT key-strided replicas (tools/gen_sf.py), so
algorithmic work decomposes exactly — replicas share no join keys, no
n-grams, no cross-replica cosine structure.

For each query: time (a) monolithic sf1 (10 replicas), (b) sf2 as TWO
sequential replica-halves (each sf1-sized; the per-executor regime a
partition-scaled cluster runs in), (c) monolithic sf2 — all in ONE
fresh data-sized context with per-shot GC, minimum of --shots runs per
measurement.  halves/sf1 ≈ 2x proves the plan linear; mono/halves is
then the single-JVM working-set residual (heap pressure), not plan
cost.

Replica-halves are selected by filtering every keyed table on its
primary stride key (< 10*KEY_STRIDE vs >= 10*KEY_STRIDE) via a patched
``__spark_entry__._t`` — the filter lands in the parquet scan
(pushdown), exactly how a cluster executor would see its shard.

Usage:
    python tools/split_probe.py [--shots 2] k_core semantic_dedup ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from gen_sf import KEY_COLS, KEY_STRIDE  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--sf1", default=os.path.join(REPO, ".localdata", "sf1"))
    ap.add_argument("--sf2", default=os.path.join(REPO, ".localdata", "sf2"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from yellowrush_spark_ml_pipeline_spark.session import get_spark

    orig_t = entrymod._t
    state = {"range": None}

    def patched_t(spark, sf_dir, name):
        df = orig_t(spark, sf_dir, name)
        if state["range"] is not None and name in KEY_COLS:
            lo, hi = state["range"]
            key = KEY_COLS[name][0]
            df = df.filter((F.col(key) >= lo) & (F.col(key) < hi))
        return df

    entrymod._t = patched_t

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "yellowrush-split-probe",
        shuffle_partitions=cpus * 20,
        driver_mem=os.environ.get("SPARK_GRAFT_PROBE_MEM", "24g"),
    )
    qmap = entrymod.queries()

    def shot(name, sf_dir, parts, rng=None) -> float:
        best = None
        for _ in range(args.shots):
            spark.sparkContext._jvm.System.gc()
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            state["range"] = rng
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            state["range"] = None
            best = dt if best is None else min(best, dt)
        return best

    half = 10 * KEY_STRIDE
    out = {}
    for name in args.queries:
        t_sf1 = shot(name, args.sf1, cpus * 10)
        t_a = shot(name, args.sf2, cpus * 10, rng=(0, half))
        t_b = shot(name, args.sf2, cpus * 10, rng=(half, 40 * KEY_STRIDE))
        t_mono = shot(name, args.sf2, cpus * 20)
        rec = {
            "sf1": round(t_sf1, 2),
            "half_a": round(t_a, 2),
            "half_b": round(t_b, 2),
            "halves": round(t_a + t_b, 2),
            "mono": round(t_mono, 2),
            "halves_over_sf1": round((t_a + t_b) / max(t_sf1, 1e-3), 2),
            "mono_over_sf1": round(t_mono / max(t_sf1, 1e-3), 2),
        }
        out[name] = rec
        print(f"{name}: {json.dumps(rec)}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
