"""Round-12 optimization measurement harness (guide §1).

Times selected queries through the noop sink (min of N shots, same
estimator as bench.py) and captures `.explain("formatted")` for each into
plans/r12/<query>_<tag>.txt so plan claims in OPTIMIZATION_r12.md are
reproducible artifacts, not prose.

Usage:
    python tools/opt_measure.py --tag before q1 q2 ...
    python tools/opt_measure.py --tag before --top 20
    python tools/opt_measure.py --tag after --shots 3 winnow_pairs

Honest-measurement rules: same session config as bench.py (get_spark),
sf0.001 warmup shot per query first (codegen/JIT), System.gc() between
queries (checkpoint residue), noop materialization.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", type=int, default=0,
                    help="also measure the N slowest from BENCH_LOCAL.json")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--shots", type=int, default=2)
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--out", default="")
    ap.add_argument("--plans-dir", default="r13",
                    help="subdirectory of plans/ for the explain captures")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from yellowrush_spark_ml_pipeline_spark.session import get_spark

    names = list(args.queries)
    if args.top:
        bench = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_LOCAL.json")))
        ranked = sorted(bench["queries"].items(), key=lambda kv: -kv[1])
        for n, _ in ranked[: args.top]:
            if n not in names:
                names.append(n)

    qmap = entrymod.queries()
    unknown = [n for n in names if n not in qmap]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", args.plans_dir)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("yellowrush-opt-measure")
    materialize(spark.range(1000).selectExpr("sum(id) as s"))
    materialize(spark.read.parquet(f"{SF_DIR}/region.parquet"))
    warm_df = spark.range(256).repartition(8)
    materialize(warm_df.mapInPandas(lambda it: it, warm_df.schema))

    timings: dict[str, float] = {}
    for qi, name in enumerate(names):
        fn = qmap[name]
        spark.sparkContext._jvm.System.gc()
        # codegen warmup at the smallest SF (uniform with bench.py)
        try:
            materialize(fn(spark, WARM_DIR))
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"opt:{name}")
        samples = []
        n_jobs = 0
        for shot in range(args.shots):
            spark.sparkContext.setJobGroup(f"opt:{name}:{shot}", name)
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
            if shot == args.shots - 1:
                tracker = spark.sparkContext.statusTracker()
                n_jobs = len(
                    tracker.getJobIdsForGroup(f"opt:{name}:{shot}"))
        timings[name] = round(min(samples), 2)
        spark.sparkContext.setJobDescription(None)
        if not args.no_plan:
            df = fn(spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(txt)
        print(json.dumps({name: timings[name], "spread": round(
            max(samples) / max(min(samples), 1e-3), 2),
            "n_jobs": n_jobs}), flush=True)

    out = {"tag": args.tag, "sf_dir": SF_DIR, "timings": timings,
           "total": round(sum(timings.values()), 2)}
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
