"""Scale-up generator: derive an sf1-shaped dataset from the driver's sf0.1
testdata by ``--factor``x replication with key remapping, so the bench can
measure a SECOND scaling decade (sf0.1 -> sf1) locally.

Replication preserves per-replica distributions exactly while keeping
replicas statistically unrelated to each other — the properties a scaling
measurement needs (a naive copy would plant every row as a 10-way
duplicate and near-dup/ANN candidate counts would grow quadratically BY
CONSTRUCTION, poisoning the super-linear check):

- every key column gets a per-replica stride offset (joins stay exact,
  key cardinality scales linearly, FK relationships hold within replicas);
- document text gets a per-replica Caesar rotation over letters
  (length/token/whitespace structure identical, all n-grams distinct
  across replicas — planted near-dups stay near-dups WITHIN a replica);
- embeddings get a per-replica deterministic sign-flip pattern (an
  orthogonal transform: norms and within-replica cosines exactly
  preserved, cross-replica similarity destroyed).

Replica 0 is the identity — sf0.1 is a literal subset of the output.

A provenance file records the source files' sizes+mtimes; consumers
(bench.py) skip the sf1 scaling block when provenance no longer matches
the live testdata (the driver regenerates testdata every round).

Usage:
    python tools/gen_sf.py [--src /root/testdata/sf0.1] \
                           [--dest .localdata/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import json
import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_STRIDE = 100_000_000  # far above any sf0.1 key, x10 replicas stay < 2^31
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def provenance(src: str) -> dict:
    out = {}
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        st = os.stat(p)
        out[t] = [st.st_size, int(st.st_mtime)]
    return out


def _shifted_alphabet(k: int) -> tuple[str, str]:
    lo = string.ascii_lowercase
    up = string.ascii_uppercase
    s = k % 26
    return lo + up, lo[s:] + lo[:s] + up[s:] + up[:s]


def _sign_pattern(k: int, dim: int) -> list[float]:
    if k == 0:
        return [1.0] * dim
    return [
        1.0 if ((k * 1315423911 + d * 2654435761) >> 7) & 1 == 0 else -1.0
        for d in range(dim)
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from yellowrush_spark_ml_pipeline_spark.session import get_spark

    spark = get_spark("gen-sf")
    os.makedirs(args.dest, exist_ok=True)

    for t in TABLES:
        src_path = os.path.join(args.src, f"{t}.parquet")
        dest_path = os.path.join(args.dest, f"{t}.parquet")
        base = spark.read.parquet(src_path)
        if t in ("region", "nation"):
            out = base  # fixed dims: cardinality does not scale
        else:
            parts = []
            dim = None
            if t == "embeddings":
                dim = len(base.select("embedding").first()[0])
            for k in range(args.factor):
                rep = base
                for c in KEY_COLS.get(t, []):
                    rep = rep.withColumn(c, F.col(c) + F.lit(k * KEY_STRIDE))
                if t == "documents" and k:
                    src_a, dst_a = _shifted_alphabet(k)
                    rep = rep.withColumn("text", F.translate("text", src_a, dst_a))
                if t == "embeddings" and k:
                    signs = F.array(
                        *[F.lit(s).cast("float") for s in _sign_pattern(k, dim)]
                    )
                    rep = rep.withColumn(
                        "embedding",
                        F.zip_with("embedding", signs, lambda a, b: a * b),
                    )
                parts.append(rep)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        # Size output files like the source layout (x factor data -> x
        # factor files, floor 1) so scan parallelism scales with data.
        n_files = max(1, args.factor if t not in ("region", "nation") else 1)
        out.repartition(n_files).write.mode("overwrite").parquet(dest_path)
        print(f"{t}: wrote {dest_path}")

    with open(os.path.join(args.dest, "provenance.json"), "w") as fh:
        json.dump({"src": args.src, "factor": args.factor,
                   "files": provenance(args.src)}, fh)
    print(f"provenance recorded; dataset at {args.dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
