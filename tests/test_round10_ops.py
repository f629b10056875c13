"""Round-10 operator tests.

Covers the r9 ADVICE fixes plus the round-10 operators (semantic_dedup
quantizer seam, incremental semantic dedup, tokenizer persistence,
mixture-composed export).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# temperature_mixture_sample large-N regression (r9 ADVICE high):
# the default target used `CAST(_N AS DECIMAL(38,0)) div 2`, but Spark's
# `div` is IntegralDivide and ALWAYS returns LONG, so T — and with it the
# whole rate numerator T * s_micro * 1e6 — collapsed to 64-bit and
# overflowed at only ~7e4 single-source docs (ARITHMETIC_OVERFLOW under
# ANSI; silent wrap to negative rates otherwise).  The fix halves the
# BIGINT count FIRST, then casts: CAST((_N div 2) AS DECIMAL(38,0)).
# ---------------------------------------------------------------------------


def test_temperature_mixture_large_n_no_overflow_ansi(spark):
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    n = 1_000_000  # ~14x beyond the pre-fix overflow threshold (~7e4)
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("source")
    )
    old = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        out = temperature_mixture_sample(df, "source", "doc_id")
        # single source: s_micro == S, so rate = (N div 2)*mod div N
        rates = [r.rate_micro for r in out.select("rate_micro").distinct().collect()]
        assert rates == [500_000], rates
        kept = out.count()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    # Lehmer-hash selection at rate 0.5 — near-half survives
    assert 0.45 * n < kept < 0.55 * n, kept


def test_temperature_mixture_rate_never_negative_large_n(spark):
    """Non-ANSI engines wrapped to NEGATIVE rates pre-fix (empty
    selection).  Pin the sign for a skewed two-source large corpus."""
    from yellowrush_spark_ml_pipeline_spark.operators.textstats import (
        temperature_mixture_sample,
    )

    big = spark.range(200_000).select(
        F.col("id").alias("doc_id"), F.lit("web").alias("source")
    )
    small = spark.range(500).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.lit("books").alias("source"),
    )
    out = temperature_mixture_sample(big.unionByName(small), "source", "doc_id")
    rates = {
        r["source"]: r["rate_micro"]
        for r in out.select("source", "rate_micro").distinct().collect()
    }
    assert all(v >= 0 for v in rates.values()), rates
    # alpha=1/2 flattening: tail source keep-rate strictly above dominant
    assert rates["books"] > rates["web"], rates
