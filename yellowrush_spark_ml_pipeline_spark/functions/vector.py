"""Embedding/array column math (extension surface, SURVEY.md §2.13).

Everything is built from ``zip_with`` / ``aggregate`` / ``transform`` —
JVM-side higher-order functions over ``array<double>``. No Python UDFs:
at 100 TB a row-at-a-time Python cosine would dominate the job; these
stay inside whole-stage codegen.

Inputs are cast to ``array<double>`` first: float arithmetic is *not*
associative-stable across engines, while float→double widening is exact, so
double math gives deterministic, oracle-comparable results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(l2_norm_sq(a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """``dot / (sqrt(na) * sqrt(nb))`` with explicit operation order so the
    DuckDB oracle can reproduce it bit-for-bit."""
    return dot(a, b) / (F.sqrt(l2_norm_sq(a)) * F.sqrt(l2_norm_sq(b)))


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize; pre-normalizing once turns cosine top-k into dot
    top-k (saves one norm per candidate pair at scale)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: x / n)
