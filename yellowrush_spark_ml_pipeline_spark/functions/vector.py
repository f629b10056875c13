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
    top-k (saves one norm per candidate pair at scale).

    The norm is routed through ``array_repeat`` so it is evaluated ONCE
    per row: Catalyst evaluates higher-order-function lambdas interpreted
    (no codegen, no subexpression elimination — see functions/text.py
    ``shingles``), so embedding the norm subtree in the per-element
    lambda recomputes the full O(dim) fold for EVERY element — O(dim²)
    per row, measured 0.72 s for 2,010 rows of dim 64 vs ~0.05 s in this
    form.  Values are bit-identical: each element is the same
    ``x / sqrt(fold)`` double division either way."""
    return F.zip_with(
        a, F.array_repeat(l2_norm(a), F.size(a)), lambda x, n: x / n
    )
