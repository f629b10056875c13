"""Text primitives for the LLM-data-pipeline operators (SURVEY.md §2.13).

All JVM-side column expressions (split / regexp / hash built-ins) — the
hot path of a 100 TB dedup run is tokenization + hashing, and keeping it
inside codegen is the difference between CPU-bound and Python-IPC-bound.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[^\p{L}\p{N}]+"  # split on any non-letter/digit run
# BPE-ish word/number/punct tokenizer for token counting
BPE_ISH_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def tokens(text: Column) -> Column:
    """Lowercased word tokens; empty strings filtered (split artifacts)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_PATTERN), lambda t: t != F.lit("")
    )


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda t: t != F.lit("")))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of word/number/punctuation tokens — a cheap proxy for LLM
    tokenizer counts (regexp, no Python)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_ISH_PATTERN), 0))


def shingles(tok: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array, via transform over index
    slices (JVM-side, no explode needed until the caller wants one)."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tok) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(tok, i + 1, n)),
    )


def char_ngrams(text: Column, n: int = 5) -> Column:
    norm = F.lower(F.regexp_replace(text, r"\s+", " "))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - n + 1, F.lit(1))),
        lambda i: norm.substr(i, F.lit(n)),
    )


def hash64(col: Column, seed: int = 42) -> Column:
    """xxhash64 — Spark's built-in 64-bit hash (fast, JVM-side). Used for
    MinHash permutations and fingerprints (engine-internal; not meant to
    match any other engine's hash)."""
    return F.xxhash64(col, F.lit(seed))


def rolling_fingerprint(text: Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    whitespace-normalized lowercased text."""
    return F.xxhash64(F.lower(F.regexp_replace(text, r"\s+", " ")))
