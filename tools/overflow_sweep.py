"""Mechanical sweep for BIGINT-overflow-prone arithmetic in BOTH engine
surfaces — the 1000x-scale failure class found in round 5: a scale-up
multiplication or row-count product that fits at test SF but wraps
(Spark, ANSI off) or errors (DuckDB) at 100 TB row counts, unless
routed through DECIMAL(38,0)/HUGEINT.

Round 6 extension (ADVICE r5): the round-5 sweep scanned only
``oracle_sql()`` text, so Spark-side ``F.expr``/SQL strings were blind —
the autocorrelation divisor ``div (den_x * den_y)`` was a live miss of
exactly the stated failure class. This version additionally extracts
every string literal from the package's operator sources and
``__spark_entry__.py`` (the Spark-side SQL surface) and applies the same
heuristics, plus a divisor-product heuristic that catches that miss.

Heuristics (regex over each SQL-ish string):
  1. ``(<big literal> * <col>) //|div`` with no HUGEINT/DECIMAL around
  2. ``SUM(<col> * <col>)`` with no HUGEINT cast before it
  3. ``//|div (<col> * <col>)`` divisor products with no
     HUGEINT/DECIMAL around (the autocorrelation class)

Every hit must either be fixed or added to ALLOWED with a bound
argument. Run standalone or via tools/round_ritual.py; exits non-zero
on new hits.
"""

from __future__ import annotations

import ast
import pathlib
import re
import sys

# key -> reason the flagged arithmetic is bounded (reviewed by hand).
# Keys are oracle names (oracle surface) or "<file>:<hit>" prefixes
# (source surface).
ALLOWED: dict[str, str] = {
    # per-document quantities: syllable count is bounded by doc length,
    # x11800 stays < 2^63 for any document under ~780 TB of text
    "readability": "per-doc syllable counts; 11800*syll bounded by doc size",
    # docstring formula; n_bins*capacity ~ total corpus tokens (each bin
    # holds <= capacity tokens), < 2^63 until ~9 exatokens
    "yellowrush_spark_ml_pipeline_spark/operators/textstats.py:"
    "div (n_bins * capacity)": "bins*capacity ~ corpus tokens, bounded",
    # per-doc counts (syllables/types/hapax bounded by doc token count);
    # x11800 < 2^63 for any single document under ~780 TB
    "yellowrush_spark_ml_pipeline_spark/operators/textstats.py:"
    "(1000 * n_syllables) div": "per-doc syllable count, bounded",
    "yellowrush_spark_ml_pipeline_spark/operators/textstats.py:"
    "(11800 * n_syllables) div": "per-doc syllable count, bounded",
    "yellowrush_spark_ml_pipeline_spark/operators/textstats.py:"
    "(1000 * n_types) div": "per-doc distinct-token count, bounded",
    "yellowrush_spark_ml_pipeline_spark/operators/textstats.py:"
    "(1000 * n_hapax) div": "per-doc hapax count, bounded",
    # DuckDB oracle: big_s is CAST(... AS HUGEINT) in its own CTE (tot)
    # — the 40-char context window just can't see it; HUGEINT*BIGINT
    # promotes to HUGEINT, and S*n can reach ~1e24 at 100 TB row counts
    # (far beyond 2^63 — which is WHY it must be HUGEINT — and far
    # below 2^127).  The Spark side is swept separately below.
    "temperature_mixture": "oracle: big_s HUGEINT-cast in the tot CTE; "
    "S*n ~1e24 needs >64-bit and HUGEINT provides it",
    # export_mixture composes the same rate CTEs (r10): big_s is
    # CAST(... AS HUGEINT) in its tot CTE, so the divisor product is
    # HUGEINT — the 40-char window can't see the cast.  The second key
    # is the same expression seen on the source surface: the
    # oracle_export_mixture_sql GENERATOR assembles the SQL from part
    # literals, so the part containing the divisor never equals a full
    # oracle text and gets swept under the file name.
    "export_mixture": "oracle: same HUGEINT rate CTEs as "
    "temperature_mixture (big_s HUGEINT in tot)",
    # the UNCAPPED-rate twins (r11 upsampler, r12 epoch-keyed export)
    # share the identical rate CTE shape: big_s and big_n are both
    # CAST(... AS HUGEINT) in their tot CTE, so the divisor product
    # big_s * n_docs AND the numerator (big_n * factor) // 1000 *
    # s_micro * 1e6 (~1e24 at 100 TB row counts) evaluate in HUGEINT
    # end to end; the Spark side routes the same arithmetic through
    # DECIMAL(38,0) (temperature_mixture_rates' t_expr), pinned by
    # test_mixture_upsample_matches_exact_integer_model's large-N case.
    "mixture_upsample": "oracle: big_s/big_n HUGEINT-cast in tot; "
    "same bound as temperature_mixture",
    "export_upsampled": "oracle: same HUGEINT rate CTEs "
    "(oracle_export_upsampled_sql prefix)",
    # DSIR per-doc weight (r12): |ratio_nanonats| <= ~5.5e10 even at
    # 100 TB feature totals (|ln(1/(N+B))| ~ 55 nats), and the sum is
    # PER DOCUMENT — n_feats_doc * 5.5e10 ~ 1.1e18 for a pathological
    # 100 MB doc, inside BIGINT; the DuckDB side SUMs in HUGEINT before
    # its final BIGINT cast (per-doc bound, like readability)
    "dsir_select": "oracle: per-doc bounded sum; DuckDB SUM is HUGEINT "
    "before the cast",
    "__spark_entry__.py:SUM(n_db*ratio_nanonats)": "same per-doc bound "
    "(the dsir_select oracle literal seen on the source surface)",
    "__spark_entry__.py:// (big_s * n_docs)": "generator part literal of "
    "the export_mixture oracle; big_s is HUGEINT-cast in its tot CTE",
    # docstring formula text only.  The r10 fix made the claim true:
    # T is now CAST((_N div 2) AS DECIMAL(38,0)) — halve the BIGINT
    # FIRST, then cast, because Spark's `div` always returns LONG and
    # would otherwise demote the whole numerator to 64-bit (the r9
    # ADVICE overflow, reproduced at ~7e4 single-source docs).  With T
    # decimal, T*s_micro*modulus and S*n_docs both evaluate in
    # DECIMAL(38,0); regression test pins the large-N case.
    "yellowrush_spark_ml_pipeline_spark/operators/textstats.py:"
    "div (S * n_docs_i)": "docstring formula; code keeps T DECIMAL(38,0)"
    " via CAST((_N div 2) AS DECIMAL(38,0)) — large-N pytest pins it",
}

_SQLISH = re.compile(r"(?i)\b(select|div|sum\s*\(|cast\s*\()")


def _hits_in_sql(sql: str) -> list[str]:
    found = []
    for m in re.finditer(r"\(\s*(\d{4,})\s*\*\s*(\w+)\s*\)\s*(//|div)", sql):
        ctx = sql[max(0, m.start() - 80) : m.end() + 40]
        if "HUGEINT" not in ctx and "DECIMAL" not in ctx:
            found.append(m.group(0).replace("\n", " ")[:60])
    for m in re.finditer(r"SUM\(\s*(\w+)\s*\*\s*(\w+)\s*\)", sql):
        if "HUGEINT" not in sql[max(0, m.start() - 60) : m.start()]:
            found.append(f"SUM({m.group(1)}*{m.group(2)})")
    for m in re.finditer(r"(?://|\bdiv\b)\s*\(\s*(\w+)\s*\*\s*(\w+)\s*\)", sql):
        ctx = sql[max(0, m.start() - 40) : m.end() + 40]
        if "HUGEINT" not in ctx and "DECIMAL" not in ctx:
            found.append(m.group(0).replace("\n", " ")[:60])
    return found


def _source_strings(path: pathlib.Path) -> list[str]:
    """All string-literal constants in a .py file (F.expr bodies, SQL)."""
    tree = ast.parse(path.read_text())
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            out.append(node.value)
    return out


def sweep() -> dict[str, list[str]]:
    import __spark_entry__ as entrymod

    hits: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        found = _hits_in_sql(sql)
        if found and name not in ALLOWED:
            hits[name] = found

    root = pathlib.Path(__file__).resolve().parent.parent
    pkg = root / "yellowrush_spark_ml_pipeline_spark"
    sources = sorted(pkg.rglob("*.py")) + [root / "__spark_entry__.py"]
    oracle_texts = {s.strip() for s in entrymod.oracle_sql().values()}
    for path in sources:
        rel = str(path.relative_to(root))
        found: list[str] = []
        for lit in _source_strings(path):
            if not _SQLISH.search(lit):
                continue
            if rel == "__spark_entry__.py" and lit.strip() in oracle_texts:
                # already swept above under its per-oracle name (with
                # the oracle-name allowlist applied)
                continue
            found.extend(_hits_in_sql(lit))
        found = [h for h in found if f"{rel}:{h}" not in ALLOWED]
        if found:
            hits[rel] = found
    return hits


def main() -> int:
    hits = sweep()
    for name, found in hits.items():
        print(f"OVERFLOW-PRONE {name}: {found}")
    print(f"overflow sweep: {len(hits)} unreviewed hits "
          f"({len(ALLOWED)} allowlisted)")
    return 1 if hits else 0


if __name__ == "__main__":
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    raise SystemExit(main())
