"""Mechanical sweep for BIGINT-overflow-prone arithmetic in the oracle
surface — the 1000x-scale failure class found in round 5: a scale-up
multiplication or row-product that fits at test SF but wraps (Spark) or
errors (DuckDB) at 100 TB row counts, unless routed through
DECIMAL(38,0)/HUGEINT.

Heuristics (regex over ``oracle_sql()`` text):
  1. ``(<big literal> * <col>) //|div`` with no HUGEINT/DECIMAL in context
  2. ``SUM(<col> * <col>)`` over bare columns with no HUGEINT cast

Every hit must either be fixed or added to ALLOWED with a bound argument.
Run standalone or via tools/round_ritual.py; exits non-zero on new hits.
"""

from __future__ import annotations

import re
import sys

# name -> reason the flagged arithmetic is bounded (reviewed by hand)
ALLOWED: dict[str, str] = {
    # per-document quantities: syllable count is bounded by doc length,
    # x11800 stays < 2^63 for any document under ~780 TB of text
    "readability": "per-doc syllable counts; 11800*syll bounded by doc size",
}


def sweep() -> dict[str, list[str]]:
    import __spark_entry__ as entrymod

    hits: dict[str, list[str]] = {}
    for name, sql in entrymod.oracle_sql().items():
        found = []
        for m in re.finditer(r"\(\s*(\d{4,})\s*\*\s*(\w+)\s*\)\s*(//|div)", sql):
            ctx = sql[max(0, m.start() - 80) : m.end() + 40]
            if "HUGEINT" not in ctx and "DECIMAL" not in ctx:
                found.append(m.group(0).replace("\n", " ")[:60])
        for m in re.finditer(r"SUM\(\s*(\w+)\s*\*\s*(\w+)\s*\)", sql):
            if "HUGEINT" not in sql[max(0, m.start() - 60) : m.start()]:
                found.append(f"SUM({m.group(1)}*{m.group(2)})")
        if found and name not in ALLOWED:
            hits[name] = found
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
