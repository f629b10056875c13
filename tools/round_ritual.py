"""One-command round ritual — run at the START of every round (testdata
regenerates between rounds and physical parquet encodings drift; r3's
events.ts nanos→micros change proved it) and again before round end so
the committed verification artifacts reflect the final tree.

Steps:
1. full oracle mirror sweep (Spark vs DuckDB hash, driver-shaped) with
   --json → MIRROR_LOCAL.json
2. rows-only queries through the same mirror (rows>0 + error surfacing)
3. VERIFIED.md ledger regeneration
4. PLANS.md physical-plan audit regeneration
5. (optional, --sf1) regenerate the derived sf1 dataset so bench.py's
   scaling_sf1 block stays provenance-fresh

Usage:
    python tools/round_ritual.py          # steps 1-4
    python tools/round_ritual.py --sf1    # steps 1-5
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(args: list[str]) -> int:
    print(f"== {' '.join(args)}", flush=True)
    return subprocess.run(args, cwd=REPO).returncode


def main() -> int:
    import __spark_entry__ as entrymod

    rc = 0
    rc |= run([sys.executable, "tools/oracle_dtype_sweep.py"])
    rc |= run([sys.executable, "tools/overflow_sweep.py"])
    rc |= run([sys.executable, "tools/driver_mirror.py", "--json"])
    rows_only = [
        n for n in entrymod.queries() if n not in entrymod.oracle_sql()
    ]
    rc |= run([sys.executable, "tools/driver_mirror.py", "--json", *rows_only])
    rc |= run([sys.executable, "tools/verified_ledger.py"])
    rc |= run([sys.executable, "tools/plan_audit.py"])
    if "--sf1" in sys.argv:
        rc |= run([sys.executable, "tools/gen_sf.py"])
    print(f"ritual {'OK' if rc == 0 else 'FAILED'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
