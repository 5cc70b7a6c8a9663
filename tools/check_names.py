#!/usr/bin/env python
"""Targeted parity check: run the named registry entries against
their DuckDB oracles at sf0.01 (or $SPARK_GRAFT_SWEEP_SF_DIR).

Usage: python tools/check_names.py name1 name2 ...
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


def main() -> int:
    import __spark_entry__ as entry
    from parity import assert_parity
    from spark_app_twitter_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark("check-names")
    q = entry.queries()
    o = entry.oracle_sql()
    bad = []
    for name in names:
        t0 = time.time()
        try:
            if name in o:
                assert_parity(q[name](spark, SF_DIR), o[name], SF_DIR, name)
                status = "ok"
            else:
                n = q[name](spark, SF_DIR).count()
                status = f"rows-only ({n})"
        except Exception as e:  # noqa: BLE001 — report, keep checking
            status = f"BAD {str(e)[:400]}"
            bad.append(name)
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    print(f"checked {len(names)} BAD: {len(bad)}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
