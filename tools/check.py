#!/usr/bin/env python
"""Name-targeted replica of the driver gate: run specific registry
queries against their DuckDB oracles at sf0.01 (or
SPARK_GRAFT_SWEEP_SF_DIR).

Usage: python tools/check.py name [name ...]
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

    spark = get_spark("check")
    spark.sparkContext.setLogLevel("ERROR")
    q, o = entry.queries(), entry.oracle_sql()
    bad = []
    for name in sys.argv[1:]:
        if name not in q:
            print(f"  {name}: NOT IN REGISTRY")
            bad.append(name)
            continue
        t0 = time.time()
        try:
            if name in o:
                assert_parity(q[name](spark, SF_DIR), o[name], SF_DIR, name)
                status = "ok"
            else:
                status = f"rows-only ({q[name](spark, SF_DIR).count()})"
        except Exception as e:  # noqa: BLE001
            status = f"BAD {str(e)[:300]}"
            bad.append(name)
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
