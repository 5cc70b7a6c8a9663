#!/usr/bin/env python
"""Dump explain('formatted') for named queries into plans/r16/<q>_<tag>.txt.

Usage: python tools/dump_plans_r16.py TAG name [name ...]
Plan build only (sf0.001 by default) — no execution.
"""
from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from spark_app_twitter_spark.plans.explain import formatted_plan  # noqa: E402
from spark_app_twitter_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    import __spark_entry__ as ent

    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("plans_r16", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    out_dir = os.path.join(ROOT, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            plan = formatted_plan(qs[name](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN BUILD FAILED: {e}"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
