#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every (or the
first N) registry queries against their DuckDB oracles at sf0.01 and
report BAD counts. This is the pre-flight for __spark_entry__'s
rotation window — run it after any registry or operator change.

Usage: python tools/sweep.py [N | A:B]   (N = check only the first N
registry entries, e.g. 50 for the driver's window; A:B = the
[A, B) slice of the registry order, for chunking the slow sf0.1
sweeps; default: all)
       python tools/sweep.py --stale    (attestation-staleness report
over the cumulative CORRECTNESS_r*.json ledger, rename-aware — the
input to each round's _R{N}_WINDOW rotation; no Spark started)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.01")
# the literal-artifact oracles (oracles.py) train their replica on
# ORACLE_SF_DIR — keep it aligned with the corpus being swept, or
# every trained-artifact query is a deliberate train/serve mismatch
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)


def _lint_oracle_dtypes(oracle_sqls: dict) -> None:
    """Reject HUGEINT-class columns in any oracle's final projection.

    DuckDB widens sum(BIGINT) to int128, which the driver's pandas
    canonicalizer turns into float64 — a guaranteed value-hash
    mismatch against Spark's int64 even with identical values (the
    r6/r7 red class). DESCRIBE binds without executing, so the whole
    registry lints in seconds before the sweep spends any Spark time.
    """
    import duckdb

    con = duckdb.connect()
    tables = ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    bad = []
    for name, sql in oracle_sqls.items():
        for cname, ctype, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if any(b in ctype.upper() for b in ("HUGEINT", "INT128")):
                bad.append((name, cname, ctype))
    con.close()
    if bad:
        raise SystemExit(f"oracle dtype lint FAILED (uncast widening "
                         f"in final projection): {bad}")
    print(f"oracle dtype lint: {len(oracle_sqls)} oracles clean", flush=True)


# registry renames: attestations recorded under a query's OLD name
# carry over to the live name, so staleness accounting tracks live
# names only and retired names stop inflating the cumulative union
# (VERDICT r11 item 8). old name -> live name.
RENAMES = {
    "sem_dedup_2level": "sem_dedup",
    "sim_bitext_mining_ivf": "sim_bitext_mining",
}


def stale_report() -> int:
    """Latest attestation round per LIVE registry name (rename-aware),
    oldest first — the rotation window's input. Exit 1 if any ledger
    name is neither live nor in RENAMES (accounting drift)."""
    import glob
    import json
    import re
    from collections import Counter

    import __spark_entry__ as entry

    att: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            att[RENAMES.get(k, k)] = max(att.get(RENAMES.get(k, k), 0), r)
    live = list(entry.queries())
    drift = sorted(set(att) - set(live))
    ranked = sorted((att.get(n, 0), n) for n in live)
    print(f"live registry: {len(live)}  attested: "
          f"{sum(1 for n in live if n in att)}  "
          f"by round: {dict(sorted(Counter(r for r, _ in ranked).items()))}")
    oldest = ranked[0][0]
    print(f"oldest attestation: r{oldest}")
    for r, n in ranked:
        if r <= oldest:
            print(f"  r{r or '–'} {n}")
    if drift:
        print(f"DRIFT: {len(drift)} ledger names neither live nor "
              f"renamed: {drift}")
        return 1
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--stale":
        return stale_report()
    start, limit = 0, None
    if len(sys.argv) > 1:
        if ":" in sys.argv[1]:
            a, b = sys.argv[1].split(":")
            start, limit = int(a), int(b)
        else:
            # 0 keeps its historic meaning: sweep EVERYTHING (a falsy
            # limit must never silently produce an empty false-green
            # pre-flight)
            limit = int(sys.argv[1]) or None

    import __spark_entry__ as entry
    from parity import assert_parity
    from spark_app_twitter_spark.session import get_spark

    _lint_oracle_dtypes(entry.oracle_sql())
    spark = get_spark("sweep")
    rows = entry.entry(spark).count()
    print(f"entry rows: {rows}", flush=True)
    q = entry.queries()
    o = entry.oracle_sql()
    # names whose DUCKDB oracle is intractable at the swept SF
    # (quadratic list ops, re-inlined iterative CTE chains) — the
    # Spark side still runs and row-counts; full value parity for
    # them is pinned at sf0.01 every sweep
    for name in os.environ.get("SPARK_GRAFT_SWEEP_ROWS_ONLY", "").split(","):
        o.pop(name.strip(), None)
    names = list(q)[start:limit]
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
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            status = f"BAD {str(e)[:300]}"
            bad.append(name)
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]", flush=True)
    print(f"checked {len(names)} BAD: {len(bad)}")
    for name in bad:
        print(f"  BAD {name}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
