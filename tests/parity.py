"""DuckDB-oracle parity harness — a local replica of the driver's t2
gate: run the Spark query and the ANSI-SQL oracle over the same
parquet tables, then compare row count, schema (column names), and
order-insensitive values exactly.
"""

from __future__ import annotations

import math
import os

import duckdb

from spark_app_twitter_spark.schemas import ALL_TABLES

REL_TOL = 1e-9


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in ALL_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _sort_key(row):
    return tuple(repr(c) for c in row)


def assert_parity(spark_df, oracle_query: str, sf_dir: str, name: str = "?"):
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_query, sf_dir)

    assert sorted(s_cols) == sorted(o_cols), (
        f"[{name}] column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"[{name}] row count: spark={len(s_rows)} oracle={len(o_rows)}"
    )

    # align columns by sorted name, normalize, sort rows
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_norm = sorted(
        [tuple(_norm_cell(r[i]) for i in s_idx) for r in s_rows], key=_sort_key
    )
    o_norm = sorted(
        [tuple(_norm_cell(r[i]) for i in o_idx) for r in o_rows], key=_sort_key
    )
    mismatches = []
    for i, (sr, orow) in enumerate(zip(s_norm, o_norm)):
        if sr != orow and not _rows_close(sr, orow):
            mismatches.append((i, sr, orow))
            if len(mismatches) >= 5:
                break
    assert not mismatches, f"[{name}] value mismatches (spark vs oracle): {mismatches}"


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=REL_TOL, abs_tol=1e-12):
                continue
        return False
    return True
