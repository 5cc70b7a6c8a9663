"""Registry-wide oracle dtype lint.

The driver's correctness gate canonicalizes DuckDB results through
pandas before hashing; DuckDB's ``sum(BIGINT)`` widens to HUGEINT
(int128), which pandas materializes as float64 — so an uncast sum in
an oracle's FINAL projection hash-mismatches Spark's int64 even when
every value is identical. This bit the gate twice (r6 array postings,
r7 ``pack_shard_manifest`` / ``text_corpus_datacard``), so the
invariant is now pinned: DESCRIBE every registered oracle and reject
any top-level HUGEINT column. DESCRIBE binds and plans the query
without executing it, so this covers the full registry (including the
trained-replica CTE chains) in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()

BANNED = ("HUGEINT", "UHUGEINT", "INT128")


def _registry():
    import __spark_entry__ as entry

    return entry.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", sorted(_registry()), ids=str)
def test_oracle_has_no_hugeint_columns(con, name):
    sql = _registry()[name]
    cols = con.execute(f"DESCRIBE {sql}").fetchall()
    offenders = [
        (cname, ctype)
        for cname, ctype, *_ in cols
        if any(b in ctype.upper() for b in BANNED)
    ]
    assert not offenders, (
        f"oracle {name} projects HUGEINT-class columns {offenders}: "
        "the driver canonicalizer turns int128 into float64 and the "
        "value hash diverges from Spark's int64 — add "
        "CAST(... AS BIGINT) in the final projection"
    )
