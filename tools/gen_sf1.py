#!/usr/bin/env python
"""sf1 fixture generator (VERDICT r14 item 4).

Every stress number through r14 was KEY-SHIFTED REPLICATION of
sf0.1 (tools/stress.py), which preserves per-key work but distorts
duplicate-heavy operators (the replicated corpus duplicates every
window) and caps the group-count growth real scale brings. This
generates a TRUE 10x-of-sf0.1 fixture with the same schemas, the
same marginal distributions, and the same structural invariants the
driver's generator exhibits at sf0.001/0.01/0.1:

- row counts scale linearly in sf (dims fixed: region 5, nation 25);
- `source = 'src' || doc_id % 20`; doc text is 10..100 uniform draws
  over the 30-word vocabulary; ~5% of docs are NEAR-DUPS (a verbatim
  copy of an earlier doc's text + " dup" appended) — the invariant
  minhash/simhash/span-dedup perf depends on;
- embeddings are unit-norm 64-dim with 10 weak label centers
  (intra-label cosine ~0.02, matching the shipped fixture);
- events are ts-sorted over Jan-2024 with |users| = 15 * rows/1000.

NOT byte-identical to the driver's tables (its RNG stream is not
public) — this fixture is for PERFORMANCE measurement at a true 10x;
the correctness gate stays on the driver's sf0.01. Writes OUTSIDE
the repo (default /tmp/sf1) — /root/testdata is read-only.

Usage: python tools/gen_sf1.py [--sf 1.0] [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast the row agg key query a scan batch"
).split()
ADJ = ["large", "hot", "blue", "old", "cold", "dark", "tiny", "new"]
NOUN = ["ring", "bolt", "plate", "gear", "cog", "wheel", "pin", "cap"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "zh", "fr", "es"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _ts_col(days_epoch: np.ndarray) -> pa.Array:
    return pa.array(
        (days_epoch.astype(np.int64) * DAY_US), type=pa.timestamp("us")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    sf, out = args.sf, args.out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust), pa.int32()
        ),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp), pa.int32()
        ),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part)
    _write(out, "part", pa.table({
        "p_partkey": pa.array(pk, pa.int64()),
        "p_name": [
            f"{ADJ[a]} {NOUN[b]}"
            for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
            )
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 2),
    }))

    # orders: dates 1995-01-01 .. 2001-08-01 (day grain)
    d0 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    d1 = np.datetime64("2001-08-01").astype("datetime64[D]").astype(int)
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col(rng.integers(d0, d1 + 1, n_ord)),
        "o_orderpriority": pa.array(
            np.array(PRIOS)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: ~4 lines/order via random order draw, linenumber 1..7,
    # shipdate = a 1995-2001 day + small lag; unsorted by orderkey
    lo = rng.integers(0, n_ord, n_li)
    s0 = np.datetime64("1995-01-02").astype("datetime64[D]").astype(int)
    s1 = np.datetime64("2001-11-04").astype("datetime64[D]").astype(int)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(lo, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_col(rng.integers(s0, s1 + 1, n_li)),
    }))

    # events: ts-sorted across Jan 2024, exp inter-arrival; users
    # scale like the driver's (150 per 10k events)
    n_users = max(1, int(n_ev * 15 // 1000))
    span_us = 30 * DAY_US
    gaps = rng.exponential(span_us / n_ev, n_ev)
    ts = np.cumsum(gaps)
    ts = (ts / ts[-1] * (span_us - 60_000_000)).astype(np.int64)
    epoch0 = (
        np.datetime64("2024-01-01").astype("datetime64[us]").astype(int)
    )
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(epoch0 + ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10..100 uniform vocab draws; ~5% near-dups (verbatim
    # copy of an earlier doc + " dup")
    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            texts.append(texts[rng.integers(0, i)] + " dup")
        else:
            texts.append(" ".join(vocab[rng.integers(0, 30, lens[i])]))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
        ),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: unit-norm 64-dim, 10 weak label centers (intra-label
    # cosine ~ alpha^2 = 0.02)
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    raw = rng.standard_normal((n_emb, 64)) + 0.15 * centers[labels]
    raw /= np.linalg.norm(raw, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(
            [r for r in raw.astype(np.float32)],
            pa.list_(pa.float32()),
        ),
        "label": pa.array(labels, pa.int32()),
    }))
    print(f"sf{sf} fixture written to {out}")


if __name__ == "__main__":
    main()
