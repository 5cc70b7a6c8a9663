"""Literal-artifact DuckDB oracles for the iteratively-trained
operators (PCA projection, LR training, BPE train/encode, PageRank).

Problem these solve: the driver's correctness gate compares each
registered Spark query against a single ANSI-SQL string run by DuckDB
over the same parquet tables. Training loops (eigendecomposition,
gradient descent, merge-rule argmax, power iteration) are not
single-statement SQL — so those five queries previously recorded the
weaker ``no_oracle`` rows-only check.

Pattern (the same published-model-artifact discipline as
``clustering.kmeans_cells_sql``): each oracle here is GENERATED at
``oracle_sql()`` time by an INDEPENDENT replica of the training
recipe — pure Python / numpy over data read with DuckDB, sharing no
Spark code path — and the trained artifact (axes, weights, merge
rules, ranks) is embedded into the emitted SQL as literals. The
deployment half of each operator (projection, scoring, encode fold,
rank scaling) stays real SQL over the corpus, so the driver's
hash-compare exercises the full distributed computation against a
sequential reference implementation.

Scope/caveat (documented, deliberate): artifacts are data-dependent,
so the SQL is trained on the corpus the driver compares at —
``ORACLE_SF_DIR`` (default ``/root/testdata/sf0.01``, overridable via
``SPARK_GRAFT_ORACLE_SF_DIR``). Comparing the generated SQL against a
different corpus is a train/serve mismatch and will (correctly)
hash-mismatch. Exactness rests on the engine's quantized-integer
reduction discipline: every distributed sum the replicas mirror is an
integer sum (order-independent), so replica == Spark bit-for-bit; the
only cross-library float surface is ``exp()`` (pinned by
``tests/test_llm_ops.py``'s bit-parity tests).

Reference parity: the reference app publishes its trained-model
outputs as static artifacts too (spark_app/functions/functions.py
loads pretrained pipelines); this module is the same train-once /
serve-anywhere seam expressed for the correctness gate.
"""

from __future__ import annotations

import math
import os

ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

BPE_EOW = "</w>"

# (oracle name, sf_dir) -> generated SQL; artifacts are deterministic
# per corpus so regeneration is pure waste.
_SQL_CACHE: dict[tuple[str, str], str] = {}


def _duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def _s(lit: str) -> str:
    """SQL single-quoted string literal."""
    return "'" + lit.replace("'", "''") + "'"


def _f(x: float) -> str:
    """Round-trip double literal (repr is shortest-exact)."""
    return repr(float(x))


# ---------------------------------------------------------------- BPE


def _merge_word(sym: list[str], left: str, right: str) -> list[str]:
    """Greedy leftmost non-overlapping pair merge — the pure-Python
    mirror of textstats._bpe_merge_pair's (out, carry) fold."""
    out: list[str] = []
    carry: str | None = None
    for s in sym:
        if carry is None:
            carry = s
        elif carry == left and s == right:
            out.append(left + right)
            carry = None
        else:
            out.append(carry)
            carry = s
    if carry is not None:
        out.append(carry)
    return out


def _word_syms(word: str) -> list[str]:
    # F.split(word, "") yields [''] for the empty string (Java regex
    # split), and DuckDB string_split(word, '') agrees; mirror both.
    chars = list(word) if word else [""]
    return chars + [BPE_EOW]


def _word_freq_vocab(sf_dir: str) -> list[tuple[int, tuple[str, ...]]]:
    """(freq, symbol-tuple) per distinct word — the shared trainer
    input of both BPE replicas. ONE copy of the DuckDB tokenization
    mirror (string_split-on-space must track functions/text.tokens);
    the connection is closed after the fetch."""
    con = _duck(sf_dir)
    try:
        freqs = con.execute(
            "SELECT word, count(*) AS freq FROM ("
            "SELECT unnest(string_split(text, ' ')) AS word FROM documents"
            ") GROUP BY word"
        ).fetchall()
    finally:
        con.close()
    return [(int(f), _word_syms(w)) for w, f in freqs]


def replica_bpe_merges(
    sf_dir: str, n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Sequential replica of textstats.bpe_train_merges_frame: DuckDB
    tokenizes (same string_split-on-space), Python runs the
    argmax-then-merge loop. All pair counts are exact integers; ties
    break (count desc, left asc, right asc) — code-point order equals
    Spark's UTF-8 binary order."""
    vocab = _word_freq_vocab(sf_dir)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for freq, sym in vocab:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((left, right, c))
        vocab = [
            (freq, _merge_word(sym, left, right)) for freq, sym in vocab
        ]
    return merges


def bpe_train_merges_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Literal-artifact twin of textstats.bpe_train_merges."""
    key = ("bpe_train_merges", sf_dir)
    if key not in _SQL_CACHE:
        rows = ", ".join(
            f"(CAST({i} AS INTEGER), {_s(l)}, {_s(r)}, CAST({c} AS BIGINT))"
            for i, (l, r, c) in enumerate(replica_bpe_merges(sf_dir))
        )
        _SQL_CACHE[key] = (
            "SELECT * FROM (VALUES "
            + rows
            + ') AS t(merge_rank, "left", "right", pair_count)'
        )
    return _SQL_CACHE[key]


def _merge_stage_sql(k: int, left: str, right: str) -> str:
    """One merge round over the vocab CTE v{k} -> v{k+1}: explode the
    symbol list with ordinality, mark greedy-leftmost matches via
    window functions, drop consumed rows, regroup in order.

    left != right: adjacent matches are impossible (they would force
    left == right), so every match merges and the row AFTER a match
    is consumed.  left == right: matches live inside maximal runs of
    the symbol; greedy-leftmost pairs occupy even offsets, odd
    offsets are consumed (gaps-and-islands for the run id)."""
    merged = _s(left + right)
    if left != right:
        return f"""e{k} AS (
  SELECT word, generate_subscripts(sym, 1) AS i, unnest(sym) AS s FROM v{k}
),
f{k} AS (
  SELECT word, i, s,
         coalesce(s = {_s(left)}
                  AND lead(s) OVER (PARTITION BY word ORDER BY i) = {_s(right)},
                  false) AS m
  FROM e{k}
),
g{k} AS (
  SELECT word, i, s, m,
         coalesce(lag(m) OVER (PARTITION BY word ORDER BY i), false) AS cons
  FROM f{k}
),
v{k + 1} AS (
  SELECT word, list(CASE WHEN m THEN {merged} ELSE s END ORDER BY i) AS sym
  FROM g{k} WHERE NOT cons GROUP BY word
)"""
    return f"""e{k} AS (
  SELECT word, generate_subscripts(sym, 1) AS i, unnest(sym) AS s FROM v{k}
),
f{k} AS (
  SELECT word, i, s, (s = {_s(left)}) AS a,
         i - row_number() OVER (PARTITION BY word, (s = {_s(left)}) ORDER BY i) AS grp
  FROM e{k}
),
g{k} AS (
  SELECT word, i, s, a,
         i - min(i) OVER (PARTITION BY word, a, grp) AS p,
         count(*) OVER (PARTITION BY word, a, grp) AS kr
  FROM f{k}
),
v{k + 1} AS (
  SELECT word,
         list(CASE WHEN a AND p % 2 = 0 AND p < kr - 1 THEN {merged} ELSE s END
              ORDER BY i) AS sym
  FROM g{k} WHERE NOT (a AND p % 2 = 1) GROUP BY word
)"""


def bpe_encode_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Twin of textstats.bpe_encode: merge rules are the trained
    artifact (from the sequential replica); tokenization, the
    per-distinct-word merge folds, and the join-back aggregation are
    all real SQL over the corpus."""
    key = ("bpe_encode", sf_dir)
    if key in _SQL_CACHE:
        return _SQL_CACHE[key]
    merges = replica_bpe_merges(sf_dir)
    stages = ",\n".join(
        _merge_stage_sql(k, l, r) for k, (l, r, _) in enumerate(merges)
    )
    n = len(merges)
    _SQL_CACHE[key] = f"""WITH wc AS (
  SELECT doc_id, word, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
),
v0 AS (
  SELECT word, list_append(string_split(word, ''), '{BPE_EOW}') AS sym
  FROM (SELECT DISTINCT word FROM wc)
),
{stages},
enc AS (SELECT word, len(sym) AS n_sub FROM v{n})
SELECT wc.doc_id,
       CAST(sum(wc.n) AS BIGINT) AS n_words,
       CAST(sum(wc.n * enc.n_sub) AS BIGINT) AS n_subwords,
       round(CAST(sum(wc.n * enc.n_sub) AS DOUBLE)
             / CAST(sum(wc.n) AS DOUBLE), 6) AS subword_ratio
FROM wc JOIN enc USING (word)
GROUP BY wc.doc_id"""
    return _SQL_CACHE[key]


def replica_bpe_merges_batched(
    sf_dir: str, n_merges: int = 8, batch: int = 4
) -> list[tuple[str, str, int]]:
    """Sequential replica of textstats.bpe_train_merges_batched_frame:
    one count pass per round, greedy disjoint-symbol selection in
    (count desc, left, right) order, folds applied in pick order."""
    vocab = _word_freq_vocab(sf_dir)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        counts: dict[tuple[str, str], int] = {}
        for freq, sym in vocab:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + freq
        if not counts:
            break
        top = sorted(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[: batch * 8]
        used: set[str] = set()
        picked: list[tuple[str, str, int]] = []
        for (left, right), c in top:
            if len(picked) >= batch or len(merges) + len(picked) >= n_merges:
                break
            if left in used or right in used:
                continue
            picked.append((left, right, c))
            used.update((left, right))
        if not picked:
            break
        for left, right, c in picked:
            merges.append((left, right, c))
            vocab = [
                (freq, _merge_word(sym, left, right)) for freq, sym in vocab
            ]
    return merges


def bpe_compression_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Twin of textstats.bpe_compression: wraps the full encode twin
    (trained-artifact merge folds and all) as a CTE and rolls the
    per-doc result up to the per-source chars-per-token scorecard."""
    key = ("bpe_compression", sf_dir)
    if key in _SQL_CACHE:
        return _SQL_CACHE[key]
    _SQL_CACHE[key] = f"""WITH enc_docs AS (
{bpe_encode_sql(sf_dir)}
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS n_chars,
       CAST(sum(e.n_subwords) AS BIGINT) AS n_subwords,
       round(CAST(sum(d.n_chars) AS DOUBLE)
             / CAST(sum(e.n_subwords) AS DOUBLE), 6) AS chars_per_token
FROM enc_docs e JOIN documents d USING (doc_id)
GROUP BY d.source"""
    return _SQL_CACHE[key]


def bpe_train_merges_batched_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Literal-artifact twin of textstats.bpe_train_merges_batched."""
    key = ("bpe_train_merges_batched", sf_dir)
    if key not in _SQL_CACHE:
        rows = ", ".join(
            f"(CAST({i} AS INTEGER), {_s(l)}, {_s(r)}, CAST({c} AS BIGINT))"
            for i, (l, r, c) in enumerate(replica_bpe_merges_batched(sf_dir))
        )
        _SQL_CACHE[key] = (
            "SELECT * FROM (VALUES "
            + rows
            + ') AS t(merge_rank, "left", "right", pair_count)'
        )
    return _SQL_CACHE[key]


# ----------------------------------------------------------------- LR


def replica_lang_lr(
    sf_dir: str, iters: int, rate: float
) -> tuple[list[float], float]:
    """Sequential replica of training.train_lang_lr_weights — same
    quantization (floor(x*1e6+0.5) features/sigmoid, 1e-9 weights),
    same left-to-right fold order; returns (weights, accuracy)."""
    from spark_app_twitter_spark.functions.text import STOPWORDS

    q_f = 1_000_000
    q_w = 1_000_000_000
    con = _duck(sf_dir)
    try:
        rows = con.execute("SELECT lang, text FROM documents").fetchall()
    finally:
        con.close()
    feats: list[tuple[int, list[int]]] = []
    for lang, text in rows:
        toks = text.split(" ")
        n = float(len(toks))
        sl = 0.0
        for t in toks:
            sl += float(len(t))
        f = [
            1.0,
            min(n / 64.0, 1.0),
            len(set(toks)) / n,
            sum(1 for t in toks if t in STOPWORDS) / n,
            (sl / n) / 10.0,
        ]
        fq = [math.floor(x * q_f + 0.5) for x in f]
        feats.append((1 if lang == "en" else 0, fq))
    dims = len(feats[0][1])
    w = [0.0] * dims
    n_docs = len(feats)

    def pq_of(fq: list[int]) -> int:
        z = 0.0
        for j in range(dims):
            z = z + w[j] * (fq[j] / float(q_f))
        p = 1.0 / (1.0 + math.exp(-z))
        return math.floor(p * q_f + 0.5)

    for _ in range(iters):
        g = [0] * dims
        for y, fq in feats:
            err = pq_of(fq) - y * q_f
            for j in range(dims):
                g[j] += err * fq[j]
        for j in range(dims):
            step = rate * (g[j] / (float(q_f) * q_f)) / n_docs
            wj = w[j] - step
            w[j] = int(wj * q_w + (0.5 if wj >= 0 else -0.5)) / q_w
    n_correct = sum(
        1
        for y, fq in feats
        if (pq_of(fq) >= q_f // 2 and y == 1)
        or (pq_of(fq) < q_f // 2 and y == 0)
    )
    return w, round(n_correct / n_docs, 6)


def train_lang_lr_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Literal-artifact twin of training.train_lang_lr."""
    key = ("train_lang_lr", sf_dir)
    if key not in _SQL_CACHE:
        from spark_app_twitter_spark.operators.training import (
            LR_FEATURES,
            LR_ITERS,
            LR_RATE,
        )

        w, acc = replica_lang_lr(sf_dir, LR_ITERS, LR_RATE)
        rows = ", ".join(
            f"({_s(name)}, CAST({_f(wj)} AS DOUBLE),"
            f" CAST({_f(acc)} AS DOUBLE))"
            for name, wj in zip(LR_FEATURES, w)
        )
        _SQL_CACHE[key] = (
            "SELECT * FROM (VALUES "
            + rows
            + ") AS t(feature, weight, train_accuracy)"
        )
    return _SQL_CACHE[key]


# ---------------------------------------------------------------- PCA


def replica_pca_axes(
    sf_dir: str, k: int
) -> tuple[list[list[float]], list[float], list[float]]:
    """Sequential replica of similarity._pca_components: exact
    integer sums from DuckDB, the operator's own IEEE chain for
    cov/means, the same numpy eigh + sign canonicalization."""
    import numpy as np

    con = _duck(sf_dir)
    q = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    )
    sums = con.execute(
        f"SELECT dim, sum(qx) AS sd, count(*) AS n FROM ("
        f"SELECT unnest(range(len(q))) AS dim, unnest(q) AS qx "
        f"FROM (SELECT {q} AS q FROM embeddings)) GROUP BY dim"
    ).fetchall()
    d = max(r[0] for r in sums) + 1
    prods = con.execute(
        f"SELECT s['i'] AS i, s['j'] AS j, sum(s['p']) AS sp, count(*) AS n "
        f"FROM (SELECT unnest(flatten(list_transform(range(1, len(q) + 1), i -> "
        f"list_transform(range(i, len(q) + 1), j -> "
        f"{{'i': i - 1, 'j': j - 1, 'p': q[i] * q[j]}})))) AS s "
        f"FROM (SELECT {q} AS q FROM embeddings)) GROUP BY i, j"
    ).fetchall()
    con.close()
    sd = {dim: int(s) for dim, s, _ in sums}
    n = float(sums[0][2])
    cov = np.zeros((d, d))
    for i, j, sp, _ in prods:
        # the operator's exact chain: (sp/n - (si/n)*(sj/n)) / 1e12
        c = (float(int(sp)) / n - (float(sd[i]) / n) * (float(sd[j]) / n)) / 1e12
        cov[i, j] = c
        cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(np.round(v, 9))))
        if v[pivot] < 0:
            v = -v
        comps.append([float(x) for x in v])
    eigvals = [float(vals[idx]) for idx in order]
    means = [float(sd[dim]) / (n * 1e6) for dim in range(d)]
    return comps, means, eigvals


def replica_pca(
    sf_dir: str, k: int
) -> tuple[list[list[float]], list[float]]:
    comps, means, _ = replica_pca_axes(sf_dir, k)
    return comps, means


def embedding_pca_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Twin of similarity.embedding_pca_project: literal trained axes
    and means, real per-row projection SQL whose chained additions
    reproduce the Spark fold's left-to-right double summation."""
    key = ("embedding_pca", sf_dir)
    if key in _SQL_CACHE:
        return _SQL_CACHE[key]
    from spark_app_twitter_spark.operators.similarity import PCA_COMPONENTS

    comps, means = replica_pca(sf_dir, PCA_COMPONENTS)
    cols = ["vec_id"]
    for ci, comp in enumerate(comps):
        terms = "0.0"
        for i in range(len(means)):
            terms += (
                f" + (CAST(embedding[{i + 1}] AS DOUBLE) - {_f(means[i])})"
                f" * {_f(comp[i])}"
            )
        cols.append(f"round({terms}, 6) AS pc{ci + 1}")
    _SQL_CACHE[key] = "SELECT " + ",\n       ".join(cols) + " FROM embeddings"
    return _SQL_CACHE[key]


def embedding_whiten_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Twin of similarity.embedding_whiten: the pca twin's literal
    axes/means projection chain, each component multiplied by the
    SHARED whiten_factors 1/sqrt(eig) literal before the round —
    bit-identical because both sides train on the same exact-integer
    covariance and the same numpy eigh."""
    key = ("embedding_whiten", sf_dir)
    if key in _SQL_CACHE:
        return _SQL_CACHE[key]
    from spark_app_twitter_spark.operators.similarity import (
        WHITEN_COMPONENTS,
        whiten_factors,
    )

    comps, means, eigvals = replica_pca_axes(sf_dir, WHITEN_COMPONENTS)
    factors = whiten_factors(eigvals)
    cols = ["vec_id"]
    for ci, (comp, inv) in enumerate(zip(comps, factors)):
        terms = "0.0"
        for i in range(len(means)):
            terms += (
                f" + (CAST(embedding[{i + 1}] AS DOUBLE) - {_f(means[i])})"
                f" * {_f(comp[i])}"
            )
        cols.append(f"round(({terms}) * {_f(inv)}, 6) AS z{ci + 1}")
    _SQL_CACHE[key] = "SELECT " + ",\n       ".join(cols) + " FROM embeddings"
    return _SQL_CACHE[key]


# ----------------------------------------------------------- PageRank


def replica_pagerank(sf_dir: str) -> list[tuple[int, int]]:
    """Sequential replica of graph.pagerank_near_dup: edges from the
    (hash-green) CAPPED MinHash-LSH pair oracle SQL, then the operator's own
    all-integer rank loop — floor division throughout, so the result
    is bit-identical regardless of engine or iteration order."""
    from spark_app_twitter_spark.operators.dedup import (
        MINHASH_LSH_PAIRS_CAPPED_SQL,
    )
    from spark_app_twitter_spark.operators.graph import PR_ITERS, PR_Q

    con = _duck(sf_dir)
    try:
        pairs = con.execute(MINHASH_LSH_PAIRS_CAPPED_SQL).fetchall()
    finally:
        con.close()
    edges: list[tuple[int, int]] = []
    for a, b, _ in pairs:
        edges.append((int(a), int(b)))
        edges.append((int(b), int(a)))
    nodes = sorted({s for s, _ in edges})
    n = len(nodes)
    if n == 0:
        return []
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {v: PR_Q // n for v in nodes}
    teleport = (15 * PR_Q // 100) // n
    for _ in range(PR_ITERS):
        summed: dict[int, int] = {}
        for s, t in edges:
            summed[t] = summed.get(t, 0) + ranks[s] // deg[s]
        ranks = {
            v: teleport + (85 * summed.get(v, 0)) // 100 for v in nodes
        }
    return [(v, ranks[v]) for v in nodes]


def pagerank_near_dup_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Literal-artifact twin of graph.pagerank_near_dup; the final
    micro-unit -> double scaling and round stay in SQL so DuckDB's
    round seam (proven across the registry) does the tie-breaking."""
    key = ("pagerank_near_dup", sf_dir)
    if key in _SQL_CACHE:
        return _SQL_CACHE[key]
    from spark_app_twitter_spark.operators.graph import PR_Q

    ranks = replica_pagerank(sf_dir)
    if not ranks:
        sql = (
            "SELECT CAST(NULL AS BIGINT) AS doc_id,"
            ' CAST(NULL AS DOUBLE) AS "rank" WHERE false'
        )
    else:
        rows = ", ".join(
            f"(CAST({v} AS BIGINT), CAST({rq} AS BIGINT))" for v, rq in ranks
        )
        sql = (
            "SELECT doc_id, round(CAST(rank_q AS DOUBLE) / "
            + _f(float(PR_Q))
            + ', 9) AS "rank" FROM (VALUES '
            + rows
            + ") AS t(doc_id, rank_q)"
        )
    _SQL_CACHE[key] = sql
    return _SQL_CACHE[key]


# ---------------------------------------------------------- unigram LM
# Sequential replica of operators/unigram.py's EM trainer. Constants
# re-declared (the replica shares no engine code path); keep in sync
# with operators/unigram.py.
UG_MAX_PIECE = 4
UG_SEED_K = 200
UG_EM_ROUNDS = 2
UG_SCALE = 1_000_000


def _ug_words(sf_dir: str) -> dict[str, int]:
    con = _duck(sf_dir)
    rows = con.execute(
        "SELECT word, count(*) FROM (SELECT unnest(string_split(text, ' '))"
        " AS word FROM documents) GROUP BY word"
    ).fetchall()
    return {w: int(c) for w, c in rows}


def _ug_mstep(counts: dict[str, int], vocab: list[str]) -> dict[str, int]:
    total = sum(counts.get(p, 0) for p in vocab)
    denom = total + len(vocab)
    return {
        p: math.floor(
            (math.log(counts.get(p, 0) + 1) - math.log(denom)) * UG_SCALE
        )
        for p in vocab
    }


def _ug_viterbi(word: str, logp: dict[str, int]) -> list[str]:
    n = len(word)
    if n == 0:
        return []
    neg_inf = -(1 << 60)
    floor_score = min(logp.values(), default=-UG_SCALE) - UG_SCALE
    best = [neg_inf] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for i in range(1, n + 1):
        for ln in range(1, min(UG_MAX_PIECE, i) + 1):
            piece = word[i - ln : i]
            score = logp.get(piece)
            if score is None:
                if ln > 1:
                    continue
                score = floor_score
            cand = best[i - ln] + score
            if cand > best[i]:
                best[i] = cand
                back[i] = ln
    seg: list[str] = []
    i = n
    while i > 0:
        seg.append(word[i - back[i] : i])
        i -= back[i]
    seg.reverse()
    return seg


def replica_unigram(sf_dir: str) -> list[tuple[str, int, int]]:
    """[(piece, em_count, logp_micro)] — the trained artifact,
    sequentially: substring-count seeding (all chars + top-K
    multi-char, ties piece asc), then UG_EM_ROUNDS of Viterbi
    E-step / add-one M-step over the word-frequency table."""
    words = _ug_words(sf_dir)
    cand: dict[str, int] = {}
    for w, f in words.items():
        for ln in range(1, UG_MAX_PIECE + 1):
            for i in range(len(w) - ln + 1):
                p = w[i : i + ln]
                cand[p] = cand.get(p, 0) + f
    chars = [(p, c) for p, c in cand.items() if len(p) == 1]
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:UG_SEED_K]
    seed = sorted(chars + multi)
    vocab = [p for p, _ in seed]
    logp = _ug_mstep(dict(seed), vocab)
    counts: dict[str, int] = {}
    for _ in range(UG_EM_ROUNDS):
        counts = {}
        for w, f in words.items():
            for p in _ug_viterbi(w, logp):
                counts[p] = counts.get(p, 0) + f
        logp = _ug_mstep(counts, vocab)
    return [(p, counts.get(p, 0), logp[p]) for p in vocab]


def unigram_train_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    key = ("unigram_train", sf_dir)
    if key not in _SQL_CACHE:
        art = replica_unigram(sf_dir)
        vals = ",\n  ".join(
            f"({_s(p)}, {c}, {lp})" for p, c, lp in art
        )
        _SQL_CACHE[key] = f"""
SELECT piece, CAST(em_count AS BIGINT) AS em_count,
       CAST(logp_micro AS BIGINT) AS logp_micro
FROM (VALUES
  {vals}
) AS t(piece, em_count, logp_micro)
"""
    return _SQL_CACHE[key]


def unigram_encode_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Literal per-word encoding relation (sequential Viterbi under
    the replica-trained probabilities) + the relational half (join,
    doc rollup) as real SQL over the corpus."""
    key = ("unigram_encode", sf_dir)
    if key not in _SQL_CACHE:
        art = replica_unigram(sf_dir)
        logp = {p: lp for p, _, lp in art}
        words = _ug_words(sf_dir)
        vals = ",\n  ".join(
            f"({_s(w)}, {len(_ug_viterbi(w, logp))})" for w in sorted(words)
        )
        _SQL_CACHE[key] = f"""
WITH enc(word, np) AS (VALUES
  {vals}
),
wc AS (
  SELECT doc_id, word, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
)
SELECT doc_id,
       CAST(sum(n) AS BIGINT) AS n_words,
       CAST(sum(n * np) AS BIGINT) AS n_pieces,
       CASE WHEN sum(n * np) > 0
            THEN round(CAST(sum(n * length(word)) AS DOUBLE)
                       / CAST(sum(n * np) AS DOUBLE), 6)
       END AS chars_per_piece
FROM wc JOIN enc USING (word)
GROUP BY doc_id
"""
    return _SQL_CACHE[key]


def tokenizer_fertility_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Per-language fertility twin: the literal per-word piece counts
    (sequential Viterbi under the replica-trained unigram
    probabilities — same relation unigram_encode_sql embeds) rolled up
    per doc, joined onto the pure-SQL language-ID prediction, grouped
    by predicted language. Division happens once, on the per-language
    integer sums, so both engines perform the identical IEEE op."""
    key = ("tokenizer_fertility", sf_dir)
    if key not in _SQL_CACHE:
        from spark_app_twitter_spark.operators.textstats import LANG_ID_SQL

        art = replica_unigram(sf_dir)
        logp = {p: lp for p, _, lp in art}
        words = _ug_words(sf_dir)
        vals = ",\n  ".join(
            f"({_s(w)}, {len(_ug_viterbi(w, logp))})" for w in sorted(words)
        )
        _SQL_CACHE[key] = f"""
WITH enc(word, np) AS (VALUES
  {vals}
),
wc AS (
  SELECT doc_id, word, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents)
  GROUP BY doc_id, word
),
docenc AS (
  SELECT doc_id, sum(n) AS n_words, sum(n * np) AS n_pieces
  FROM wc JOIN enc USING (word)
  GROUP BY doc_id
),
lid AS (
  SELECT doc_id, predicted FROM ({LANG_ID_SQL})
)
SELECT predicted AS lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       round(CAST(sum(n_pieces) AS DOUBLE)
             / CAST(sum(n_words) AS DOUBLE), 6) AS pieces_per_word
FROM docenc JOIN lid USING (doc_id)
GROUP BY predicted
"""
    return _SQL_CACHE[key]


UG_PRUNE_KEEP = 100


def replica_unigram_pruned(sf_dir: str) -> list[tuple[str, int, int]]:
    """Sequential replica of the one-round vocabulary prune: chars +
    top-K EM-mass multi-char survivors, then one further EM round."""
    full = replica_unigram(sf_dir)
    chars = [p for p, _, _ in full if len(p) == 1]
    multi = sorted(
        ((p, c) for p, c, _ in full if len(p) > 1 and c > 0),
        key=lambda t: (-t[1], t[0]),
    )[:UG_PRUNE_KEEP]
    vocab = sorted(chars + [p for p, _ in multi])
    keep = set(vocab)
    logp = _ug_mstep({p: c for p, c, _ in full if p in keep}, vocab)
    words = _ug_words(sf_dir)
    counts: dict[str, int] = {}
    for w, f in words.items():
        for p in _ug_viterbi(w, logp):
            counts[p] = counts.get(p, 0) + f
    logp = _ug_mstep(counts, vocab)
    return [(p, counts.get(p, 0), logp[p]) for p in vocab]


def unigram_prune_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    key = ("unigram_prune", sf_dir)
    if key not in _SQL_CACHE:
        art = replica_unigram_pruned(sf_dir)
        vals = ",\n  ".join(f"({_s(p)}, {c}, {lp})" for p, c, lp in art)
        _SQL_CACHE[key] = f"""
SELECT piece, CAST(em_count AS BIGINT) AS em_count,
       CAST(logp_micro AS BIGINT) AS logp_micro
FROM (VALUES
  {vals}
) AS t(piece, em_count, logp_micro)
"""
    return _SQL_CACHE[key]


def replica_isotropy(sf_dir: str) -> tuple:
    """Sequential replica of similarity.embedding_isotropy: the same
    exact-integer covariance (replica_pca's reduction) and the same
    numpy eigvalsh + spectrum summary."""
    import math as _math

    import numpy as np

    con = _duck(sf_dir)
    q = (
        "list_transform(embedding,"
        " x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    )
    sums = con.execute(
        f"SELECT dim, sum(qx) AS sd, count(*) AS n FROM ("
        f"SELECT unnest(range(len(q))) AS dim, unnest(q) AS qx "
        f"FROM (SELECT {q} AS q FROM embeddings)) GROUP BY dim"
    ).fetchall()
    d = max(r[0] for r in sums) + 1
    n = sums[0][2]
    mean_q = [0.0] * d
    for dim, sd, _n in sums:
        mean_q[dim] = float(sd) / float(_n)
    prods = con.execute(
        "SELECT i, j, sum(p) FROM ("
        "SELECT a.dim AS i, b.dim AS j, a.qx * b.qx AS p, a.rid FROM ("
        "SELECT rid, unnest(range(len(q))) AS dim, unnest(q) AS qx FROM ("
        f"SELECT row_number() OVER () AS rid, {q} AS q FROM embeddings)) a "
        "JOIN ("
        "SELECT rid, unnest(range(len(q))) AS dim, unnest(q) AS qx FROM ("
        f"SELECT row_number() OVER () AS rid, {q} AS q FROM embeddings)) b "
        "USING (rid) WHERE a.dim <= b.dim) GROUP BY i, j"
    ).fetchall()
    cov = np.zeros((d, d))
    for i, j, sp in prods:
        c = (float(sp) / n - mean_q[i] * mean_q[j]) / 1e12
        cov[i][j] = c
        cov[j][i] = c
    vals = np.linalg.eigvalsh(cov)
    pos = [float(v) for v in vals if v > 0]
    trace = sum(pos)
    top = max(pos)
    ps = [v / trace for v in pos]
    ent = -sum(p * math.log(p) for p in ps if p > 0)
    return (
        d,
        int(math.floor(trace * 1e6 + 0.5)),
        int(math.floor(top * 1e6 + 0.5)),
        round(top / trace, 6),
        round(math.exp(ent), 6),
    )


def embedding_isotropy_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    key = ("isotropy", sf_dir)
    if key not in _SQL_CACHE:
        d, tr, te, share, erank = replica_isotropy(sf_dir)
        _SQL_CACHE[key] = f"""
SELECT CAST({d} AS INTEGER) AS n_dims,
       CAST({tr} AS BIGINT) AS trace_micro,
       CAST({te} AS BIGINT) AS top_eig_micro,
       CAST({_f(share)} AS DOUBLE) AS top_share,
       CAST({_f(erank)} AS DOUBLE) AS effective_rank
"""
    return _SQL_CACHE[key]


def _ug_enc_values(sf_dir: str) -> str:
    """The literal per-word piece-count relation (sequential Viterbi
    under the replica-trained unigram probabilities) — shared by the
    encode, fertility, and tokenizer-aware packing twins."""
    art = replica_unigram(sf_dir)
    logp = {p: lp for p, _, lp in art}
    words = _ug_words(sf_dir)
    return ",\n  ".join(
        f"({_s(w)}, {len(_ug_viterbi(w, logp))})" for w in sorted(words)
    )


def _pack_unigram_ctes(sf_dir: str, doc_where: str = "") -> str:
    """The tokenizer-aware packer's shared CTE chain. ``doc_where``
    optionally restricts the corpus (e.g. to a funnel's survivor set)
    with a raw SQL predicate over ``documents`` — the export-manifest
    oracle packs only surviving docs."""
    from spark_app_twitter_spark.operators.packing import PACK_SHARDS

    return f"""enc(word, np) AS (VALUES
  {_ug_enc_values(sf_dir)}
),
wc AS (
  SELECT doc_id, word, count(*) AS n
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents {doc_where})
  GROUP BY doc_id, word
),
sized AS (
  SELECT doc_id,
         CAST(sum(n) AS BIGINT) AS n_words,
         CAST(sum(n * np) AS BIGINT) AS n_pieces,
         doc_id % {PACK_SHARDS} AS shard
  FROM wc JOIN enc USING (word)
  GROUP BY doc_id
),
cum AS (
  SELECT doc_id, shard, n_words, n_pieces,
         CAST(sum(n_pieces) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) - n_pieces AS start
  FROM sized
)"""


def pack_unigram_sequences_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Tokenizer-aware packer twin: literal per-word piece counts +
    the relational half (doc rollup, shard-keyed running cut) as real
    SQL over the corpus."""
    key = ("pack_unigram_sequences", sf_dir)
    if key not in _SQL_CACHE:
        from spark_app_twitter_spark.operators.packing import PACK_BUDGET

        _SQL_CACHE[key] = f"""
WITH {_pack_unigram_ctes(sf_dir)}
SELECT doc_id, shard,
       CAST(floor(CAST(start AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin,
       start % {PACK_BUDGET} AS offset,
       n_pieces
FROM cum
"""
    return _SQL_CACHE[key]


def pack_unigram_efficiency_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    key = ("pack_unigram_efficiency", sf_dir)
    if key not in _SQL_CACHE:
        from spark_app_twitter_spark.operators.packing import PACK_BUDGET

        _SQL_CACHE[key] = f"""
WITH {_pack_unigram_ctes(sf_dir)},
per AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_words) AS BIGINT) AS total_words,
         CAST(sum(n_pieces) AS BIGINT) AS total_pieces
  FROM sized GROUP BY shard
)
SELECT shard, n_docs, total_words, total_pieces,
       CAST(floor((total_pieces - 1) / {PACK_BUDGET}) + 1 AS BIGINT)
         AS n_bins,
       round(CAST(total_pieces AS DOUBLE)
             / CAST((floor((total_pieces - 1) / {PACK_BUDGET}) + 1)
                    * {PACK_BUDGET} AS DOUBLE) * 100.0, 4) AS fill_pct,
       CAST((total_pieces - total_words) * 10000
            // total_words AS BIGINT) AS word_budget_underestimate_bp
FROM per
"""
    return _SQL_CACHE[key]


def pack_rollover_segments_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    """Exact-fill rollover packer twin: the piece-sized cum CTE +
    a generate_series explode over each doc's bin span."""
    key = ("pack_rollover_segments", sf_dir)
    if key not in _SQL_CACHE:
        from spark_app_twitter_spark.operators.packing import PACK_BUDGET

        b = PACK_BUDGET
        _SQL_CACHE[key] = f"""
WITH {_pack_unigram_ctes(sf_dir)},
spans AS (
  SELECT doc_id, shard, n_pieces, start,
         unnest(generate_series(start // {b},
                                (start + n_pieces - 1) // {b})) AS bin
  FROM cum
)
SELECT doc_id, shard, CAST(bin AS BIGINT) AS bin,
       CAST(greatest(start, bin * {b}) - bin * {b} AS BIGINT)
         AS bin_offset,
       CAST(greatest(start, bin * {b}) - start AS BIGINT) AS doc_offset,
       CAST(least(start + n_pieces, (bin + 1) * {b})
            - greatest(start, bin * {b}) AS BIGINT) AS seg_pieces
FROM spans
"""
    return _SQL_CACHE[key]


def pack_rollover_fill_sql(sf_dir: str = ORACLE_SF_DIR) -> str:
    key = ("pack_rollover_fill", sf_dir)
    if key not in _SQL_CACHE:
        from spark_app_twitter_spark.operators.packing import PACK_BUDGET

        b = PACK_BUDGET
        _SQL_CACHE[key] = f"""
WITH {_pack_unigram_ctes(sf_dir)},
spans AS (
  SELECT doc_id, shard, n_pieces, start,
         unnest(generate_series(start // {b},
                                (start + n_pieces - 1) // {b})) AS bin
  FROM cum
),
segs AS (
  SELECT doc_id, shard, bin,
         least(start + n_pieces, (bin + 1) * {b})
           - greatest(start, bin * {b}) AS seg_pieces
  FROM spans
),
per_bin AS (
  SELECT shard, bin,
         CAST(sum(seg_pieces) AS BIGINT) AS fill,
         CAST(count(*) AS BIGINT) AS n_segs
  FROM segs GROUP BY shard, bin
),
rollup AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(CASE WHEN fill = {b} THEN 1 ELSE 0 END) AS BIGINT)
           AS full_bins,
         CAST(sum(n_segs) AS BIGINT) AS n_segments,
         max(bin) AS last_bin
  FROM per_bin GROUP BY shard
),
sd AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS split_docs
  FROM (SELECT shard, doc_id FROM segs GROUP BY shard, doc_id
        HAVING count(*) > 1)
  GROUP BY shard
)
SELECT r.shard, r.n_bins, r.full_bins, r.n_segments,
       COALESCE(sd.split_docs, CAST(0 AS BIGINT)) AS split_docs,
       p.fill AS last_fill_pieces
FROM rollup r
JOIN per_bin p ON p.shard = r.shard AND p.bin = r.last_bin
LEFT JOIN sd ON sd.shard = r.shard
"""
    return _SQL_CACHE[key]
