"""Sequence preparation for LLM training: document chunking and
deterministic sequence packing.

Two ops every large-scale training-data pipeline runs after
filtering/dedup, re-expressed Spark-first:

- **Chunking**: split each document into overlapping fixed-width
  token windows (the context-window prep step). Pure map-side array
  math — scan -> codegen -> explode, zero shuffles, so it scales
  linearly with the corpus.
- **Packing**: concatenate docs in a deterministic order and cut at a
  fixed token budget ("concat-then-cut", the standard pretraining
  packing scheme). A global running sum would serialize, so docs are
  first hash-sharded and packed WITHIN shards — each shard's cumsum
  window is independent, which is exactly how distributed packing
  runs at 100 TB (shard count scales with the cluster, bins stay
  local to a shard).

Reference scope note: the reference app (jmcmt87/spark_app_twitter)
has no training-data surface; this module comes from SURVEY.md's
LLM-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_app_twitter_spark.functions.text import tokens
from spark_app_twitter_spark.sources.parquet import load_table

CHUNK_W = 64  # tokens per chunk
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks
PACK_SHARDS = 16
PACK_BUDGET = 1024  # tokens per packed training sequence


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start, n_chunk_tokens, chunk_text) — sliding
    token windows of CHUNK_W with stride CHUNK_STRIDE; the final full
    window is always emitted so no tail tokens are lost; docs shorter
    than one window become a single short chunk.

    Map-only: the starts array, slices and joins all run inside one
    codegen stage; explode multiplies rows without a shuffle.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    w = tokens("text")
    n = F.size(w)
    starts = F.when(n <= CHUNK_W, F.array(F.lit(1))).otherwise(
        F.array_sort(
            F.array_union(
                F.expr(
                    f"sequence(1, size(split(text, ' ')) - {CHUNK_W} + 1,"
                    f" {CHUNK_STRIDE})"
                ),
                F.expr(f"array(size(split(text, ' ')) - {CHUNK_W} + 1)"),
            )
        )
    )
    chunks = docs.select(
        "doc_id",
        w.alias("w"),
        F.posexplode(starts).alias("chunk_id", "start"),
    )
    piece = F.slice(F.col("w"), F.col("start"), CHUNK_W)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "start",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
st AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= {CHUNK_W} THEN [CAST(1 AS BIGINT)]
              ELSE list_sort(list_distinct(list_append(
                     range(1, len(w) - {CHUNK_W} + 2, {CHUNK_STRIDE}),
                     len(w) - {CHUNK_W} + 1)))
         END AS starts
  FROM toks
),
chunks AS (
  SELECT doc_id, w,
         unnest(list_transform(range(1, len(starts) + 1),
                               i -> {{'cid': i - 1, 's': starts[i]}})) AS u
  FROM st
)
SELECT doc_id,
       u.cid AS chunk_id,
       u.s AS start,
       len(w[u.s:u.s + {CHUNK_W} - 1]) AS n_chunk_tokens,
       array_to_string(w[u.s:u.s + {CHUNK_W} - 1], ' ') AS chunk_text
FROM chunks
"""


def _sized_sharded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tok, shard): the packer's input projection — ONE
    definition of tokenization and sharding for pack_sequences AND
    pack_efficiency, so the efficiency report can never describe a
    different packing than the one shipped."""
    return load_table(spark, sf_dir, "documents", spread=True).select(
        "doc_id",
        F.size(tokens("text")).alias("n_tok"),
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
    )


def _shard_start(n_tok_col: str = "n_tok"):
    """Running first-token offset within the shard stream (shared
    window of both packer consumers)."""
    win = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.sum(n_tok_col).over(win) - F.col(n_tok_col)


# shared SQL CTEs (mirror of the two helpers above)
_PACK_CTES = f"""sized AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tok,
         doc_id % {PACK_SHARDS} AS shard
  FROM documents
),
cum AS (
  SELECT doc_id, shard, n_tok,
         -- CAST: DuckDB's windowed sum(BIGINT) is HUGEINT (int128);
         -- Spark's is bigint — align before it leaks into outputs
         CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) - n_tok AS start
  FROM sized
)"""


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, bin, offset) — concat-then-cut packing: within
    each hash shard, docs concatenate in doc_id order and are cut
    into PACK_BUDGET-token bins; a doc belongs to the bin where its
    first token lands, offset is that position within the bin.

    The cumulative sum is a per-shard window (running frame) — state
    is one counter per shard partition, never global, so shards pack
    in parallel and the plan is one shuffle on the shard key.
    """
    docs = _sized_sharded_docs(spark, sf_dir)
    start = _shard_start()
    return docs.select(
        "doc_id",
        "shard",
        F.floor(start / PACK_BUDGET).alias("bin"),
        (start % PACK_BUDGET).alias("offset"),
    )


PACK_SEQUENCES_SQL = f"""
WITH {_PACK_CTES}
SELECT doc_id, shard,
       CAST(floor(CAST(start AS DOUBLE) / {PACK_BUDGET}) AS BIGINT) AS bin,
       start % {PACK_BUDGET} AS offset
FROM cum
"""

def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, total_tokens, n_bins, fill_pct,
    n_boundary_crossers): the packing-efficiency report for
    :func:`pack_sequences` — per shard, how full the PACK_BUDGET
    bins are (the token-waste metric every training export tracks)
    and how many docs straddle a bin boundary (candidates for
    truncation/rollover handling downstream).

    Same single shard-keyed window as the packer itself, then a
    |shards|-row rollup — the report costs one aggregation over the
    already-planned packing frame, not a second corpus pass.
    """
    docs = _sized_sharded_docs(spark, sf_dir)
    start = _shard_start()
    crosses = (start % PACK_BUDGET) + F.col("n_tok") > PACK_BUDGET
    per = docs.withColumn("crosses", crosses).groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("crosses"), 1).otherwise(0))
        .cast("long")
        .alias("n_boundary_crossers"),
    )
    n_bins = (
        F.floor((F.col("total_tokens") - 1) / PACK_BUDGET) + 1
    ).cast("long")
    return per.select(
        "shard",
        "n_docs",
        "total_tokens",
        n_bins.alias("n_bins"),
        F.round(
            F.col("total_tokens").cast("double")
            / (n_bins * F.lit(PACK_BUDGET)).cast("double")
            * 100.0,
            4,
        ).alias("fill_pct"),
        "n_boundary_crossers",
    )


PACK_EFFICIENCY_SQL = f"""
WITH {_PACK_CTES},
per AS (
  SELECT shard,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         CAST(sum(CASE WHEN (start % {PACK_BUDGET}) + n_tok > {PACK_BUDGET}
                       THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boundary_crossers
  FROM cum GROUP BY shard
)
SELECT shard, n_docs, total_tokens,
       CAST(floor((total_tokens - 1) / {PACK_BUDGET}) + 1 AS BIGINT)
         AS n_bins,
       round(CAST(total_tokens AS DOUBLE)
             / CAST((floor((total_tokens - 1) / {PACK_BUDGET}) + 1)
                    * {PACK_BUDGET} AS DOUBLE) * 100.0, 4) AS fill_pct,
       n_boundary_crossers
FROM per
"""


__all__ = [
    "chunk_documents",
    "pack_sequences",
    "pack_efficiency",
    "CHUNK_DOCUMENTS_SQL",
    "PACK_SEQUENCES_SQL",
    "PACK_EFFICIENCY_SQL",
]


# ---------------------------------------------------------------------------
# Deterministic corpus shuffle: the "global shuffle before training"
# step. Order-by-random would be irreproducible and a full sort;
# instead every doc gets a hash-derived (shard, position) — the same
# corpus always shuffles identically, any engine can verify the
# layout, and at scale the sort is per-shard (range-partition on
# shard, sort within partitions), never a single global order.
SHUFFLE_SHARDS = 16


def shuffle_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, position): the deterministic training-shuffle
    layout. shard = first md5 hex digit (exactly SHUFFLE_SHARDS=16
    uniform buckets); position = rank of the full md5 within the
    shard (tie-broken by doc_id, so the order is total and
    engine-independent).

    Plan shape: one hash shuffle on shard + an in-partition
    row_number — no global sort. Writing would be
    .repartition("shard").sortWithinPartitions(...): each output
    file is one shard in shuffled order.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    okey = F.md5(F.col("doc_id").cast("string"))
    # first hex digit of the SAME md5 -> a perfect 0..15 shard id on
    # any engine (instr into the hex alphabet; crc32 isn't portable)
    sid = F.instr(F.lit("0123456789abcdef"), F.substring(okey, 1, 1)) - 1
    w = Window.partitionBy("shard").orderBy(okey.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("shard", sid.cast("int"))
        .withColumn("position", F.row_number().over(w))
        .select("doc_id", "shard", "position")
    )


SHUFFLE_EXPORT_SQL = """
SELECT doc_id,
       CAST(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INTEGER) AS shard,
       CAST(row_number() OVER (
         PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
       ) AS INTEGER) AS position
FROM documents
"""


# ---------------------------------------------------------------------------
# Shard manifest: the integrity record a training-data export ships
# with its shards — (counts, token totals, id range, content digest)
# per shard — so a consumer can verify a transfer and a re-run can
# prove bit-identical output without re-reading the data.
MANIFEST_SHARDS = PACK_SHARDS


def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, n_tokens, min_doc_id, max_doc_id, digest): the
    per-shard manifest of the deterministic hash-sharded export
    (shuffle_export's shard scheme).

    The digest chains per-doc md5(text) in shard order (order key =
    md5(doc_id), shuffle_export's key), so ANY change to a shard's
    membership, order, or payload changes its digest — the manifest a
    downstream trainer checks before touching the data.

    Scale shape: one map-side projection computes (shard, order key,
    doc md5, token count); everything reduces in a single
    groupBy(shard). The ordered digest concat holds one 32-char hash
    per doc in the shard's aggregation buffer — bounded by the
    shard-size target, which at 100 TB is a CONSTANT (shard count is
    chosen as corpus_bytes / target_shard_bytes; here pinned to
    MANIFEST_SHARDS for the synthetic corpus), exactly the per-file
    checksum cost any export writer already pays.
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    okey = F.md5(F.col("doc_id").cast("string"))
    sid = F.instr(F.lit("0123456789abcdef"), F.substring(okey, 1, 1)) - 1
    rows = docs.select(
        sid.cast("int").alias("shard"),
        okey.alias("okey"),
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        F.size(tokens("text")).cast("long").alias("nt"),
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("okey", F.col("doc_id"), F.col("h")))
        ),
        lambda s: s.getField("h"),
    )
    return rows.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").alias("n_tokens"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.md5(F.concat_ws("", ordered)).alias("digest"),
    )


SHARD_MANIFEST_SQL = """
WITH rows_ AS (
  SELECT CAST(instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
              AS INTEGER) AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS okey,
         doc_id,
         md5(text) AS h,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS n_tokens,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id,
       md5(string_agg(h, '' ORDER BY okey ASC, doc_id ASC)) AS digest
FROM rows_
GROUP BY shard
"""


# ---------------------------------------------------------------------------
# Curriculum shard ordering: rank the export's shards by mean
# document quality so a curriculum-learning run can consume them
# easy/clean-first (or reverse) — the data-ordering knob BETWEEN
# mixture sampling and sequence packing.
def curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, mean_quality_micro, curriculum_pos): every
    export shard (shuffle_export's deterministic hash scheme, the
    shard_manifest's population) with its mean document quality in
    exact integer micro-units and its 1-based curriculum position
    (highest quality first; ties break on shard id).

    Scale shape: ONE corpus scan computes (shard, quality micro) per
    doc map-side; one shard-keyed reduce yields |shards| rows; the
    ranking window runs over that constant-size relation. The mean
    is floor((2*sum + n) / (2*n)) — the engine's half-up integer
    rational, order-independent and engine-exact.
    """
    from spark_app_twitter_spark.functions.text import tokens as _tokens
    from spark_app_twitter_spark.operators.textstats import (
        quality_score_expr,
    )

    docs = load_table(spark, sf_dir, "documents", spread=True)
    sid = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
        )
        - 1
    )
    qmicro = F.round(quality_score_expr(_tokens("text")) * F.lit(1e6)).cast(
        "long"
    )
    per_shard = (
        docs.select(sid.cast("int").alias("shard"), qmicro.alias("q"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("(2 * sum(q) + count(*)) div (2 * count(*))").alias(
                "mean_quality_micro"
            ),
        )
        .localCheckpoint(eager=True)  # 16 rows feed both rank sides
    )
    # rank via broadcast triangular self-join over the 16-row shard
    # relation (r10: window-free — the GWIN! lint carries no
    # allowlist entry; the power_users Lorenz idiom)
    earlier = per_shard.select(
        F.col("shard").alias("s2"),
        F.col("mean_quality_micro").alias("m2"),
    )
    before = (
        F.col("m2") > F.col("mean_quality_micro")
    ) | (
        (F.col("m2") == F.col("mean_quality_micro"))
        & (F.col("s2") < F.col("shard"))
    )
    return (
        per_shard.join(F.broadcast(earlier), before, "left")
        .groupBy("shard", "n_docs", "mean_quality_micro")
        .agg(
            (F.count(F.col("s2")) + 1)
            .cast("int")
            .alias("curriculum_pos")
        )
    )


def _curriculum_shards_sql() -> str:
    from spark_app_twitter_spark.operators.textstats import quality_score_sql

    return f"""
WITH per_doc AS (
  SELECT CAST(instr('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1
              AS INTEGER) AS shard,
         CAST(round({quality_score_sql("string_split(text, ' ')")} * 1e6)
              AS BIGINT) AS q
  FROM documents
),
per_shard AS (
  SELECT shard, count(*) AS n_docs,
         CAST((2 * sum(q) + count(*)) // (2 * count(*)) AS BIGINT)
           AS mean_quality_micro
  FROM per_doc GROUP BY shard
)
SELECT shard, n_docs, mean_quality_micro,
       CAST(row_number() OVER (ORDER BY mean_quality_micro DESC,
                               shard ASC) AS INTEGER) AS curriculum_pos
FROM per_shard
"""


CURRICULUM_SHARDS_SQL = _curriculum_shards_sql()


def length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket_cap, n_docs, total_tokens, padded_tokens, waste_bp) —
    the dynamic-batching audit: docs bucketed by next-power-of-two
    token length, with the padding waste a fixed-shape batcher would
    pay per bucket (``padded - total`` as integer basis points of the
    padded volume). Training exports use this to pick bucket
    boundaries; a large waste_bp in a hot bucket means wasted FLOPs.

    Scale shape: map-side length + bit-math bucket assignment, then
    ONE reduce over at most ~40 bucket keys — output is
    O(log(max_len)) regardless of corpus size. The power-of-two cap
    is integer bit arithmetic (length of the binary representation),
    not float log2, so bucket edges are engine-exact.

    Reference scope note: no reference analogue; SURVEY.md §2.9
    training-data-pipeline mandate (sequence batching efficiency).
    """
    docs = load_table(spark, sf_dir, "documents", spread=True)
    n = F.size(tokens("text"))
    sized = docs.select(
        F.when(n <= 1, F.lit(1).cast("long"))
        .otherwise(F.expr("shiftleft(1L, length(bin(size(split(text, ' ')) - 1)))"))
        .alias("bucket_cap"),
        n.cast("long").alias("n_tok"),
    )
    agg = sized.groupBy("bucket_cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )
    padded = F.col("bucket_cap") * F.col("n_docs")
    # integer DIV, not float /: basis points are exact on every engine
    return agg.select(
        "bucket_cap",
        "n_docs",
        "total_tokens",
        padded.alias("padded_tokens"),
        F.expr(
            "(bucket_cap * n_docs - total_tokens) * 10000L"
            " DIV (bucket_cap * n_docs)"
        ).alias("waste_bp"),
    )


LENGTH_BUCKETS_SQL = """
WITH sized AS (
  SELECT CASE WHEN len(string_split(text, ' ')) <= 1 THEN CAST(1 AS BIGINT)
              ELSE CAST(1 AS BIGINT)
                   << length(bin(len(string_split(text, ' ')) - 1)) END
           AS bucket_cap,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
agg AS (
  SELECT bucket_cap, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS total_tokens
  FROM sized GROUP BY bucket_cap
)
SELECT bucket_cap, n_docs, total_tokens,
       bucket_cap * n_docs AS padded_tokens,
       (bucket_cap * n_docs - total_tokens) * 10000
         // (bucket_cap * n_docs) AS waste_bp
FROM agg
"""


# ---------------------------------------------------------------------------
# Tokenizer-aware packing (VERDICT r14 item 7b): the concat-then-cut
# packer re-run in TRAINED-TOKENIZER PIECE units instead of
# whitespace words. A training export is consumed in tokenizer
# pieces, so a packer that budgets whitespace words under-fills every
# bin by the corpus fertility factor (pieces per word > 1) — this
# pair is the deployable fix plus the scorecard quantifying what the
# word-budget packer got wrong.


def _piece_sized_sharded_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(doc_id, n_words, n_pieces, shard): the tokenizer-aware
    packer's input projection — per-doc piece counts under the
    trained unigram vocabulary (unigram.unigram_encode's
    vocabulary-trick join: Viterbi once per DISTINCT word, broadcast
    back, doc-keyed reduce), sharded like the word packer."""
    # function-level import: packing must stay importable without
    # pulling the tokenizer stack
    from spark_app_twitter_spark.operators.unigram import unigram_encode

    return unigram_encode(spark, sf_dir).select(
        "doc_id",
        "n_words",
        "n_pieces",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
    )


def pack_unigram_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, bin, offset, n_pieces): concat-then-cut
    packing in trained-unigram PIECE units — within each hash shard,
    docs concatenate in doc_id order and cut into PACK_BUDGET-piece
    training sequences; a doc belongs to the bin where its first
    piece lands.

    Scale shape: the unigram encode's vocab-bounded broadcast join +
    one doc-keyed reduce, then ONE shard-keyed window (running
    per-shard counter, shards pack in parallel) — the same plan
    skeleton as pack_sequences with n_tok swapped for n_pieces. The
    oracle embeds the sequential replica's per-word piece counts as
    a literal relation (oracles.pack_unigram_sequences_sql) and
    replays the relational half."""
    docs = _piece_sized_sharded_docs(spark, sf_dir)
    start = _shard_start("n_pieces")
    return docs.select(
        "doc_id",
        "shard",
        F.floor(start / PACK_BUDGET).alias("bin"),
        (start % PACK_BUDGET).alias("offset"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
    )


def pack_unigram_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, total_words, total_pieces, n_bins, fill_pct,
    word_budget_underestimate_bp): the tokenizer-aware packing
    scorecard — per shard, bin count and fill under the PIECE budget,
    plus how far a whitespace-word budget underestimates the piece
    stream in exact basis points ((total_pieces - total_words) *
    10000 div total_words — the corpus fertility tax on the training
    budget, computed with the integer-division parity discipline).

    Same single shard-keyed reduce as pack_efficiency; the underrun
    column is free (both sums ride the same aggregate)."""
    per = (
        _piece_sized_sharded_docs(spark, sf_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
            F.sum("n_pieces").cast("long").alias("total_pieces"),
        )
    )
    n_bins = (
        F.floor((F.col("total_pieces") - 1) / PACK_BUDGET) + 1
    ).cast("long")
    return per.select(
        "shard",
        "n_docs",
        "total_words",
        "total_pieces",
        n_bins.alias("n_bins"),
        F.round(
            F.col("total_pieces").cast("double")
            / (n_bins * F.lit(PACK_BUDGET)).cast("double")
            * 100.0,
            4,
        ).alias("fill_pct"),
        F.expr(
            "CAST((total_pieces - total_words) * 10000"
            " div total_words AS BIGINT)"
        ).alias("word_budget_underestimate_bp"),
    )


def pack_rollover_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shard, bin, bin_offset, doc_offset, seg_pieces):
    EXACT-FILL tokenizer-aware packing — the concat-then-cut stream in
    trained-unigram piece units with documents SPLIT at bin
    boundaries (rollover), so every training sequence except a
    shard's last holds exactly PACK_BUDGET pieces. This is the shape
    a real training export ships (GPT-style document packing with
    cross-boundary continuation), where pack_unigram_sequences is the
    whole-doc-placement variant.

    A doc occupying piece interval [start, start+n) emits one row per
    bin it overlaps: bin_offset = where the segment starts inside the
    bin, doc_offset = how many of the doc's pieces earlier bins
    already consumed, seg_pieces = the piece count landing here.

    Scale shape: the same vocab-bounded sizing join + ONE shard-keyed
    running window, then a map-side explode over
    sequence(first_bin, last_bin) — output rows = total_pieces/BUDGET
    + n_docs, i.e. input-linear with no new exchange after the
    window. Nothing is corpus^2 and the explode bound per doc is
    ceil(n_pieces/BUDGET) + 1."""
    docs = _piece_sized_sharded_docs(spark, sf_dir)
    start = _shard_start("n_pieces")
    sized = docs.select(
        "doc_id", "shard", "n_pieces", start.alias("start")
    )
    b = PACK_BUDGET
    return sized.selectExpr(
        "doc_id",
        "shard",
        "n_pieces",
        "start",
        f"explode(sequence(CAST(start div {b} AS BIGINT),"
        f" CAST((start + n_pieces - 1) div {b} AS BIGINT))) AS bin",
    ).selectExpr(
        "doc_id",
        "shard",
        "bin",
        f"CAST(greatest(start, bin * {b}) - bin * {b} AS BIGINT)"
        " AS bin_offset",
        f"CAST(greatest(start, bin * {b}) - start AS BIGINT)"
        " AS doc_offset",
        f"CAST(least(start + n_pieces, (bin + 1) * {b})"
        f" - greatest(start, bin * {b}) AS BIGINT) AS seg_pieces",
    )


def pack_rollover_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_bins, full_bins, n_segments, split_docs,
    last_fill_pieces): the exact-fill audit for
    :func:`pack_rollover_segments` — every bin but the shard's last
    holds exactly PACK_BUDGET pieces; publishing the audit makes the
    invariant a monitored contract instead of a code comment.

    Scale shape — and the verification trick: because the piece
    stream is a CONTIGUOUS concat from offset 0, every audit column
    has a closed form over the per-doc sizing relation (n_bins from
    the piece total, full_bins = n_bins minus the one partial tail,
    n_segments = sum of per-doc bin spans, split_docs = docs whose
    interval crosses a boundary) — so the Spark side is ONE
    shard-keyed reduce over `sized`, never touching the exploded
    segment stream (a naive per-bin re-aggregation re-ran the encode
    chain per consumer: 24 shuffles / 16 scans; this is 6/4, the
    pack_unigram_efficiency plan shape). The DuckDB oracle
    DELIBERATELY computes the same columns the expensive way — from
    the exploded segment stream (pack_rollover_fill_sql) — so the
    driver's hash equality IS a proof that the closed form and the
    segment stream agree, i.e. the exact-fill invariant holds on the
    materialized export."""
    docs = _piece_sized_sharded_docs(spark, sf_dir)
    start = _shard_start("n_pieces")
    b = PACK_BUDGET
    sized = docs.select(
        "doc_id", "shard", "n_pieces", start.alias("start")
    ).selectExpr(
        "shard",
        "n_pieces",
        f"CAST(start div {b} AS BIGINT) AS first_bin",
        f"CAST((start + n_pieces - 1) div {b} AS BIGINT) AS last_bin",
    )
    return sized.groupBy("shard").agg(
        F.sum("n_pieces").cast("long").alias("_total"),
        F.sum(F.col("last_bin") - F.col("first_bin") + 1)
        .cast("long")
        .alias("n_segments"),
        F.sum(
            F.when(F.col("last_bin") > F.col("first_bin"), 1).otherwise(0)
        )
        .cast("long")
        .alias("split_docs"),
    ).selectExpr(
        "shard",
        f"CAST((_total - 1) div {b} + 1 AS BIGINT) AS n_bins",
        f"CAST((_total - 1) div {b} + (CASE WHEN _total % {b} = 0"
        f" THEN 1 ELSE 0 END) AS BIGINT) AS full_bins",
        "n_segments",
        "split_docs",
        f"CAST(_total - ((_total - 1) div {b}) * {b} AS BIGINT)"
        " AS last_fill_pieces",
    )
