"""Mergeable cardinality sketches with EXACT cross-engine parity —
the approximate-analytics layer a 100 TB engine serves dashboards
from, built so the correctness gate can still hash-match it.

Why not ``approx_count_distinct``: Spark's HLL++ and DuckDB's
``approx_count_distinct`` use different hash functions and bias
tables, so their estimates can never hash-match. This module
implements classic HyperLogLog (Flajolet et al. 2007, public) from
deterministic md5-derived bucket/rank pairs that BOTH engines
compute identically, and keeps every distributed reduction integer:

- register: h = 60-bit md5 prefix; bucket = h mod m (m=256),
  w = h div m (52 bits), rho = 53 - bitlength(w) (53 when w = 0);
- merge: max(rho) per (group, bucket) — the mergeable-sketch
  property that makes partial aggregation work map-side;
- estimate: denominators are summed as INTEGERS
  (2^(53 - rho) per present bucket, 2^53 per empty bucket), so the
  only float math is one identical IEEE chain per group, and the
  small-range (linear-counting) branch reads a shared literal table
  of the 256 possible ``m * ln(m / V)`` values — no cross-library
  ``ln`` at query time.

The estimate is exact-replayable; accuracy is the standard
1.04/sqrt(m) ~ 6.5% at m=256 (tests pin a rel-err ceiling and the
gate pins bit-equality).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_app_twitter_spark.sources.parquet import load_table

HLL_M = 256  # buckets (b = 8 bits); rel err ~ 1.04/sqrt(m)
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# linear-counting values for every possible empty-bucket count V:
# identical literals on both engines instead of runtime ln()
_LC_TABLE = [HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M + 1)]


def hll_sketch(ev: DataFrame) -> DataFrame:
    """(day, bucket, mrho): the per-day 256-register sketch from a
    (day, user_id) frame — batch OR streaming. The only aggregate is
    max(rho), the mergeable-sketch operation, so the same expression
    is correct across partitions (map-side combine), across
    micro-batches (streaming state merge), and across separately
    built sketches unioned and re-maxed (cross-dataset merge —
    tests pin all three)."""
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    # w MUST be integer math: h is a 60-bit prefix, and double
    # division rounds integers above 2^53 (h = 2^59-32 would round to
    # 2^59 and shift rho by one vs DuckDB's exact `h // 256`) —
    # shiftright(h, 8) is the exact `h div 256` the docstring claims
    reg = ev.select(
        "day",
        F.pmod(h, F.lit(HLL_M)).alias("bucket"),
        F.shiftright(h, 8).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(53)).otherwise(
            F.lit(53) - F.length(F.bin(F.col("w")))
        ),
    )
    return reg.groupBy("day", "bucket").agg(F.max("rho").alias("mrho"))


def hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_exact, hll_estimate, rel_err): per-day distinct users
    estimated from a 256-bucket HLL sketch, with the exact count
    alongside as the audit column.

    Scale shape: the sketch aggregation shuffles at most
    |days| * 256 rows after map-side max-combine — independent of
    event count — which is the whole point: the exact branch's
    count(DISTINCT) must shuffle every distinct (day, user) pair,
    the sketch branch never does. (The exact column stays here for
    auditability; production serves the sketch alone.)
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    sk = hll_sketch(ev)
    per_day = sk.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - mrho AS INT))")
        ).alias("denom_present"),
    )
    v = F.lit(HLL_M) - F.col("n_buckets")  # empty buckets
    denom = (
        F.col("denom_present")
        + v.cast("long") * F.lit(1 << 53).cast("long")
    ).cast("double")
    raw = (
        F.lit(_HLL_ALPHA * HLL_M * HLL_M) * F.lit(float(1 << 53)) / denom
    )
    lc = F.array(*[F.lit(x) for x in _LC_TABLE])
    est = F.when(
        (raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.element_at(lc, v.cast("int")),
    ).otherwise(raw)
    exact = ev.groupBy("day").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return (
        exact.join(per_day, "day")
        .select(
            "day",
            "n_exact",
            F.round(est, 4).alias("hll_estimate"),
            F.round(
                F.abs(est - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                4,
            ).alias("rel_err"),
        )
    )


def _lc_sql() -> str:
    return "[" + ", ".join(repr(x) for x in _LC_TABLE) + "]"


HLL_DAILY_USERS_SQL = f"""
WITH reg AS (
  SELECT CAST(ts AS DATE) AS day,
         h % {HLL_M} AS bucket,
         h // {HLL_M} AS w
  FROM (SELECT ts,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events)
),
sk AS (
  SELECT day, bucket,
         max(CASE WHEN w = 0 THEN 53 ELSE 53 - len(bin(w)) END) AS mrho
  FROM reg GROUP BY day, bucket
),
per_day AS (
  SELECT day,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(CAST(1 AS BIGINT) << (53 - mrho)) AS BIGINT)
           AS denom_present
  FROM sk GROUP BY day
),
est AS (
  SELECT day, n_buckets,
         CAST({_HLL_ALPHA * HLL_M * HLL_M!r} AS DOUBLE)
           * CAST({float(1 << 53)!r} AS DOUBLE)
           / CAST(denom_present
                  + ({HLL_M} - n_buckets) * (CAST(1 AS BIGINT) << 53)
                  AS DOUBLE) AS raw,
         {HLL_M} - n_buckets AS v
  FROM per_day
),
fin AS (
  SELECT day,
         CASE WHEN raw <= CAST({2.5 * HLL_M!r} AS DOUBLE) AND v > 0
              THEN CAST(({_lc_sql()})[v] AS DOUBLE)
              ELSE raw END AS e
  FROM est
),
exact AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY day
)
SELECT exact.day, n_exact,
       round(e, 4) AS hll_estimate,
       round(abs(e - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 4)
         AS rel_err
FROM exact JOIN fin ON exact.day = fin.day
"""


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005, public): mergeable
# frequency sketch for heavy-hitter ("trending term") queries. Same
# exact-parity discipline as the HLL above: both engines derive the
# CMS_D row hashes from md5(j || ':' || term), so the sketch — and
# therefore every estimate — is bit-identical and hash-matchable.
CMS_D = 4  # hash rows; P(overestimate > 2eN/w) <= 2^-D
CMS_W = 512  # buckets per row; overestimate bound ~ 2N/w
CMS_TOPK = 20


def _cms_hash():
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("j").cast("string"), F.lit(":"), F.col("term")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def cms_cells(occ: DataFrame) -> DataFrame:
    """(j, cell, c): the D*W count-min sketch from a stream OR batch
    of term occurrences. Cell sums ADD — the mergeable operation —
    so the same expression aggregates across partitions (map-side
    combine), across micro-batches (streaming state), and across
    separately built sketches summed cell-wise (tests pin
    stream==batch equality)."""
    js = F.array(*[F.lit(j) for j in range(CMS_D)])
    h = _cms_hash()
    return (
        occ.select("term", F.explode(js).alias("j"))
        .select("j", F.pmod(h, F.lit(CMS_W)).alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, n_exact, cms_estimate, overestimate): the CMS_TOPK
    heaviest terms by sketch estimate, with the exact occurrence
    count as the audit column (estimate >= exact always, by CMS
    construction).

    Scale shape: the sketch build explodes each token occurrence to
    CMS_D cells, but the groupBy key space is only D*W = 2048 cells,
    so map-side partial aggregation collapses every partition to
    <= 2048 rows before the shuffle — sketch cost is independent of
    corpus size, which is the whole point vs the exact branch's
    vocabulary-keyed shuffle. The estimate join broadcasts the
    2048-row sketch; candidate enumeration is vocabulary-bounded
    (production would feed a sampled candidate set instead).
    """
    # r16: per-term occurrence totals come from the published text
    # index (sum of per-doc tf over postings == count of occurrence
    # rows — same tokens(), grouped one level finer first), and the
    # sketch cells aggregate the VOCABULARY-bounded counts weighted
    # by n_exact instead of exploding every corpus occurrence CMS_D
    # ways: sum(n_exact) per (j, cell) over term rows equals
    # count(*) per (j, cell) over occurrence x j rows, integer for
    # integer — the committed stream/batch seam (:func:`cms_cells`)
    # is unchanged for callers that genuinely hold an occurrence
    # stream.
    from spark_app_twitter_spark.operators.retrieval import text_index

    postings, _dl, _scalars = text_index(spark, sf_dir)
    js = F.array(*[F.lit(j) for j in range(CMS_D)])
    h = _cms_hash()
    cand = (
        postings.groupBy("term")
        .agg(F.sum("tf").cast("long").alias("n_exact"))
        # |vocab| rows feeding BOTH the cells build and the estimate
        # join below — truncate once
        .localCheckpoint(eager=False)
    )
    cells = (
        cand.select("term", "n_exact", F.explode(js).alias("j"))
        .select("j", F.pmod(h, F.lit(CMS_W)).alias("cell"), "n_exact")
        .groupBy("j", "cell")
        .agg(F.sum("n_exact").cast("long").alias("c"))
    )
    est = (
        cand.select("term", "n_exact", F.explode(js).alias("j"))
        .withColumn("cell", F.pmod(h, F.lit(CMS_W)))
        .join(F.broadcast(cells), ["j", "cell"])
        .groupBy("term", "n_exact")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return (
        est.select(
            "term",
            "n_exact",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n_exact")).alias("overestimate"),
        )
        .orderBy(F.desc("cms_estimate"), F.asc("term"))
        .limit(CMS_TOPK)
    )


CMS_TOP_TERMS_SQL = f"""
WITH occ AS (
  SELECT unnest(string_split(text, ' ')) AS term FROM documents
),
hashed AS (
  SELECT term, j,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || term), 1, 15))
              AS BIGINT) % {CMS_W} AS cell
  FROM occ, (SELECT unnest(range(0, {CMS_D})) AS j)
),
cells AS (
  SELECT j, cell, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY j, cell
),
cand AS (
  SELECT term, CAST(count(*) AS BIGINT) AS n_exact FROM occ GROUP BY term
),
cand_cells AS (
  SELECT cand.term, cand.n_exact, j,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || cand.term),
                              1, 15)) AS BIGINT) % {CMS_W} AS cell
  FROM cand, (SELECT unnest(range(0, {CMS_D})) AS j)
)
SELECT cc.term, cc.n_exact,
       min(cells.c) AS cms_estimate,
       min(cells.c) - cc.n_exact AS overestimate
FROM cand_cells cc
JOIN cells ON cells.j = cc.j AND cells.cell = cc.cell
GROUP BY cc.term, cc.n_exact
ORDER BY cms_estimate DESC, term ASC
LIMIT {CMS_TOPK}
"""

__all__ = [
    "hll_sketch",
    "hll_daily_users",
    "HLL_DAILY_USERS_SQL",
    "HLL_M",
    "cms_top_terms",
    "cms_cells",
    "CMS_TOP_TERMS_SQL",
    "CMS_D",
    "CMS_W",
    "CMS_TOPK",
]


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch — the third leg of the sketch
# family (HLL = distinct, CMS = frequency, this = distribution).
# Mergeable (histograms add), deterministic (bucket math is the same
# integer/double chain on both engines), error bounded by bucket
# width (max-min)/HIST_B rather than by rank — the trade every
# histogram-percentile dashboard (e.g. Prometheus) makes.
HIST_B = 1024
HIST_PS = (0.5, 0.95, 0.99)


def hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n, width, p50_est, p95_est, p99_est): per-type
    quantile estimates read off a HIST_B-bucket equi-width histogram
    of ``value`` — each estimate is the upper edge of the first
    bucket whose cumulative count reaches p*n, so the true quantile
    lies within one bucket width below it.

    Scale shape: pass 1 is a |types|-row min/max/count aggregate
    (broadcast back); pass 2 buckets every row map-side and
    aggregates to at most |types| * HIST_B rows — like the HLL, the
    shuffle is sketch-sized, not data-sized, and partial aggregation
    combines map-side. The quantile read-off is a window over the
    |types| * HIST_B sketch, never over data rows.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    b = F.least(
        F.lit(HIST_B),
        F.greatest(
            F.lit(1),
            (
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * F.lit(HIST_B)
                )
                + F.lit(1)
            ).cast("int"),
        ),
    )
    hist = (
        ev.join(F.broadcast(stats), "event_type")
        .select("event_type", "lo", "hi", "n", b.alias("b"))
        .groupBy("event_type", "lo", "hi", "n", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    cum = F.sum("c").over(
        Window.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_cum = hist.withColumn("cum", cum)
    width = (F.col("hi") - F.col("lo")) / F.lit(HIST_B)
    agg_exprs = []
    for p in HIST_PS:
        tag = f"p{int(p * 100)}_est"
        first_b = F.min(
            F.when(
                F.col("cum")
                >= F.lit(p) * F.col("n").cast("double"),
                F.col("b"),
            )
        )
        agg_exprs.append(
            F.round(
                F.first("lo")
                + first_b.cast("double")
                * (F.first("hi") - F.first("lo"))
                / F.lit(HIST_B),
                6,
            ).alias(tag)
        )
    return (
        with_cum.groupBy("event_type")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first(width), 6).alias("width"),
            *agg_exprs,
        )
    )


def _hist_q_sql() -> str:
    est_cols = []
    for p in HIST_PS:
        tag = f"p{int(p * 100)}_est"
        est_cols.append(
            f"round(any_value(lo) + CAST(min(CASE WHEN cum >= {p!r} *"
            f" CAST(n AS DOUBLE) THEN b END) AS DOUBLE)"
            f" * (any_value(hi) - any_value(lo)) / {HIST_B}, 6) AS {tag}"
        )
    cols = ",\n       ".join(est_cols)
    return f"""
WITH stats AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
hist AS (
  SELECT e.event_type, lo, hi, n,
         least({HIST_B}, greatest(1,
           CAST(floor((value - lo) / (hi - lo) * {HIST_B}) + 1 AS INT)))
           AS b,
         CAST(count(*) AS BIGINT) AS c
  FROM events e JOIN stats ON stats.event_type = e.event_type
  GROUP BY e.event_type, lo, hi, n, b
),
with_cum AS (
  SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY b
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS cum
  FROM hist
)
SELECT event_type,
       any_value(n) AS n,
       round((any_value(hi) - any_value(lo)) / {HIST_B}, 6) AS width,
       {cols}
FROM with_cum
GROUP BY event_type
"""


HIST_QUANTILES_SQL = _hist_q_sql()

__all__ += [
    "hist_quantiles",
    "HIST_QUANTILES_SQL",
    "HIST_B",
    "HIST_PS",
]


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch + set operations: unlike
# HLL, a KMV sketch supports INTERSECTION estimates (Beyer et al.
# 2007), so cross-source overlap can be estimated from K-row
# sketches instead of dedup_source_overlap's exact digest join — the
# sketch-sized path for wide source matrices. All integer: hashes
# are 56-bit md5 prefixes, estimates use floor division, the
# jaccard numerator is an exact count over the union sketch.
KMV_K = 64
_KMV_HEX = 14  # 56-bit hash space: (K-1)*SPACE stays inside int64
KMV_SPACE = 16 ** _KMV_HEX


def kmv_source_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, h, rn): each source's K smallest distinct 56-bit text
    hashes — the mergeable sketch relation (K rows per source)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", spread=True)
    h = F.conv(F.substring(F.md5(F.col("text")), 1, _KMV_HEX), 16, 10).cast(
        "long"
    )
    hs = docs.select("source", h.alias("h")).distinct()
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy(F.asc("h"))
    )
    return hs.withColumn("rn", rn).where(F.col("rn") <= KMV_K)


def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source_a, source_b, m, kth, n_both, est_union,
    est_jaccard_micro, est_intersection): KMV set-operation estimates
    for every source pair (a < b). The union sketch is the m <= K
    smallest hashes of the two sketches combined; when m < K both
    sources were fully sketched and the estimates are exact counts.

    Scale shape: the corpus contributes ONE distinct + one
    source-keyed rank pass (the sketch build); everything pairwise
    runs on |sources|^2 * K sketch rows — independent of corpus
    size, which is the point.
    """
    from pyspark.sql import Window

    sk = kmv_source_sketches(spark, sf_dir).localCheckpoint(eager=True)
    sources = sk.select("source").distinct()
    pairlist = (
        sources.select(F.col("source").alias("source_a"))
        .join(
            sources.select(F.col("source").alias("source_b")),
            F.col("source_a") < F.col("source_b"),
        )
    )
    exp = pairlist.join(
        F.broadcast(sk.select(F.col("source").alias("s"), "h")),
        (F.col("s") == F.col("source_a")) | (F.col("s") == F.col("source_b")),
    )
    byh = exp.groupBy("source_a", "source_b", "h").agg(
        F.max((F.col("s") == F.col("source_a")).cast("int")).alias("in_a"),
        F.max((F.col("s") == F.col("source_b")).cast("int")).alias("in_b"),
    )
    rn = F.row_number().over(
        Window.partitionBy("source_a", "source_b").orderBy(F.asc("h"))
    )
    agg = (
        byh.withColumn("rn", rn)
        .where(F.col("rn") <= KMV_K)
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("m"),
            F.max("h").alias("kth"),
            F.sum(
                ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("long")
            ).alias("n_both"),
        )
    )
    est_union = F.expr(
        f"CASE WHEN m < {KMV_K} THEN m"
        f" ELSE CAST({KMV_K - 1} AS BIGINT) * {KMV_SPACE} div kth END"
    )
    return agg.select(
        "source_a",
        "source_b",
        "m",
        "kth",
        "n_both",
        est_union.alias("est_union"),
        F.expr("(1000000 * n_both) div m").alias("est_jaccard_micro"),
    ).withColumn(
        "est_intersection",
        F.expr(
            "CAST(floor(CAST(n_both AS DECIMAL(38,0)) * est_union / m)"
            " AS BIGINT)"
        ),
    )


KMV_SOURCE_OVERLAP_SQL = f"""
WITH hs AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5(text), 1, {_KMV_HEX})) AS BIGINT) AS h
  FROM documents
),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h ASC) AS rn
    FROM hs
  ) WHERE rn <= {KMV_K}
),
srcs AS (SELECT DISTINCT source FROM sk),
pairlist AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a JOIN srcs b ON a.source < b.source
),
byh AS (
  SELECT p.source_a, p.source_b, s.h,
         max(CASE WHEN s.source = p.source_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.source = p.source_b THEN 1 ELSE 0 END) AS in_b
  FROM pairlist p JOIN sk s
    ON s.source = p.source_a OR s.source = p.source_b
  GROUP BY p.source_a, p.source_b, s.h
),
agg AS (
  SELECT source_a, source_b,
         CAST(count(*) AS BIGINT) AS m,
         max(h) AS kth,
         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_both
  FROM (
    SELECT *, row_number() OVER (PARTITION BY source_a, source_b
                                 ORDER BY h ASC) AS rn
    FROM byh
  ) WHERE rn <= {KMV_K}
  GROUP BY source_a, source_b
)
SELECT source_a, source_b, m, kth, n_both,
       CASE WHEN m < {KMV_K} THEN m
            ELSE CAST({KMV_K - 1} AS BIGINT) * {KMV_SPACE} // kth
       END AS est_union,
       CAST((1000000 * n_both) // m AS BIGINT) AS est_jaccard_micro,
       -- integer floor division (//) mirrors the exact DECIMAL(38,0)
       -- Spark path; '/' would route through DOUBLE and can disagree
       -- by ulps once the product exceeds 2^53 (ADVICE r08)
       CAST(CAST(n_both AS HUGEINT)
            * (CASE WHEN m < {KMV_K} THEN m
               ELSE CAST({KMV_K - 1} AS BIGINT) * {KMV_SPACE} // kth
               END) // m AS BIGINT) AS est_intersection
FROM agg
"""

__all__ += [
    "KMV_K",
    "KMV_SPACE",
    "kmv_source_sketches",
    "kmv_source_overlap",
    "KMV_SOURCE_OVERLAP_SQL",
]
