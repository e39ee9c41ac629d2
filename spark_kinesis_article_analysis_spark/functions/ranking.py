"""Lexical relevance ranking: Okapi BM25 retrieval and a hashed-feature
linear scorer (the fastText-style quality-classifier shape).

Two ranking primitives every corpus pipeline ends up needing:

* **BM25** (`text_bm25_topk`): the standard lexical retrieval score —
  used directly for search/RAG candidate generation and, in curation,
  as the "looks like the benchmark" signal for decontamination triage.
  Formula (Robertson/Spärck Jones, +1 idf variant so scores stay
  positive):

      idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
      s(d, t) = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))

  Scale shape: tokens are FILTERED to the query vocabulary *before*
  the (doc, term) count, so the only corpus-grain shuffle carries just
  matching postings; df/avgdl fold to tiny frames that broadcast back;
  the final top-k orders a candidate set already cut to matching docs.

* **Hashed linear model** (`text_hashed_ngram_score`): the
  fastText/CCNet-style classifier applied as a *scoring pass* — word
  uni+bigrams hash into K buckets, each bucket carries a fixed weight,
  the document score is the mean bucket weight. Here the weight table
  is a deterministic function of the bucket id (md5-derived, embedded
  in both engines' expressions) — the Spark-side plumbing is exactly
  what a learned-weights deployment uses (swap the arithmetic weight
  for a broadcast map lookup); the derivation keeps it oracle-exact.
  Entirely map-only: features, hashes and the weight SUM run inside
  one higher-order expression per row — zero shuffles, zero Python.

Float discipline: BM25 rounds the score to 6 digits BEFORE ranking
(the similarity.py rule) and breaks ties on doc_id; avgdl is rounded
once on both sides so downstream arithmetic starts from the identical
double. The hashed model never sums doubles at all — integer weights
sum exactly (order-independent), with ONE final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.functions.folds import materialize_fold
from spark_kinesis_article_analysis_spark.functions.text import tokens_col
from spark_kinesis_article_analysis_spark.registry import register

#: Query vocabulary for the BM25 spec — mixed document frequencies in
#: the synthetic corpus (a multi-term query, summed per doc).
BM25_TERMS: tuple[str, ...] = ("join", "vector", "stream", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

#: DuckDB whitespace tokenizer (the corpus-wide shared tokenization).
_TOK_SQL = "string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')"

#: Hashed-model geometry: 2^14 buckets; md5-derived integer weights in
#: [-500_000, 500_000) at denominator 1_000_003 (prime, so bucket ids
#: spread over the full weight range).
HASH_BUCKETS = 16384
_W_MOD = 1_000_003
_W_MUL = 2_654_435_761  # Knuth multiplicative constant


def _bm25_terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in BM25_TERMS)


#: Shared BM25 oracle CTE chain ending in ``scored(doc_id, score)`` —
#: reused by text_bm25_topk and rank_fusion_rrf.
def _bm25_scored_sql() -> str:
    return f"""
d AS (
    SELECT doc_id, {_TOK_SQL} AS toks FROM documents WHERE doc_id IS NOT NULL
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           round(sum(len(toks)) / CAST(count(*) AS DOUBLE), 6) AS avgdl
    FROM d
),
tf AS (
    SELECT doc_id, tkn AS term, CAST(count(*) AS BIGINT) AS tf
    FROM d, LATERAL unnest(toks) AS u(tkn)
    WHERE tkn IN ({_bm25_terms_sql()})
    GROUP BY doc_id, tkn
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM d),
scored AS (
    SELECT tf.doc_id,
           round(sum(
               ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * tf.tf * ({BM25_K1} + 1)
               / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / s.avgdl))
           ), 6) AS score
    FROM tf
    JOIN df USING (term)
    JOIN dl USING (doc_id)
    CROSS JOIN stats s
    GROUP BY tf.doc_id
)"""


@register(
    "text_bm25_topk",
    oracle=f"""
WITH {_bm25_scored_sql()}
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
FROM scored
ORDER BY rank
LIMIT {BM25_TOPK}
""",
    tags=("text", "bm25", "ranking", "retrieval", "north-star"),
    doc=(
        "Okapi BM25 (k1=1.2, b=0.75, +1 idf) for a 4-term query, summed "
        "per document, top-20 by (rounded score, doc_id). Tokens filter to "
        "the query vocabulary BEFORE the posting count, so the corpus-grain "
        "shuffle carries only matching postings; df (<= |Q| rows) and "
        "avgdl/N (1 row) broadcast back onto the postings; doc length is a "
        "broadcast-joined per-doc scalar. Scores round to 6 digits before "
        "ranking (similarity.py float discipline)."
    ),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _bm25_scored(spark, sf_dir)
    # Global top-k: limit() cuts the candidate set first (Spark's
    # TakeOrderedAndProject — no single-partition sort of the full set),
    # then a window numbers the <= K survivors.
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(BM25_TOPK)
    w = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "score", F.row_number().over(w).cast("long").alias("rank")
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) BM25 sum over the query vocabulary — the shared
    pre-top-k stage (text_bm25_topk ranks it; rank_fusion_rrf fuses it
    with the quality ranking)."""
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .select("doc_id", tokens_col().alias("toks"))
    )
    stats = d.agg(
        F.count("*").alias("n_docs"),
        F.round(F.sum(F.size("toks")) / F.count("*").cast("double"), 6).alias("avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in BM25_TERMS])
    # Vocabulary filter runs INSIDE the array before explode: only query
    # terms reach the (doc, term) shuffle.
    tf = (
        d.select(
            "doc_id",
            F.explode(F.filter("toks", lambda t: F.array_contains(terms, t))).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    dl = d.select("doc_id", F.size("toks").cast("long").alias("dl"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    denom = F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    return (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * F.col("tf") * (BM25_K1 + 1) / denom), 6).alias("score"))
    )


#: Shared weight arithmetic: bucket -> integer weight in
#: [-_W_MOD//2, _W_MOD//2). All-integer, exact on both engines.
def _bucket_sql(feat: str) -> str:
    """DuckDB: md5 -> first 6 hex digits -> int -> bucket."""
    return f"CAST(('0x' || substr(md5({feat}), 1, 6)) AS BIGINT) % {HASH_BUCKETS}"


#: Shared hashed-scorer oracle CTE chain ending in
#: ``weighted(doc_id, n_feats, wsum)`` — reused by rank_fusion_rrf.
def _hashed_weighted_sql() -> str:
    return f"""
hd AS (
    SELECT doc_id, {_TOK_SQL} AS toks FROM documents WHERE doc_id IS NOT NULL
),
feats AS (
    SELECT doc_id,
           list_concat(
               toks,
               list_transform(generate_series(1, len(toks) - 1),
                              i -> toks[i] || ' ' || toks[i + 1])
           ) AS fs
    FROM hd
),
weighted AS (
    SELECT doc_id,
           CAST(len(fs) AS BIGINT) AS n_feats,
           CAST(list_sum(list_transform(fs,
               f -> ({_bucket_sql('f')}) * {_W_MUL} % {_W_MOD} - {_W_MOD // 2}
           )) AS BIGINT) AS wsum
    FROM feats
)"""


@register(
    "text_hashed_ngram_score",
    oracle=f"""
WITH {_hashed_weighted_sql()}
SELECT doc_id, n_feats, wsum,
       CASE WHEN n_feats > 0
            THEN round(wsum / (n_feats * CAST({_W_MOD} AS DOUBLE)), 6) END AS score,
       CASE WHEN n_feats > 0 THEN wsum > 0 END AS label
FROM weighted
""",
    tags=("text", "classifier", "hashing-trick", "quality", "north-star"),
    doc=(
        "Hashed-feature linear scorer (the fastText/CCNet classifier "
        "shape): word uni+bigrams hash via md5 into 16384 buckets, each "
        "bucket maps to a fixed integer weight (Knuth-multiplicative "
        "spread mod a prime, centered), the doc score is the normalized "
        "weight mean and the label its sign. The weight SUM is all-"
        "integer — exact and summation-order-independent across engines — "
        "with one final double division. Features, hashes, and the fold "
        "all run inside one higher-order expression per row: map-only, "
        "zero shuffles, zero Python; a learned deployment swaps the "
        "arithmetic weight for a broadcast bucket->weight map join."
    ),
)
def text_hashed_ngram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    weighted = _hashed_weighted(spark, sf_dir)
    nz = F.col("n_feats") > 0
    return weighted.select(
        "doc_id",
        "n_feats",
        "wsum",
        F.when(nz, F.round(F.col("wsum") / (F.col("n_feats") * float(_W_MOD)), 6)).alias(
            "score"
        ),
        F.when(nz, F.col("wsum") > 0).alias("label"),
    )


def _hashed_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_feats, wsum) — the shared map-only weight fold."""
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .select("doc_id", tokens_col().alias("toks"))
    )
    bigrams = F.filter(
        F.transform(
            "toks",
            lambda x, i: F.when(
                i < F.size(F.col("toks")) - 1,
                F.concat(x, F.lit(" "), F.element_at(F.col("toks"), i + 2)),
            ),
        ),
        lambda b: b.isNotNull(),
    )
    feats = d.select("doc_id", F.concat(F.col("toks"), bigrams).alias("fs"))
    bucket = lambda f: F.conv(F.substring(F.md5(f), 1, 6), 16, 10).cast("long") % HASH_BUCKETS  # noqa: E731
    weight = lambda f: bucket(f) * _W_MUL % _W_MOD - _W_MOD // 2  # noqa: E731
    return feats.select(
        "doc_id",
        F.size("fs").cast("long").alias("n_feats"),
        F.aggregate("fs", F.lit(0).cast("long"), lambda acc, f: acc + weight(f)).alias(
            "wsum"
        ),
    )


#: RRF constant (Cormack et al.'s standard 60) and candidate-list size.
RRF_K = 60
RRF_LIST = 100
RRF_TOPK = 20


@register(
    "rank_fusion_rrf",
    oracle=f"""
WITH {_bm25_scored_sql()},
{_hashed_weighted_sql().lstrip()},
la AS (
    SELECT doc_id, ra FROM (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS ra
        FROM scored
    ) WHERE ra <= {RRF_LIST}
),
lb AS (
    SELECT doc_id, rb FROM (
        SELECT doc_id,
               row_number() OVER (
                   ORDER BY round(wsum / (n_feats * CAST({_W_MOD} AS DOUBLE)), 6) DESC,
                            doc_id ASC) AS rb
        FROM weighted WHERE n_feats > 0
    ) WHERE rb <= {RRF_LIST}
),
fused AS (
    SELECT coalesce(la.doc_id, lb.doc_id) AS doc_id, ra, rb,
           round(coalesce(1.0 / ({RRF_K} + ra), 0.0)
                 + coalesce(1.0 / ({RRF_K} + rb), 0.0), 6) AS rrf
    FROM la FULL OUTER JOIN lb ON la.doc_id = lb.doc_id
)
SELECT doc_id, CAST(ra AS BIGINT) AS bm25_rank, CAST(rb AS BIGINT) AS quality_rank,
       rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS BIGINT) AS rank
FROM fused
ORDER BY rank
LIMIT {RRF_TOPK}
""",
    tags=("ranking", "fusion", "rrf", "retrieval", "north-star"),
    doc=(
        "Reciprocal-rank fusion (k=60) of two candidate rankings — the "
        "BM25 lexical top-100 and the hashed-quality-score top-100 — the "
        "standard way a retrieval stack combines signals without score "
        "calibration: rrf = sum over lists of 1/(k + rank), missing "
        "membership contributes 0, top-20 by (rrf, doc_id). Both "
        "candidate lists cut with TakeOrderedAndProject (no global "
        "sort); the fusion joins two <= 100-row sets — broadcastable at "
        "any corpus size."
    ),
)
def rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    wa = W.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    la = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(RRF_LIST)
        .select("doc_id", F.row_number().over(wa).alias("ra"))
    )
    # Materialize the uni+bigram md5 fold ONCE before filtering/sorting
    # on its outputs (measured 6.5x re-evaluation otherwise — see
    # functions/folds.py for the CodegenFallback/no-CSE mechanics). The
    # barrier is doc-grain (doc_id + two longs); the BM25 side needs
    # none because its aggregation is already an exchange barrier.
    weighted = materialize_fold(_hashed_weighted(spark, sf_dir)).where(
        F.col("n_feats") > 0
    )
    qscore = F.round(F.col("wsum") / (F.col("n_feats") * float(_W_MOD)), 6)
    wb = W.orderBy(F.col("qs").desc(), F.col("doc_id").asc())
    lb = (
        weighted.select("doc_id", qscore.alias("qs"))
        .orderBy(F.col("qs").desc(), F.col("doc_id").asc())
        .limit(RRF_LIST)
        .select("doc_id", F.row_number().over(wb).alias("rb"))
    )
    fused = la.join(lb, "doc_id", "full").select(
        "doc_id",
        "ra",
        "rb",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("ra")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rb")), F.lit(0.0)),
            6,
        ).alias("rrf"),
    )
    wf = W.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id").asc())
        .limit(RRF_TOPK)
        .select(
            "doc_id",
            F.col("ra").cast("long").alias("bm25_rank"),
            F.col("rb").cast("long").alias("quality_rank"),
            "rrf",
            F.row_number().over(wf).cast("long").alias("rank"),
        )
    )
