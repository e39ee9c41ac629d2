"""Feature-hashed document embeddings — the cheap, deterministic
embedding stage that bridges the text surface to the similarity surface.

The hashing trick (Weinberger et al. 2009; the fastText input layer):
each token md5-hashes to a (dimension, sign) pair and the document's
vector is the signed count per dimension. No vocabulary, no training,
no floats until the consumer — the components are INTEGER sums, so the
embedding is exact and summation-order-independent across engines,
partitionings, and reruns (the same portability discipline as
``text_hashed_ngram_score``, whose md5-bucket geometry this reuses).

Downstream: the output is exactly the ``array`` + id shape the
similarity operators consume (cosine top-k, LSH buckets, int8
quantization), so `documents -> text_embed_feature_hash -> sim_*` is a
complete no-model near-dup/retrieval path.

Scale: token explode is map-side; the ONLY shuffle is the doc-grain
aggregation, whose partial sums are DIM+1 longs per doc — map-side
combine keeps skewed docs cheap. At 100 TB this is one exchange, same
as any grouped agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.functions.ranking import HASH_BUCKETS
from spark_kinesis_article_analysis_spark.functions.text import tokens_col
from spark_kinesis_article_analysis_spark.registry import register

#: embedding dimensionality — small on purpose: each dim is one pivoted
#: integer sum in both engines, and the geometry (md5 -> bucket ->
#: (dim, sign)) is what's being verified, not the width. Widening is a
#: constant change on both sides.
EMBED_DIM = 8

_TOK_SQL = "string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')"
_B_SQL = f"CAST(('0x' || substr(md5(tok), 1, 6)) AS BIGINT) % {HASH_BUCKETS}"


def _dim_sums_sql() -> str:
    # CAST: DuckDB sums integers into HUGEINT, which pandas widens to
    # float64 — pin BIGINT so the dtype matches Spark's long.
    return ",\n       ".join(
        f"CAST(coalesce(sum(CASE WHEN b % {EMBED_DIM} = {i} "
        f"THEN (b // {EMBED_DIM}) % 2 * 2 - 1 END), 0) AS BIGINT)"
        for i in range(EMBED_DIM)
    )


@register(
    "text_embed_feature_hash",
    oracle=f"""
WITH t AS (
    SELECT doc_id, unnest({_TOK_SQL}) AS tok
    FROM documents WHERE doc_id IS NOT NULL
),
h AS (SELECT doc_id, {_B_SQL} AS b FROM t),
e AS (
    SELECT doc_id,
           [{_dim_sums_sql()}] AS emb,
           count(*) AS n_tokens
    FROM h GROUP BY doc_id
)
SELECT doc_id, u.pos - 1 AS dim, emb[u.pos] AS component, n_tokens
FROM e, LATERAL unnest(generate_series(1, {EMBED_DIM})) AS u(pos)
""",
    tags=("text", "embedding", "hashing-trick", "similarity", "north-star"),
    doc=(
        "Hashing-trick document embedding: every whitespace token "
        f"md5-hashes into {HASH_BUCKETS} buckets; dimension = bucket mod "
        f"{EMBED_DIM}, sign = the next bucket bit; the embedding is the "
        "signed token count per dimension — all-integer, engine- and "
        "order-exact. One map-side explode + one doc-grain aggregation "
        "(DIM pivoted sums, map-side partials); output shape plugs "
        "straight into the cosine/LSH/quantization operators. Docs with "
        "NULL text produce no tokens and are absent, mirroring unnest."
    ),
)
def text_embed_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id", F.explode(tokens_col()).alias("tok"))
    )
    b = (
        F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10).cast("long") % HASH_BUCKETS
    )
    dim = (b % EMBED_DIM).alias("dim")
    sign = ((b / EMBED_DIM).cast("long") % 2 * 2 - 1).alias("sign")
    h = d.select("doc_id", dim, sign)
    sums = [
        F.coalesce(
            F.sum(F.when(F.col("dim") == i, F.col("sign"))), F.lit(0).cast("long")
        )
        for i in range(EMBED_DIM)
    ]
    emb = h.groupBy("doc_id").agg(
        F.array(*sums).alias("emb"), F.count("*").alias("n_tokens")
    )
    # long form (doc, dim, component) for the driver compare — the
    # harness sorts/hashes scalar columns (same convention as
    # embed_centroid_per_label); array-shaped consumers take `emb`
    # upstream of this posexplode.
    return emb.select(
        "doc_id", F.posexplode("emb").alias("dim", "component"), "n_tokens"
    ).select("doc_id", "dim", "component", "n_tokens")
