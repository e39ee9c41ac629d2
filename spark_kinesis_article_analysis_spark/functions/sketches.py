"""Count-min sketch in PORTABLE relational form — the sketch family's
first value-hash-verifiable member.

The existing sketch specs (HLL, Greenwald-Khanna, ``approx_count_distinct``)
ride Spark-internal binary buffers, so their verdicts are rows-only plus
error-bound pytests. A count-min sketch, by contrast, is just a d x w
integer matrix of hashed counts — representable as (depth, col, count)
ROWS, buildable with one aggregate, and therefore oracle-exact: DuckDB
can rebuild the identical matrix from the identical md5-derived hash
functions and the estimates must match to the bit.

Why an engine needs it: CMS is the streaming/mergeable answer to
"approximate frequency of anything, bounded memory" — heavy-hitter
screens over unbounded token streams, join-frequency hints, skew
detection. The relational form here is exactly what the distributed
build looks like at 100 TB: a map-side-combined count at (depth, col)
grain (d x w cells total — broadcastable), then O(1) point queries
against the folded matrix. The width is deliberately NARROW (4 x 32)
for the fixture vocabulary so hash collisions — the over-estimate the
sketch trades for its space bound — are actually visible at test
scale. The estimate's one-sided error (estimate >= true) is asserted
per probe in tests.

Hash family: col_i(t) = int(md5(i ':' t)[:6], 16) % WIDTH — the
repo-standard md5-portable derivation (same idiom as
``similarity.portable_bucket``), independent per depth via the ``i:``
prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.functions.text import tokens_col
from spark_kinesis_article_analysis_spark.registry import register

CMS_DEPTH = 4
CMS_WIDTH = 32

#: Probe terms: the BM25 query vocabulary (present at varied
#: frequencies) plus two guaranteed-absent terms — absent keys are
#: where CMS over-estimation is visible (true = 0, estimate >= 0).
CMS_PROBES: tuple[str, ...] = (
    "join",
    "vector",
    "stream",
    "window",
    "zz_absent_probe",
    "qq_never_seen",
)

_TOK_SQL = "string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')"


def _col_sql(depth: str, term: str) -> str:
    """DuckDB: md5-derived column index for ``term`` at ``depth``."""
    return (
        f"CAST(('0x' || substr(md5(CAST({depth} AS VARCHAR) || ':' || {term}), 1, 6)) "
        f"AS BIGINT) % {CMS_WIDTH}"
    )


def _col_spark(depth, term):
    """Spark twin of :func:`_col_sql`."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(depth.cast("string"), F.lit(":"), term)), 1, 6
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def _probes_sql() -> str:
    return ", ".join(f"('{t}')" for t in CMS_PROBES)


@register(
    "sketch_countmin_portable",
    oracle=f"""
WITH tf AS (
    SELECT tkn AS term, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT {_TOK_SQL} AS toks FROM documents WHERE doc_id IS NOT NULL),
         LATERAL unnest(toks) AS u(tkn)
    GROUP BY tkn
),
depths AS (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS depth),
cells AS (
    SELECT d.depth, {_col_sql("d.depth", "tf.term")} AS col,
           CAST(sum(tf.cnt) AS BIGINT) AS cell
    FROM tf CROSS JOIN depths d
    GROUP BY d.depth, {_col_sql("d.depth", "tf.term")}
),
probes AS (SELECT * FROM (VALUES {_probes_sql()}) AS p(term)),
est AS (
    SELECT p.term,
           CAST(min(coalesce(c.cell, 0)) AS BIGINT) AS cms_estimate
    FROM probes p CROSS JOIN depths d
    LEFT JOIN cells c
      ON c.depth = d.depth AND c.col = {_col_sql("d.depth", "p.term")}
    GROUP BY p.term
)
SELECT e.term, CAST(coalesce(tf.cnt, 0) AS BIGINT) AS true_count,
       e.cms_estimate,
       CAST(e.cms_estimate - coalesce(tf.cnt, 0) AS BIGINT) AS over_estimate
FROM est e LEFT JOIN tf ON tf.term = e.term
""",
    tags=("sketch", "count-min", "approximate", "portable-twin", "north-star"),
    doc=(
        "Count-min sketch built as RELATIONAL rows — 4 depths x 32 "
        "cols, md5-derived independent hash per depth — from the "
        "corpus token stream (vocabulary-grain: tf folds first, cells "
        "aggregate the tf rows, so the token-grain shuffle happens once). "
        "Point queries take min over depths of the hashed cell; the "
        "output reports true count, estimate, and the one-sided error "
        "per probe term (estimate >= true always — pinned in tests). "
        "Fully oracle-exact, unlike the buffer-based HLL/GK sketches: "
        "the matrix is d x w = 128 rows, broadcastable at any corpus "
        "scale, and mergeable by cell-wise addition across partitions "
        "or streams."
    ),
)
def sketch_countmin_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull())
        .select(F.explode(tokens_col()).alias("term"))
    )
    tf = d.groupBy("term").agg(F.count("*").alias("cnt"))
    depths = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("depth"))
    cells = (
        tf.join(F.broadcast(depths))
        .select("cnt", "depth", _col_spark(F.col("depth"), F.col("term")).alias("col"))
        .groupBy("depth", "col")
        .agg(F.sum("cnt").alias("cell"))
    )
    probes = spark.createDataFrame([(t,) for t in CMS_PROBES], ["term"])
    est = (
        probes.join(F.broadcast(depths))
        .withColumn("col", _col_spark(F.col("depth"), F.col("term")))
        .join(F.broadcast(cells), ["depth", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cell", F.lit(0))).alias("cms_estimate"))
    )
    return est.join(tf, "term", "left").select(
        "term",
        F.coalesce("cnt", F.lit(0)).alias("true_count"),
        "cms_estimate",
        (F.col("cms_estimate") - F.coalesce("cnt", F.lit(0))).alias("over_estimate"),
    )
