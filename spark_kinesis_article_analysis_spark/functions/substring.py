"""Substring-grain corpus dedup: cross-document repeated-span detection
and corpus-wide boilerplate removal.

Round-7 additions extending the reference's single text transform
(``app/process_articles.py:74-75``) with the two span-grain dedup
stages a pre-training pipeline runs that the document/segment-grain
family (``functions/dedup.py``, ``corpus.py::text_segment_dedup``)
does not cover:

* **Substring duplication stats** (the ExactSubstr idea from
  "Deduplicating Training Data Makes Language Models Better", Lee et
  al. 2022): sample fixed-width character grams at a stride, count for
  each gram how many *distinct* documents contain it, and report per
  document what fraction of its sampled grams also occur elsewhere in
  the corpus. The production form feeds the flagged spans to a cut
  stage; the stats form here is the detection dataflow, oracle-exact.
* **Boilerplate segment removal** (RefinedWeb-style repeated-line
  filtering): unlike ``text_segment_dedup`` (keep the globally FIRST
  occurrence of every segment), true boilerplate — a segment present in
  >= DF_MIN distinct documents — is dropped from ALL documents,
  including the first. Headers, cookie banners, and license footers are
  noise in every copy; first-occurrence dedup would keep one.

Scale shape shared by both: gram/segment extraction is JVM-side
(``sequence``/``transform``/``explode`` inside whole-stage codegen, no
Python), the document-frequency table is one aggregated row per
distinct gram, and the flag join keys on the gram itself so AQE can
split a skewed probe side (a viral boilerplate gram is many probe rows
against a single build row, not a k^2 pair expansion — contrast the
df-cap that ``dedup_ngram_jaccard`` needs for its *pair* grain). The
stride bounds extraction to ``len/STRIDE`` rows per document, so a
100 TB corpus grows the gram stream linearly, never quadratically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register

#: Character-gram width. Lee et al. use 50 BPE tokens; 20 characters
#: keeps the synthetic corpus (avg ~300 chars/doc) non-vacuous.
GRAM_CHARS = 20
#: Sampling stride: one gram every STRIDE characters. Bounds the gram
#: stream at len/STRIDE rows per document — the knob that keeps
#: extraction linear at 100 TB (stride=1 is the exhaustive suffix form).
GRAM_STRIDE = 10
#: Boilerplate threshold: a segment in >= DF_MIN distinct documents is
#: boilerplate and is dropped from every document that contains it.
BOILER_DF_MIN = 3
#: Words per boilerplate segment — mirrors corpus.SEG_WORDS geometry so
#: the two segment operators are directly comparable on one corpus.
BOILER_SEG_WORDS = 3


@register(
    "text_substring_dedup",
    oracle=f"""
WITH grams AS (
    SELECT doc_id, substr(text, CAST(i AS INTEGER), {GRAM_CHARS}) AS g
    FROM documents, LATERAL unnest(range(1, length(text) - {GRAM_CHARS - 2}, {GRAM_STRIDE})) AS t(i)
    WHERE text IS NOT NULL AND length(text) >= {GRAM_CHARS}
),
df AS (
    SELECT g, count(DISTINCT doc_id) AS ndocs FROM grams GROUP BY g
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
       sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE) AS dup_ratio
FROM grams JOIN df USING (g)
GROUP BY doc_id
""",
    tags=("text", "dedup", "substring", "north-star"),
    doc=(
        "Substring-level duplication stats (Lee et al. 2022 ExactSubstr "
        "detection): stride-sampled fixed-width character grams, per-gram "
        "distinct-document frequency, per-document duplicated-gram fraction. "
        "A gram counts as duplicated only when some OTHER document contains "
        "it (distinct-doc frequency >= 2), so within-document repetition "
        "alone never flags."
    ),
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`substring_dedup_stats` over documents."""
    return substring_dedup_stats(load(spark, sf_dir, "documents"))


def substring_dedup_stats(d: DataFrame) -> DataFrame:
    """Scale shape: three corpus-grain shuffles, all on the gram key —
    (1) the distinct-doc-frequency aggregate (Spark plans exact
    count(DISTINCT) as two hash aggregates with map-side partials; the
    intermediate is the DISTINCT (g, doc_id) pair stream, already the
    minimal form), (2) the flag join back onto the gram stream (build
    side is one row per distinct gram; a skewed gram skews only the
    probe side, which AQE splits), (3) the per-document rollup. Gram
    extraction itself is codegen'd sequence/explode — zero Python, and
    the scan prunes to (doc_id, text).

    Documents shorter than GRAM_CHARS (or with NULL text) yield no
    grams and are absent from the output, mirroring the oracle's WHERE.
    """
    d = d.where(F.length("text") >= F.lit(GRAM_CHARS))
    # Positions 1, 1+STRIDE, ... up to the last full-width start
    # (length - GRAM_CHARS + 1); sequence() is inclusive of the stop
    # only when the arithmetic lands on it, same as the oracle's
    # exclusive range(stop = length - GRAM_CHARS + 2).
    pos = F.sequence(
        F.lit(1), F.length("text") - F.lit(GRAM_CHARS - 1), F.lit(GRAM_STRIDE)
    )
    grams = d.select(
        "doc_id", F.explode(pos).alias("i"), "text"
    ).select("doc_id", F.expr(f"substring(text, i, {GRAM_CHARS})").alias("g"))
    df_tbl = grams.groupBy("g").agg(F.countDistinct("doc_id").alias("ndocs"))
    dup = (F.col("ndocs") >= F.lit(2)).cast("long")
    return (
        grams.join(df_tbl, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(dup).alias("dup_grams"),
            (F.sum(dup) / F.count(F.lit(1)).cast("double")).alias("dup_ratio"),
        )
    )


@register(
    "text_boilerplate_segments",
    oracle=f"""
WITH words AS (
    SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w FROM documents
),
segs AS (
    SELECT doc_id, i,
           array_to_string(w[(i * {BOILER_SEG_WORDS} + 1):(i * {BOILER_SEG_WORDS} + {BOILER_SEG_WORDS})], ' ') AS seg
    FROM words, LATERAL unnest(range(CAST(ceil(len(w) / {BOILER_SEG_WORDS}.0) AS BIGINT))) AS t(i)
),
df AS (
    SELECT seg, count(DISTINCT doc_id) AS ndocs FROM segs GROUP BY seg
)
SELECT doc_id,
       string_agg(CASE WHEN ndocs < {BOILER_DF_MIN} THEN seg END, ' ' ORDER BY i) AS clean_text,
       CAST(sum(CASE WHEN ndocs < {BOILER_DF_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS segs_kept,
       CAST(sum(CASE WHEN ndocs >= {BOILER_DF_MIN} THEN 1 ELSE 0 END) AS BIGINT) AS segs_dropped
FROM segs JOIN df USING (seg)
GROUP BY doc_id
""",
    tags=("text", "dedup", "boilerplate", "north-star"),
    doc=(
        "RefinedWeb-style boilerplate removal: a word segment appearing in "
        ">= 3 distinct documents is dropped from EVERY document (including "
        "the first occurrence — contrast text_segment_dedup's keep-first), "
        "and documents are reassembled from surviving segments in order. "
        "clean_text is NULL when nothing survives."
    ),
)
def text_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`boilerplate_filter` over documents."""
    return boilerplate_filter(load(spark, sf_dir, "documents"))


def _segments(d: DataFrame) -> DataFrame:
    """(doc_id, i, seg): fixed word-count segments — the same geometry
    as corpus.text_segment_dedup so the keep-first and drop-everywhere
    policies are comparable side by side on one corpus. NULL text maps
    to '' (one empty segment), keeping the document present in the
    output like the oracle's coalesce."""
    words = d.select(
        "doc_id", F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("w")
    )
    n_segs = (F.floor((F.size("w") - F.lit(1)) / F.lit(BOILER_SEG_WORDS)) + 1).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.array_join(F.slice(F.col("w"), i * BOILER_SEG_WORDS + 1, BOILER_SEG_WORDS), " "),
    )
    return words.select("doc_id", F.posexplode(segs).alias("i", "seg"))


def boilerplate_filter(d: DataFrame) -> DataFrame:
    """Scale shape: identical to :func:`substring_dedup_stats` — the
    distinct-doc-frequency aggregate on the segment key, the flag join
    (one build row per distinct segment, AQE-splittable probe skew),
    and one doc-grain rollup that reassembles survivors with
    array_sort(collect_list(struct(i, seg))) — collect_list is bounded
    by the per-document segment count, never the corpus. Dropping is a
    filter expression, not an anti-join: the df table already carries
    the verdict per segment."""
    segs = _segments(d)
    df_tbl = segs.groupBy("seg").agg(F.countDistinct("doc_id").alias("ndocs"))
    keep: Column = F.col("ndocs") < F.lit(BOILER_DF_MIN)
    per_doc = (
        segs.join(df_tbl, "seg")
        .groupBy("doc_id")
        .agg(
            F.sum(keep.cast("long")).alias("segs_kept"),
            F.sum((~keep).cast("long")).alias("segs_dropped"),
            # when() yields NULL for dropped segments; collect_list
            # skips NULLs, so the list holds survivors only.
            F.collect_list(F.when(keep, F.struct("i", "seg"))).alias("lst"),
        )
    )
    clean = F.array_join(
        F.transform(F.array_sort("lst"), lambda x: x["seg"]), " "
    )
    return per_doc.select(
        "doc_id",
        # string_agg over zero non-NULL inputs is NULL, not '' — mirror.
        F.when(F.col("segs_kept") > 0, clean).alias("clean_text"),
        "segs_kept",
        "segs_dropped",
    )


@register(
    "text_substring_cut",
    oracle=f"""
WITH docs AS (
    SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) >= 1
),
grams AS (
    SELECT doc_id, CAST(i AS BIGINT) AS i, substr(text, CAST(i AS INTEGER), {GRAM_CHARS}) AS g
    FROM docs, LATERAL unnest(range(1, length(text) - {GRAM_CHARS - 2}, {GRAM_STRIDE})) AS t(i)
    WHERE length(text) >= {GRAM_CHARS}
),
df AS (
    SELECT g, count(DISTINCT doc_id) AS ndocs FROM grams GROUP BY g
),
flagged AS (
    SELECT doc_id, i FROM grams JOIN df USING (g) WHERE ndocs >= 2
),
chars AS (
    SELECT d.doc_id, CAST(p AS BIGINT) AS p, substr(d.text, CAST(p AS INTEGER), 1) AS ch
    FROM docs d, LATERAL unnest(range(1, length(d.text) + 1)) AS t(p)
),
kept AS (
    SELECT c.doc_id, c.p, c.ch
    FROM chars c
    WHERE NOT EXISTS (
        SELECT 1 FROM flagged f
        WHERE f.doc_id = c.doc_id AND c.p BETWEEN f.i AND f.i + {GRAM_CHARS - 1}
    )
)
SELECT d.doc_id,
       coalesce(string_agg(k.ch, '' ORDER BY k.p), '') AS clean_text,
       CAST(length(any_value(d.text)) - count(k.ch) AS BIGINT) AS n_removed_chars
FROM docs d LEFT JOIN kept k ON k.doc_id = d.doc_id
GROUP BY d.doc_id
""",
    tags=("text", "dedup", "substring", "north-star"),
    doc=(
        "The CUT stage completing the ExactSubstr pipeline: every character "
        "covered by a cross-document duplicated gram (the stats operator's "
        "flag, df >= 2) is removed, and the document is reassembled from the "
        "surviving spans. Overlapping flagged grams merge into one removed "
        "interval. Documents with no flagged grams pass through unchanged; "
        "empty-text documents are excluded (no characters to cut)."
    ),
)
def text_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`substring_cut` over documents."""
    return substring_cut(load(spark, sf_dir, "documents"))


def substring_cut(d: DataFrame) -> DataFrame:
    """Scale shape: the flag side reuses the stats operator's plan (gram
    aggregate + equi-join back), then collapses to ONE row per document
    holding its sorted flagged starts (bounded by len/STRIDE), and the
    removal itself is an O(flags) ``aggregate`` fold that walks the
    sorted starts merging [i, i+GRAM_CHARS-1] intervals and extracting
    the gaps with substring — per-document, map-side, no character-
    grain explosion anywhere on the Spark side (the oracle's char-level
    NOT EXISTS form is the brute-force correctness mirror only).
    """
    base = d.select("doc_id", "text").where(
        F.col("text").isNotNull() & (F.length("text") >= 1)
    )
    grammed = base.where(F.length("text") >= F.lit(GRAM_CHARS))
    pos = F.sequence(
        F.lit(1), F.length("text") - F.lit(GRAM_CHARS - 1), F.lit(GRAM_STRIDE)
    )
    grams = grammed.select(
        "doc_id", F.explode(pos).alias("i"), "text"
    ).select("doc_id", "i", F.expr(f"substring(text, i, {GRAM_CHARS})").alias("g"))
    df_tbl = grams.groupBy("g").agg(F.countDistinct("doc_id").alias("ndocs"))
    flags = (
        grams.join(df_tbl, "g")
        .where(F.col("ndocs") >= 2)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("i")).alias("starts"))
    )
    cut = F.expr(f"""
        aggregate(
            coalesce(starts, CAST(array() AS ARRAY<INT>)),
            struct(CAST(0 AS INT) AS last_end, CAST('' AS STRING) AS txt),
            (acc, s) -> struct(
                CAST(greatest(acc.last_end, s + {GRAM_CHARS} - 1) AS INT) AS last_end,
                CASE WHEN s > acc.last_end + 1
                     THEN concat(acc.txt,
                                 substring(text, acc.last_end + 1, s - acc.last_end - 1))
                     ELSE acc.txt END AS txt),
            acc -> concat(acc.txt,
                          substring(text, acc.last_end + 1, length(text) - acc.last_end))
        )
    """)
    return (
        base.join(flags, "doc_id", "left")
        .withColumn("clean_text", cut)
        .select(
            "doc_id",
            "clean_text",
            (F.length("text") - F.length("clean_text")).cast("long").alias(
                "n_removed_chars"
            ),
        )
    )
