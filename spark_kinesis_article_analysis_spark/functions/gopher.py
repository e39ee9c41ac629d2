"""The consolidated Gopher quality gate — the published rule set
(Rae et al. 2021, arXiv:2112.11446, Appendix A) as one named operator.

Pieces of it exist across the engine (`text_quality_score`'s ratios,
`text_repetition_stats`' duplication signals); real pipelines apply the
WHOLE rule list as one gate with every signal visible for audit, which
is what this spec registers. All signals are per-document expressions —
token folds, line splits, set intersections — so the operator is
map-only: zero shuffles, scan-fused, trivially scale-free.

Rules (document passes iff ALL hold; thresholds are the published
ones):

1. 50 <= word count <= 100,000
2. 3 <= mean word length <= 10
3. symbol-to-word ratio (``#`` or ``...``) <= 0.1
4. <= 90% of lines start with a bullet (``- `` / ``* ``)
5. <= 30% of lines end with an ellipsis
6. >= 80% of words contain at least one alphabetic character
7. at least 2 distinct stop words present (configurable list)

Portability: counts are exact integers; every ratio divides two exact
integers once (correctly rounded identically on both engines) and is
rounded to 6 digits. Token folds use the shared whitespace
tokenization; the ``...`` count uses replace-length arithmetic (no
regex-overlap ambiguity); line-grain rules split on ``\\n`` only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.functions.text import tokens_col
from spark_kinesis_article_analysis_spark.registry import register

#: The stop list is a pipeline configurable (Gopher's own — the, be,
#: to, of, and, that, have, with — is English-prose-specific); this
#: deployment's list keeps Gopher's head and adds the two function
#: words the synthetic fixture actually contains ("the", "a"), so the
#: >= 2-distinct-hits rule discriminates on this corpus instead of
#: failing everything vacuously.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "a", "be", "to", "of", "and", "that", "have",
)

_TOK_SQL = "string_split_regex(text, '[ \\t\\n\\x0b\\f\\r]+')"
_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

#: the rule list ONCE, in terms of the sig CTE's columns — reused by the
#: pass-flag expression (batch oracle) and the WHERE clause (streaming
#: gate oracle), so a threshold retune cannot leave a frozen copy behind
_RULES_SQL = """n_words BETWEEN 50 AND 100000
        AND word_chars / greatest(n_words, 1) BETWEEN 3 AND 10
        AND n_symbols / CAST(greatest(n_words, 1) AS DOUBLE) <= 0.1
        AND n_bullet_lines / CAST(n_lines AS DOUBLE) <= 0.9
        AND n_ellipsis_lines / CAST(n_lines AS DOUBLE) <= 0.3
        AND n_alpha_words / CAST(greatest(n_words, 1) AS DOUBLE) >= 0.8
        AND n_stop_hits >= 2"""


def gopher_oracle_sql(passing_only: bool = False) -> str:
    """The gate's DuckDB oracle, built from the module's own fragments
    (tokenizer regex, stop list, rule thresholds) so every consumer —
    the batch spec here, the streaming gate spec
    (streaming/gate_stream.py) — shares ONE source of truth. With
    ``passing_only`` the pass flag becomes a constant TRUE column and
    the rules move to WHERE (the survivors-only stream shape)."""
    pass_col = (
        "TRUE AS gopher_pass"
        if passing_only
        else f"({_RULES_SQL})                              AS gopher_pass"
    )
    where = f"\nWHERE {_RULES_SQL}" if passing_only else ""
    return f"""
WITH sig AS (
    SELECT doc_id,
           CAST(len({_TOK_SQL}) AS BIGINT) AS n_words,
           CAST(list_sum(list_prepend(0, list_transform({_TOK_SQL}, t -> length(t))))
                AS BIGINT) AS word_chars,
           CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
               + CAST((length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT)
               AS n_symbols,
           CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
           CAST(len(list_filter(string_split(text, chr(10)),
                                l -> starts_with(l, '- ') OR starts_with(l, '* ')))
                AS BIGINT) AS n_bullet_lines,
           CAST(len(list_filter(string_split(text, chr(10)),
                                l -> ends_with(l, '...'))) AS BIGINT) AS n_ellipsis_lines,
           CAST(len(list_filter({_TOK_SQL}, t -> regexp_matches(t, '[A-Za-z]')))
                AS BIGINT) AS n_alpha_words,
           CAST(len(list_intersect(list_distinct({_TOK_SQL}), [{_STOP_SQL}]))
                AS BIGINT) AS n_stop_hits
    FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
)
SELECT doc_id, n_words,
       round(word_chars / greatest(n_words, 1), 6)        AS mean_word_len,
       round(n_symbols / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS symbol_ratio,
       round(n_bullet_lines / CAST(n_lines AS DOUBLE), 6) AS bullet_line_ratio,
       round(n_ellipsis_lines / CAST(n_lines AS DOUBLE), 6) AS ellipsis_line_ratio,
       round(n_alpha_words / CAST(greatest(n_words, 1) AS DOUBLE), 6) AS alpha_word_ratio,
       n_stop_hits,
       {pass_col}
FROM sig{where}
"""


@register(
    "quality_gopher_gate",
    oracle=gopher_oracle_sql(),
    tags=("quality", "gopher", "gate", "north-star"),
    doc=(
        "The published Gopher quality rule set (Rae et al. 2021 App. A) "
        "as one auditable gate: word-count bounds, mean word length 3-10, "
        "#/ellipsis symbol ratio <= 0.1, bullet-line <= 90%, "
        "ellipsis-line <= 30%, >= 80% alphabetic words, >= 2 distinct "
        "stop words (configurable list) — every signal emitted with the pass "
        "flag. Pure per-document expressions (token folds, line splits, "
        "set intersection): map-only, zero shuffles at any corpus size."
    ),
)
def quality_gopher_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load(spark, sf_dir, "documents")
        .where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        .select("doc_id", "text", tokens_col().alias("toks"))
    )
    return gopher_signals(d)


def gopher_signals(d: DataFrame) -> DataFrame:
    """The gate as a TRANSFORM on any (doc_id, text, toks) frame —
    shared by the batch spec above and the streaming quality gate
    (streaming/gate_stream.py): pure per-row expressions, so the exact
    same plan fragment is legal in a micro-batch (no aggregation, no
    window — nothing the streaming planner rejects)."""
    stop = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    lines = F.split("text", "\n", -1)
    sig = d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_words"),
        F.aggregate(
            F.transform("toks", lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        )
        .cast("long")
        .alias("word_chars"),
        (
            (F.length("text") - F.length(F.replace("text", F.lit("#"), F.lit("")))).cast(
                "long"
            )
            + F.floor(
                (
                    F.length("text")
                    - F.length(F.replace("text", F.lit("..."), F.lit("")))
                )
                / 3
            ).cast("long")
        ).alias("n_symbols"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(
            F.filter(lines, lambda l: l.startswith("- ") | l.startswith("* "))
        )
        .cast("long")
        .alias("n_bullet_lines"),
        F.size(F.filter(lines, lambda l: l.endswith("...")))
        .cast("long")
        .alias("n_ellipsis_lines"),
        F.size(F.filter("toks", lambda t: t.rlike("[A-Za-z]")))
        .cast("long")
        .alias("n_alpha_words"),
        F.size(F.array_intersect(F.array_distinct("toks"), stop))
        .cast("long")
        .alias("n_stop_hits"),
    )
    g1 = F.greatest(F.col("n_words"), F.lit(1))
    mean_wl = F.col("word_chars") / g1
    sym = F.col("n_symbols") / g1.cast("double")
    bullet = F.col("n_bullet_lines") / F.col("n_lines").cast("double")
    ellip = F.col("n_ellipsis_lines") / F.col("n_lines").cast("double")
    alpha = F.col("n_alpha_words") / g1.cast("double")
    return sig.select(
        "doc_id",
        "n_words",
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(sym, 6).alias("symbol_ratio"),
        F.round(bullet, 6).alias("bullet_line_ratio"),
        F.round(ellip, 6).alias("ellipsis_line_ratio"),
        F.round(alpha, 6).alias("alpha_word_ratio"),
        "n_stop_hits",
        (
            F.col("n_words").between(50, 100000)
            & mean_wl.between(3, 10)
            & (sym <= 0.1)
            & (bullet <= 0.9)
            & (ellip <= 0.3)
            & (alpha >= 0.8)
            & (F.col("n_stop_hits") >= 2)
        ).alias("gopher_pass"),
    )
