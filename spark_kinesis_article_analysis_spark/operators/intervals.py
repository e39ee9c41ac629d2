"""Interval algebra over event-derived time ranges: coalescing
(merge-overlapping) and sweep-line overlap depth.

The reference's only temporal grouping is the fixed sliding window
(``process_articles.py:78-80``); real event pipelines also need the
*data-dependent* interval forms — merge a user's overlapping activity
ranges into visits (the "gaps and islands" problem), and measure peak
concurrency. Neither is a built-in in Spark or DuckDB, and both have
canonical window-function rewrites that stay entirely inside Catalyst:

* **Coalesce**: a row starts a new island iff its start exceeds the
  running ``max(end)`` of every earlier row in its partition (ROWS
  UNBOUNDED PRECEDING .. 1 PRECEDING); a running sum of those flags
  numbers the islands; a per-island aggregate merges them. Two window
  passes + one hash aggregate, all partitioned by the entity key — ONE
  shuffle at 100 TB, sorted externally per partition (no per-key
  materialization).
* **Overlap depth**: the classic sweep — every interval contributes a
  ``+1`` endpoint at start and ``-1`` at end, a running sum over the
  (pos, delta) order is the live-interval count, and its per-key max is
  the peak concurrency. Half-open ``[start, end)`` semantics: at equal
  positions the ``-1`` sorts first, so touching intervals never count
  as concurrent.

Portability notes (the oracle must hash-match): interval bounds are
exact BIGINT epoch-microseconds (Spark ``unix_micros`` == DuckDB
``epoch_us``; no float, no second-grain division with its pre-1970
truncate-vs-floor trap), the synthetic duration uses ``abs(x % k)``
(both engines keep the dividend's sign, abs makes it moot), and every
window carries a full deterministic tiebreak so running aggregates see
the identical row order on both engines. NULL ts/user/event rows are
excluded on both sides (the NULL-ts window rule — an interval without a
position or an owner merges with nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register

#: Synthetic per-event duration: (abs(event_id % 600) + 1) minutes, in
#: microseconds — up to 10 h, the same order as the corpus's per-user
#: inter-event gap (~11 h), so islands genuinely merge and depths exceed
#: 1. Integer arithmetic end to end, identical on both engines; +1
#: keeps every interval non-degenerate.
DUR_US = "(abs(event_id % 600) + 1) * 60 * 1000000"

#: Shared derivation: one interval row per usable event.
_INTERVALS_SQL = f"""
SELECT user_id, event_id,
       epoch_us(ts)            AS start_us,
       epoch_us(ts) + {DUR_US} AS end_us
FROM events
WHERE ts IS NOT NULL AND user_id IS NOT NULL AND event_id IS NOT NULL
"""


def _intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.where(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("start_us"),
            (F.unix_micros("ts") + F.expr(DUR_US)).alias("end_us"),
        )
    )


@register(
    "interval_coalesce",
    oracle=f"""
WITH iv AS ({_INTERVALS_SQL}),
flagged AS (
    SELECT user_id, start_us, end_us,
           CASE WHEN start_us > coalesce(max(end_us) OVER (
                    PARTITION BY user_id
                    ORDER BY start_us, end_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    start_us - 1)
                THEN 1 ELSE 0 END AS new_island
    FROM iv
),
islands AS (
    SELECT user_id, start_us, end_us,
           sum(new_island) OVER (
               PARTITION BY user_id
               ORDER BY start_us, end_us, new_island DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM flagged
),
merged AS (
    SELECT user_id, island,
           min(start_us)          AS merged_start_us,
           max(end_us)            AS merged_end_us,
           CAST(count(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, island
)
SELECT user_id, merged_start_us, merged_end_us, n_events,
       lead(merged_start_us) OVER (
           PARTITION BY user_id ORDER BY merged_start_us) - merged_end_us
           AS gap_to_next_us
FROM merged
""",
    tags=("interval", "coalesce", "gaps-islands", "temporal"),
    doc=(
        "Merge each user's overlapping [start, end) activity intervals into "
        "maximal islands (running-max flag + running-sum numbering, the "
        "canonical two-window rewrite), emitting per island its merged "
        "bounds, the member count, and the gap to the user's next island "
        "(NULL for the last). Bounds are exact epoch-microsecond BIGINTs; "
        "one user-keyed shuffle total, window sorts run externally per "
        "partition at scale."
    ),
)
def interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    order = [F.col("start_us").asc(), F.col("end_us").asc(), F.col("event_id").asc()]
    w_prev = (
        W.partitionBy("user_id").orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "start_us",
        "end_us",
        F.when(
            F.col("start_us")
            > F.coalesce(F.max("end_us").over(w_prev), F.col("start_us") - 1),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    # Island numbering re-sorts on (start, end, flag DESC): the flag
    # itself is a deterministic function of the (start, end, event_id)
    # order above, and island ids only need to be CONSISTENT per island,
    # so dropping event_id from the key keeps the second window
    # independent of it (ties inside an island share the island number
    # wherever the sort puts them). flag DESC pins the boundary row of
    # an island ahead of its same-(start,end) followers on both engines.
    w_isl = (
        W.partitionBy("user_id")
        .orderBy(F.col("start_us").asc(), F.col("end_us").asc(), F.col("new_island").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    islands = flagged.withColumn("island", F.sum("new_island").over(w_isl))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("start_us").alias("merged_start_us"),
        F.max("end_us").alias("merged_end_us"),
        F.count("*").alias("n_events"),
    )
    w_next = W.partitionBy("user_id").orderBy("merged_start_us")
    return merged.select(
        "user_id",
        "merged_start_us",
        "merged_end_us",
        "n_events",
        (F.lead("merged_start_us").over(w_next) - F.col("merged_end_us")).alias(
            "gap_to_next_us"
        ),
    )


@register(
    "interval_overlap_depth",
    oracle=f"""
WITH iv AS ({_INTERVALS_SQL}),
endpoints AS (
    SELECT user_id, start_us AS pos, 1  AS delta, event_id FROM iv
    UNION ALL
    SELECT user_id, end_us   AS pos, -1 AS delta, event_id FROM iv
),
swept AS (
    SELECT user_id,
           sum(delta) OVER (
               PARTITION BY user_id
               ORDER BY pos, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
    FROM endpoints
)
SELECT user_id,
       CAST(max(live) AS BIGINT)      AS max_depth,
       CAST(count(*) / 2 AS BIGINT)   AS n_intervals
FROM swept GROUP BY user_id
""",
    tags=("interval", "sweep-line", "overlap", "temporal"),
    doc=(
        "Peak concurrent-interval depth per user by the sweep-line rewrite: "
        "each interval emits +1 at start and -1 at end, the running sum over "
        "(pos, delta, event_id) order is the live count, and its max is the "
        "answer. delta sorts -1 before +1 at equal positions, so half-open "
        "[start, end) adjacency never counts as overlap — consistent with "
        "interval_coalesce merging exactly those touching intervals. One "
        "user-keyed shuffle over 2x the interval rows."
    ),
)
def interval_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _intervals(spark, sf_dir)
    endpoints = iv.select(
        "user_id",
        "event_id",
        F.explode(
            F.array(
                F.struct(F.col("start_us").alias("pos"), F.lit(1).alias("delta")),
                F.struct(F.col("end_us").alias("pos"), F.lit(-1).alias("delta")),
            )
        ).alias("ep"),
    ).select("user_id", "event_id", F.col("ep.pos").alias("pos"), F.col("ep.delta").alias("delta"))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("pos").asc(), F.col("delta").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    swept = endpoints.withColumn("live", F.sum("delta").over(w))
    return swept.groupBy("user_id").agg(
        F.max("live").cast("long").alias("max_depth"),
        (F.count("*") / 2).cast("long").alias("n_intervals"),
    )
