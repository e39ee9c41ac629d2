"""Event-time windows in batch-testable form: tumbling, sliding, session.

The reference uses exactly one of these (sliding 5 min/1 min,
``process_articles.py:80``); tumbling and session windows complete the
family. The same ``F.window`` / ``F.session_window`` calls run unchanged
under Structured Streaming (``streaming/pipeline.py``) — batch execution
here is what makes them oracle-checkable.

Oracle notes: Spark's window assignment is epoch-aligned
(floor(epoch/slide)); the DuckDB SQL reproduces it with integer epoch
arithmetic. Session windows are reproduced with the classic
gaps-and-islands construction (lag + cumulative session counter), which
is also exactly how you'd compute them in a batch engine without a
native session operator.

Scale notes: tumbling/sliding plan as a single hash exchange on
(window, key) with map-side partial aggregation. Session windows in
batch need the per-key sort (one shuffle + sort); in streaming Spark
keeps per-key state instead — both bounded by key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "time_window_tumbling",
    oracle="""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       time_bucket(INTERVAL '5 minutes', ts) + INTERVAL 5 MINUTE AS window_end,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY window_start, window_end, event_type
-- time_bucket, NOT (epoch_us // N) * N: DuckDB's integer // truncates
-- toward zero, so a pre-1970 (negative-epoch) event rounded UP into the
-- wrong bucket while Spark's window() floors (fuzz-found on an
-- epoch-straddling fixture); time_bucket floors and its default origin
-- (2000-01-03, epoch-multiple of every bucket width used here) keeps
-- the epoch alignment window() uses
""",
    tags=("time-window", "tumbling", "G2"),
    doc="5-minute tumbling window x event_type: count + sum.",
)
def time_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "time_window_sliding",
    oracle="""
WITH base AS (
    SELECT user_id, value,
           time_bucket(INTERVAL '5 minutes', ts) AS fl  -- floors pre-1970 (// truncates)
    FROM events
)
SELECT ws AS window_start,
       ws + INTERVAL 10 MINUTE AS window_end,
       user_id,
       round(avg(value), 6) AS avg_value
FROM base,
     LATERAL unnest(generate_series(fl - INTERVAL 5 MINUTE, fl, INTERVAL 5 MINUTE)) AS t(ws)
GROUP BY ws, user_id
""",
    tags=("time-window", "sliding", "G2"),
    doc="10-minute window sliding every 5 minutes x user: avg(value); each row in 2 windows.",
)
def time_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"), "user_id")
        .agg(F.round(F.avg("value"), 6).alias("avg_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "user_id",
            "avg_value",
        )
    )


@register(
    "time_window_session",
    oracle="""
WITH marked AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     > INTERVAL 30 MINUTE
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WHERE ts IS NOT NULL
),
sessions AS (
    SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM marked
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events,
       round(sum(value), 6) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
    tags=("time-window", "session"),
    doc=(
        "session_window(ts, '30 minutes') per user: Spark's native session operator; "
        "oracle reproduces it with the gaps-and-islands construction."
    ),
)
def time_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "time_window_json_events",
    oracle="""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,  -- floors pre-1970 (// truncates)
       event_type,
       round(avg(CASE WHEN json_valid(props)
                       AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                      THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                 END), 6) AS avg_k,
       count(*) AS n
FROM events
WHERE ts IS NOT NULL
GROUP BY window_start, event_type
""",
    tags=("time-window", "json", "P2"),
    doc=(
        "The reference's parse-then-window shape on the events table: JSON payload "
        "field (from_json on props) aggregated per hourly tumbling window x type. "
        "Oracle guards the extraction with json_valid/TRY_CAST so a malformed "
        "payload drops out of the avg exactly like Spark's PERMISSIVE from_json "
        "NULL — the window row itself survives (count(*) still includes it)."
    ),
)
def time_window_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        ev.withColumn("k", k)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.round(F.avg("k"), 6).alias("avg_k"), F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "avg_k",
            "n",
        )
    )
