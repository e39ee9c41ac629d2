"""Time-series downsampling: OHLC resampling of the events stream.

The classic tick -> bar operator (open/high/low/close + volume per
bucket), expressed as ONE hash aggregation: open/close are struct-
min/max selections over the total order (ts, event_id, value) — no
first()/last() (order-nondeterministic under shuffle) and no per-bucket
sort. At 100 TB this is the same single exchange on (bucket, series)
with map-side partials as any grouped agg; the struct min/max partials
combine associatively, so skewed buckets still stream through combiners.

Row discipline (mirrored exactly in the oracle): NULL ts has no bucket,
NULL value has no place in a price bar, NULL event_id would break the
deterministic (ts, event_id, value) tie order, and a NULL series key is
not a series (fuzz find #27: Spark's groupBy keeps a NULL event_type
group that the oracle's equi-join on the series key silently drops) —
all four are excluded up front (the scd2_history / funnel precedent for
key- and order-sensitive operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


@register(
    "ts_resample_ohlc",
    oracle="""
WITH b AS (
    SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket_start,
           event_type, ts, event_id, value
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND event_id IS NOT NULL
      AND event_type IS NOT NULL
),
o AS (
    SELECT bucket_start, event_type, value AS open, ts AS open_ts FROM (
        SELECT *, row_number() OVER (PARTITION BY bucket_start, event_type
                                     ORDER BY ts ASC, event_id ASC, value ASC) AS rn
        FROM b
    ) WHERE rn = 1
),
c AS (
    SELECT bucket_start, event_type, value AS close FROM (
        SELECT *, row_number() OVER (PARTITION BY bucket_start, event_type
                                     ORDER BY ts DESC, event_id DESC, value DESC) AS rn
        FROM b
    ) WHERE rn = 1
)
SELECT b.bucket_start, b.event_type,
       o.open,
       round(max(b.value), 6) AS high,
       round(min(b.value), 6) AS low,
       c.close,
       count(*) AS n_ticks,
       round(sum(b.value), 6) AS volume
FROM b
JOIN o USING (bucket_start, event_type)
JOIN c USING (bucket_start, event_type)
GROUP BY b.bucket_start, b.event_type, o.open, c.close
""",
    tags=("time-window", "resample", "ohlc"),
    doc=(
        "15-minute OHLC bars per event_type: open/close picked by "
        "struct-min/max over (ts, event_id, value) — a deterministic "
        "total order, so the bar is engine- and partitioning-independent "
        "— high/low/volume as rounded min/max/sum, all in ONE grouped "
        "aggregation (the oracle's window form is the SQL spelling of "
        "the same selection). high/low/volume round to 6; open/close are "
        "untouched selections, exact by construction."
    ),
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
    )
    bars = (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.min(F.struct("ts", "event_id", "value"))["value"].alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.max(F.struct("ts", "event_id", "value"))["value"].alias("close"),
            F.count("*").alias("n_ticks"),
            F.round(F.sum("value"), 6).alias("volume"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_ticks",
            "volume",
        )
    )
    return bars
