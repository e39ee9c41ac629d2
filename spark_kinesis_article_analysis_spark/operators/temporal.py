"""Temporal join operators Spark has no native form of: as-of join,
interval-overlap (range) join, and time-bucket rollup with gap filling.

The reference's only temporal operator is the sliding window
(``process_articles.py:80``); these are the time-series operators a
user of that pipeline reaches for next, each re-expressed as a
composition of existing DataFrame ops (no UDFs, no iteration):

* **as-of join** — the union+window rewrite: tag both sides, union on
  the key, and carry the last build-side row forward with
  ``last(..., ignorenulls=True)`` over (key, ts, tag). ONE hash
  exchange on the key + a per-key sort, vs the O(probe x build)-per-key
  nested loop a raw ``ts <= ts`` theta-join plans as.
* **range join** — the bin-join rewrite: quantize time into bins the
  width of the interval, explode each interval onto the (exactly 2)
  bins it can touch, hash-join probe rows on their single bin, then
  apply the exact bounds as a residual predicate. Each (probe,
  interval) pair meets in exactly one bin (the probe's), so no
  dedup pass is needed.
* **gapfill** — aggregate first (bucket grain), then densify with
  ``sequence()`` per key and left-join the real buckets back; LOCF is
  ``last(value, ignorenulls=True)`` over the densified series. All
  post-aggregation work is at bucket-grain cardinality, so the
  corpus-scale cost stays the one aggregation exchange.

Oracle notes: DuckDB has a native ``ASOF LEFT JOIN`` — the oracle uses
it, so the Spark rewrite is checked against an INDEPENDENT
implementation of the semantics, not a transliteration of itself. The
range-join oracle is the plain inequality join; the gapfill oracle is
``generate_series`` + ``last_value IGNORE NULLS``. Event timestamps
are normalized with ``make_timestamp(epoch_us(ts))`` so both parquet
ts encodings (NANOS-as-long and MICROS) hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: list[str],
    probe_ts: str,
    build_ts: str,
    payload: list[str],
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_secs: float | None = None,
) -> DataFrame:
    """As-of join of two ARBITRARY relations: each probe row gains
    ``asof_ts`` (the nearest ``build_ts`` at-or-before it for
    ``direction='backward'``, at-or-after for ``'forward'``, within its
    ``on`` group) and ``asof_<c>`` for every payload column of that
    build row; NULLs when no build row qualifies (LEFT semantics).
    ``allow_exact_matches=False`` makes the bound strict (< / >);
    ``tolerance_secs`` voids matches farther than that many seconds
    (``pd.merge_asof``'s knob set). This is the general form
    ``join_asof_last_purchase`` (same-relation running max of a single
    scalar, ``operators/joins.py``) can't express: probe and build may
    have different schemas, and the whole build ROW is carried.

    Rewrite: tag both sides, union on the key, carry the last non-null
    build struct forward with ``last(..., ignorenulls=True)`` over
    (key, ts, tag) — ts descending for the forward direction, so "last
    seen" is the nearest at-or-after. Exact-match inclusion is the tag
    order: build sorts before probe at equal ts when inclusive, after
    when strict. Duplicate build rows at one (key, ts) are resolved
    inside the same sort (payload ascending, so the max-payload row is
    carried) — a dedup groupBy would add a (key, ts) exchange that
    can't be reused by the window's (key) exchange. The tolerance is a
    pure post-projection (null-out), never a join predicate. Cost: ONE
    hash exchange on the key + a per-key sort, vs the per-key nested
    loop a ``ts <= ts`` theta-join plans as. Per-key state is that
    key's row count — cap per-key history before the join for
    adversarial keys at 100 TB.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    carry = F.struct(
        F.col(build_ts).alias("__ts"), *[F.col(c).alias(c) for c in payload]
    )
    build_tag, probe_tag = (0, 1) if allow_exact_matches else (1, 0)
    # SQL join semantics: a NULL key or NULL timestamp matches NOTHING.
    # The window's partitionBy would group NULL keys together (GROUP BY
    # semantics), and a NULL build ts would sort to the head of the
    # ascending scan and become a phantom fallback match — so build rows
    # with a NULL key or ts are dropped up front (the oracle's
    # `probe_ts >= build_ts` can never accept them), while NULL-key/ts
    # probe rows flow through with NULL payloads (LEFT semantics; the
    # probe-side NULL ts is handled at the match projection below).
    build = build.na.drop(subset=[*on, build_ts])
    b = build.select(
        *on,
        F.col(build_ts).alias("__t"),
        F.lit(build_tag).alias("__tag"),
        carry.alias("__carry"),
    )
    probe_cols = probe.columns
    p = probe.select(
        *on,
        F.col(probe_ts).alias("__t"),
        F.lit(probe_tag).alias("__tag"),
        F.lit(None).cast(b.schema["__carry"].dataType).alias("__carry"),
        F.struct(*[F.col(c) for c in probe_cols]).alias("__probe"),
    )
    b = b.withColumn("__probe", F.lit(None).cast(p.schema["__probe"].dataType))
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        W.partitionBy(*on)
        .orderBy(t_order, "__tag", "__carry")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = F.last("__carry", ignorenulls=True).over(w)
    # A probe with a NULL ts satisfies no ts bound in either direction
    # (and under the forward/descending sort it would otherwise scan the
    # whole partition from the NULLS-LAST position).
    matched = F.when(F.col("__t").isNotNull(), matched)
    if tolerance_secs is not None:
        gap = F.abs(
            F.col("__t").cast("double") - matched["__ts"].cast("double")
        )
        matched = F.when(gap <= F.lit(float(tolerance_secs)), matched)
    return (
        p.unionByName(b)
        .withColumn("__last", matched)
        .filter(F.col("__tag") == probe_tag)
        .select(
            *[F.col(f"__probe.{c}").alias(c) for c in probe_cols],
            F.col("__last.__ts").alias("asof_ts"),
            *[F.col(f"__last.{c}").alias(f"asof_{c}") for c in payload],
        )
    )


@register(
    "join_asof",
    oracle="""
WITH p AS (
    SELECT event_id, user_id, ts, value
    FROM events WHERE event_type = 'purchase'
),
-- The engine rule is "a NULL timestamp satisfies no bound" (probe OR
-- build) — but DuckDB's native ASOF matches NULL-ts build rows (fuzz
-- find #16: a NULL-ts click paired with a NULL-ts purchase), so the
-- NULL-ts carve-outs are explicit: clicks drop NULL ts, NULL-ts
-- purchases bypass the ASOF and emit unmatched.
c AS (
    SELECT user_id, ts, max(value) AS click_value
    FROM events WHERE event_type = 'click' AND ts IS NOT NULL
    GROUP BY user_id, ts
),
j AS (
    SELECT p.event_id, p.user_id, p.ts AS pts, p.value, c.ts AS cts, c.click_value
    FROM (SELECT * FROM p WHERE ts IS NOT NULL) p
    ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    UNION ALL
    SELECT event_id, user_id, ts, value,
           CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE)
    FROM p WHERE ts IS NULL
)
SELECT event_id,
       user_id,
       make_timestamp(epoch_us(pts))           AS purchase_ts,
       value                                   AS purchase_value,
       make_timestamp(epoch_us(cts))           AS click_ts,
       click_value,
       round(date_diff('microsecond', cts, pts) / 1000000.0, 6) AS wait_secs
FROM j
""",
    tags=("join", "asof", "temporal", "events"),
    doc=(
        "General as-of join (see asof_join above): every purchase paired "
        "with the same user's most recent click at-or-before it, carrying "
        "the click's payload (NULLs when none precede) — the two-relation, "
        "row-carrying form join_asof_last_purchase's running-max trick "
        "can't express. ONE hash exchange, no Join operator (pinned in "
        "test_plans). The DuckDB oracle uses its native ASOF LEFT JOIN — "
        "an independent implementation of the same semantics, with max() "
        "at duplicate (user, ts) matching the helper's payload-ascending "
        "tie-break."
    ),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    build = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    return asof_join(
        probe,
        build,
        on=["user_id"],
        probe_ts="purchase_ts",
        build_ts="ts",
        payload=["click_value"],
    ).select(
        "event_id",
        "user_id",
        "purchase_ts",
        "purchase_value",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_click_value").alias("click_value"),
        F.round(
            F.col("purchase_ts").cast("double") - F.col("asof_ts").cast("double"), 6
        ).alias("wait_secs"),
    )


@register(
    "join_range_interval",
    oracle="""
WITH c AS (
    SELECT event_id, user_id, ts
    FROM events WHERE event_type = 'click'
),
r AS (
    SELECT ts FROM events WHERE event_type = 'error'
)
SELECT c.event_id,
       c.user_id,
       make_timestamp(epoch_us(c.ts)) AS click_ts,
       count(r.ts)                    AS n_error_windows
FROM c LEFT JOIN r
  ON c.ts >= r.ts AND c.ts < r.ts + INTERVAL 10 MINUTE
GROUP BY c.event_id, c.user_id, c.ts
""",
    tags=("join", "range", "interval", "temporal", "events"),
    doc=(
        "Interval-overlap (range) join: per click, how many 10-minute "
        "error windows [error_ts, error_ts + 10 min) cover it. A raw "
        "theta-join plans as a per-partition nested loop (O(n*m)); the "
        "Spark side bin-joins instead: time quantized into bins exactly "
        "the interval width, each window exploded onto the 2 bins it can "
        "touch, clicks hash-joined on their single bin, exact bounds "
        "applied as a residual predicate. Each (click, window) pair "
        "meets in exactly one bin so the count needs no dedup; LEFT "
        "semantics keep zero-overlap clicks via count(CASE residual). "
        "Pair cardinality is (event rate x window length) per bin — "
        "inherent to the query's answer, not the algorithm. Complements "
        "join_range_binned (orders x a 12-row STATIC period dimension): "
        "here BOTH sides are corpus-derived and grow with the data, so "
        "the bin key is what keeps the join hash-planned when the "
        "interval side outgrows a broadcast."
    ),
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    width_us = 600_000_000  # 10 minutes, in microseconds
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        "ts",
        (F.unix_micros("ts") / F.lit(width_us)).cast("long").alias("__bin"),
    )
    windows = (
        ev.filter(F.col("event_type") == "error")
        .select(F.unix_micros("ts").alias("__start_us"))
        .select(
            "__start_us",
            F.explode(
                F.sequence(
                    (F.col("__start_us") / F.lit(width_us)).cast("long"),
                    (F.col("__start_us") / F.lit(width_us)).cast("long") + 1,
                )
            ).alias("__bin"),
        )
    )
    probe_us = F.unix_micros("ts")
    inside = (probe_us >= F.col("__start_us")) & (
        probe_us < F.col("__start_us") + F.lit(width_us)
    )
    return (
        clicks.join(windows, "__bin", "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count(F.when(inside, F.lit(1))).alias("n_error_windows"))
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("click_ts"),
            "n_error_windows",
        )
    )


@register(
    "time_bucket_gapfill",
    oracle="""
WITH agg AS (
    SELECT event_type,
           make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bucket,
           count(*)             AS n,
           round(sum(value), 6) AS tv
    FROM events
    GROUP BY event_type, bucket
),
bounds AS (
    SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
    FROM agg GROUP BY event_type
),
series AS (
    SELECT event_type,
           unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
    FROM bounds
)
SELECT s.event_type,
       s.bucket                 AS bucket_start,
       coalesce(a.n, 0)         AS n_events,
       coalesce(a.tv, 0.0)      AS total_value,
       (a.n IS NULL)            AS is_gap,
       last_value(a.tv IGNORE NULLS) OVER (
           PARTITION BY s.event_type ORDER BY s.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       )                        AS locf_value
-- NULL-safe key join: a NULL event_type is a legal GROUP that must
-- round-trip through densification (the Spark helper already joins
-- null-safely; USING's plain equality marked every NULL-type bucket
-- as a gap — fuzz-found)
FROM series s LEFT JOIN agg a
  ON s.event_type IS NOT DISTINCT FROM a.event_type AND s.bucket = a.bucket
""",
    tags=("time-window", "gapfill", "rollup", "temporal", "events"),
    doc=(
        "Hypertable-style rollup: 15-minute buckets per event_type, "
        "densified so every bucket between each type's first and last "
        "appears — empty buckets emit (0, 0.0, is_gap=true) — plus LOCF "
        "(last observation carried forward) over the dense series. "
        "Aggregation runs FIRST, so densification (sequence + explode + "
        "left join + window) operates at bucket-grain cardinality "
        "(days/15min x |types|), never corpus grain: the only "
        "corpus-scale exchange is the bucket groupBy's."
    ),
)
def time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    step_us = 900_000_000  # 15 minutes
    agg = (
        ev.groupBy(
            "event_type",
            F.timestamp_micros(
                (F.unix_micros("ts") / F.lit(step_us)).cast("long") * F.lit(step_us)
            ).alias("bucket"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("tv"))
    )
    return densify_locf(
        agg,
        ["event_type"],
        "bucket",
        "15 minutes",
        zero_fill={"n": 0, "tv": 0.0},
        locf_cols=["tv"],
    ).select(
        "event_type",
        F.col("bucket").alias("bucket_start"),
        F.col("n").alias("n_events"),
        F.col("tv").alias("total_value"),
        "is_gap",
        F.col("tv_locf").alias("locf_value"),
    )


@register(
    "scd2_history",
    oracle="""
WITH ordered AS (
    SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
           lag(o_orderstatus) OVER w AS prev_status
    FROM orders
    WHERE o_orderdate IS NOT NULL
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
changes AS (
    SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate
    FROM ordered
    WHERE prev_status IS NULL OR o_orderstatus <> prev_status
)
SELECT o_custkey,
       o_orderkey   AS change_orderkey,
       o_orderstatus AS status,
       o_orderdate  AS valid_from,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
       (lead(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) IS NULL) AS is_current
FROM changes
""",
    tags=("temporal", "scd2", "cdc", "history"),
    doc=(
        "SCD Type-2 history construction (the MERGE INTO / CDC pattern "
        "without a table format): a per-key change feed collapses to "
        "true status transitions (row kept only when status differs "
        "from lag(status)), then each surviving change gets "
        "[valid_from, valid_to) validity from lead() and an is_current "
        "flag on the open interval. Both windows share one (custkey) "
        "partitioning + (date, orderkey) sort, so the whole history "
        "build is ONE hash exchange + one per-key sort regardless of "
        "feed size; the deterministic orderkey tie-break makes the "
        "interval bounds reproducible under concurrent same-day changes."
    ),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A change record with no timestamp cannot be placed in a validity
    # chain — excluded on BOTH engine sides (the temporal NULL-event-time
    # rule). Without the filter the two engines even disagree on WHICH
    # rows are transitions: Spark windows sort NULLS FIRST by default,
    # DuckDB NULLS LAST, so a NULL-date row heads the Spark partition
    # (its successor keeps prev_status IS NULL) but tails DuckDB's —
    # fuzz-found on a dirty-FK graph (round 5, find #13).
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate").isNotNull())
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(
            F.col("prev_status").isNull()
            | (F.col("o_orderstatus") != F.col("prev_status"))
        )
        .drop("prev_status")
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        "o_custkey",
        F.col("o_orderkey").alias("change_orderkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
        F.lead("o_orderdate").over(w2).isNull().alias("is_current"),
    )


def interval_overlap_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str,
    start_ts: str,
    end_ts: str,
    bin_width_secs: float,
) -> DataFrame:
    """Generic interval-overlap join: every (probe row, interval row)
    pair with ``start_ts <= probe_ts < end_ts``, for ARBITRARY
    variable-length intervals — the reusable form of the fixed-width
    rewrite ``join_range_interval`` showcases. Returns the inner-joined
    pairs (all probe columns + all interval columns).

    Bin-join rewrite: each interval explodes onto every
    ``bin_width_secs``-wide time bin it touches (ceil(len/width) + 1
    rows), each probe row carries its single bin, and the join is
    bin-EQUI + exact-bounds residual — hash-planned however large both
    sides grow, where the raw theta-join is a per-partition nested
    loop. Each qualifying pair meets in exactly one bin (the probe's),
    so no dedup pass is needed. Pick ``bin_width_secs`` near the TYPICAL
    interval length: wider bins mean fewer explode rows but more
    residual misses per bin; intervals much longer than the bin width
    just contribute proportionally more bin rows (correctness is
    unaffected)."""
    width_us = int(bin_width_secs * 1_000_000)
    # An inverted interval (end <= start) contains nothing — drop it
    # BEFORE the explode: Spark's sequence(a, b) auto-selects step -1
    # when a > b, so one corrupt year-inverted row would otherwise
    # explode a bin row per bin across the whole backwards span (correct
    # after the residual filter, but a job-killing blowup first).
    intervals = intervals.filter(F.col(end_ts) > F.col(start_ts))
    start_bin = (F.unix_micros(F.col(start_ts)) / F.lit(width_us)).cast("long")
    # last bin a half-open interval can touch: floor((end-1)/w)
    end_bin = ((F.unix_micros(F.col(end_ts)) - F.lit(1)) / F.lit(width_us)).cast("long")
    # Span guard (same class as densify_locf's): ONE corrupt far-future
    # interval end explodes that row onto millions of bins — a silent
    # straggler, worse than a crash. Fail loudly with the bounds and the
    # knob; assert_true threads through the sequence's end bound so the
    # check cannot be pruned and costs no extra job.
    max_bins = 100_000
    guard = F.assert_true(
        end_bin - start_bin < F.lit(max_bins),
        F.concat_ws(
            " ",
            F.lit(f"interval_overlap_join: interval spans more than {max_bins} bins;"),
            F.lit("start="),
            F.col(start_ts).cast("string"),
            F.lit("end="),
            F.col(end_ts).cast("string"),
            F.lit(
                "— a corrupt timestamp inflates the bin explode; filter "
                "the feed or widen bin_width_secs"
            ),
        ),
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(start_bin, F.when(guard.isNull(), end_bin))),
    )
    p = probe.withColumn(
        "__bin", (F.unix_micros(F.col(probe_ts)) / F.lit(width_us)).cast("long")
    )
    inside = (F.col(probe_ts) >= F.col(start_ts)) & (F.col(probe_ts) < F.col(end_ts))
    return p.join(iv, "__bin").filter(inside).drop("__bin")


def densify_locf(
    agg: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    step: str,
    zero_fill: dict | None = None,
    locf_cols: list[str] | None = None,
    max_buckets: int = 2_000_000,
) -> DataFrame:
    """Densify a bucket-grain aggregate: emit EVERY ``step``-spaced
    bucket between each key's first and last observed bucket, zero-fill
    the listed measures, optionally carry others forward (LOCF), and
    flag synthesized rows with ``is_gap``. The reusable form of
    ``time_bucket_gapfill``'s densification stage.

    Operates strictly at bucket-grain cardinality — call it ON an
    aggregate, never on raw rows: the sequence/explode/left-join/window
    all scale with (time span / step) x |keys|, so the corpus-scale
    cost stays whatever aggregation produced ``agg``. ``is_gap`` comes
    from an explicit presence marker, not measure NULL-ness, so an
    observed bucket whose measure is legitimately NULL (the exact case
    LOCF exists for) is never mislabeled as synthesized; NULL key
    groups round-trip via a null-safe join (their observed values are
    kept, matching the GROUP BY that produced them)."""
    import functools

    zero_fill = zero_fill or {}
    locf_cols = locf_cols or []
    if not zero_fill and not locf_cols:
        raise ValueError("densify_locf needs at least one zero_fill or locf column")
    marked = agg.withColumn("__present", F.lit(True))
    # Span guard: ONE corrupt far-future/past timestamp inflates a key's
    # [lo, hi] range until the per-key sequence is no longer bucket-grain
    # (a year-9999 event -> ~281M 15-min buckets) and the job dies inside
    # sequence() with an anonymous UnsupportedOperationException. Fail
    # loudly and name the key/span/knob instead. assert_true is threaded
    # through the sequence's hi bound (when(guard.isNull(), hi)) so
    # column pruning cannot optimize the check away; it costs nothing —
    # it runs where the bounds are already computed, no extra job.
    step_us = F.expr(f"unix_micros(timestamp_micros(0) + INTERVAL {step})")
    n_buckets = (F.unix_micros(F.col("__hi")) - F.unix_micros(F.col("__lo"))) / step_us
    guard = F.assert_true(
        n_buckets < F.lit(max_buckets),
        F.concat_ws(
            " ",
            F.lit(f"densify_locf: series span exceeds max_buckets={max_buckets};"),
            F.lit("key="),
            *[F.col(k).cast("string") for k in key_cols],
            F.lit("lo="),
            F.col("__lo").cast("string"),
            F.lit("hi="),
            F.col("__hi").cast("string"),
            F.lit(
                "— a corrupt timestamp inflates the densification range; "
                "filter the feed or raise max_buckets"
            ),
        ),
    )
    series = (
        agg.groupBy(*key_cols)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(
                    "__lo",
                    F.when(guard.isNull(), F.col("__hi")),
                    F.expr(f"INTERVAL {step}"),
                )
            ).alias(bucket_col),
        )
        .alias("s")
    )
    a = marked.alias("a")
    cond = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"s.{k}").eqNullSafe(F.col(f"a.{k}")) for k in key_cols]
        + [F.col(f"s.{bucket_col}") == F.col(f"a.{bucket_col}")],
    )
    measures = [c for c in agg.columns if c not in (*key_cols, bucket_col)]
    out = series.join(a, cond, "left").select(
        *[F.col(f"s.{k}") for k in key_cols],
        F.col(f"s.{bucket_col}").alias(bucket_col),
        *[F.col(f"a.{c}") for c in measures],
        F.col("a.__present").isNull().alias("is_gap"),
    )
    w = (
        W.partitionBy(*key_cols)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for c in locf_cols:
        out = out.withColumn(f"{c}_locf", F.last(c, ignorenulls=True).over(w))
    for c, default in zero_fill.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(default)))
    return out
