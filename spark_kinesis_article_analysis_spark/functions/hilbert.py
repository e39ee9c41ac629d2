"""Hilbert-curve layout clustering — the locality-stronger sibling of
``layout_zorder_cluster``.

Z-order (Morton) interleaving is cheap but has seams: consecutive
z-values can jump across the whole key space (the bit-carry from
0b0111.. to 0b1000..), so a range of curve positions maps to data pages
whose (x, y) extents include far-apart points. The Hilbert curve fixes
exactly that: CONSECUTIVE CURVE POSITIONS ARE ALWAYS SPATIALLY ADJACENT
(one step in x or y — asserted exhaustively in tests/test_hilbert.py),
which is why layout engines that let you choose (e.g. columnar table
formats' clustering options) offer Hilbert where range-scan locality
matters most.

Implementation discipline: the classic xy2d bit loop (rotate/flip per
level) is re-expressed as ONE pure-arithmetic fold shared between
engines — state (d, x, y) packs into a single BIGINT
(d * 65536 + x * 256 + y), each level updates it with only
integer */%//+- and the XOR of the quadrant table computed
arithmetically (``(3*rx) XOR ry`` == ``rx*(3-ry) + (1-rx)*ry`` for
bits), so Spark's ``aggregate`` and DuckDB's ``list_reduce`` run the
IDENTICAL formula text and the whole layout key is value-hash
verified — the same portability treatment the z-order op got, extended
to a stateful per-level recurrence.

Scale shape: identical to z-order — a 1-row domain-stats aggregate
broadcast to the scan, then the key is a pure map expression; the only
corpus-grain exchange is the final bucket aggregation. Writers order by
``hilbert_d`` with a range-partitioned write for zone-map pruning.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.functions.scale_ops import (
    _MIN_DUCK,
    _MIN_SPARK,
    _quant,
)
from spark_kinesis_article_analysis_spark.registry import register

HILBERT_BITS = 8  # 8 bits per dimension -> 16-bit curve position


def _hilbert_step(acc: str, s: str, divop: str) -> str:
    """One level of the xy2d recurrence on the packed state ``acc``
    (d*65536 + x*256 + y) at level size ``s`` — pure integer
    arithmetic, identical text for both engines modulo ``divop``.

    Pack-safety (found by the exhaustive test): the CLASSIC loop's flip
    ``x = s-1-x`` goes NEGATIVE when bit s is set (x >= s), which is
    harmless with arbitrary integers (only low bits are ever read
    again) but corrupts a fixed-field packing (a -1 y borrows from the
    x field). Equivalent masked form: work on the LOW parts
    ``xl = x % s`` / ``yl = y % s`` — the flip becomes ``s-1-xl``,
    always in [0, s), because (s-1-x) mod s == s-1-(x mod s). The
    invariant x, y < 2s holds entering every level (initial 255 < 256;
    each step emits values < s = next level's 2s')."""
    x = f"(({acc} {divop} 256) % 256)"
    y = f"({acc} % 256)"
    d = f"({acc} {divop} 65536)"
    rx = f"(({x} {divop} {s}) % 2)"
    ry = f"(({y} {divop} {s}) % 2)"
    xl = f"({x} % {s})"
    yl = f"({y} % {s})"
    # (3*rx) XOR ry for bit inputs, arithmetically
    q = f"({rx} * (3 - {ry}) + (1 - {rx}) * {ry})"
    nd = f"({d} + {s} * {s} * {q})"
    # rotate: if ry == 0 then (flip low parts if rx) and swap, else keep
    nx = f"({ry} * {xl} + (1 - {ry}) * ({rx} * ({s} - 1 - {yl}) + (1 - {rx}) * {yl}))"
    ny = f"({ry} * {yl} + (1 - {ry}) * ({rx} * ({s} - 1 - {xl}) + (1 - {rx}) * {xl}))"
    return f"({nd} * 65536 + {nx} * 256 + {ny})"


_LEVELS = [2 ** i for i in range(HILBERT_BITS - 1, -1, -1)]  # 128 .. 1


def hilbert_d_spark(x: str, y: str) -> str:
    """Spark SQL expression: Hilbert curve position of quantized
    ``(x, y)`` (each in [0, 255]) — an 8-level aggregate fold over the
    packed BIGINT state."""
    levels = ", ".join(f"{s}L" for s in _LEVELS)
    step = _hilbert_step("acc", "s", "div")
    return (
        f"aggregate(array({levels}), cast({x} as bigint) * 256 + cast({y} as bigint), "
        f"(acc, s) -> {step}) div 65536"
    )


def hilbert_d_duck(x: str, y: str) -> str:
    """DuckDB twin: list_reduce over the prepended initial state."""
    levels = ", ".join(str(s) for s in _LEVELS)
    step = _hilbert_step("acc", "s", "//")
    return (
        f"list_reduce(list_prepend(CAST({x} AS BIGINT) * 256 + CAST({y} AS BIGINT), "
        f"[{levels}]::BIGINT[]), (acc, s) -> {step}) // 65536"
    )


@functools.lru_cache(maxsize=1)
def hilbert_lut_bytes() -> bytes:
    """The full curve as a 128 KB lookup table: byte pair ``2*(x*256+y)``
    (big-endian uint16) holds the Hilbert position of cell ``(x, y)``.

    Same packed-state recurrence as :func:`hilbert_d_spark`, evaluated
    over the whole 256x256 domain in vectorized int64 numpy (exact
    integer arithmetic — asserted equal to the classic xy2d bit loop,
    exhaustively, in tests/test_hilbert.py). Pure function of the
    module constants — no data dependence, so memoized (r12 ADVICE):
    one shared bytes object serves every plan build, test, and repeated
    build in a session instead of a fresh ~2 ms numpy rebuild per call
    (the ``similarity._plane_weights`` precedent, now cached).

    Why a table at all: Catalyst evaluates higher-order folds
    interpreted (CodegenFallback), and the 8-level step expression is
    ~60 integer ops with heavy subtree re-evaluation — measured
    ~14 us/row at sf0.1, the dominant cost of layout_hilbert_cluster.
    The curve has only 65,536 cells, so the key becomes one codegen'd
    byte-pair probe into a literal (guide §1.2: fix the per-row work
    once the shape is right; the plan shape — stats broadcast, map-side
    key, one bucket exchange — is unchanged)."""
    import numpy as np

    acc = np.arange(256 * 256, dtype=np.int64)  # x*256+y IS the packed init
    for s in _LEVELS:
        x = (acc // 256) % 256
        y = acc % 256
        d = acc // 65536
        rx = (x // s) % 2
        ry = (y // s) % 2
        xl = x % s
        yl = y % s
        q = rx * (3 - ry) + (1 - rx) * ry
        nx = ry * xl + (1 - ry) * (rx * (s - 1 - yl) + (1 - rx) * yl)
        ny = ry * yl + (1 - ry) * (rx * (s - 1 - xl) + (1 - rx) * xl)
        acc = (d + s * s * q) * 65536 + nx * 256 + ny
    return (acc // 65536).astype(">u2").tobytes()


def hilbert_d_lookup(hkey) -> "F.Column":
    """Hilbert position of packed key ``hx*256 + hy`` via the byte-pair
    probe into the :func:`hilbert_lut_bytes` literal — value-identical
    to the fold (NULL key -> NULL position, like the fold's NULL init)."""
    pair = F.substring(F.lit(hilbert_lut_bytes()), hkey * 2 + 1, F.lit(2))
    return F.conv(F.hex(pair), 16, 10).cast("long")


@register(
    "layout_hilbert_cluster",
    oracle=f"""
WITH s AS (
    SELECT min(user_id) AS ulo, max(user_id) AS uhi,
           min({_MIN_DUCK}) AS tlo, max({_MIN_DUCK}) AS thi
    FROM events WHERE ts IS NOT NULL
),
keyed AS (
    SELECT event_id,
           {_quant("user_id", "ulo", "uhi", "//")} AS hx,
           {_quant(_MIN_DUCK, "tlo", "thi", "//")} AS hy
    FROM events, s
    WHERE ts IS NOT NULL
)
SELECT hbucket, CAST(count(*) AS BIGINT) AS n_events,
       min(event_id) AS min_event_id, max(event_id) AS max_event_id
FROM (SELECT event_id, ({hilbert_d_duck("hx", "hy")}) // 64 AS hbucket FROM keyed)
GROUP BY hbucket
""",
    tags=("layout", "hilbert", "scale", "north-star"),
    doc=(
        "Hilbert-curve clustering key over (user_id, event minute): the "
        "same 256-cell equi-width quantization as layout_zorder_cluster, "
        "but the curve position comes from the xy2d rotate/flip "
        "recurrence — consecutive positions are always spatially "
        "adjacent (no Morton seams), the property that makes Hilbert "
        "the stronger range-scan layout. The 8-level recurrence runs as "
        "one packed-BIGINT arithmetic fold shared verbatim by both "
        "engines; stats broadcast, key map-side, one bucket exchange."
    ),
)
def layout_hilbert_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    stats = e.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.expr(f"min({_MIN_SPARK})").alias("tlo"),
        F.expr(f"max({_MIN_SPARK})").alias("thi"),
    )
    keyed = e.join(F.broadcast(stats)).select(
        "event_id",
        F.expr(_quant("user_id", "ulo", "uhi", "div")).alias("hx"),
        F.expr(_quant(_MIN_SPARK, "tlo", "thi", "div")).alias("hy"),
    )
    # r12 optimization: the interpreted 8-level fold (hilbert_d_spark)
    # becomes one codegen'd probe into the 128 KB curve table — same
    # values (tests/test_hilbert.py proves table == fold == bit loop
    # exhaustively), same plan shape, ~60 interpreted ops/row removed.
    hkey = F.expr("cast(hx as bigint) * 256 + cast(hy as bigint)")
    return (
        keyed.select("event_id", hilbert_d_lookup(hkey).alias("hd"))
        .select("event_id", F.expr("hd div 64").alias("hbucket"))
        .groupBy("hbucket")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )
