"""Hilbert layout key: the packed-BIGINT arithmetic fold must equal the
classic xy2d bit loop EXHAUSTIVELY, and the curve must have the
property the operator exists for — consecutive positions are spatially
adjacent (the locality guarantee Z-order lacks)."""

from __future__ import annotations

import pytest


def _xy2d(n: int, x: int, y: int) -> int:
    """Reference: the classic Hilbert xy2d bit loop (Wikipedia form)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


@pytest.mark.parity
class TestHilbert:
    def test_fold_matches_reference_exhaustively(self, spark):
        """Every (x, y) in the full 256x256 domain: the arithmetic fold
        == the bit-loop reference. 65,536 cells — exhaustive, not
        sampled, so a wrong rotation at ANY level cannot hide."""
        from pyspark.sql import functions as F

        from spark_kinesis_article_analysis_spark.functions.hilbert import (
            hilbert_d_spark,
        )

        grid = spark.range(256 * 256).select(
            (F.col("id") % 256).cast("int").alias("hx"),
            (F.col("id") / 256).cast("int").alias("hy"),
        )
        got = {
            (r.hx, r.hy): r.d
            for r in grid.select(
                "hx", "hy", F.expr(hilbert_d_spark("hx", "hy")).alias("d")
            ).collect()
        }
        for (x, y), d in got.items():
            assert d == _xy2d(256, x, y), (x, y, d)

    def test_consecutive_positions_are_adjacent(self):
        """The Hilbert property: |curve(i+1) - curve(i)| is ONE step in
        (x, y) — every consecutive pair of the full 2^16-cell traversal
        has manhattan distance exactly 1. (Z-order violates this at
        every bit-carry seam — that is the documented reason this
        operator exists next to layout_zorder_cluster.)"""
        pos = {}
        for x in range(256):
            for y in range(256):
                pos[_xy2d(256, x, y)] = (x, y)
        assert len(pos) == 256 * 256  # bijection
        for d in range(256 * 256 - 1):
            (x1, y1), (x2, y2) = pos[d], pos[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, pos[d], pos[d + 1])

    def test_lookup_table_matches_reference_exhaustively(self):
        """The r12 byte-pair lookup table (the optimized query path)
        holds the bit-loop position for EVERY cell — table[2k:2k+2]
        big-endian == xy2d(x, y) for all 65,536 (x, y)."""
        from spark_kinesis_article_analysis_spark.functions.hilbert import (
            hilbert_lut_bytes,
        )

        lut = hilbert_lut_bytes()
        assert len(lut) == 2 * 256 * 256
        for x in range(256):
            for y in range(256):
                k = x * 256 + y
                got = int.from_bytes(lut[2 * k : 2 * k + 2], "big")
                assert got == _xy2d(256, x, y), (x, y, got)

    def test_lookup_column_matches_fold_column(self, spark):
        """The probe expression the query uses == the interpreted fold
        it replaced, over the full domain plus a NULL key (NULL in ->
        NULL out, the fold's NULL-init behavior)."""
        from pyspark.sql import functions as F

        from spark_kinesis_article_analysis_spark.functions.hilbert import (
            hilbert_d_lookup,
            hilbert_d_spark,
        )

        grid = spark.range(256 * 256).select(
            F.col("id").alias("hkey"),  # the packed key IS hx*256 + hy
            (F.col("id") / 256).cast("long").alias("hx"),
            (F.col("id") % 256).alias("hy"),
        ).union(
            spark.range(1).select(
                F.lit(None).cast("long").alias("hkey"),
                F.lit(None).cast("long").alias("hx"),
                F.lit(None).cast("long").alias("hy"),
            )
        )
        n_bad = grid.select(
            F.expr(hilbert_d_spark("hx", "hy")).alias("fold"),
            hilbert_d_lookup(F.col("hkey")).alias("probe"),
        ).filter("fold IS DISTINCT FROM probe").count()
        assert n_bad == 0

    def test_duckdb_twin_matches_spark_fold(self):
        """The oracle-side list_reduce runs the same formula: spot-grid
        agreement with the Python reference directly in DuckDB."""
        import duckdb

        from spark_kinesis_article_analysis_spark.functions.hilbert import (
            hilbert_d_duck,
        )

        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT hx, hy, {hilbert_d_duck("hx", "hy")} AS d
            FROM (SELECT (i % 256)::BIGINT AS hx, (i // 256)::BIGINT AS hy
                  FROM generate_series(0, 65535) AS t(i))
            """
        ).fetchall()
        assert len(rows) == 65536
        for x, y, d in rows:
            assert d == _xy2d(256, x, y), (x, y, d)
