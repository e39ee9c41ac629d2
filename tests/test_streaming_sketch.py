"""Streaming count-min sketch (streaming/sketch_stream.py): the
streamed cell matrix must equal the batch matrix under any micro-batch
slicing (mergeability), point estimates taken from it must match the
batch spec's, and the aggregate's state must stay bounded at d x w
rows. Restart: the checkpointed matrix resumes, not recounts."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.functions.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    CMS_PROBES,
    _col_spark,
)
from spark_kinesis_article_analysis_spark.plans import inspect
from spark_kinesis_article_analysis_spark.streaming import pipeline as sp
from spark_kinesis_article_analysis_spark.streaming.sketch_stream import (
    cms_cell_updates,
    cms_stream,
)

_CORPUS = [
    (1, "alpha beta gamma alpha alpha"),
    (2, "beta beta delta"),
    (3, None),
    (4, "gamma alpha epsilon zeta eta theta iota kappa"),
    (5, ""),
    (6, "alpha beta gamma delta epsilon"),
]


def _write_batch(spark, dir_path, idx, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append" if idx else "overwrite"
    ).parquet(dir_path)


def _doc_stream(spark, dir_path):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dir_path)
    )


def _batch_cells(spark, rows) -> dict:
    d = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.depth, r.col): r.cell
        for r in cms_cell_updates(d)
        .groupBy("depth", "col")
        .agg(F.count("*").cast("long").alias("cell"))
        .collect()
    }


def _stream_cells(spark, tmp_path, slices, name, checkpoint=None) -> dict:
    data = str(tmp_path / f"{name}_data")
    for i, sl in enumerate(slices):
        _write_batch(spark, data, i, sl)
    q = (
        cms_stream(_doc_stream(spark, data))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
    )
    if checkpoint:
        q = q.option("checkpointLocation", checkpoint)
    qq = q.start()
    qq.processAllAvailable()
    qq.stop()
    return {
        (r.depth, r.col): r.cell for r in spark.sql(f"SELECT * FROM {name}").collect()
    }


class TestStreamBatchParity:
    def test_matrix_equal_under_any_slicing(self, spark, tmp_path):
        want = _batch_cells(spark, _CORPUS)
        for si, slices in enumerate(
            [
                [_CORPUS],                         # one batch
                [[r] for r in _CORPUS],            # one doc per batch
                [_CORPUS[:2], _CORPUS[2:5], _CORPUS[5:]],  # ragged
            ]
        ):
            got = _stream_cells(spark, tmp_path, slices, f"cms_slice_{si}")
            assert got == want, f"slicing {si}"

    def test_state_bounded_by_matrix_geometry(self, spark, tmp_path):
        got = _stream_cells(spark, tmp_path, [_CORPUS], "cms_bound")
        assert len(got) <= CMS_DEPTH * CMS_WIDTH
        # every token instance contributes exactly one count per depth;
        # the reference tokenization splits "" into [''] (one empty
        # token), so model with re.split, not str.split
        import re

        n_tokens = sum(
            len(re.split(r"\s+", t)) for _, t in _CORPUS if t is not None
        )
        for depth in range(CMS_DEPTH):
            assert sum(v for (d, _), v in got.items() if d == depth) == n_tokens

    def test_estimates_from_streamed_matrix_match_batch_spec(self, spark, tmp_path):
        """min-over-depths point queries against the STREAMED matrix must
        reproduce the batch estimates for the same corpus."""
        got = _stream_cells(spark, tmp_path, [_CORPUS[:3], _CORPUS[3:]], "cms_est")
        probe_cols = {
            (r.term, r.depth): r.col
            for r in spark.createDataFrame(
                [(t,) for t in CMS_PROBES] + [("alpha",), ("beta",)], ["term"]
            )
            .join(F.broadcast(spark.range(CMS_DEPTH).selectExpr("cast(id as int) depth")))
            .select("term", "depth", _col_spark(F.col("depth"), F.col("term")).alias("col"))
            .collect()
        }
        truth = {}
        for _, t in _CORPUS:
            for tok in (t or "").split():
                truth[tok] = truth.get(tok, 0) + 1
        for term in {t for t, _ in probe_cols}:
            est = min(
                got.get((d, probe_cols[(term, d)]), 0) for d in range(CMS_DEPTH)
            )
            assert est >= truth.get(term, 0), term


class TestCheckpointRestart:
    def test_matrix_resumes_not_recounts(self, spark, tmp_path):
        """Stop after the first file, append more, restart on the same
        checkpoint: the final matrix equals the full-corpus batch matrix
        (a recount/duplicate would overshoot; a reset would undershoot)."""
        data = str(tmp_path / "cms_restart_data")
        ckpt = str(tmp_path / "cms_restart_ckpt")
        _write_batch(spark, data, 0, _CORPUS[:3])
        q = (
            cms_stream(_doc_stream(spark, data))
            .writeStream.format("memory")
            .queryName("cms_r1")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        _write_batch(spark, data, 1, _CORPUS[3:])
        q2 = (
            cms_stream(_doc_stream(spark, data))
            .writeStream.format("memory")
            .queryName("cms_r2")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q2.processAllAvailable()
        q2.stop()
        got = {
            (r.depth, r.col): r.cell
            for r in spark.sql("SELECT * FROM cms_r2").collect()
        }
        assert got == _batch_cells(spark, _CORPUS)


class TestPlanShape:
    def test_updates_map_only_before_aggregate(self, spark):
        d = spark.createDataFrame(_CORPUS, "doc_id long, text string")
        assert inspect.count_exchanges(cms_cell_updates(d)) == 0
