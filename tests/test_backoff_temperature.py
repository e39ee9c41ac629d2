"""Semantic checks for the r12 batch-2 ops: Stupid-Backoff trigram
scoring (backoff chain actually fires; salad scores below real text)
and temperature mixing (weights normalize; alpha flattens the head)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


@pytest.mark.parity
class TestStupidBackoff:
    def test_backoff_fires_on_heldout_split(self, spark, tmp_path):
        """Doc 1 (scored half) repeats model trigrams; doc 3 shares the
        vocabulary but never the transitions — it must rely on the
        backoff chain and score strictly lower."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from spark_kinesis_article_analysis_spark.functions.backoff import (
            text_trigram_backoff_logprob,
        )

        model = "the cat sat on the mat and the dog sat on the rug " * 10
        fluent = "the cat sat on the rug and the dog sat on the mat " * 10
        salad = "rug the and mat on dog sat the cat the on sat and mat " * 10
        tbl = pa.table(
            {
                "doc_id": pa.array([0, 1, 3], pa.int64()),  # 0 = model half
                "text": pa.array([model.strip(), fluent.strip(), salad.strip()]),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["a"] * 3),
                "n_chars": pa.array([len(model), len(fluent), len(salad)], pa.int64()),
            }
        )
        d = tmp_path / "docs"
        d.mkdir()
        pq.write_table(tbl, d / "documents.parquet")
        rows = {
            r.doc_id: r.avg_sb_logprob
            for r in text_trigram_backoff_logprob(spark, str(d)).collect()
        }
        assert set(rows) == {1, 3}  # only the odd half is scored
        assert rows[3] < rows[1], rows

    def test_scores_are_finite_at_smoke_sf(self, spark):
        """OOV words in the scored half must hit the smoothed unigram
        floor, never ln(0): every score finite, every doc_id odd."""
        import math

        from spark_kinesis_article_analysis_spark.functions.backoff import (
            text_trigram_backoff_logprob,
        )

        rows = text_trigram_backoff_logprob(spark, SF_SMOKE).collect()
        assert rows, "no scored docs at SF_SMOKE — test is vacuous"
        assert all(r.doc_id % 2 == 1 for r in rows)
        assert all(math.isfinite(r.avg_sb_logprob) for r in rows)


@pytest.mark.parity
class TestTemperatureMix:
    def test_weights_normalize_and_alpha_flattens(self, spark):
        from spark_kinesis_article_analysis_spark.functions.temperature import (
            corpus_mix_temperature,
        )

        rows = corpus_mix_temperature(spark, SF_SMOKE).collect()
        assert len(rows) >= 2, "need >= 2 sources for a mixing test"
        assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
        # alpha < 1 flattens: the tempered weight of the largest source
        # must sit BELOW its raw share, the smallest source's above it.
        total = sum(r.n_tokens for r in rows)
        big = max(rows, key=lambda r: r.n_tokens)
        small = min(rows, key=lambda r: r.n_tokens)
        if big.n_tokens != small.n_tokens:
            assert big.weight < big.n_tokens / total
            assert small.weight > small.n_tokens / total
        # quota mass equals the budget; multiplier = quota / mass
        from spark_kinesis_article_analysis_spark.functions.temperature import (
            TEMP_BUDGET,
        )

        assert abs(sum(r.quota_tokens for r in rows) - TEMP_BUDGET) < 1.0
        for r in rows:
            assert r.sample_multiplier == pytest.approx(
                r.quota_tokens / r.n_tokens, rel=1e-4
            )
