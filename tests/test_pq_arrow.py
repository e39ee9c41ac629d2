"""The Arrow-vectorized PQ encoder must agree with the exact built-in
encoder — the rows-only spec's correctness evidence (same treatment as
sim_cosine_topk_arrow's agreement test)."""

from __future__ import annotations

import pytest

from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


@pytest.mark.parity
class TestPqArrowAgreement:
    @pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECTNESS])
    def test_codes_and_errors_match_exact_encoder(self, spark, sf_dir):
        specs = all_specs()
        exact = {
            r.vec_id: (r.codes, r.recon_err)
            for r in specs["embed_pq_quantize"].build(spark, sf_dir).collect()
        }
        arrow = {
            r.vec_id: (r.codes, r.recon_err)
            for r in specs["embed_pq_quantize_arrow"].build(spark, sf_dir).collect()
        }
        assert set(arrow) == set(exact)
        code_mismatch = {
            k: (arrow[k][0], exact[k][0])
            for k in exact
            if arrow[k][0] != exact[k][0]
        }
        assert not code_mismatch, dict(list(code_mismatch.items())[:3])
        # recon_err: identical rounding rule; allow the one-ulp-of-.5
        # decimal-vs-binary edge the arrow family documents
        err_mismatch = {
            k: (arrow[k][1], exact[k][1])
            for k in exact
            if abs(arrow[k][1] - exact[k][1]) > 1e-6
        }
        assert not err_mismatch, dict(list(err_mismatch.items())[:3])
