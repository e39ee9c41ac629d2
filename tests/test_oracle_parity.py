"""Every oracle-backed query must match DuckDB exactly — the local,
stricter version of the driver's CORRECTNESS gate (t2, sf0.01)."""

from __future__ import annotations

import pytest

from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_CORRECTNESS
from tests.oracle_harness import compare

SPECS = [s for s in all_specs().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_matches_duckdb_oracle(spark, spec):
    compare(spark, spec, SF_CORRECTNESS)
