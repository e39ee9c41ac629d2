"""Every oracle-backed spec against a fully EMPTY corpus (all ten
tables, correct schemas, zero rows).

At 100 TB the empty input is not an edge case — it is every partition
of a selective filter, every cold-start incremental batch, every
just-created table. A builder that throws on zero rows (array_max of an
empty collect, footer stats of a row-less file, division by a NULL
min/max span) or returns a phantom row where the oracle returns none
fails exactly when a production pipeline first boots.

Schemas are copied from the real sf0.001 parquet footers, so a driver
regeneration that changes a schema flows through automatically.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from spark_kinesis_article_analysis_spark.catalog import TABLES
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_SMOKE
from tests.oracle_harness import _normalize


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_corpus")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_SMOKE}/{t}.parquet")
        pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    return str(d)


def _oracle_specs() -> list[str]:
    return [n for n, s in all_specs().items() if s.oracle is not None]


@pytest.mark.parametrize("name", _oracle_specs())
def test_empty_corpus_parity(spark, name, empty_dir):
    spec = all_specs()[name]
    got = _normalize(spec.build(spark, empty_dir).toPandas())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{empty_dir}/{t}.parquet')"
        )
    want = _normalize(con.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True, obj=name
    )
