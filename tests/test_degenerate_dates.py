"""Oracle parity when date-ish columns arrive as parquet DATE32.

The corpus currently writes ``o_orderdate`` / ``l_shipdate`` as
TIMESTAMP(MICROS), and every date-consuming oracle was written against
that. The events table's ts encoding has ALREADY flipped once between
rounds (NANOS -> MICROS, defended in test_degenerate_events.py); the
analogous flip for dates is TIMESTAMP -> DATE, which the TPC-H spec
actually calls for. This suite rewrites every table with date-named
timestamp columns cast to DATE32 and re-runs EVERY oracle-backed spec
whose oracle references a date column — auto-discovered, so new
registrations are covered automatically — proving both engines coerce
DATE through comparisons, windows, intervals, arithmetic, and output
hashing identically.
"""

from __future__ import annotations

import re

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from spark_kinesis_article_analysis_spark.catalog import TABLES
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.conftest import SF_SMOKE
from tests.oracle_harness import _normalize


@pytest.fixture(scope="module")
def date32_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("date32_corpus")
    for t in TABLES:
        tbl = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        cols = {}
        for f in tbl.schema:
            col = tbl[f.name]
            if "date" in f.name and str(f.type).startswith("timestamp"):
                col = pc.cast(col, pa.date32())
            cols[f.name] = col
        pq.write_table(pa.table(cols), str(d / f"{t}.parquet"))
    return str(d)


def _date_specs() -> list[str]:
    return [
        name
        for name, spec in all_specs().items()
        if spec.oracle and re.search(r"o_orderdate|l_shipdate", spec.oracle)
    ]


@pytest.mark.parametrize("name", _date_specs())
def test_date32_encoding_parity(spark, name, date32_dir):
    spec = all_specs()[name]
    got = _normalize(spec.build(spark, date32_dir).toPandas())
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{date32_dir}/{t}.parquet')"
        )
    want = _normalize(con.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)
