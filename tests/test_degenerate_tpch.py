"""Oracle parity for the relational core on HOSTILE TPC-H tables:
NULL join keys, dangling foreign keys, NULL grouping/ordering columns,
NULL dates inside BETWEEN windows, NULL/empty strings under LIKE/regex,
zero and negative money values.

TPC-H's spec marks most of these columns NOT NULL, so the main
fixtures never exercise them — but a 100 TB lakehouse ingests what it
is given, and the divergence classes are exactly the ones this repo
keeps finding elsewhere: NULL-matches-nothing in joins vs NULL-is-a-
group in GROUP BY/PARTITION BY, and Spark's ASC = NULLS FIRST vs
DuckDB's ASC = NULLS LAST default orderings. Every oracle-backed spec
whose oracle touches ONLY these seven tables runs here.
"""

from __future__ import annotations

import datetime as dt
import re

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_kinesis_article_analysis_spark.catalog import TABLES
from spark_kinesis_article_analysis_spark.registry import all_specs
from tests.oracle_harness import _normalize

_TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _write(d) -> str:
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int32()),
                "r_name": pa.array(["AMERICA", None], pa.string()),
            }
        ),
        d / "region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1, 2, 3], pa.int32()),
                "n_name": pa.array(["BRAZIL", "GERMANY", None, "FRANCE"], pa.string()),
                "n_regionkey": pa.array([0, 1, None, 7], pa.int32()),  # NULL + dangling
            }
        ),
        d / "nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                "c_name": pa.array(
                    ["Customer#1", "", None, "Customer#4", "Customer#5", "Customer#6"],
                    pa.string(),
                ),
                "c_nationkey": pa.array([0, 1, None, 9, 0, 1], pa.int32()),
                "c_acctbal": pa.array([100.0, -5.5, None, 0.0, 7.25, 900.0], pa.float64()),
                "c_mktsegment": pa.array(
                    ["BUILDING", None, "MACHINERY", "BUILDING", "", "AUTOMOBILE"],
                    pa.string(),
                ),
            }
        ),
        d / "customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], pa.int64()),
                "s_name": pa.array(["Supplier#1", None, "Supplier#3"], pa.string()),
                "s_nationkey": pa.array([0, None, 3], pa.int32()),
                "s_acctbal": pa.array([50.0, None, -1.0], pa.float64()),
            }
        ),
        d / "supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "p_name": pa.array(
                    ["green metal part", None, "", "small brushed copper", "promo shiny steel"],
                    pa.string(),
                ),
                "p_brand": pa.array(["Brand#1", "Brand#2", None, "Brand#1", "Brand#2"], pa.string()),
                "p_type": pa.array(
                    ["PROMO BRUSHED", "STANDARD POLISHED", None, "PROMO ANODIZED", ""],
                    pa.string(),
                ),
                "p_size": pa.array([5, None, 7, 5, 50], pa.int32()),
                "p_retailprice": pa.array([10.0, 20.0, None, 0.0, -3.0], pa.float64()),
            }
        ),
        d / "part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12, 13, 14, 15, 16], pa.int64()),
                "o_custkey": pa.array([1, 2, None, 99, 1, 5, 6], pa.int64()),
                "o_orderstatus": pa.array(["O", "F", None, "O", "F", "O", "P"], pa.string()),
                "o_totalprice": pa.array(
                    [100.0, 250.5, None, 0.0, -10.0, 42.0, 77.0], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [
                        _ts("1995-01-15"),
                        _ts("1995-03-10"),
                        None,
                        _ts("1994-06-01"),
                        _ts("1995-03-10"),
                        None,
                        _ts("1996-12-31"),
                    ],
                    pa.timestamp("us"),
                ),
                "o_orderpriority": pa.array(
                    ["1-URGENT", "3-MEDIUM", "5-LOW", None, "1-URGENT", "2-HIGH", ""],
                    pa.string(),
                ),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([10, 10, 11, 12, 13, None, 14, 15, 16, 99], pa.int64()),
                "l_partkey": pa.array([1, 2, None, 3, 4, 5, 1, 9, 2, 1], pa.int64()),
                "l_suppkey": pa.array([1, 2, 3, None, 1, 2, 3, 1, 9, 1], pa.int64()),
                "l_linenumber": pa.array([1, 2, 1, 1, 1, 1, 1, 1, 1, 1], pa.int32()),
                "l_quantity": pa.array(
                    [5.0, 10.0, None, 0.0, 30.0, 2.0, -1.0, 7.0, 8.0, 9.0], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [50.0, 100.0, 30.0, None, 300.0, 20.0, 10.0, 70.0, 80.0, 90.0],
                    pa.float64(),
                ),
                "l_discount": pa.array(
                    [0.05, 0.0, 0.1, 0.06, None, 0.07, 0.05, 0.0, 1.0, 0.05], pa.float64()
                ),
                "l_tax": pa.array(
                    [0.01, 0.02, 0.0, 0.03, 0.04, None, 0.0, 0.01, 0.02, 0.03], pa.float64()
                ),
                "l_returnflag": pa.array(
                    ["R", "N", None, "A", "R", "N", "A", "", "R", "N"], pa.string()
                ),
                "l_linestatus": pa.array(
                    ["O", "F", "O", None, "F", "O", "F", "O", "", "F"], pa.string()
                ),
                "l_shipdate": pa.array(
                    [
                        _ts("1995-02-01"),
                        _ts("1995-02-20"),
                        _ts("1995-04-01"),
                        None,
                        _ts("1994-07-15"),
                        _ts("1995-03-25"),
                        _ts("1995-05-01"),
                        None,
                        _ts("1997-01-15"),
                        _ts("1995-06-01"),
                    ],
                    pa.timestamp("us"),
                ),
            }
        ),
        d / "lineitem.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def tpch_dir(tmp_path_factory):
    return _write(tmp_path_factory.mktemp("hostile_tpch"))


def _tpch_only_specs() -> list[str]:
    others = [t for t in TABLES if t not in _TPCH]
    return [
        name
        for name, spec in all_specs().items()
        if spec.oracle is not None
        and any(re.search(rf"\b{t}\b", spec.oracle) for t in _TPCH)
        and not any(re.search(rf"\b{t}\b", spec.oracle) for t in others)
    ]


@pytest.mark.parametrize("name", _tpch_only_specs())
def test_hostile_tpch_parity(spark, name, tpch_dir):
    spec = all_specs()[name]
    got = _normalize(spec.build(spark, tpch_dir).toPandas())
    con = duckdb.connect()
    for t in _TPCH:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tpch_dir}/{t}.parquet')"
        )
    want = _normalize(con.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True, obj=name
    )
