"""Local replica of the driver's DuckDB-oracle compare.

Runs a QuerySpec's Spark builder and its oracle SQL side by side and
asserts exact equality (column-name-sorted, row-sorted) — a strictly
stronger check than the driver's order-insensitive value hash, so a
pass here implies a pass there.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from spark_kinesis_article_analysis_spark.catalog import TABLES, table_path

_CONNS: dict[str, duckdb.DuckDBPyConnection] = {}


def duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    if sf_dir not in _CONNS:
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
        _CONNS[sf_dir] = con
    return _CONNS[sf_dir]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        # unify integer widths and nullable/NumPy backends across engines
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_object_dtype(df[c]):
            # DATE columns: Spark collects datetime.date objects, DuckDB
            # may give datetime64 — align both on datetime64[us]
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], (datetime.date, datetime.datetime)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="first")


def compare(spark, spec, sf_dir: str) -> None:
    got = _normalize(spec.build(spark, sf_dir).toPandas())
    want = _normalize(duck(sf_dir).sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{spec.name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    # The driver's value hash is dtype-sensitive: DuckDB HUGEINT (int128,
    # e.g. sum over integers) lands in pandas as float64 while Spark sums
    # to int64 — numerically equal, hash-different. Fail that drift here
    # (fix: CAST(... AS BIGINT) in the oracle) instead of at the driver.
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert gk == wk, (
            f"{spec.name}.{c}: cross-engine dtype drift spark={got[c].dtype} "
            f"oracle={want[c].dtype} — CAST the oracle column (HUGEINT?) so kinds match"
        )
    assert len(got) == len(want), f"{spec.name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=spec.name)
