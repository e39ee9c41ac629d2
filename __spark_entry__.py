"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``spark_kinesis_article_analysis_spark.registry`` — every
operator from SURVEY.md §2 registers itself there as a named query with
(where SQL-expressible) a DuckDB oracle. See the package docstring for
layout.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from spark_kinesis_article_analysis_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's full pipeline (JSON parse -> word count -> 5 min/1 min
    sliding window by author -> avg) in batch form over the documents
    fixture — see operators/article.py.
    """
    return registry.queries()["article_pipeline_sliding"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys get rows-only checks."""
    return registry.oracles()
