#!/usr/bin/env python
"""Dump .explain("formatted") for headline queries to plans/<round>/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [query ...]
(tag is e.g. "before" or "after"; no queries = the full bench HEADLINE set;
round dir defaults to r13, override with SPARK_GRAFT_PLAN_ROUND)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE, SF_DIR  # noqa: E402
from spark_kinesis_article_analysis_spark.registry import all_specs  # noqa: E402
from spark_kinesis_article_analysis_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    import os

    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / rnd
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    specs = all_specs()
    for name in names:
        df = specs[name].build(spark, SF_DIR)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
