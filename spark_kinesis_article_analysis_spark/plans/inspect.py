"""Physical-plan inspection: the objective evidence for the scale
claims (broadcasts chosen, filters pushed, shuffles counted).

Used by tests/test_plans.py to keep plan-shape regressions out: a
dimension join silently flipping from broadcast to sort-merge, or a
filter no longer reaching the parquet scan, is a perf bug at 100 TB
even though results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the initial physical plan
    (broadcast exchanges excluded — those are the cheap ones).

    Formatted mode lists operators as ``(N) Exchange`` with the
    partitioning on a following ``Arguments:`` line, so count operator
    headers, not argument strings."""
    import re

    plan = explain_str(df, "formatted")
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan uses a broadcast strategy (hash or
    nested-loop — the latter is what a broadcast cross join plans as)."""
    plan = explain_str(df, "formatted")
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> str:
    plan = explain_str(df, "formatted")
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning evidence)."""
    plan = explain_str(df, "formatted")
    cols: list[str] = []
    for line in plan.splitlines():
        if "ReadSchema" in line:
            inner = line.split("struct<", 1)[-1].rstrip(">").strip()
            cols.extend(part.split(":")[0].strip() for part in inner.split(",") if ":" in part)
    return cols


def codegen_stage_count(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count. The formatted/AQE plan hides
    codegen annotations, so ask the codegen explain mode, whose header
    reads 'Found N WholeStageCodegen subtrees.'"""
    plan = explain_str(df, "codegen")
    for line in plan.splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split("Found ", 1)[1].split(" ", 1)[0])
    return 0
