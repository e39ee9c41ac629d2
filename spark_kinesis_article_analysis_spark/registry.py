"""Named-query registry — the single source of truth for the engine's
operator surface.

Every operator from SURVEY.md §2 ships as a :class:`QuerySpec`:

* ``name``     — stable key; ``__spark_entry__.queries()`` exposes it.
* ``build``    — ``(spark, sf_dir) -> DataFrame``; idiomatic DataFrame
  API (Catalyst plans it).
* ``oracle``   — equivalent ANSI SQL runnable by DuckDB over the same
  parquet tables, or ``None`` for ops with no exact SQL expression
  (LSH, approximate aggregates, nondeterministic exprs) — the driver
  then records a rows-only check.
* ``tags``     — coverage bookkeeping against SURVEY.md §2.

Column-name discipline (driver contract): the oracle compare sorts
columns by name before hashing, so the Spark DataFrame and the oracle
SQL must alias every computed column identically.

Float discipline: double aggregates computed in different orders differ
in final ulps between engines. Specs that aggregate doubles round the
final value (both sides, same digits) — see ``fround``.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def _pin_session_conf(spark: SparkSession) -> None:
    """Confs the oracle compare depends on, pinned per-call because the
    driver owns the session and may not have set them:

    - UTC session timezone: TIMESTAMP(_LTZ) values (``timestamp_micros``,
      ``timestamp_seconds``, window bounds) must collect as naive UTC to
      match DuckDB's naive timestamps.
    - ``nanosAsLong``: the events table's TIMESTAMP(NANOS) column is
      unreadable by the Spark parquet reader without it (see catalog.load).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def build(spark: SparkSession, sf_dir: str) -> DataFrame:
            _pin_session_conf(spark)
            return fn(spark, sf_dir)

        build.__name__ = fn.__name__
        build.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name=name, build=build, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from spark_kinesis_article_analysis_spark.operators import (  # noqa: F401
        aggregates,
        article,
        joins,
        relational,
        subqueries,
        windows_analytic,
        windows_time,
    )
    from spark_kinesis_article_analysis_spark.functions import (  # noqa: F401
        dedup,
        multimodal,
        pipeline,
        scalar,
        udfs,
        similarity,
        text,
    )


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Builder]:
    return {name: spec.build for name, spec in all_specs().items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
