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
    """Import every module that registers queries (idempotent).

    Import order is the verification-priority order: the driver verdicts
    only the FIRST 50 entries of ``queries()`` each round, so modules
    whose queries most need a fresh verdict import first (fixed entries,
    then the north-star LLM-pipeline surface), and ``all_specs`` pushes
    already-driver-verified names to the back (see ``_verified_names``).
    """
    from spark_kinesis_article_analysis_spark.operators import (  # noqa: F401
        aggregates,  # fixed r1 harness crash (agg_approx_sketches)
        relational,  # fixed r1 hash mismatch (tpch_q12)
    )
    from spark_kinesis_article_analysis_spark.functions import (  # noqa: F401
        dedup,
        similarity,
        text,
        pipeline,
        multimodal,
        udfs,
        corpus,
    )
    from spark_kinesis_article_analysis_spark.operators import (  # noqa: F401
        article,
        joins,
        subqueries,
        windows_analytic,
        windows_time,
    )
    from spark_kinesis_article_analysis_spark.functions import (  # noqa: F401
        scalar,
    )
    # Round-3+ additions import LAST: with the driver's 50-query/round
    # verdict budget, new queries must queue BEHIND the older not-yet-
    # verified entries, not displace them from the current round's window.
    from spark_kinesis_article_analysis_spark.operators import (  # noqa: F401
        tpch_extra,
    )
    from spark_kinesis_article_analysis_spark.functions import (  # noqa: F401
        quality,
    )


def _verified_names() -> frozenset[str]:
    """Query names with a clean driver verdict in any prior round.

    Reads ``CORRECTNESS_r*.json`` at the repo root (written by the
    driver, one per round). "Clean" = value-hash green, or a rows-only
    record for an oracle-less spec (``err == 'no_oracle'``). Broken
    entries (hash mismatch, harness crash) stay unverified so they are
    re-checked after a fix. Names absent from every file have never been
    checked — the driver caps each round at 50 queries.
    """
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    done: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name, v in data.items():
            if isinstance(v, dict) and (v.get("hash_match") is True or v.get("err") == "no_oracle"):
                done.add(name)
    return frozenset(done)


def all_specs() -> dict[str, QuerySpec]:
    """All registered specs, never-driver-verified first.

    The driver verdicts the first 50 entries per round; ordering
    unverified-first rotates the budget across rounds until every query
    has a recorded verdict, with no per-round hand-curation.
    """
    _load_all()
    verified = _verified_names()
    order = [n for n in _REGISTRY if n not in verified] + [n for n in _REGISTRY if n in verified]
    return {name: _REGISTRY[name] for name in order}


def queries() -> dict[str, Builder]:
    return {name: spec.build for name, spec in all_specs().items()}


def oracles() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
