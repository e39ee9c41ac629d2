"""The higher-order-function materialization barrier, extracted.

The trap (rediscovered independently by three queries before this
helper existed — ``corpus_ingest_batch_form`` r3,
``dedup_fuzzy_levenshtein`` r5, ``rank_fusion_rrf`` r9, each paying a
measured 6.5-27x surprise first): Spark's higher-order functions
(``transform``/``aggregate``/``filter``/...) and a few other expensive
expressions (``levenshtein``) are CodegenFallback expressions with NO
common-subexpression elimination. Catalyst's CollapseProject happily
inlines a projection into every consumer, so a *filter or sort key on a
fold-derived column* re-evaluates the entire fold once per consuming
expression — a plan that reads as "compute once, filter" executes as
"compute three times".

``materialize_fold`` is the one documented barrier. Two methods:

* ``"checkpoint"`` — ``localCheckpoint(eager=True)``: cuts lineage, the
  fold runs exactly once and downstream plans scan an ExistingRDD.
  Blocks released by the ContextCleaner on GC. Use when the frame is
  small-grain (ids + a few numerics) and reused/filtered downstream.
* ``"persist"`` — in-memory cache: same once-only evaluation, but keeps
  lineage (recomputable on executor loss — the safer choice on a real
  cluster when the frame feeds BOTH sides of a self-join).

When NOT to use either: if the consumer below the fold is already a
plan barrier — a Window, an Aggregate, or a streaming state operator —
the fold evaluates once for free and a checkpoint would only add a
materialization (``corpus_ingest_batch_form`` keeps its survivor-window
barrier for exactly this reason: checkpointing there would materialize
doc-grain text).

Scale note (100 TB): both methods materialize ``df``. Callers must
bound the frame first (candidate-pair grain after LSH banding, top-N
cuts, semi-joined subsets) — this helper is a CPU-dedup barrier, not an
excuse to persist a corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_fold(df: DataFrame, method: str = "checkpoint") -> DataFrame:
    """Evaluate ``df``'s projection ONCE before callers filter/sort on
    fold-derived columns (see module docstring for why that re-inlines).

    ``method="checkpoint"`` (default) or ``"persist"``.
    """
    if method == "checkpoint":
        return df.localCheckpoint(eager=True)
    if method == "persist":
        return df.persist()
    raise ValueError(f"unknown materialize_fold method {method!r}")
