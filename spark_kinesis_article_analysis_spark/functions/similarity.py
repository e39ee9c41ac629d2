"""Similarity search over embedding columns (north star): exact
brute-force cosine top-k, and the two approximate scale paths (IVF
cells, random-hyperplane LSH buckets).

Vectors are ``array<float>`` (dim 64) cast to ``array<double>`` before
arithmetic; dot products are built-in higher-order expressions
(``zip_with`` + ``aggregate``) — JVM-side, codegen'd, no Python UDF.

Ranking discipline: scores are rounded to 6 digits *before* ranking and
tie-broken by vec_id, so the top-k set is deterministic and identical
to the DuckDB oracle regardless of float summation order.

Scale posture:
- brute force is O(Q x N) with the query side broadcast — fine for a
  bounded query set, the correctness baseline for everything else;
- IVF: assign every vector to its nearest of K centroids (one broadcast
  pass), then search only the probe cell — O(N/K) per query;
- LSH: sign-bit bucket of R fixed hyperplanes, candidates from bucket
  equality; recall vs brute force is asserted in tests. Both LSH forms
  are oracle-backed since round 4: plane weights are derived at
  plan-build time (seeded stdlib PRNG / md5) and embedded as literals
  the DuckDB oracle repeats verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from spark_kinesis_article_analysis_spark.catalog import load
from spark_kinesis_article_analysis_spark.registry import register

#: Bounded query set: these vec_ids are the search queries.
N_QUERIES = 5
TOP_K = 5
#: IVF centroid seeds: every 100th vector seeds a cell (K ~ N/100);
#: one spherical-kmeans round over the training subsample then moves
#: each seed to its cell's mean (see _ivf_trained_cents).
IVF_CENTROID_STRIDE = 100
#: Training subsample: every 5th vector (20%) participates in the
#: centroid-update round. Deterministic and oracle-mirrorable; at
#: 100 TB this is a fixed-size reservoir sample instead.
IVF_TRAIN_STRIDE = 5
#: Corpus-side multi-assignment width (IVF spill): each corpus vector
#: is indexed in its IVF_NASSIGN nearest cells. Index grows x NASSIGN;
#: recall at fixed nprobe jumps because near-boundary vectors stop
#: disappearing behind a single Voronoi cut. r10 measurement on the
#: bench corpus (trained centroids): NASSIGN 1 -> 2 lifted recall@5
#: from 0.44 to 0.80 at nprobe=4 (numpy prototype 0.44; Spark 0.80
#: confirmed by bench.py's per-round curve).
IVF_NASSIGN = 2
#: Multiprobe width: each QUERY searches its nprobe nearest cells.
#: The synthetic corpus is near-isotropic (little cluster structure,
#: the adversarial case for IVF); with trained centroids +
#: multi-assignment the r10 measured curve is recall@5 = 0.36/0.52/
#: 0.80/0.88 at nprobe 1/2/4/8 — the classic recall-vs-scan-fraction
#: dial, recorded per round by bench.py's ivf_recall curve.
IVF_NPROBE = 4
#: LSH: hash tables x sign bits per table. Multiple independent tables are
#: what gives recall — a near neighbor only needs to collide in ONE table
#: (per-table collision prob for angle theta is (1-theta/pi)^bits).
LSH_TABLES = 4
LSH_BITS = 4
#: Embedding dimensionality of the corpus (embeddings.parquet).
EMB_DIM = 64
#: Phase-1 shard count for the two-phase brute-force top-k (see
#: operators/skew.sharded_topk): bounds the merge window at
#: TOPK_SHARDS * TOP_K rows per query regardless of corpus size.
TOPK_SHARDS = 32

#: Schema-validity guard (DuckDB twins of the Spark filters below): a
#: 100 TB feed WILL contain corrupt rows whose array length is not
#: EMB_DIM — truncated writes, concatenation bugs, empty lists. zip_with
#: silently folds over the shorter length (garbage cosines, skewed
#: centroids) and DuckDB's list_cosine_similarity throws outright, so
#: every vector operator excludes wrong-dim rows up front. NULL
#: embeddings keep their documented per-spec semantics (propagate or
#: drop), hence the two flavors.
VALID_DIM_SQL = f"len(embedding) = {EMB_DIM}"
VALID_OR_NULL_SQL = f"(embedding IS NULL OR len(embedding) = {EMB_DIM})"


def dot(x: Column, y: Column) -> Column:
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v)


def cosine(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def valid_dim_or_null() -> Column:
    """Spark twin of :data:`VALID_OR_NULL_SQL` over the raw ``embedding``
    column (before any cast/rename)."""
    return F.col("embedding").isNull() | (F.size("embedding") == EMB_DIM)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "embeddings")
        .filter(valid_dim_or_null())
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("emb"))
    )


#: DuckDB twin of the zero-vector guard below (raw `embedding` column):
#: cosine consumers additionally require schema-valid dimensionality.
NONZERO_SQL = f"({VALID_DIM_SQL} AND len(list_filter(embedding, x -> x <> 0)) > 0)"


def _emb_nonzero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_emb`` minus zero-norm vectors. Cosine is UNDEFINED for the zero
    vector, and under ANSI mode (Spark 4 default) a single all-zero
    embedding row — padding, a dead encoder, a null-imputed batch —
    would otherwise kill every cosine-scoring job with DIVIDE_BY_ZERO.
    Excluded identically in the oracles via :data:`NONZERO_SQL`, and
    deliberately NOT applied to non-cosine operators (norm stats,
    centroids, quantization) where a zero vector is a legitimate row.
    ``exists`` short-circuits on the first nonzero component — cheaper
    than a norm fold, and no filter-on-fold-column re-inline."""
    return _emb(spark, sf_dir).filter(F.exists("emb", lambda x: x != 0.0))


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings
           WHERE vec_id < {N_QUERIES} AND {NONZERO_SQL}),
c AS (SELECT vec_id, embedding::DOUBLE[] AS ce FROM embeddings
      WHERE vec_id >= {N_QUERIES} AND {NONZERO_SQL}),
scored AS (
    SELECT query_id, vec_id AS neighbor_id,
           round(list_cosine_similarity(qe, ce), 6) AS cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC,
                                       vec_id ASC) AS rn
    FROM q, c
)
SELECT query_id, neighbor_id, cosine FROM scored WHERE rn <= {TOP_K}
""",
    tags=("similarity", "topk", "north-star"),
    doc=(
        "Exact brute-force cosine top-k: broadcast the bounded query set against "
        "all candidates, zip_with dot product, two-phase sharded top-k on the "
        "rounded score (per-(query, shard) row_number <= k, then a merge window "
        "over <= TOPK_SHARDS * k survivors — no reducer sorts the whole scored "
        "corpus for one query). The correctness baseline for the approximate "
        "variants."
    ),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Norms are per-vector quantities: fold them ONCE at vector grain
    # (Q + N fold ops) instead of inside the pair-grain cosine (the
    # inline form re-folds both norms for every (q, c) pair — 3x the
    # higher-order-expression work, the same pathology class the r3
    # sweep caught in dedup_embedding_cosine). sqrt(fold) is the same
    # arithmetic either way, so the pair cosine is bit-identical.
    e = _emb_nonzero(spark, sf_dir).withColumn(
        "nrm", F.sqrt(dot(F.col("emb"), F.col("emb")))
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("qe"),
        F.col("nrm").alias("qnrm"),
    )
    c = e.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("ce"),
        F.col("nrm").alias("cnrm"),
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(
            dot(F.col("qe"), F.col("ce")) / (F.col("qnrm") * F.col("cnrm")), 6
        ).alias("cosine"),
    )
    # Two-phase top-k (r12): the scan emits N_corpus rows per query, so
    # a plain partitionBy(query_id) window is one reducer sorting the
    # whole scored corpus per query at 100 TB. sharded_topk prunes to
    # <= TOPK_SHARDS * TOP_K rows per query before the merge window —
    # row-identical (tie-free order by (cosine DESC, neighbor_id)).
    from spark_kinesis_article_analysis_spark.operators.skew import sharded_topk

    return sharded_topk(
        scored,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        TOP_K,
        shard_key=F.col("neighbor_id"),
        num_shards=TOPK_SHARDS,
    ).select("query_id", "neighbor_id", "cosine")


@register(
    "sim_cosine_topk_arrow",
    oracle=None,  # numpy pairwise-summation dots differ from fold order in final ulps -> rows-only; agreement with the exact form asserted in pytest
    tags=("similarity", "topk", "arrow", "vectorized", "north-star"),
    doc=(
        "The vectorized execution shape for brute-force top-k at scale: "
        "the bounded query set collects to the driver (N_QUERIES rows by "
        "construction) and closes over an Arrow-batched mapInPandas that "
        "scores each candidate batch as ONE numpy matmul — dense linear "
        "algebra is where row-at-a-time Catalyst expression evaluation "
        "loses to BLAS, the documented exception to the built-ins-first "
        "rule. Per-batch top-k (tie-broken by neighbor_id) then a global "
        "top-k window over batches*Q*K candidate rows — top-k composes "
        "over batches, so the result matches the exact operator; only "
        "the float summation order differs (ulp-level), hence rows-only."
    ),
)
def sim_cosine_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    # zero-norm guard: numpy would not throw like ANSI Spark does — it
    # yields NaN scores that silently diverge from the exact operator.
    e = _emb_nonzero(spark, sf_dir)
    qrows = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "emb")
        .collect()  # bounded by N_QUERIES — a query SET, not the corpus
    )
    if not qrows:
        # every query vector was zero-norm (or absent): the exact twin
        # returns an empty frame; np.linalg.norm(axis=1) on the empty
        # 1-D array would raise AxisError at plan-build time instead.
        return spark.createDataFrame([], "query_id long, neighbor_id long, cosine double")
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([list(r.emb) for r in qrows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    k = TOP_K

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = _np.array(pdf["emb"].tolist(), dtype=_np.float64)
            ids = pdf["vec_id"].to_numpy()
            Cn = C / _np.linalg.norm(C, axis=1, keepdims=True)
            # round BEFORE ranking, like the exact form — and with the
            # exact form's ROUNDING MODE: Spark's F.round is decimal
            # HALF_UP while np.round is half-to-even, a systematic 1e-6
            # divergence at exact halves, not just summation-order ulps.
            # floor(|x|*1e6 + 0.5) is vectorized half-up; the residual
            # difference (binary scaling vs Spark's shortest-repr decimal
            # string) only surfaces when the scaled value sits within one
            # ulp of .5 — covered by the pytest tolerance + membership
            # assertions (tests/test_rows_only.py::TestArrowTopK).
            raw = Cn @ Qn.T
            S = _np.sign(raw) * _np.floor(_np.abs(raw) * 1e6 + 0.5) / 1e6
            for qi, qid in enumerate(q_ids):
                col = S[:, qi]
                top = _np.lexsort((ids, -col))[:k]
                yield _pd.DataFrame(
                    {
                        "query_id": _np.full(len(top), qid),
                        "neighbor_id": ids[top],
                        "cosine": col[top],
                    }
                )

    cand = (
        e.filter(F.col("vec_id") >= N_QUERIES)
        .select("vec_id", "emb")
        .mapInPandas(score, "query_id long, neighbor_id long, cosine double")
    )
    # Merge-phase input is n_batches * Q * K rows — bounded per batch but
    # linear in batch count, so at 100 TB one query_id partition still
    # accumulates millions of survivor rows. Same two-phase rewrite as
    # the exact form bounds the final window at TOPK_SHARDS * K per query.
    from spark_kinesis_article_analysis_spark.operators.skew import sharded_topk

    return sharded_topk(
        cand,
        ["query_id"],
        [F.col("cosine").desc(), F.col("neighbor_id").asc()],
        TOP_K,
        shard_key=F.col("neighbor_id"),
        num_shards=TOPK_SHARDS,
    ).select("query_id", "neighbor_id", "cosine")


#: The IVF training/index/probe CTEs, factored so the IVFPQ composition
#: (functions/pq.py: sim_ivfpq_topk) reuses the EXACT same trained
#: cells, multi-assignment, and probe semantics as sim_ivf_topk —
#: byte-one source of truth, no copy to drift. Defines: e, seeds, a1,
#: m1, cent, assigned (corpus x IVF_NASSIGN cells), probes
#: (queries x IVF_NPROBE cells).
IVF_TRAIN_CTES = f"""e AS (
    SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings WHERE {NONZERO_SQL}
),
seeds AS (
    SELECT vec_id AS cid, emb AS cent FROM e WHERE vec_id % {IVF_CENTROID_STRIDE} = 0
),
a1 AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT t.vec_id, s.cid,
               row_number() OVER (PARTITION BY t.vec_id
                                  ORDER BY round(list_cosine_similarity(t.emb, s.cent), 6) DESC,
                                           s.cid ASC) AS rn
        FROM (SELECT * FROM e WHERE vec_id % {IVF_TRAIN_STRIDE} = 0) t, seeds s
    ) WHERE rn = 1
),
m1 AS (
    SELECT cluster, pos,
           round(list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
                             (x, y) -> x + y) / count(*), 6) AS m
    FROM (
        SELECT a.cluster, t.pos, e.vec_id, e.emb[t.pos] AS val
        FROM a1 a JOIN e USING (vec_id),
             LATERAL unnest(generate_series(1, {EMB_DIM})) AS t(pos)
    ) GROUP BY cluster, pos
),
cent AS (
    SELECT * FROM (
        SELECT cluster AS centroid_id, list(m ORDER BY pos) AS cent_e
        FROM m1 GROUP BY cluster
    ) WHERE list_sum(list_transform(cent_e, x -> x * x)) > 0
),
assigned AS (
    SELECT vec_id, emb, centroid_id FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], cent_e), 6) DESC,
                                           centroid_id ASC) AS rn
        FROM embeddings e, cent
        WHERE {NONZERO_SQL.replace("embedding", "e.embedding")}
    ) WHERE rn <= {IVF_NASSIGN}
),
probes AS (
    SELECT vec_id AS query_id, emb AS qe, centroid_id FROM (
        SELECT e.vec_id, e.embedding::DOUBLE[] AS emb, cent.centroid_id,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], cent_e), 6) DESC,
                                           centroid_id ASC) AS rn
        FROM embeddings e, cent
        WHERE e.vec_id < {N_QUERIES}
          AND {NONZERO_SQL.replace("embedding", "e.embedding")}
    ) WHERE rn <= {IVF_NPROBE}
)"""


@register(
    "sim_ivf_topk",
    oracle=f"""
WITH {IVF_TRAIN_CTES},
scored AS (
    SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
           round(list_cosine_similarity(p.qe, a.emb), 6) AS cosine
    FROM probes p JOIN assigned a
      ON a.centroid_id = p.centroid_id AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id ASC) AS rn
    FROM scored
) WHERE rn <= {TOP_K}
""",
    tags=("similarity", "ivf", "ann", "north-star"),
    doc=(
        "IVF approximate NN with TRAINED centroids and MULTIPROBE: cell "
        "centers are one spherical-kmeans round over a deterministic "
        "stride subsample (seeds = every IVF_CENTROID_STRIDE-th vector, "
        "means as vec_id-ordered 0.0-seeded folds rounded per dim — the "
        "cluster_kmeans_portable float discipline, so the oracle mirrors "
        "the training exactly), plus MULTI-ASSIGNMENT: each corpus vector "
        "is indexed in its IVF_NASSIGN nearest cells (IVF spill — index "
        "size x NASSIGN buys recall at a fixed probe width). r9's "
        "untrained single-assignment form measured recall@5 = 0.48 at "
        "nprobe=4; this form measures 0.80 (0.88 at nprobe=8). Each "
        "query probes its IVF_NPROBE nearest cells — the recall-vs-scan-"
        "fraction dial every production IVF exposes (bench.py records "
        "the recall curve per round). Probed-cell search is the "
        "O(NPROBE * NASSIGN * N/K) scale path. Corpus assignment is a "
        "PURE MAP stage: the trained centroid set folds to one array "
        "row (K x dim doubles — broadcastable by the IVF contract, "
        "~33 MB even at 65k cells), and each vector computes its nearest "
        "cells inside a single higher-order expression — no pair-grain "
        "rows, no shuffle, no window. Training cost is sample-grain (one argmax "
        "pass + one (cluster, dim) agg over corpus/IVF_TRAIN_STRIDE "
        "rows); at 100 TB the subsample is a fixed-size reservoir, the "
        "standard train-on-sample / assign-full-corpus split. The "
        "rounded cosine and the (score DESC, centroid_id ASC) tie-break "
        "are bit-identical to the oracle's row_number form."
    ),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_topk(spark, sf_dir, nprobe=IVF_NPROBE)


#: argmax over the folded centroid array, one SQL parse: score each
#: centroid (same rounded-cosine arithmetic as the oracle), take the
#: lexicographic max of (score, -cid) — max score, ties to the SMALLEST
#: centroid_id: exactly the oracle's ORDER BY score DESC, centroid_id
#: ASC with rn = 1. collect_list order is nondeterministic but argmax
#: over the array is order-invariant given that tie-break. An empty
#: centroid set (degenerate corpus) gives transform([]) -> [] and
#: array_max([]) -> NULL, which every consumer drops — the same empty
#: result as a rn=1 window form. Consumers compute `-(...).negcid`.
_IVF_ARGMAX_NEGCID = """(array_max(transform(cents, c -> struct(
               round(aggregate(zip_with(emb, c.ce, (p, q) -> p * q),
                               cast(0.0 as double), (a, v) -> a + v)
                     / (nrm * c.cnrm), 6) AS s,
               -c.cid AS negcid)))).negcid"""


def _ivf_trained_cents(e: DataFrame) -> DataFrame:
    """One-row frame (`cents`: array<struct<cid, ce, cnrm>>) of trained
    IVF cell centers: seeds = every IVF_CENTROID_STRIDE-th vector, one
    spherical-kmeans round over the IVF_TRAIN_STRIDE subsample. Means
    are vec_id-ORDERED 0.0-seeded folds rounded per dim (the
    cluster_kmeans_portable portability discipline) so the DuckDB oracle
    reproduces the centroids bit-for-bit; zero-norm centers (possible
    only if a cluster's sample cancels exactly) are dropped on both
    sides — cosine is undefined for them."""
    seeds = (
        e.filter(F.col("vec_id") % IVF_CENTROID_STRIDE == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("cid"),
                F.col("emb").alias("ce"),
                F.col("nrm").alias("cnrm"),
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("cents"))
    )
    a1 = (
        e.filter(F.col("vec_id") % IVF_TRAIN_STRIDE == 0)
        .join(F.broadcast(seeds))
        .withColumn("cluster", -F.expr(_IVF_ARGMAX_NEGCID))
        .filter(F.col("cluster").isNotNull())
        .select("cluster", "vec_id", "emb")
    )
    means = (
        a1.select("cluster", "vec_id", F.posexplode("emb").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            F.round(
                F.aggregate(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                        lambda s: s["val"],
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / F.count("*"),
                6,
            ).alias("m")
        )
    )
    return (
        means.groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("ce")
        )
        .select(F.col("cluster").alias("cid"), "ce")
        .withColumn("cnrm", F.sqrt(dot(F.col("ce"), F.col("ce"))))
        .filter(F.col("cnrm") > 0)
        .select(F.struct("cid", "ce", "cnrm").alias("c"))
        .agg(F.collect_list("c").alias("cents"))
        # LAZY lineage cut: the trained set feeds BOTH the corpus
        # assignment and the probe side; without the barrier each
        # broadcast re-runs the whole training subtree (a sample
        # assignment pass + two aggs). Lazy so building the plan (or
        # explaining it) costs no job — first consumer materializes the
        # single row, the second reuses it.
        .localCheckpoint(eager=False)
    )


def _ivf_top_cells(n: int) -> Column:
    """``array<long>`` of the n nearest cell ids for the current row
    (columns ``emb``/``nrm`` vs the folded ``cents``). Same struct-array
    fold as :data:`_IVF_ARGMAX_NEGCID`, but sorted and sliced instead of
    argmax'd: array_sort orders (s ASC, negcid ASC), reverse gives
    (s DESC, negcid DESC) = (s DESC, cid ASC) — bit-identical to the
    oracle's row_number tie-break — then slice(1, n). A pure map
    expression: no window, no exchange (pinned in test_plans)."""
    return F.expr(
        f"""transform(
               slice(reverse(array_sort(transform(cents, c -> struct(
                   round(aggregate(zip_with(emb, c.ce, (p, q) -> p * q),
                                   cast(0.0 as double), (a, v) -> a + v)
                         / (nrm * c.cnrm), 6) AS s,
                   -c.cid AS negcid)))), 1, {n}),
               x -> -x.negcid)"""
    )


def ivf_index_and_probes(
    spark: SparkSession, sf_dir: str, nprobe: int
) -> "tuple[DataFrame, DataFrame]":
    """The IVF candidate-generation machinery, shared by ``ivf_topk``
    and the IVFPQ composition (``functions/pq.sim_ivfpq_topk``) so the
    assignment/probe semantics exist ONCE Spark-side, mirroring the
    shared :data:`IVF_TRAIN_CTES` oracle constant. Returns
    ``(assigned, probes)``:

    * ``assigned`` — (vec_id, emb, nrm, centroid_id): every corpus
      vector MULTI-ASSIGNED to its IVF_NASSIGN nearest cells (IVF
      spill: index size x NASSIGN buys recall at a fixed probe width —
      boundary vectors stop vanishing behind the single Voronoi cut;
      measured +0.36 recall@5 at nprobe=4 vs rn=1 assignment).
    * ``probes`` — (query_id, qe, qnrm, centroid_id): each query's
      ``nprobe`` nearest cells. Derived from the vec_id < N_QUERIES
      scan directly — that predicate pushes into the parquet scan, so
      the FULL-corpus assignment executes once (deriving probes from
      ``assigned`` would re-run the corpus-wide subtree)."""
    e = _emb_nonzero(spark, sf_dir).withColumn(
        "nrm", F.sqrt(dot(F.col("emb"), F.col("emb")))
    )
    cents = _ivf_trained_cents(e)
    assigned = (
        e.join(F.broadcast(cents))
        .select(
            "vec_id",
            "emb",
            "nrm",
            F.explode(_ivf_top_cells(IVF_NASSIGN)).alias("centroid_id"),
        )
    )
    probes = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cents))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("emb").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.explode(_ivf_top_cells(nprobe)).alias("centroid_id"),
        )
    )
    return assigned, probes


def ivf_score_and_rank(assigned: DataFrame, probes: DataFrame) -> DataFrame:
    """The IVF search back half — probe-cell join, rounded cosine,
    multi-assignment collapse, top-k — shared by :func:`ivf_topk` and
    the streaming serving path (``streaming/ann_stream.py``), so the
    scoring discipline exists ONCE Spark-side (self-review r12: the
    stream had re-implemented this block and would have silently missed
    the next change to it). ``assigned`` carries (vec_id, emb, nrm,
    centroid_id); ``probes`` carries (query_id, qe, qnrm, centroid_id).
    """
    scored = (
        assigned.join(
            F.broadcast(probes.select("query_id", "qe", "qnrm", "centroid_id")),
            "centroid_id",
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qe"), F.col("emb")) / (F.col("qnrm") * F.col("nrm")), 6
            ).alias("cosine"),
        )
        # a candidate sharing MORE than one probed cell with a query
        # appears once per shared cell under multi-assignment — collapse
        # before ranking (identical cosine bits on every copy, so a
        # hash-distinct on the 3 output columns is exact); the oracle
        # mirrors with SELECT DISTINCT.
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= TOP_K).select(
        "query_id", "neighbor_id", "cosine"
    )


def ivf_topk(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    """The sim_ivf_topk plan at an explicit probe width — bench.py
    sweeps this to record the recall-vs-nprobe curve each round."""
    assigned, probes = ivf_index_and_probes(spark, sf_dir, nprobe)
    return ivf_score_and_rank(assigned, probes)


def _bucket_expr(planes: list[list[float]]) -> Column:
    """Sign-bit bucket id of ``col("emb")`` under literal hyperplanes —
    ONE ``F.expr`` SQL parse (classic PySpark turns every F.lit/F.array
    element and every Python HOF lambda into py4j round trips; the
    per-(table, bit) Column-API form cost ~2.6s of driver-side plan
    CONSTRUCTION per dedup_embedding_cosine build vs ~0.7s execution).
    The literal plane matrix constant-folds JVM-side; per-plane dot is a
    left-to-right zip_with/aggregate fold; ``repr()`` round-trips the
    double weights exactly."""
    arr = "array(" + ", ".join(
        "array(" + ", ".join(f"{w!r}D" for w in p) + ")" for p in planes
    ) + ")"
    return F.expr(
        f"""aggregate(sequence(0, {len(planes) - 1}), 0L, (acc, bit) -> acc +
        CASE WHEN aggregate(zip_with(emb, element_at({arr}, bit + 1),
                                     (p, q) -> p * q),
                            cast(0.0 as double), (a, v) -> a + v) > 0
             THEN shiftleft(1L, bit) ELSE 0L END)"""
    )


def _prng_plane(table: int, bit: int) -> list[float]:
    """Signed hyperplane weights in [-1, 1) from a seeded stdlib PRNG.

    Plan-build-time derivation (the original xxhash64-derived form
    computed TABLES x BITS x EMB_DIM = 1024 hashes PER ROW at runtime —
    and was measured slower than its own md5 'portable' twin once that
    twin got literal planes). ``random.Random(str)`` seeding is
    sha512-based and documented stable across platforms and CPython
    versions, so the planes — and therefore every bucket id — are as
    deterministic as the hash derivation was."""
    import random

    rnd = random.Random(f"lsh:{table}:{bit}")
    return [rnd.uniform(-1.0, 1.0) for _ in range(EMB_DIM)]


def _lsh_oracle_sql() -> str:
    rows = ",\n        ".join(
        "({t}, {b}, [{ws}]::DOUBLE[])".format(
            t=t, b=bit, ws=", ".join(repr(w) for w in _prng_plane(t, bit))
        )
        for t in range(LSH_TABLES)
        for bit in range(LSH_BITS)
    )
    return f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
           WHERE {VALID_OR_NULL_SQL}),
planes(table_id, bit, wts) AS (
    VALUES {rows}
)
SELECT vec_id, label, CAST(table_id AS INT) AS table_id,
       CAST(SUM(CASE WHEN list_sum(list_transform(generate_series(1, {EMB_DIM}),
                                                  i -> emb[i] * wts[i])) > 0
                     THEN 1 << bit ELSE 0 END) AS BIGINT) AS bucket
FROM e CROSS JOIN planes
GROUP BY vec_id, label, table_id
"""


@register(
    "sim_lsh_buckets",
    oracle=_lsh_oracle_sql(),
    tags=("similarity", "lsh", "ann", "oracle-backed", "north-star"),
    doc=(
        "Random-hyperplane LSH: 4 independent hash tables x 4 sign bits from "
        "fixed pseudo-random hyperplanes (seeded-PRNG weights embedded as "
        "plan-time literals — zero per-row hash derivation). One row per "
        "(vector, table); near-dup candidates = bucket equality within any "
        "table. Bucket quality (same-bucket cosine > global mean) asserted "
        "in tests/test_rows_only.py; since round 4 the literal planes are "
        "also replicated by the DuckDB oracle, so every bucket id is "
        "value-hash-checked (sign comparisons sit far from the float "
        "summation noise floor)."
    ),
)
def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    tables = [
        F.struct(
            F.lit(t).alias("table_id"),
            _bucket_expr([_prng_plane(t, bit) for bit in range(LSH_BITS)]).alias("bucket"),
        )
        for t in range(LSH_TABLES)
    ]
    # no orderBy: a global sort is a range exchange + boundary-sampling
    # pass that buys nothing — the driver compare is order-insensitive
    # (measured 2x the whole query's cost).
    return (
        e.select("vec_id", "label", F.explode(F.array(*tables)).alias("t"))
        .select("vec_id", "label", F.col("t.table_id").alias("table_id"), F.col("t.bucket").alias("bucket"))
    )


#: Oracle fragments generated from the SAME geometry constants as the
#: Spark builders (sign-bit planes over EMB_DIM dims) — a retune changes
#: both sides together. Parameterized by bit count so other operators
#: (dedup_embedding_cosine's bounded blocking key) share the identical
#: md5-derived geometry instead of re-deriving a diverging copy.


def plane_bit_sql(bits: int) -> str:
    """DuckDB expression for the ``bits``-bit sign-plane bucket id.

    Expects ``emb`` (DOUBLE[]) and ``table_id`` columns in scope; plane
    weight for (table, bit, dim) is md5("{table}:{bit}:{dim}") -> 8 hex
    chars -> % 1e6 / 1e6, exactly what :func:`portable_bucket` computes
    Spark-side."""
    return "\n             + ".join(
        "CASE WHEN list_sum(list_transform(generate_series(1, {d}), i -> emb[i] * "
        "((CAST(('0x' || substr(md5(CAST(table_id AS VARCHAR) || ':{bit}:' || CAST(i - 1 AS VARCHAR)), 1, 8)) AS BIGINT) "
        "% 1000000) / 1000000.0))) > 0 THEN CAST(1 AS BIGINT) << {bit} ELSE 0 END".format(d=EMB_DIM, bit=bit)
        for bit in range(bits)
    )


_PLANE_BIT_SQL = plane_bit_sql(LSH_BITS)


def _plane_weights(table: int, bit: int) -> list[float]:
    """md5-derived hyperplane weights for (table, bit) over EMB_DIM dims.

    Pure function of (table, bit, dim): computed ONCE at plan-build time
    with hashlib and embedded as literals, instead of shipping an
    md5-per-(row x bit x dim) expression tree (EMB_DIM x bits x tables
    md5 calls PER ROW — measured ~3x of sim_lsh_buckets_portable's
    runtime before this). The DuckDB twin (:func:`plane_bit_sql`)
    recomputes the same md5 in SQL, so the portability claim is
    unchanged: both engines derive identical weights from the identical
    formula."""
    import hashlib

    return [
        (int(hashlib.md5(f"{table}:{bit}:{j}".encode()).hexdigest()[:8], 16) % 1000000)
        / 1000000.0
        for j in range(EMB_DIM)
    ]


def portable_bucket(table: int, bits: int) -> Column:
    """Sign-bit bucket id of ``col("emb")`` under the md5 planes — the
    engine-portable LSH assignment (DuckDB twin: :func:`plane_bit_sql`),
    built as one SQL parse via :func:`_bucket_expr`."""
    return _bucket_expr([_plane_weights(table, bit) for bit in range(bits)])


@register(
    "sim_lsh_buckets_portable",
    oracle=f"""
WITH e AS (
    SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    WHERE {VALID_OR_NULL_SQL}
),
tb AS (SELECT unnest(generate_series(0, {LSH_TABLES - 1})) AS table_id)
SELECT vec_id, label, CAST(table_id AS INT) AS table_id,
       {_PLANE_BIT_SQL}
           AS bucket
FROM e CROSS JOIN tb
""",
    tags=("similarity", "lsh", "ann", "oracle-backed", "north-star"),
    doc=(
        "sim_lsh_buckets with engine-portable hyperplanes: identical "
        "4-table x 4-sign-bit bucketing, but plane weights derive from "
        "md5(table:bit:dim) instead of the seeded-PRNG literals, so "
        "DuckDB reproduces every weight, projection, and bucket id and "
        "the driver value-hash-checks the whole LSH assignment (sign "
        "comparisons sit far from the float summation noise floor, so "
        "fold order cannot flip a bucket bit in practice). Since round "
        "4 BOTH forms embed literal planes and are oracle-backed; this "
        "twin differs only in how the constants are derived."
    ),
)
def sim_lsh_buckets_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    tables = [
        F.struct(
            F.lit(t).alias("table_id"), portable_bucket(t, LSH_BITS).alias("bucket")
        )
        for t in range(LSH_TABLES)
    ]
    return (
        e.select("vec_id", "label", F.explode(F.array(*tables)).alias("t"))
        .select(
            "vec_id", "label", F.col("t.table_id").alias("table_id"), F.col("t.bucket").alias("bucket")
        )
    )


@register(
    "embed_centroid_per_label",
    oracle=f"""
WITH p AS (
    SELECT label, i - 1 AS pos, embedding[i]::DOUBLE AS v
    FROM embeddings, LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
    WHERE {VALID_OR_NULL_SQL}
)
SELECT label, pos, round(avg(v), 6) AS c
FROM p GROUP BY label, pos
""",
    tags=("similarity", "centroid", "north-star"),
    doc=(
        "Per-label embedding centroid in long form (label, dim, mean) — the "
        "k-means / class-prototype building block. posexplode keeps the "
        "reduction a plain (label, pos) hash agg: partial aggregation is "
        "map-side, the only shuffle is 10 labels x 64 dims wide."
    ),
)
def embed_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return (
        e.select("label", F.posexplode("emb").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg("v"), 6).alias("c"))
    )


@register(
    "embed_norm_stats",
    oracle=f"""
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm,
       round(list_min(embedding::DOUBLE[]), 6) AS min_c,
       round(list_max(embedding::DOUBLE[]), 6) AS max_c
FROM embeddings
WHERE {VALID_OR_NULL_SQL}
""",
    tags=("similarity", "norm", "north-star"),
    doc=(
        "Vector norm/statistics per embedding via higher-order fold "
        "(F.aggregate) — the normalize-before-cosine prerequisite, fully "
        "JVM-side and map-only (no shuffle, scan-fused)."
    ),
)
def embed_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    sq = F.aggregate("emb", F.lit(0.0), lambda acc, x: acc + x * x)
    return e.select(
        "vec_id",
        F.round(F.sqrt(sq), 6).alias("l2_norm"),
        F.round(F.array_min("emb"), 6).alias("min_c"),
        F.round(F.array_max("emb"), 6).alias("max_c"),
    )


@register(
    "cluster_kmeans_lloyd",
    oracle=None,  # iterative refinement: float-summation order differs across engines -> rows-only; semantics in pytest
    tags=("similarity", "clustering", "iterative", "north-star"),
    doc=(
        "K-means (Lloyd, k=8, 3 rounds, deterministic lowest-vec_id init): "
        "the 8 centroids fold to ONE broadcast array row and every vector "
        "picks its cluster inside a single map-side array_min(transform(...)) "
        "expression over struct(d2, cid) — ties broken by centroid id; "
        "re-centering is a posexplode (cluster, dim) mean fed straight from "
        "the assignment (emb rides through the map stage, so there is no "
        "join back to the corpus). Per round: one broadcast map pass + one "
        "hash agg whose combine output is at most K x dims rows — the "
        "iterative-refinement template at 100 TB, where k centroids always "
        "fit in a broadcast and the corpus never self-joins or re-shuffles. "
        "Centroids are localCheckpoint-ed per round so plan size stays flat "
        "in ROUNDS."
    ),
)
def cluster_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmeans_lloyd(spark, sf_dir, rounds=3)


def kmeans_lloyd(spark: SparkSession, sf_dir: str, rounds: int) -> DataFrame:
    K, ROUNDS = 8, rounds
    # NULL embeddings are unclusterable and must be EXCLUDED, not merely
    # tolerated (fuzz find #22): _emb's valid_dim_or_null keeps them, and
    # a NULL-embedding row among the K lowest vec_ids becomes a NULL
    # centroid whose struct(d2=NULL, cid) sorts FIRST in array_min's
    # ascending struct order — silently assigning EVERY vector to that
    # cluster with NULL dist. Non-seed NULL rows were emitted with NULL
    # cluster. The fixture has no NULL embeddings, so only the
    # generative harness caught it.
    e = _emb(spark, sf_dir).where(F.col("emb").isNotNull()).select("vec_id", "emb")
    cents = (
        e.orderBy("vec_id")
        .limit(K)
        .select(F.col("vec_id").alias("cid"), F.col("emb").alias("cent"))
    )
    # Map-side argmin over the folded centroid array: struct(d2, cid)
    # ordering is the same (distance, centroid-id) lexicographic tie-break
    # the previous min_by form used, but with zero pair-grain rows — the
    # corpus is scanned once per round with no exchange on the assignment.
    best = F.expr(
        """array_min(transform(cents, c -> struct(
               aggregate(zip_with(emb, c.cent, (p, q) -> (p - q) * (p - q)),
                         cast(0.0 as double), (a, x) -> a + x) AS d2,
               c.cid AS cid)))"""
    )
    assign = None
    for _ in range(ROUNDS):
        folded = cents.agg(F.collect_list(F.struct("cid", "cent")).alias("cents"))
        assign = (
            e.join(F.broadcast(folded))
            .withColumn("b", best)
            .select(
                "vec_id",
                "emb",
                F.col("b.cid").alias("cluster"),
                F.col("b.d2").alias("d2"),
            )
        )
        # (r12 tried a single cluster-grain agg with 64 avg buffers here —
        # one exchange instead of two — but 128 buffer fields exceeds
        # codegen's maxFields and the whole aggregate fell back to
        # interpreted row mode, measuring no better; kept the two-level
        # codegen'd form.)
        cents = (
            assign.select("cluster", F.posexplode("emb").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg("v").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cent")
            )
            .select(F.col("cluster").alias("cid"), "cent")
            # truncate lineage per round (as dedup_cluster_components does):
            # without this the plan doubles every round and both planning
            # time and stage DAG size grow with ROUNDS instead of staying
            # flat. LAZY (r12): eager ran each round as a separate
            # build-time job; lazy materializes inside the next round's
            # broadcast build — 3 fewer jobs per build, same lineage cut.
            .localCheckpoint(eager=False)
        )
    return assign.select("vec_id", "cluster", F.round(F.sqrt("d2"), 6).alias("dist"))
