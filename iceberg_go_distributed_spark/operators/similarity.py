"""Similarity search over embedding columns (`embeddings` table:
vec_id bigint, embedding array<float>, label int).

Three plans with the same output contract (query_id, neighbor_id, cos):

  - cosine_topk   — brute-force: broadcast the (small) query set against
                    the full corpus; the baseline and the oracle shape.
  - ann_ivf_topk  — IVF-style: restrict the search to the query's cell
                    (here the precomputed `label` partition); at scale
                    the cell assignment comes from a trained coarse
                    quantizer, and the join prunes to ~1/n_cells of the
                    corpus per probe.
  - ann_lsh_topk  — random-hyperplane LSH: 16-bit signs bucket both
                    sides; candidates share the bucket, then exact
                    cosine re-ranks. The scale path when no cell
                    assignment exists.

Determinism: all arithmetic is element-wise double (float32 inputs are
exactly representable), folded left-to-right — bit-identical between
Spark's `aggregate` and DuckDB's `list_dot_product`, so oracles can
hash-match. Ties broken by neighbor_id.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 4 planes → 16 buckets: sized so buckets stay populated at the test
# scale factors (500–5000 vectors). At corpus scale you raise planes so
# bucket occupancy ~ target candidate count (e.g. 20 planes for 1e9
# vectors) and multi-probe neighboring buckets for recall.
LSH_PLANES = 4
EMBED_DIM = 64


def _dot(a: str | Column, b: str | Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: str | Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", _norm(vec_col))


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", F.round("_cos", 6).alias("cos"))
    )


def cosine_topk(
    emb: DataFrame, max_query_id: int = 10, k: int = 5, vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force exact top-k cosine for query vectors vec_id < max_query_id.

    The query set is broadcast; the corpus is scanned once with no
    shuffle of the embedding column — the right brute-force plan at any
    corpus size (cost is O(|corpus| * |queries| * dim) map-side work).
    """
    base = with_norm(emb, vec_col)
    q = base.where(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    scored = (
        base.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("_cos", _dot("_qv", vec_col) / (F.col("_qn") * F.col("_norm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "_cos")
    )
    return _topk(scored, k)


def ann_ivf_topk(
    emb: DataFrame,
    max_query_id: int = 20,
    k: int = 3,
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-pruned top-k: search only the query's cell (`cell_col`).

    The candidate join keys on the cell, so the probe touches one cell's
    partition instead of the corpus — the IVF pruning contract. With a
    real quantizer the cell would be argmin-centroid; here the table
    ships a precomputed assignment.
    """
    base = with_norm(emb, vec_col)
    q = base.where(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"),
        F.col(cell_col).alias("_qcell"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    scored = (
        base.join(
            F.broadcast(q),
            (F.col(cell_col) == F.col("_qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("_cos", _dot("_qv", vec_col) / (F.col("_qn") * F.col("_norm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "_cos")
    )
    return _topk(scored, k)


def lsh_planes(
    n_planes: int = LSH_PLANES, dim: int = EMBED_DIM, seed: int = 7
) -> list[list[float]]:
    """Deterministic random hyperplanes, rounded so the literal values
    are exactly representable and identical in Spark and oracle SQL."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in row] for row in rng.standard_normal((n_planes, dim))]


def _bucket(vec_col: str | Column, planes: list[list[float]]) -> Column:
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(x) for x in p])) > 0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


_DIM_MEMO: dict[int, int] = {}


def _dim_of(emb: DataFrame, vec_col: str) -> int:
    """Embedding width via a one-row probe, memoized per logical plan so
    bench/batch loops don't pay a Spark job per call."""
    from pyspark.sql import functions as F2

    key = hash((emb._jdf.queryExecution().logical().semanticHash(), vec_col))
    if key not in _DIM_MEMO:
        _DIM_MEMO[key] = emb.select(F2.size(vec_col)).first()[0]
    return _DIM_MEMO[key]


def ann_lsh_topk(
    emb: DataFrame,
    max_query_id: int = 10,
    k: int = 3,
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int = LSH_PLANES,
    n_probes: int = 1,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's
    hyperplane-sign bucket; exact cosine re-ranks inside it.

    At scale the corpus is hash-partitioned (or written bucketed) by
    `_bucket`, so a probe is a partition-pruned lookup, not a scan.
    Pass `dim` when known (embeddings tables have fixed width) to skip
    the one-row dimensionality probe; repeated callers on the same
    DataFrame hit a per-plan memo instead of re-running the job.

    Multi-probe (`n_probes` > 1): a true neighbor that lands in an
    adjacent bucket differs in exactly the sign bits whose hyperplane
    margin |q·p| is smallest, so each query also probes the buckets
    reached by flipping its `n_probes - 1` lowest-margin bits (Lv et
    al., "Multi-Probe LSH"). That recovers recall without re-hashing
    or widening buckets; buckets partition the corpus, so the probe
    fan-out never duplicates a candidate pair. Cost scales linearly
    with n_probes on the query side only.
    """
    # planes must match the embedding dimensionality — a short plane
    # array would null out every dot product and collapse all vectors
    # into one bucket (silent brute-force)
    if dim is None:
        dim = _dim_of(emb, vec_col)
    planes = lsh_planes(n_planes=n_planes, dim=dim)
    base = with_norm(emb, vec_col).withColumn("_bucket", _bucket(vec_col, planes))
    q = base.where(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("_bucket").alias("_qb"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    if n_probes > 1:
        margins = F.array(
            *[_dot("_qv", F.array(*[F.lit(x) for x in p])) for p in planes]
        )
        # probe list = own bucket + flips of the lowest-|margin| bits;
        # all codegen'd array ops, one explode per query row
        probe_expr = (
            "concat(array(_qb), transform(slice(transform("
            "array_sort(transform(_margins, (m, i) -> named_struct("
            "'a', abs(m), 'i', i))), s -> s.i), 1, {p}), "
            "i -> _qb ^ shiftleft(1L, i)))"
        ).format(p=n_probes - 1)
        q = (
            q.withColumn("_margins", margins)
            .withColumn("_qb", F.explode(F.expr(probe_expr)))
            .drop("_margins")
        )
    scored = (
        base.join(
            F.broadcast(q),
            (F.col("_bucket") == F.col("_qb")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("_cos", _dot("_qv", vec_col) / (F.col("_qn") * F.col("_norm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "_cos")
    )
    return _topk(scored, k)


def _assign_cells(emb: DataFrame, cents: DataFrame, vec_col: str) -> DataFrame:
    """(vec_id, cell): nearest centroid by dot product, ties to the
    lowest cell id. Centroids are broadcast (they are tiny by
    construction); the corpus never shuffles."""
    scored = emb.select("vec_id", vec_col).crossJoin(F.broadcast(cents)).withColumn(
        "_d", _dot(vec_col, "_c")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_d").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "cell")
    )


def ivf_trained_topk(
    emb: DataFrame,
    n_cells: int = 8,
    max_query_id: int = 20,
    k: int = 3,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with a TRAINED coarse quantizer: one deterministic
    Lloyd refinement (seeds = the first `n_cells` vectors, assign,
    recompute means, reassign), then each query searches only its
    trained cell — the real IVF shape, vs `ann_ivf_topk` which trusts
    a precomputed assignment.

    Distribution: assignment is a broadcast of `n_cells` centroids and
    a map-side argmax (corpus never shuffles); the mean recomputation
    is a posexplode + groupBy(cell, pos) with map-side partial sums —
    the shuffle carries at most cells × dim rows per partition, the
    standard distributed k-means step. Determinism for the oracle:
    element sums run in exact DECIMAL(27,10) (order-independent), the
    mean is rounded to 6 dp, and dot products fold left-to-right —
    bit-identical to the DuckDB formulation."""
    seeds = emb.where(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col(vec_col).alias("_c")
    )
    a0 = _assign_cells(emb, seeds, vec_col)
    ex = a0.join(emb, "vec_id").select(
        "cell", F.posexplode(vec_col).alias("pos", "_v")
    )
    elems = ex.groupBy("cell", "pos").agg(
        F.round(
            F.sum(F.col("_v").cast("decimal(27,10)")).cast("double") / F.count("*"),
            6,
        ).alias("_m")
    )
    cents = (
        elems.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "_m"))).alias("_s"))
        .select("cell", F.expr("transform(_s, x -> x._m)").alias("_c"))
    )
    a1 = _assign_cells(emb, cents, vec_col)

    na = with_norm(emb, vec_col).join(a1, "vec_id")
    q = na.where(F.col("vec_id") < max_query_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("cell").alias("_qcell"),
        F.col(vec_col).alias("_qv"),
        F.col("_norm").alias("_qn"),
    )
    scored = (
        na.join(
            F.broadcast(q),
            (F.col("cell") == F.col("_qcell")) & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("_cos", _dot("_qv", vec_col) / (F.col("_qn") * F.col("_norm")))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "_cos")
    )
    return _topk(scored, k)


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a coarse cell.

    Blocking on the precomputed cell assignment (IVF-style) turns the
    quadratic all-pairs problem into per-cell quadratic work — the
    standard semantic-dedup shape (SemDeDup-style: cluster, then compare
    within clusters only). The self-join keys on the cell, so the
    shuffle distributes by cell and no cross-cell pair is ever formed.
    Output: (vec_a, vec_b, cos) exact within-cell pairs >= threshold.
    """
    base = with_norm(emb, vec_col)
    a = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col(cell_col).alias("_cell"),
        F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"),
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col(cell_col).alias("_cellb"),
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
    )
    return (
        a.join(b, (F.col("_cell") == F.col("_cellb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("_cos", _dot("_va", "_vb") / (F.col("_na") * F.col("_nb")))
        .where(F.col("_cos") >= threshold)
        .select("vec_a", "vec_b", F.round("_cos", 6).alias("cos"))
    )
