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
    # Deliberately the higher-order fold, NOT an unrolled 64-term
    # `a[0]*b[0] + …` expression: the unrolled tree was measured 3×
    # SLOWER end-to-end (llm_ann_bruteforce 1.03 s → 3.11 s at sf0.1,
    # OPTIMIZATION_r14.md) — a ~500-node expression per dot product
    # blows the whole-stage-codegen method budget and the stage falls
    # back to interpreted evaluation of the giant tree, which costs
    # more than the aggregate() loop it was meant to replace.
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
    bench/batch loops don't pay a Spark job per call. The memo key uses
    a private Catalyst surface (semanticHash); if a Spark upgrade moves
    it, the probe still works — it just stops memoizing."""
    from pyspark.sql import functions as F2

    try:
        key = hash((emb._jdf.queryExecution().logical().semanticHash(), vec_col))
    except Exception:  # noqa: BLE001 — private py4j surface unavailable
        key = None
    if key is not None and key in _DIM_MEMO:
        return _DIM_MEMO[key]
    dim = emb.select(F2.size(vec_col)).first()[0]
    if key is not None:
        _DIM_MEMO[key] = dim
    return dim


def lsh_n_planes_for(corpus_size: int, target_bucket_rows: int = 1024) -> int:
    """Plane count sized so expected bucket occupancy ≈
    `target_bucket_rows`: planes = ceil(log2(corpus / target)), floored
    at the test-scale default. Each probe then scans ~target rows
    regardless of corpus size — 1e9 vectors at the default target gives
    20 planes (≈1M buckets), with multi-probe recovering the recall the
    finer partitioning costs."""
    import math

    if corpus_size <= target_bucket_rows:
        return LSH_PLANES
    return max(LSH_PLANES, math.ceil(math.log2(corpus_size / target_bucket_rows)))


def _perturbation_sets(n_probes: int, n_planes: int) -> list[tuple[int, ...]]:
    """First `n_probes` perturbation sets for multi-probe LSH: subsets
    of margin-ranks (0 = lowest |margin|), ordered by Lv et al.'s
    expected-score weights: E[margin²] for the rank-r order statistic
    grows ∝ (r+1)(r+2), so weight(S) = Σ (r+1)(r+2) and the best
    probes are e.g. ∅, {0}, {1}, {0,1}, {2}, ... — multi-bit flips
    reach the Hamming-distance-2+ buckets single-bit probing can never
    see."""
    import heapq

    def weight(s: tuple[int, ...]) -> int:
        return sum((r + 1) * (r + 2) for r in s)

    out: list[tuple[int, ...]] = [()]
    # enumerate by weight using a heap over (weight, subset); the
    # shift/extend successor rule reaches every subset exactly once
    heap: list[tuple[int, tuple[int, ...]]] = [(2, (0,))] if n_planes else []
    seen = {(), (0,)} if n_planes else {()}
    while heap and len(out) < n_probes:
        _, s = heapq.heappop(heap)
        out.append(s)
        last = s[-1]
        # successors: shift the last element up, or extend with last+1
        if last + 1 < n_planes:
            shifted = s[:-1] + (last + 1,)
            if shifted not in seen:
                seen.add(shifted)
                heapq.heappush(heap, (weight(shifted), shifted))
            extended = s + (last + 1,)
            if extended not in seen:
                seen.add(extended)
                heapq.heappush(heap, (weight(extended), extended))
    return out[:n_probes]


def ann_lsh_topk(
    emb: DataFrame,
    max_query_id: int = 10,
    k: int = 3,
    vec_col: str = "embedding",
    dim: int | None = None,
    n_planes: int | None = None,
    n_probes: int = 1,
    corpus_size: int | None = None,
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
    if n_planes is None:
        # explicit n_planes wins; otherwise size to the corpus (see
        # lsh_n_planes_for) or fall back to the test-scale default
        n_planes = (
            lsh_n_planes_for(corpus_size) if corpus_size is not None else LSH_PLANES
        )
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
        # probe list = own bucket + margin-ordered perturbation sets
        # (multi-bit flips of the lowest-|margin| planes — Lv et al.
        # multi-probe); all codegen'd array ops, one explode per query
        # row. `_sorted[r]` is the plane index with the r-th smallest
        # margin, so each static set maps to one XOR mask per query.
        sets = _perturbation_sets(n_probes, n_planes)
        bucket_exprs = []
        for s in sets:
            if not s:
                bucket_exprs.append("_qb")
            else:
                mask = " ^ ".join(
                    f"shiftleft(1L, element_at(_sorted, {r + 1}))" for r in s
                )
                bucket_exprs.append(f"_qb ^ ({mask})")
        probe_expr = "array(" + ", ".join(bucket_exprs) + ")"
        sorted_expr = (
            "transform(array_sort(transform(_margins, (m, i) -> "
            "named_struct('a', abs(m), 'i', i))), s -> s.i)"
        )
        q = (
            q.withColumn("_margins", margins)
            .withColumn("_sorted", F.expr(sorted_expr))
            .withColumn("_qb", F.explode(F.expr(probe_expr)))
            .drop("_margins", "_sorted")
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
