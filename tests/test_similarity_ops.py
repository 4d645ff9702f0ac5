"""Similarity operator tests beyond the oracle suite: multi-probe LSH
recall on planted near-neighbors (the property the oracle can't see —
llm_ann_lsh's oracle mirrors the bucketing, so it validates candidate
selection, not recall)."""

from __future__ import annotations

import numpy as np
import pytest

from iceberg_go_distributed_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)


@pytest.fixture(scope="module")
def planted_embeddings(spark):
    """20 unit queries (ids 0-19), one planted partner each at cosine
    ≈ 0.95 (ids 100-119), 400 random fillers (ids 200+). Deterministic:
    fixed rng seed here, fixed plane seed in lsh_planes."""
    rng = np.random.default_rng(42)
    dim, nq, nf = 64, 20, 400
    qs = rng.standard_normal((nq, dim))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    partners = qs + 0.04 * rng.standard_normal((nq, dim))
    partners /= np.linalg.norm(partners, axis=1, keepdims=True)
    fill = rng.standard_normal((nf, dim))
    fill /= np.linalg.norm(fill, axis=1, keepdims=True)
    rows = (
        [(i, [float(x) for x in qs[i]], 0) for i in range(nq)]
        + [(100 + i, [float(x) for x in partners[i]], 0) for i in range(nq)]
        + [(200 + i, [float(x) for x in fill[i]], 0) for i in range(nf)]
    )
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def _recall_at_1(emb, **kwargs):
    got = {
        r.query_id: r.neighbor_id
        for r in ann_lsh_topk(emb, max_query_id=20, k=1, **kwargs).collect()
    }
    return sum(1 for i in range(20) if got.get(i) == 100 + i) / 20


def test_planted_partner_is_true_nearest(planted_embeddings):
    """Sanity: brute force finds every planted partner (so LSH recall
    below is measured against a meaningful ground truth)."""
    got = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(planted_embeddings, max_query_id=20, k=1).collect()
    }
    assert got == {i: 100 + i for i in range(20)}


def test_multi_probe_recovers_recall(planted_embeddings):
    """At 8 planes (256 buckets over 440 vectors) single-probe recall
    collapses — a cos≈0.95 pair still splits across buckets with
    probability ≈ 1-(0.9)^8. Probing the 3 lowest-margin bit-flip
    buckets recovers most of it. Deterministic given the fixed seeds."""
    single = _recall_at_1(planted_embeddings, n_planes=8, n_probes=1)
    multi = _recall_at_1(planted_embeddings, n_planes=8, n_probes=4)
    assert single <= 0.5  # the problem multi-probe exists to fix
    assert multi >= 0.75
    assert multi >= single + 0.3


def test_multi_probe_is_superset_of_single(planted_embeddings):
    """Extra probes only add candidates: every single-probe result pair
    survives (same exact re-rank, wider candidate set, same k means
    ranks can only improve for true neighbors)."""
    single = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(
            planted_embeddings, max_query_id=20, k=5, n_planes=8, n_probes=1
        ).collect()
    }
    multi_candidates = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(
            planted_embeddings, max_query_id=20, k=500, n_planes=8, n_probes=4
        ).collect()
    }
    assert single <= multi_candidates
