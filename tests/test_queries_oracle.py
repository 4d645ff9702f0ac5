"""Every registered query vs its DuckDB oracle at sf0.001.

Mirrors the driver's CORRECTNESS gate: row count, column names, and
order-insensitive value comparison (columns sorted by name, rows sorted).
Floats compared with tiny relative tolerance; everything else exact.
"""

from __future__ import annotations

import math

import pytest

from iceberg_go_distributed_spark.queries import all_queries

REGISTRY = all_queries()
ORACLE_CASES = sorted(n for n, qd in REGISTRY.items() if qd.oracle)
ROWS_ONLY_CASES = sorted(n for n, qd in REGISTRY.items() if not qd.oracle)


def _normalize(val):
    if val is None:
        return None
    if isinstance(val, float):
        return val
    if hasattr(val, "isoformat"):  # datetime/date
        return val.isoformat()
    if isinstance(val, list):
        return tuple(_normalize(v) for v in val)
    return val


def _sort_key(row):
    return tuple((v is None, str(v)) for v in row)


def compare_results(spark_rows, spark_cols, duck_rows, duck_cols):
    assert sorted(c.lower() for c in spark_cols) == sorted(c.lower() for c in duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    # reorder both to columns sorted by name (case-insensitive), rows sorted
    s_order = [i for i, _ in sorted(enumerate(spark_cols), key=lambda t: t[1].lower())]
    d_order = [i for i, _ in sorted(enumerate(duck_cols), key=lambda t: t[1].lower())]
    s = sorted(
        (tuple(_normalize(r[i]) for i in s_order) for r in spark_rows), key=_sort_key
    )
    d = sorted(
        (tuple(_normalize(r[i]) for i in d_order) for r in duck_rows), key=_sort_key
    )
    for ri, (sr, dr) in enumerate(zip(s, d)):
        for ci, (sv, dv) in enumerate(zip(sr, dr)):
            if isinstance(sv, float) or isinstance(dv, float):
                if sv is None or dv is None:
                    assert sv == dv, f"row {ri} col {ci}: {sv!r} != {dv!r}"
                else:
                    assert math.isclose(float(sv), float(dv), rel_tol=1e-9, abs_tol=1e-9), (
                        f"row {ri} col {ci}: {sv!r} != {dv!r}"
                    )
            else:
                assert sv == dv, f"row {ri} col {ci}: {sv!r} != {dv!r}"


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, ducks, sf_dir, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    spark_rows = [tuple(r) for r in df.collect()]
    duck = ducks.execute(qd.oracle)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()
    compare_results(spark_rows, df.columns, duck_rows, duck_cols)
    assert len(spark_rows) > 0, f"{name}: vacuous test (0 rows on both sides)"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_query_runs(spark, sf_dir, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    assert df.count() >= 0


def test_registry_priority_window():
    """The driver verifies only the first 50 registry entries per round;
    every table-layer (ice_*) and curation (llm_*) oracle must be inside
    that window — they are the components whose only hard correctness
    signal is a driver row."""
    names = list(REGISTRY)
    window = set(names[:50])
    # Deliberately outside (each subsumed by an in-window entry with the
    # same execution shape, and five-plus-rounds driver-green before
    # moving):
    #   llm_ann_ivf          — llm_ann_ivf_trained covers the cell-scan
    #                          read path with trained centroids on top
    #   llm_dedup_fingerprint — same hash-groupBy shape as llm_dedup_exact
    #   llm_token_stats      — map-only accounting strictly extended by
    #                          llm_quality_filter (in-window)
    #   llm_doc_fingerprints — same md5-map shape as llm_dedup_exact
    # Round 7 rotations out (to admit ev_value_quantiles/_histogram and
    # ice_partitioned_write_mor):
    #   ev_skew_salted_agg   — six rounds green; salted two-phase agg
    #                          verified locally every round
    #   q9_product_profit    — five rounds green; q18 covered the
    #                          fact⋈fact exchange, q1 the wide agg
    #   q18_large_volume_customers — six rounds green; semi-join-on-agg
    #                          + fact⋈fact exchange verified by the
    #                          local oracle suite every round
    exempt = {
        "llm_ann_ivf",
        "llm_dedup_fingerprint",
        "llm_token_stats",
        "llm_doc_fingerprints",
    }
    inside = [
        n
        for n in names
        if n.startswith(("ice_", "llm_")) and n not in exempt
    ]
    missing = [n for n in inside if n not in window]
    assert not missing, f"priority window lost: {missing}"
    # never-driver-verified-before-round-7 operators must be in the window
    for n in (
        "ev_asof_attribution",
        "ev_range_count",
        "ev_funnel",
        "ev_retention_cohorts",
        "llm_pii_scan",
        "llm_term_cooccurrence",
        "ev_value_quantiles",
        "ev_value_histogram",
        "ice_partitioned_write_mor",
    ):
        assert n in window, f"{n} outside the driver window"
    # Tail entries must still be registered (local oracle coverage).
    assert len(names) == len(set(names))
