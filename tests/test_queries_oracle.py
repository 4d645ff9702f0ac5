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
    signal is a driver row. The exempt set is DERIVED from the
    ROTATED_OUT ledger (queries/__init__.py), not hand-listed here; the
    ledger itself is validated by test_rotation_ledger_policy below."""
    from iceberg_go_distributed_spark.queries import ROTATED_OUT

    names = list(REGISTRY)
    window = set(names[:50])
    inside = [
        n
        for n in names
        if n.startswith(("ice_", "llm_")) and n not in ROTATED_OUT
    ]
    missing = [n for n in inside if n not in window]
    assert not missing, f"priority window lost: {missing}"
    # rotated entries must actually be OUTSIDE the window (a rotation
    # that never happened would silently waste a ledger row)
    still_inside = [n for n in ROTATED_OUT if n in window]
    assert not still_inside, f"ledger says rotated but still in window: {still_inside}"
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
        "ice_stream_cdc",
        # round-8 additions — never driver-verified, so in-window
        "q12_late_priority_lines",
        "q21_suppliers_kept_waiting",
        # round-12 additions — the last four never-driver-verified
        # queries, rotated in per VERDICT r11 task 1
        "q2_min_cost_supplier",
        "q11_important_stock",
        "q16_part_supplier_relation",
        "q20_dominant_suppliers",
    ):
        assert n in window, f"{n} outside the driver window"
    assert len(names) == len(set(names))


def test_rotation_ledger_policy():
    """Mechanical audit of the rotation ledger (VERDICT r7 task 7):
    every ROTATED_OUT entry must (1) still be registered — the local
    oracle suite keeps verifying it; (2) either have had >=
    ROTATION_MIN_GREEN consecutive driver-green rounds immediately
    before its rotation round — checked against the recorded
    CORRECTNESS_r*.json artifacts, not prose — or name an IN-window
    entry that subsumes its execution shape; (3) carry its rationale."""
    import json
    import os

    from iceberg_go_distributed_spark.queries import (
        ROTATED_OUT,
        ROTATION_MIN_GREEN,
    )

    names = list(REGISTRY)
    window = set(names[:50])
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def round_results(r):
        path = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_green(entry):
        if entry is None:
            return False
        return bool(entry.get("hash_match")) or (
            entry.get("err") == "no_oracle" and entry.get("spark_rows") is not None
        )

    def greens_before(name, since):
        """Consecutive driver-green rounds immediately before `since`."""
        greens = 0
        for r in range(since - 1, 0, -1):
            results = round_results(r)
            if results is None or not is_green(results.get(name)):
                break
            greens += 1
        return greens

    for name, row in ROTATED_OUT.items():
        assert name in REGISTRY, f"{name}: rotated entry fell out of the registry"
        assert row["why"].strip(), f"{name}: ledger entry missing rationale"
        sub = row["subsumed_by"]
        if sub is not None:
            # the subsuming shape must carry driver evidence itself:
            # either it is in the window now, or it rotated out on its
            # own >= MIN consecutive green rounds (transitive evidence)
            sub_ok = sub in window or (
                sub in ROTATED_OUT
                and greens_before(sub, ROTATED_OUT[sub]["since_round"])
                >= ROTATION_MIN_GREEN
            )
            assert sub_ok, (
                f"{name}: subsumed_by {sub!r} has no driver evidence "
                "(not in window, not green-rotated)"
            )
        since = row["since_round"]
        if round_results(since - 1) is None:
            # artifact history unavailable (fresh clone without the
            # driver artifacts): the structural clauses above still hold
            continue
        greens = greens_before(name, since)
        assert greens >= ROTATION_MIN_GREEN or sub is not None, (
            f"{name}: rotated at r{since} with only {greens} consecutive "
            f"green rounds and no shape subsumption"
        )
        # and rotation must not predate the entry's last green round
        # (a red entry may never be rotated out instead of fixed)
        last = round_results(since - 1)
        assert is_green(last.get(name)), (
            f"{name}: not driver-green in the round before its rotation"
        )
        # numeric streak claims in `why` must match the artifacts exactly
        # (VERDICT r12 task 7: a miscounted streak is a drifted ledger)
        import re

        m = re.search(
            r"(\d+) (?:driver-green rounds|green rounds|"
            r"rows-only-green driver rounds)",
            row["why"],
        )
        if m is not None:
            claimed = int(m.group(1))
            actual = sum(
                1
                for r in range(1, since)
                if is_green((round_results(r) or {}).get(name))
            )
            assert claimed == actual, (
                f"{name}: ledger claims {claimed} green rounds but the "
                f"CORRECTNESS artifacts record {actual}"
            )
