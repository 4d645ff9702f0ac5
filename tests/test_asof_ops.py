"""As-of / range-join operator semantics on hand-built frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from iceberg_go_distributed_spark.operators.asof import asof_join, range_join_count


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, v double"
    )


def test_asof_backward_inclusive_and_left(spark):
    left = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T10:00:00"), 0.0),
            (2, 1, _ts("2024-01-01T12:00:00"), 0.0),
            (3, 2, _ts("2024-01-01T09:00:00"), 0.0),  # no right row at all
        ],
    )
    right = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01T09:30:00"), 1.5),
            (11, 1, _ts("2024-01-01T12:00:00"), 2.5),  # equal ts: inclusive
            (12, 1, _ts("2024-01-01T13:00:00"), 3.5),  # future: never matches
        ],
    )
    out = {
        r.event_id: r
        for r in asof_join(
            left, right, on="user_id", right_cols=("v",), tie_break="event_id"
        ).collect()
    }
    assert out[1].v_r == 1.5 and out[1]._asof_gap_us == 1800 * 1_000_000
    assert out[2].v_r == 2.5 and out[2]._asof_gap_us == 0  # <= is inclusive
    assert out[3].v_r is None and out[3]._asof_gap_us is None  # left row kept


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _events(spark, [(1, 1, _ts("2024-01-01T10:00:00"), 0.0)])
    right = _events(spark, [(10, 1, _ts("2024-01-01T08:00:00"), 9.0)])
    strict = asof_join(
        left, right, on="user_id", right_cols=("v",), tolerance_us=3600 * 1_000_000
    ).collect()[0]
    assert strict.v_r is None and strict._asof_gap_us is None
    loose = asof_join(
        left, right, on="user_id", right_cols=("v",), tolerance_us=3 * 3600 * 1_000_000
    ).collect()[0]
    assert loose.v_r == 9.0


def test_asof_tie_break_deterministic(spark):
    left = _events(spark, [(1, 1, _ts("2024-01-01T10:00:00"), 0.0)])
    right = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01T09:00:00"), 1.0),
            (11, 1, _ts("2024-01-01T09:00:00"), 2.0),  # same ts, higher id wins
        ],
    )
    r = asof_join(
        left, right, on="user_id", right_cols=("v",), tie_break="event_id"
    ).collect()[0]
    assert r.v_r == 2.0


def test_range_join_counts_and_zero_rows(spark):
    ev = _events(
        spark,
        [
            (1, 1, _ts("2024-01-01T10:00:00"), 0.0),
            (2, 1, _ts("2024-01-01T10:04:00"), 0.0),  # within 5min of 1
            (3, 1, _ts("2024-01-01T10:06:00"), 0.0),  # within 5min of 2, not 1
            (4, 2, _ts("2024-01-01T10:00:00"), 0.0),  # other user, isolated
            (5, 3, _ts("2024-01-01T23:59:00"), 0.0),  # bucket-boundary straddle
            (6, 3, _ts("2024-01-02T00:01:00"), 0.0),
        ],
    )
    out = {
        r.event_id: r.n_nearby
        for r in range_join_count(ev, ev, on="user_id", radius_us=300_000_000).collect()
    }
    assert out == {1: 1, 2: 2, 3: 1, 4: 0, 5: 1, 6: 1}


def test_range_join_no_shuffle_explosion(spark):
    """The exact interval predicate must not appear in the join: the plan
    joins on (key, bucket) equi-conditions only."""
    ev = _events(spark, [(1, 1, _ts("2024-01-01T10:00:00"), 0.0)])
    plan = range_join_count(ev, ev, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_matches_pandas_merge_asof(spark):
    """Property check against the public reference semantics: for random
    per-key event sets, asof_join == pandas.merge_asof(direction=
    'backward') on the matched timestamp (gap), modulo merge_asof's
    lack of key-aware tolerance edge cases (none generated here)."""
    import random

    import pandas as pd

    rng = random.Random(20260814)
    base = 1_700_000_000_000_000
    lrows, rrows = [], []
    eid = 0
    for user in range(6):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            lrows.append((eid, user, base + rng.randint(0, 10_000) * 1_000_000))
        for _ in range(rng.randint(0, 12)):
            eid += 1
            rrows.append((eid, user, base + rng.randint(0, 10_000) * 1_000_000))

    ldf = spark.createDataFrame(
        [(i, u, us) for i, u, us in lrows], "event_id long, user_id long, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    rdf = spark.createDataFrame(
        [(i, u, us) for i, u, us in rrows], "event_id long, user_id long, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))

    got = {
        r.event_id: r._asof_gap_us
        for r in asof_join(ldf, rdf, on="user_id", tie_break="event_id").collect()
    }

    lp = pd.DataFrame(lrows, columns=["event_id", "user_id", "us"]).sort_values("us", kind="stable")
    rp = pd.DataFrame(rrows, columns=["event_id", "user_id", "us"]).sort_values("us", kind="stable")
    rp["rts"] = rp.us  # keep the matched right ts (merge consumes `us`)
    m = pd.merge_asof(lp, rp, on="us", by="user_id", direction="backward", suffixes=("", "_r"))
    want = {
        int(row.event_id): None if pd.isna(row.rts) else int(row.us) - int(row.rts)
        for _, row in m.iterrows()
    }
    assert got == want


def test_range_join_matches_bruteforce_random(spark):
    """Randomized check: bucketed range join == brute-force interval
    scan on arbitrary timestamps (including bucket-boundary cases)."""
    import random

    rng = random.Random(6)
    base = 1_700_000_000_000_000
    rows = [
        (i, rng.randint(0, 3), base + rng.randint(0, 2_000) * 1_000_000)
        for i in range(120)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    radius = 300_000_000
    got = {
        r.event_id: r.n_nearby
        for r in range_join_count(ev, ev, on="user_id", radius_us=radius).collect()
    }
    want = {
        i: sum(
            1
            for j, uj, usj in rows
            if j != i and uj == u and abs(usj - usi) <= radius
        )
        for i, u, usi in rows
    }
    assert got == want


def test_asof_forward_direction(spark):
    left = _events(spark, [(1, 1, _ts("2024-01-01T10:00:00"), 0.0)])
    right = _events(
        spark,
        [
            (10, 1, _ts("2024-01-01T09:00:00"), 1.0),  # past: never matches
            (11, 1, _ts("2024-01-01T10:30:00"), 2.0),  # earliest future wins
            (12, 1, _ts("2024-01-01T11:00:00"), 3.0),
        ],
    )
    r = asof_join(
        left, right, on="user_id", right_cols=("v",), direction="forward"
    ).collect()[0]
    assert r.v_r == 2.0 and r._asof_gap_us == 1800 * 1_000_000
    # tolerance in the forward direction
    strict = asof_join(
        left, right, on="user_id", right_cols=("v",),
        direction="forward", tolerance_us=60 * 1_000_000,
    ).collect()[0]
    assert strict.v_r is None and strict._asof_gap_us is None


def test_asof_composite_key(spark):
    """Multi-column join keys: matches must respect EVERY key column."""
    left = spark.createDataFrame(
        [(1, 1, "eu", _ts("2024-01-01T10:00:00")), (2, 1, "us", _ts("2024-01-01T10:00:00"))],
        "event_id bigint, user_id bigint, region string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, "eu", _ts("2024-01-01T09:00:00"), 1.0),
         (1, "us", _ts("2024-01-01T09:30:00"), 2.0)],
        "user_id bigint, region string, ts timestamp, v double",
    )
    out = {
        r.event_id: (r.v, r._asof_gap_us)
        for r in asof_join(
            left, right, on=["user_id", "region"], right_cols=("v",)
        ).collect()
    }
    assert out[1] == (1.0, 3600 * 1_000_000)
    assert out[2] == (2.0, 1800 * 1_000_000)


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: NULL join keys match nothing on either
    side (DuckDB ASOF / merge_asof parity), instead of null-grouping."""
    left = spark.createDataFrame(
        [(1, None, _ts("2024-01-01T10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, _ts("2024-01-01T09:00:00"), 7.0), (1, _ts("2024-01-01T09:00:00"), 8.0)],
        "user_id bigint, ts timestamp, v double",
    )
    r = asof_join(left, right, on="user_id", right_cols=("v",)).collect()[0]
    assert r.v is None and r._asof_gap_us is None  # left row kept, unmatched


def test_asof_right_col_named_ats(spark):
    """Review regression: a right payload column named 'ats' must not
    collide with the internal matched-timestamp field."""
    left = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01T10:00:00"))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:00:00"), 42.0)],
        "user_id bigint, ts timestamp, ats double",
    )
    r = asof_join(left, right, on="user_id", right_cols=("ats",)).collect()[0]
    assert r.ats == 42.0 and r._asof_gap_us == 3600 * 1_000_000


def test_asof_hot_key_skew_correct_and_bounded(spark):
    """Skew stress (VERDICT r7 task 8): one key holds 90% of both sides.
    The union-then-window plan serializes a hot key's carry-forward (as-of
    order is inherently sequential per key), so this pins (a) exact
    correctness under skew vs pandas.merge_asof and (b) that the cost is
    time-linear, not quadratic: the skewed run must stay within a loose
    constant factor of a uniform run over the same row counts. The
    escape hatch for pathological keys (range-salt the hot key into time
    slices, carry the slice boundary) is documented in SCALE.md."""
    import time

    import pandas as pd

    n_left, n_right = 60_000, 30_000

    def mk(skewed: bool):
        # deterministic congruential values; key 0 takes 90% when skewed
        left = spark.range(n_left).select(
            F.col("id").alias("event_id"),
            (
                F.when((F.col("id") % 10) < 9, F.lit(0)).otherwise(F.col("id") % 100)
                if skewed
                else F.col("id") % 100
            ).alias("user_id"),
            F.timestamp_micros(
                (F.col("id") * 7919 % 1_000_000_000).cast("long")
            ).alias("ts"),
            F.lit(0.0).alias("v"),
        )
        right = spark.range(n_right).select(
            (F.col("id") + 1_000_000).alias("event_id"),
            (
                F.when((F.col("id") % 10) < 9, F.lit(0)).otherwise(F.col("id") % 100)
                if skewed
                else F.col("id") % 100
            ).alias("user_id"),
            F.timestamp_micros(
                (F.col("id") * 104729 % 1_000_000_000).cast("long")
            ).alias("ts"),
            (F.col("id") % 997).cast("double").alias("v"),
        )
        return left, right

    def run(skewed: bool):
        left, right = mk(skewed)
        t0 = time.perf_counter()
        out = asof_join(
            left, right, on="user_id", right_cols=("v",), tie_break="event_id"
        )
        n = out.count()
        return time.perf_counter() - t0, out, left, right

    t_uniform, _, _, _ = run(False)
    t_skew, out, left, right = run(True)

    # (a) exact correctness on the skewed data vs pandas.merge_asof
    lp = left.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    rp = (
        right.toPandas()
        .sort_values(["ts", "event_id"])  # tie_break=event_id: last wins
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        lp, rp, on="ts", by="user_id", direction="backward", suffixes=("", "_r")
    )
    got = out.toPandas().set_index("event_id")["v_r"]
    want = want.set_index("event_id")["v_r"]
    assert len(got) == n_left
    merged = pd.DataFrame({"got": got, "want": want})
    bad = merged[
        ~(
            (merged.got.isna() & merged.want.isna())
            | (merged.got == merged.want)
        )
    ]
    assert bad.empty, bad.head(10)

    # (b) time-linear under skew: generous bound only flags quadratic
    # blowups or a single-partition plan, not scheduler noise
    assert t_skew < max(6 * t_uniform, 15.0), (t_skew, t_uniform)
