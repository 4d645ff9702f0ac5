"""rollback_to (bad-commit recovery) and cherry_pick (WAP publish after
main moved) — snapshot-management surface over the ref/commit machinery.
"""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import (
    DoubleType,
    LongType,
    NestedField,
    Schema,
)


@pytest.fixture()
def cat(tmp_path):
    return FileSystemCatalog(str(tmp_path / "wh"))


def _table(cat, name="db.t", v3=False):
    t = cat.create_table(
        name,
        Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(2, "v", DoubleType()),
        ),
    )
    if v3:
        t.upgrade_format_version(3)
    return t


def _append(t, spark, rows):
    t.append(spark.createDataFrame(rows, "id long, v double").coalesce(1))


def _ids(t, spark, **scan_kwargs):
    return sorted(r.id for r in t.scan(**scan_kwargs).to_df(spark).collect())


def test_rollback_rewinds_main_and_keeps_time_travel(cat, spark):
    t = _table(cat)
    _append(t, spark, [(1, 1.0)])
    s1 = t.current_snapshot().snapshot_id
    _append(t, spark, [(2, 2.0)])
    _append(t, spark, [(3, 3.0)])
    s3 = t.current_snapshot().snapshot_id

    t.rollback_to(s1)
    assert _ids(t, spark) == [1]
    # the rolled-back head stays time-travelable until expiry
    assert _ids(t, spark, snapshot_id=s3) == [1, 2, 3]

    # writing after the rollback diverges from the old head
    _append(t, spark, [(9, 9.0)])
    assert _ids(t, spark) == [1, 9]
    # ...and the old head is NOT an ancestor anymore: refuse
    with pytest.raises(ValueError, match="not an ancestor"):
        t.rollback_to(s3)


def test_rollback_rejects_unknown_snapshot(cat, spark):
    t = _table(cat)
    _append(t, spark, [(1, 1.0)])
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.rollback_to(12345)


def test_cherry_pick_publishes_over_moved_main(cat, spark):
    t = _table(cat)
    _append(t, spark, [(1, 1.0)])
    base = t.current_snapshot().snapshot_id

    # stage a batch on an audit branch, then main moves independently
    t.transaction().set_ref("audit", base).commit()
    t.refresh()
    t.append(
        spark.createDataFrame([(2, 2.0), (3, 3.0)], "id long, v double").coalesce(1),
        branch="audit",
    )
    staged = t.metadata.refs["audit"].snapshot_id
    _append(t, spark, [(4, 4.0)])  # concurrent main commit

    assert t.cherry_pick(staged) is True
    t.refresh()
    assert _ids(t, spark) == [1, 2, 3, 4]
    snap = t.current_snapshot()
    assert snap.summary.operation == "append"
    assert snap.summary.properties["source-snapshot-id"] == str(staged)
    # running totals reflect the reapplied rows
    assert snap.summary.properties["total-records"] == "4"

    # incremental consumers attribute the files to the NEW snapshot
    inc = t.incremental_append_scan(
        from_snapshot_id=None, to_snapshot_id=snap.snapshot_id
    )
    assert len(inc.plan_files()) == len(t.scan().plan_files())

    # picking again is a no-op: the source snapshot itself is not on
    # main's ancestry, but its manifests are — re-applying would
    # duplicate; the ancestry check fires only for published ids, so
    # verify idempotence via the published NEW head instead
    assert t.cherry_pick(snap.snapshot_id) is False


def test_cherry_pick_v3_assigns_fresh_row_lineage(cat, spark):
    t = _table(cat, v3=True)
    _append(t, spark, [(1, 1.0)])
    base = t.current_snapshot().snapshot_id
    t.transaction().set_ref("audit", base).commit()
    t.refresh()
    t.append(
        spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1),
        branch="audit",
    )
    staged = t.metadata.refs["audit"].snapshot_id
    _append(t, spark, [(3, 3.0)])

    assert t.cherry_pick(staged) is True
    t.refresh()
    rows = {
        r.id: r._row_id
        for r in t.scan().with_row_lineage().to_df(spark).collect()
    }
    assert sorted(rows) == [1, 2, 3]
    # every row id unique — the reapplied rows drew FRESH lineage after
    # main's concurrent commit instead of reusing the branch assignment
    assert len(set(rows.values())) == 3
    assert rows[2] > rows[3]  # picked after main's concurrent append


def test_cherry_pick_refuses_non_append(cat, spark):
    from iceberg_go_distributed_spark.iceberg import expressions as E

    t = _table(cat, v3=True)
    _append(t, spark, [(1, 1.0), (2, 2.0)])
    base = t.current_snapshot().snapshot_id
    t.transaction().set_ref("audit", base).commit()
    t.refresh()
    # a delete committed on main; pretend it was staged by id
    t.delete_where(spark, E.equal("id", 1))
    deleted = t.current_snapshot().snapshot_id
    t.rollback_to(base)
    with pytest.raises(ValueError, match="append snapshots only"):
        t.cherry_pick(deleted)


def test_cherry_pick_already_on_main_is_noop(cat, spark):
    t = _table(cat)
    _append(t, spark, [(1, 1.0)])
    s1 = t.current_snapshot().snapshot_id
    _append(t, spark, [(2, 2.0)])
    assert t.cherry_pick(s1) is False


def test_cherry_pick_twice_does_not_duplicate(cat, spark):
    """Re-picking an already-applied staged snapshot is a no-op: the
    applied commit records source-snapshot-id, and re-applying would
    duplicate every row."""
    t = _table(cat)
    _append(t, spark, [(1, 1.0)])
    base = t.current_snapshot().snapshot_id
    t.transaction().set_ref("audit", base).commit()
    t.refresh()
    t.append(
        spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1),
        branch="audit",
    )
    staged = t.metadata.refs["audit"].snapshot_id
    _append(t, spark, [(3, 3.0)])

    assert t.cherry_pick(staged) is True
    t.refresh()
    assert t.cherry_pick(staged) is False  # idempotent
    t.refresh()
    assert _ids(t, spark) == [1, 2, 3]
