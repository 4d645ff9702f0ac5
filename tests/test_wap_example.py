"""examples/wap_publish.py: staging isolation, audit gating, fast-
forward publish, and the diverged-main refusal."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import (
    DoubleType,
    LongType,
    NestedField,
    Schema,
)


def _table(tmp_path):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    return cat, cat.create_table(
        "db.facts",
        Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(2, "v", DoubleType()),
        ),
    )


def _rows(spark, t):
    return sorted(r.id for r in t.scan().to_df(spark).collect())


def test_wap_happy_path(tmp_path, spark):
    from wap_publish import audit, publish, stage

    cat, t = _table(tmp_path)
    t.append(spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1))

    stage(t, spark.createDataFrame([(2, 2.0), (3, 3.0)], "id long, v double").coalesce(1), "audit-1")
    # staging is invisible on main...
    assert _rows(spark, cat.load_table("db.facts")) == [1]
    # ...but the branch sees main's history plus the staged batch
    staged = t.scan().use_branch_or_tag("audit-1").to_df(spark)
    assert sorted(r.id for r in staged.collect()) == [1, 2, 3]

    def no_nulls(df):
        return df.where("v IS NULL").count() == 0

    audit(t, spark, "audit-1", [no_nulls])
    publish(t, "audit-1")
    assert _rows(spark, cat.load_table("db.facts")) == [1, 2, 3]
    assert "audit-1" not in t.metadata.refs


def test_wap_failed_audit_drops_branch(tmp_path, spark):
    from wap_publish import AuditFailed, audit, stage

    cat, t = _table(tmp_path)
    t.append(spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1))
    stage(t, spark.createDataFrame([(2, None)], "id long, v double").coalesce(1), "audit-bad")

    def no_nulls(df):
        return df.where("v IS NULL").count() == 0

    with pytest.raises(AuditFailed):
        audit(t, spark, "audit-bad", [no_nulls])
    assert "audit-bad" not in t.metadata.refs
    assert _rows(spark, cat.load_table("db.facts")) == [1]  # main untouched


def test_wap_publish_refuses_diverged_main(tmp_path, spark):
    from wap_publish import PublishConflict, publish, stage

    cat, t = _table(tmp_path)
    t.append(spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1))
    stage(t, spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1), "audit-2")

    # a concurrent writer lands on main AFTER the branch was cut
    w = cat.load_table("db.facts")
    w.append(spark.createDataFrame([(9, 9.0)], "id long, v double").coalesce(1))
    t.refresh()

    with pytest.raises(PublishConflict):
        publish(t, "audit-2")
    # nothing was clobbered: main kept the concurrent row, branch intact
    assert _rows(spark, cat.load_table("db.facts")) == [1, 9]
    assert "audit-2" in t.metadata.refs


def test_wap_publish_cherry_picks_over_diverged_main(tmp_path, spark):
    from wap_publish import publish, stage

    cat, t = _table(tmp_path)
    t.append(spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1))
    stage(t, spark.createDataFrame([(2, 2.0)], "id long, v double").coalesce(1), "audit-3")
    staged = t.metadata.refs["audit-3"].snapshot_id

    w = cat.load_table("db.facts")
    w.append(spark.createDataFrame([(9, 9.0)], "id long, v double").coalesce(1))
    t.refresh()

    publish(t, "audit-3", on_conflict="cherry-pick")
    # both the concurrent row and the staged batch survive, branch dropped
    assert _rows(spark, cat.load_table("db.facts")) == [1, 2, 9]
    assert "audit-3" not in t.metadata.refs
    assert t.current_snapshot().summary.properties["source-snapshot-id"] == str(staged)
