"""examples/delete_maintenance.py: the two-tier delete-maintenance loop
keeps scan results invariant while bounding DV scatter and delete debt."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


def _live_delete_files(t):
    from iceberg_go_distributed_spark.iceberg.manifest import (
        ManifestContent,
        read_manifest,
    )

    return {
        e.data_file.file_path
        for m in t.current_snapshot().manifests()
        if m.content == ManifestContent.DELETES
        for e in read_manifest(m.manifest_path)
    }


def test_delete_stream_maintenance(tmp_path, spark, sf_dir):
    from delete_maintenance import delete_debt, maintain

    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    li = load_table(spark, sf_dir, "lineitem")
    rows = [r.asDict() for r in li.limit(120).collect()]
    for i, r in enumerate(rows):
        r["l_orderkey"] = i
    df = spark.createDataFrame(rows, li.schema)

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.curated", schema_from_spark(df.schema))
    t.upgrade_format_version(3)
    for lo, hi in ((0, 40), (40, 80), (80, 120)):
        t.append(df.where(f"l_orderkey >= {lo} AND l_orderkey < {hi}").coalesce(1))

    alive = set(range(120))

    def check():
        got = {r.l_orderkey for r in t.scan().to_df(spark).select("l_orderkey").collect()}
        assert got == alive

    # ---- phase 1: light delete stream → cheap tier only
    for batch in ([5, 6], [45, 46], [85, 86]):
        t.delete_where(spark, E.is_in("l_orderkey", batch))
        alive -= set(batch)
    assert len(_live_delete_files(t)) == 3  # scattered
    assert delete_debt(t) < 0.3
    assert maintain(t, spark) == "consolidated"
    assert len(_live_delete_files(t)) == 1  # repacked, no data rewrite
    check()

    # idle tick: nothing to do
    assert maintain(t, spark) == "noop"
    check()

    # ---- phase 2: heavy deletes push debt past the threshold → compaction
    heavy = [k for k in alive if k % 2 == 0]
    t.delete_where(spark, E.is_in("l_orderkey", heavy))
    alive -= set(heavy)
    assert delete_debt(t) >= 0.3
    assert maintain(t, spark) == "compacted"
    assert _live_delete_files(t) == set()  # debt cleared with the rewrite
    check()


def test_equality_debt_tier(tmp_path, spark, sf_dir):
    """The new cheapest tier: upsert/MERGE equality-delete debt converts
    to DVs before any consolidation or compaction is considered."""
    from delete_maintenance import equality_debt, maintain

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(200)], "id long, v double"
    )
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.eqd", schema_from_spark(df.schema))
    t.upgrade_format_version(3)
    t.append(df.coalesce(2))

    assert equality_debt(t) == 0
    t.upsert(
        spark.createDataFrame([(7, 700.0), (8, 800.0)], "id long, v double"),
        ["id"],
    )
    assert equality_debt(t) == 2
    assert maintain(t, spark) == "converted"
    assert equality_debt(t) == 0
    rows = {r.id: r.v for r in t.scan().to_df(spark).collect()}
    assert rows[7] == 700.0 and rows[8] == 800.0 and len(rows) == 200
    assert maintain(t, spark) in ("noop", "consolidated")
