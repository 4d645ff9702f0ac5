"""examples/merge_patch.py: patch semantics vs a pandas recompute, file
pruning under a banded patch, eq-delete debt relief preserving visible
rows, and the CDC mirror seeing every patch exactly once."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from merge_patch import (
    PatchCardinalityError,
    apply_patch,
    eq_delete_debt,
    relieve_debt,
)

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark


@pytest.fixture()
def facts(tmp_path, spark):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"t{i % 5}", float(i)) for i in range(400)],
        "id long, tenant string, amount double",
    )
    t = cat.create_table("db.facts", schema_from_spark(df.schema))
    t.upgrade_format_version(3)
    # 4 files with disjoint id ranges so a banded patch can prune
    for b in range(4):
        t.append(df.where((F.col("id") >= b * 100) & (F.col("id") < (b + 1) * 100)).coalesce(1))
    t.refresh()
    return cat, t


def test_patch_update_insert_delete_semantics(facts, spark):
    cat, t = facts
    patch = spark.createDataFrame(
        [
            (5, "t0", 555.0, False),    # update
            (900, "t9", 9.0, False),    # insert (new key)
            (7, "t2", 0.0, True),       # delete
            (901, "t9", 1.0, True),     # delete of an ABSENT key: no-op,
                                        # must NOT insert (ANSI NOT
                                        # MATCHED AND condition)
        ],
        "id long, tenant string, amount double, deleted boolean",
    )
    assert apply_patch(t, spark, patch, on=["id"], delete_marker="deleted")
    t.refresh()
    rows = {r.id: (r.tenant, r.amount) for r in t.scan().to_df(spark).collect()}
    assert rows[5] == ("t0", 555.0)
    assert rows[900] == ("t9", 9.0)
    assert 7 not in rows and 901 not in rows
    assert len(rows) == 400  # 400 - 1 deleted + 1 inserted


def test_null_delete_marker_updates_instead_of_deleting(facts, spark):
    """A NULL marker is 'condition not true': the row must fall through
    to UPDATE (and a NULL marker on a new key must still insert) — a
    bare `source.marker` condition would equality-delete the key while
    emitting neither the update nor the insert (data loss)."""
    _, t = facts
    patch = spark.createDataFrame(
        [(5, "t0", 555.0, None), (900, "t9", 9.0, None)],
        "id long, tenant string, amount double, deleted boolean",
    )
    assert apply_patch(t, spark, patch, on=["id"], delete_marker="deleted")
    t.refresh()
    rows = {r.id: (r.tenant, r.amount) for r in t.scan().to_df(spark).collect()}
    assert rows[5] == ("t0", 555.0)      # updated, NOT deleted
    assert rows[900] == ("t9", 9.0)      # inserted despite NULL marker
    assert len(rows) == 401


def test_patch_rejects_duplicate_keys(facts, spark):
    _, t = facts
    patch = spark.createDataFrame(
        [(5, "a", 1.0), (5, "b", 2.0)], "id long, tenant string, amount double"
    )
    with pytest.raises(PatchCardinalityError):
        apply_patch(t, spark, patch, on=["id"])


def test_banded_patch_prunes_target_files(facts, spark):
    """A patch whose keys live in one id band plans one file of four."""
    from iceberg_go_distributed_spark.iceberg.write import (
        _resolve_key_fields,
        _source_key_prune_filter,
    )

    _, t = facts
    patch = spark.createDataFrame(
        [(110 + i, "tx", float(i)) for i in range(20)],
        "id long, tenant string, amount double",
    )
    flt = _source_key_prune_filter(
        patch, _resolve_key_fields(t.metadata.current_schema(), ["id"])
    )
    assert len(t.scan(flt).plan_files()) == 1
    assert len(t.scan().plan_files()) == 4
    assert apply_patch(t, spark, patch, on=["id"])


def test_debt_relief_threshold_and_row_preservation(facts, spark):
    cat, t = facts
    for i in range(4):
        patch = spark.createDataFrame(
            [(i * 10 + j, "patched", float(i)) for j in range(3)],
            "id long, tenant string, amount double",
        )
        apply_patch(t, spark, patch, on=["id"])
        t.refresh()
    assert eq_delete_debt(t) == 4
    before = sorted(
        (r.id, r.tenant, r.amount) for r in t.scan().to_df(spark).collect()
    )
    assert relieve_debt(t, spark, max_eq_files=8) is False  # under threshold
    assert relieve_debt(t, spark, max_eq_files=3) is True
    t.refresh()
    assert eq_delete_debt(t) == 0
    after = sorted(
        (r.id, r.tenant, r.amount) for r in t.scan().to_df(spark).collect()
    )
    assert after == before


def test_patches_flow_through_cdc_mirror(facts, tmp_path, spark):
    """The CDC stream delivers each patch as delete+insert events, and
    the conversion snapshot (a 'replace') delivers nothing."""
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    cat, t = facts
    patch = spark.createDataFrame(
        [(5, "t0", 555.0), (900, "t9", 9.0)],
        "id long, tenant string, amount double",
    )
    apply_patch(t, spark, patch, on=["id"])
    t.refresh()
    relieve_debt(t, spark, max_eq_files=0)

    seen: list[tuple] = []
    q = (
        iceberg_stream(spark, cat.warehouse, "db.facts", mode="cdc")
        .writeStream.foreachBatch(
            lambda b, _id: seen.extend(
                (r.id, r.amount, r._change_type) for r in b.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    assert (5, 555.0, "insert") in seen and (5, 5.0, "delete") in seen
    assert (900, 9.0, "insert") in seen
    # exactly once: the conversion 'replace' snapshot emitted nothing
    assert sorted(seen).count((5, 555.0, "insert")) == 1
    inserts = sum(1 for r in seen if r[2] == "insert")
    assert inserts == 400 + 2  # initial appends + the patch's two rows
