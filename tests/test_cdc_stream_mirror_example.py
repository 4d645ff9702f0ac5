"""examples/cdc_stream_mirror.py — exactly-once mirroring of a v3 table
through the first-class CDC stream (delete-by-_row_id + append per
micro-batch, batch-id idempotency ledger on the mirror's snapshots)."""

from __future__ import annotations

import shutil

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import (
    LongType,
    NestedField,
    Schema,
    StringType,
)

from examples.cdc_stream_mirror import mirror_via_cdc_stream


def _rows(t, spark, drop=("_row_id",)):
    df = t.scan().to_df(spark)
    for c in drop:
        if c in df.columns:
            df = df.drop(c)
    return sorted(tuple(r) for r in df.collect())


def test_cdc_stream_mirror(tmp_path, spark):
    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    src_df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, v string"
    )
    src = cat.create_table(
        "db.src",
        Schema(
            0,
            [
                NestedField(1, "id", LongType(), required=False),
                NestedField(2, "v", StringType(), required=False),
            ],
        ),
    )
    src.upgrade_format_version(3)
    src.append(src_df.limit(5).coalesce(1))
    src.append(src_df.subtract(src_df.limit(5)).coalesce(1))
    src.delete_where(spark, E.equal("id", 3))

    mirror = cat.create_table(
        "db.mirror",
        Schema(
            0,
            [
                NestedField(1, "id", LongType(), required=False),
                NestedField(2, "v", StringType(), required=False),
                NestedField(3, "_row_id", LongType(), required=False),
            ],
        ),
    )
    ckpt = str(tmp_path / "ck")

    mirror_via_cdc_stream(spark, wh, "db.src", mirror, ckpt)
    mirror.refresh()
    assert _rows(mirror, spark) == _rows(src, spark)
    # lineage carried through: mirror _row_id set == source lineage ids
    src_ids = sorted(
        r._row_id for r in src.scan().with_row_lineage().to_df(spark).collect()
    )
    mir_ids = sorted(
        r._row_id for r in mirror.scan().to_df(spark).select("_row_id").collect()
    )
    assert mir_ids == src_ids

    # incremental: more commits, drain again from the same checkpoint
    src.append(
        spark.createDataFrame([(8, "v8"), (9, "v9")], "id long, v string").coalesce(1)
    )
    src.delete_where(spark, E.less_than("id", 2))
    mirror_via_cdc_stream(spark, wh, "db.src", mirror, ckpt)
    mirror.refresh()
    assert _rows(mirror, spark) == _rows(src, spark)

    # idle drain applies nothing (no new snapshots on the mirror)
    n_snaps = len(list(mirror.metadata.snapshots))
    mirror_via_cdc_stream(spark, wh, "db.src", mirror, ckpt)
    mirror.refresh()
    assert len(list(mirror.metadata.snapshots)) == n_snaps

    # redelivery: wipe the CHECKPOINT (not the mirror) — the whole
    # history replays as already-seen batch ids, and the idempotency
    # ledger must skip every one of them instead of double-applying
    shutil.rmtree(ckpt)
    mirror_via_cdc_stream(spark, wh, "db.src", mirror, str(tmp_path / "ck"))
    mirror.refresh()
    assert _rows(mirror, spark) == _rows(src, spark)
    rows = mirror.scan().to_df(spark).select("_row_id").collect()
    assert len(rows) == len({r._row_id for r in rows}), "double-applied rows"
