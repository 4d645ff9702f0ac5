"""Patch-apply — the "small correction into a huge table" workflow.

A data platform constantly lands small fixes into big fact tables: a
vendor re-states yesterday's prices, a compliance job redacts a few
thousand rows, an ops script backfills one tenant. The naive plan reads
the whole table to touch almost nothing; at 100 TB it is simply not
runnable. This example composes the engine's pieces into the shape that
IS runnable:

1. `apply_patch` — one multi-action MERGE. The target scan is pruned by
   the patch's key statistics (`Table.merge(prune_target=True)`, the
   default): partition and file-metrics pruning plan only the files the
   keys can live in, so cost scales with the PATCH's key locality, not
   the table. The commit is merge-on-read: a data manifest (updated +
   inserted rows) plus an equality-delete manifest land in ONE snapshot.
2. `relieve_debt` — every patch adds one equality-delete file, and every
   subsequent read pays a keyed anti-join per file. Past a threshold,
   `convert_equality_deletes` materializes the debt into deletion
   vectors (bitmap skips, no data rewrite).
3. Downstream consumers never stop: the CDC stream (`mode="cdc"`)
   delivers each patch as row-level delete+insert events — including
   the equality-delete commits, expanded executor-side — and the
   conversion snapshot is a 'replace' the stream correctly skips.

Pinned by tests/test_merge_patch_example.py: patch semantics vs a plain
recompute, file pruning under a banded patch, debt relief preserving
the visible rows, and the CDC mirror seeing every patch exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class PatchCardinalityError(ValueError):
    """The patch carries duplicate key tuples — deduplicate upstream
    (which row should win?) rather than letting MERGE guess."""


def apply_patch(
    table,
    spark: SparkSession,
    patch: DataFrame,
    on: list[str],
    delete_marker: str | None = None,
) -> bool:
    """Apply one patch batch in ONE snapshot.

    Patch rows update matching target rows column-for-column, insert
    when the key is new, and — when `delete_marker` names a boolean
    patch column — delete the target row where it is true. Returns
    False when the patch produced no change (no snapshot committed).
    """
    from iceberg_go_distributed_spark.iceberg.write import MergeCardinalityError

    data_cols = [c for c in patch.columns if c != delete_marker]
    try:
        return table.merge(
            spark,
            patch,
            on=on,
            matched_update={
                c: f"source.{c}" for c in data_cols if c not in on
            },
            # coalesce: a NULL marker must fall through to UPDATE (ANSI
            # 'condition not true'), not silently delete — a bare
            # `source.marker` would exclude the row from both the update
            # and the sibling re-emit while still equality-deleting its
            # key (TRUE & ~NULL = NULL), i.e. data loss
            matched_delete_condition=(
                f"coalesce(source.{delete_marker}, false)"
                if delete_marker
                else None
            ),
            not_matched_insert=(
                {c: f"source.{c}" for c in data_cols}
                if delete_marker
                else True
            ),
            # a patch row that only flags a deletion must not insert
            # when its key is already absent (ANSI WHEN NOT MATCHED AND)
            not_matched_insert_condition=(
                f"NOT coalesce(source.{delete_marker}, false)"
                if delete_marker
                else None
            ),
        )
    except MergeCardinalityError as exc:
        raise PatchCardinalityError(str(exc)) from exc


def eq_delete_debt(table) -> int:
    """Number of live equality-delete files — the per-read anti-join tax
    accumulated by patches since the last conversion."""
    from iceberg_go_distributed_spark.iceberg.manifest import (
        DataFileContent,
        ManifestContent,
        read_manifest,
    )

    snap = table.current_snapshot()
    if snap is None:
        return 0
    n = 0
    for m in snap.manifests():
        if m.content != ManifestContent.DELETES:
            continue
        for e in read_manifest(
            m.manifest_path, inherit_sequence_number=m.sequence_number
        ):
            if e.data_file.content == DataFileContent.EQUALITY_DELETES:
                n += 1
    return n


def relieve_debt(table, spark: SparkSession, max_eq_files: int = 8) -> bool:
    """Convert accumulated equality-delete files into deletion vectors
    once the debt passes `max_eq_files` (one 'replace' snapshot, no data
    rewrite). Returns True when a conversion ran."""
    from iceberg_go_distributed_spark.iceberg.maintenance import (
        convert_equality_deletes,
    )

    if eq_delete_debt(table) <= max_eq_files:
        return False
    return convert_equality_deletes(table, spark)
