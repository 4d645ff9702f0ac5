"""The write path: the fork's distributed-snapshot protocol mapped onto
Spark (SURVEY §3.3 — this is Spark's native shape):

  coordinator (driver)   BeginDistributedSnapshot → reserve snapshot id
                         + commit UUID (ref distributed_snapshot.go:52-76)
  workers (executors)    mapInPandas: write Parquet files (bin-packed or
                         partition-fanout), harvest footer stats, return
                         DataFile descriptor rows (ref manifest.go:1137
                         NewManifestWriterForSnapshot — workers need no
                         transaction)
  coordinator            build Avro manifest(s) + manifest list, commit
                         AddSnapshot+SetSnapshotRef guarded by
                         AssertRefSnapshotID(main, parent); on CAS
                         conflict, refresh and restart from reservation
                         (ref distributed_snapshot.go:83-114,
                         transaction.go:157-225,
                         docs/distributed_snapshot_design.md:89-93)

Scale notes: descriptor rows are O(files), not O(rows) — the only data
crossing the executor→driver boundary is metadata. Partitioned writes
repartition by the transform expressions first so each task's fanout
writer sees few partitions (the shuffle replaces the reference's
bounded-worker fanout, partitioned_fanout_writer.go:54-256).
"""

from __future__ import annotations

import json
import os
import uuid as _uuid
from dataclasses import dataclass
from typing import Any, Iterator, Optional

from .catalog import CommitConflictError
from .manifest import (
    DataFile,
    ManifestEntry,
    ManifestEntryStatus,
    write_manifest,
)
from .metadata import MAIN_BRANCH, Summary
from .partitioning import PartitionSpec
from .types import (
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IcebergType,
    IntegerType,
    LongType,
    Schema,
    StringType,
    TimestampType,
    TimestampTzType,
)

TARGET_FILE_SIZE_BYTES = 512 * 1024 * 1024  # write.target-file-size-bytes default
METRICS_TRUNCATE = 16  # write.metadata.metrics.default = truncate(16)


@dataclass(frozen=True)
class DistributedSnapshot:
    """ref table/distributed_snapshot.go:31-49."""

    snapshot_id: int
    parent_snapshot_id: Optional[int]
    commit_uuid: str
    properties: dict[str, str]


def begin_distributed_snapshot(table, properties: Optional[dict] = None) -> DistributedSnapshot:
    """ref distributed_snapshot.go:52-76."""
    from .metadata import MetadataBuilder

    b = MetadataBuilder(table.metadata)
    sid = b.reserve_snapshot_id()
    parent = table.metadata.current_snapshot_id
    return DistributedSnapshot(
        snapshot_id=sid,
        parent_snapshot_id=parent,
        commit_uuid=str(_uuid.uuid4()),
        properties=dict(properties or {}),
    )


# ----------------------------------------------------------- arrow schema

def _arrow_type(t: IcebergType):
    import pyarrow as pa

    if isinstance(t, BooleanType):
        return pa.bool_()
    if isinstance(t, IntegerType):
        return pa.int32()
    if isinstance(t, LongType):
        return pa.int64()
    if isinstance(t, FloatType):
        return pa.float32()
    if isinstance(t, DoubleType):
        return pa.float64()
    if isinstance(t, DateType):
        return pa.date32()
    if isinstance(t, (TimestampType, TimestampTzType)):
        return pa.timestamp("us")
    if isinstance(t, StringType):
        return pa.string()
    if isinstance(t, BinaryType):
        return pa.binary()
    if isinstance(t, DecimalType):
        return pa.decimal128(t.precision, t.scale)
    raise TypeError(f"no arrow mapping for {t}")


def _arrow_schema(schema: Schema):
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(
                f.name,
                _arrow_type(f.field_type),
                nullable=not f.required,
                metadata={b"PARQUET:field_id": str(f.field_id).encode()},
            )
            for f in schema.fields
        ]
    )


# ------------------------------------------------------------ file stats

def _truncate_bounds(t: IcebergType, lo, hi):
    """truncate(16) metrics mode — ref parquet_files.go:103 +
    properties.go:37-38. Lower truncates down; upper truncates then
    increments the last codepoint so it stays an upper bound."""
    if isinstance(t, StringType) and isinstance(lo, str):
        if len(lo) > METRICS_TRUNCATE:
            lo = lo[:METRICS_TRUNCATE]
        if len(hi) > METRICS_TRUNCATE:
            cut = hi[:METRICS_TRUNCATE]
            hi = cut[:-1] + chr(ord(cut[-1]) + 1)
    return lo, hi


def _stats_from_parquet(path: str, schema: Schema) -> dict:
    """Harvest per-column stats from the footer —
    ref table/internal/parquet_files.go:403 (DataFileStatsFromMeta)."""
    import pyarrow.parquet as pq

    from .conversions import to_bytes

    meta = pq.read_metadata(path)
    by_name = {f.name: f for f in schema.fields}
    value_counts: dict[int, int] = {}
    null_counts: dict[int, int] = {}
    lowers: dict[int, Any] = {}
    uppers: dict[int, Any] = {}
    col_sizes: dict[int, int] = {}
    split_offsets: list[int] = []
    for rg_i in range(meta.num_row_groups):
        rg = meta.row_group(rg_i)
        split_offsets.append(rg.column(0).file_offset)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            name = col.path_in_schema.split(".")[0]
            f = by_name.get(name)
            if f is None:
                continue
            fid = f.field_id
            value_counts[fid] = value_counts.get(fid, 0) + col.num_values + (
                col.statistics.null_count if col.statistics and col.statistics.has_null_count else 0
            )
            col_sizes[fid] = col_sizes.get(fid, 0) + col.total_compressed_size
            st = col.statistics
            if st is None:
                continue
            if st.has_null_count:
                null_counts[fid] = null_counts.get(fid, 0) + st.null_count
            if st.has_min_max:
                mn, mx = st.min, st.max
                if fid not in lowers or mn < lowers[fid]:
                    lowers[fid] = mn
                if fid not in uppers or mx > uppers[fid]:
                    uppers[fid] = mx
    lower_b: dict[int, bytes] = {}
    upper_b: dict[int, bytes] = {}
    for f in schema.fields:
        fid = f.field_id
        if fid in lowers:
            lo, hi = _truncate_bounds(f.field_type, lowers[fid], uppers[fid])
            lower_b[fid] = to_bytes(f.field_type, lo)
            upper_b[fid] = to_bytes(f.field_type, hi)
    return {
        "record_count": meta.num_rows,
        "value_counts": value_counts,
        "null_value_counts": null_counts,
        "lower_bounds": lower_b,
        "upper_bounds": upper_b,
        "column_sizes": col_sizes,
        "split_offsets": split_offsets,
    }


# -------------------------------------------------------- executor writer

_DESCRIPTOR_SCHEMA = "descriptor string"


def _encode_descriptor(df: DataFile) -> str:
    def hexmap(m):
        return {k: v.hex() for k, v in m.items()} if m else None

    return json.dumps(
        {
            "file_path": df.file_path,
            "file_format": df.file_format,
            "partition": df.partition,
            "record_count": df.record_count,
            "file_size_in_bytes": df.file_size_in_bytes,
            "column_sizes": df.column_sizes,
            "value_counts": df.value_counts,
            "null_value_counts": df.null_value_counts,
            "lower_bounds": hexmap(df.lower_bounds),
            "upper_bounds": hexmap(df.upper_bounds),
            "split_offsets": df.split_offsets,
        }
    )


def _decode_descriptor(s: str) -> DataFile:
    d = json.loads(s)

    def unhex(m):
        return {int(k): bytes.fromhex(v) for k, v in m.items()} if m else None

    def intkeys(m):
        return {int(k): v for k, v in m.items()} if m else None

    return DataFile(
        file_path=d["file_path"],
        file_format=d["file_format"],
        partition=d.get("partition") or {},
        record_count=d["record_count"],
        file_size_in_bytes=d["file_size_in_bytes"],
        column_sizes=intkeys(d.get("column_sizes")),
        value_counts=intkeys(d.get("value_counts")),
        null_value_counts=intkeys(d.get("null_value_counts")),
        lower_bounds=unhex(d.get("lower_bounds")),
        upper_bounds=unhex(d.get("upper_bounds")),
        split_offsets=d.get("split_offsets"),
    )


def write_data_files(
    df,
    schema: Schema,
    spec: PartitionSpec,
    location: str,
    commit_uuid: str,
):
    """Executor-side Parquet writing via mapInPandas; returns the list of
    DataFile descriptors (driver-side, O(files)).

    Unpartitioned → bin-pack per task (ref arrow_utils.go:1267-1280);
    partitioned → shuffle on the transform expressions, then a fanout
    writer per task (ref partitioned_fanout_writer.go:54-256), with
    Hive-style paths from PartitionToPath (ref partitions.go:447-463).
    """
    from pyspark.sql import functions as F

    field_names = [f.name for f in schema.fields]
    part_names = [pf.name for pf in spec.fields]
    data = df.select(*field_names)

    if spec.fields:
        src_by_id = {f.field_id: f for f in schema.fields}
        part_cols = [
            pf.transform.spark_column(
                F.col(src_by_id[pf.source_id].name), src_by_id[pf.source_id].field_type
            ).alias(f"__part_{pf.name}")
            for pf in spec.fields
        ]
        data = data.select("*", *part_cols)
        data = data.repartition(*[F.col(f"__part_{n}") for n in part_names])

    arrow_schema_fields = [(f.name, f.field_type) for f in schema.fields]
    spec_fields = [(pf.name, str(pf.transform)) for pf in spec.fields]
    schema_pickle = schema
    spec_pickle = spec

    def write_task(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        task_id = TaskContext.get().partitionId() if TaskContext.get() else 0
        aschema = _arrow_schema(schema_pickle)
        writers: dict[tuple, Any] = {}
        paths: dict[tuple, str] = {}
        parts: dict[tuple, dict] = {}
        counter = [0]

        def writer_for(key: tuple, part_values: dict):
            if key not in writers:
                if spec_pickle.fields:
                    part_path = spec_pickle.partition_to_path(
                        [part_values[n] for n in part_names], schema_pickle
                    )
                    d = os.path.join(location, "data", part_path)
                else:
                    d = os.path.join(location, "data")
                os.makedirs(d, exist_ok=True)
                fname = f"00000-{task_id}-{counter[0]}-{commit_uuid}.parquet"
                counter[0] += 1
                path = os.path.join(d, fname)
                writers[key] = pq.ParquetWriter(path, aschema, compression="zstd")
                paths[key] = path
                parts[key] = dict(part_values)
            return writers[key]

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if spec_pickle.fields:
                grouped = pdf.groupby(
                    [f"__part_{n}" for n in part_names], dropna=False, sort=False
                )
                for key, g in grouped:
                    key = key if isinstance(key, tuple) else (key,)
                    part_values = {
                        n: (None if pd.isna(k) else (int(k) if hasattr(k, "item") else k))
                        for n, k in zip(part_names, key)
                    }
                    tbl = pa.Table.from_pandas(
                        g[field_names], schema=aschema, preserve_index=False
                    )
                    writer_for(tuple(key), part_values).write_table(tbl)
            else:
                tbl = pa.Table.from_pandas(
                    pdf[field_names], schema=aschema, preserve_index=False
                )
                writer_for((), {}).write_table(tbl)

        out = []
        for key, w in writers.items():
            w.close()
            path = paths[key]
            stats = _stats_from_parquet(path, schema_pickle)
            dfile = DataFile(
                file_path=path,
                file_format="PARQUET",
                partition=parts[key],
                file_size_in_bytes=os.path.getsize(path),
                **stats,
            )
            out.append(_encode_descriptor(dfile))
        yield pd.DataFrame({"descriptor": out})

    desc = data.mapInPandas(write_task, _DESCRIPTOR_SCHEMA)
    return [_decode_descriptor(r.descriptor) for r in desc.collect()]


# ------------------------------------------------------------- coordinator

def _summary_props(data_files: list[DataFile], parent_summary: dict) -> dict[str, str]:
    """Snapshot summary counters — ref table/snapshots.go:89-179."""
    added_files = len(data_files)
    added_records = sum(f.record_count for f in data_files)
    added_size = sum(f.file_size_in_bytes for f in data_files)
    prev_files = int(parent_summary.get("total-data-files", "0"))
    prev_records = int(parent_summary.get("total-records", "0"))
    prev_size = int(parent_summary.get("total-files-size", "0"))
    return {
        "added-data-files": str(added_files),
        "added-records": str(added_records),
        "added-files-size": str(added_size),
        "total-data-files": str(prev_files + added_files),
        "total-records": str(prev_records + added_records),
        "total-files-size": str(prev_size + added_size),
        "total-delete-files": parent_summary.get("total-delete-files", "0"),
        "total-position-deletes": parent_summary.get("total-position-deletes", "0"),
        "total-equality-deletes": parent_summary.get("total-equality-deletes", "0"),
    }


def commit_data_files(
    table,
    data_files: list[DataFile],
    operation: str = "append",
    snapshot_properties: Optional[dict] = None,
    max_retries: int = 4,
) -> None:
    """Coordinator commit with the optimistic retry loop —
    ref distributed_snapshot.go:83-114 + design doc :89-93."""
    attempt = 0
    while True:
        ds = begin_distributed_snapshot(table, snapshot_properties)
        md = table.metadata
        schema = md.current_schema()
        spec = md.default_spec()
        manifest_path = os.path.join(
            md.location, "metadata", f"{ds.commit_uuid}-m{attempt}.avro"
        )
        os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
        entries = [
            ManifestEntry(
                status=ManifestEntryStatus.ADDED,
                snapshot_id=ds.snapshot_id,
                sequence_number=None,  # inherited from the snapshot
                file_sequence_number=None,
                data_file=f,
            )
            for f in data_files
        ]
        manifest = write_manifest(
            manifest_path, spec, schema, ds.snapshot_id, entries
        )
        parent = md.current_snapshot()
        parent_summary = parent.summary.properties if parent else {}
        summary = Summary(operation, _summary_props(data_files, parent_summary))
        tx = table.transaction()
        try:
            tx.commit_snapshot_from_manifests(
                snapshot_id=ds.snapshot_id,
                commit_uuid=ds.commit_uuid,
                manifests=[manifest],
                summary=summary,
                parent_snapshot_id=ds.parent_snapshot_id,
            )
            tx.commit()
            return
        except CommitConflictError:
            attempt += 1
            if attempt > max_retries:
                raise
            table.refresh()  # restart from reservation with fresh state


def append_distributed(table, df, snapshot_properties: Optional[dict] = None) -> None:
    """Table.append: executors write, coordinator commits —
    ref table/table.go:123-130 + transaction.go:372-398, re-expressed as
    the distributed-snapshot protocol (our default write path)."""
    ds = begin_distributed_snapshot(table, snapshot_properties)
    md = table.metadata
    data_files = write_data_files(
        df, md.current_schema(), md.default_spec(), md.location, ds.commit_uuid
    )
    commit_data_files(
        table, data_files, operation="append", snapshot_properties=snapshot_properties
    )


def commit_distributed_snapshot(table, ds, manifests, summary_props=None) -> None:
    """Commit worker-written manifests as one snapshot —
    ref distributed_snapshot.go:83-114."""
    tx = table.transaction()
    tx.commit_snapshot_from_manifests(
        snapshot_id=ds.snapshot_id,
        commit_uuid=ds.commit_uuid,
        manifests=list(manifests),
        summary=Summary("append", summary_props or {}),
        parent_snapshot_id=ds.parent_snapshot_id,
    )
    tx.commit()
