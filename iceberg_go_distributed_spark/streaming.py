"""Structured Streaming integration.

The reference's "Append Stream" feature (README table) is a batched
record-reader append (table/table.go:123-130) — its Spark-native
equivalent is a `foreachBatch` sink committing each micro-batch through
the distributed-snapshot append, which is exactly what `append_stream`
does. Each micro-batch becomes one snapshot: exactly-once end-to-end
when the checkpoint survives, at-least-once otherwise (idempotent
readers can dedup on the batch-id property we stamp on the snapshot).

`windowed_event_counts` shows the watermark + windowed-agg shape for
late data over the `events` stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_stream(
    table,
    stream_df: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_time: Optional[str] = None,
):
    """Sink a streaming DataFrame into an Iceberg table: one snapshot
    per micro-batch, committed by the driver (coordinator) after the
    executors (workers) wrote the batch's files."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        table.refresh()  # tolerate concurrent committers between batches
        table.append(
            batch_df, snapshot_properties={"spark.streaming.batch-id": str(batch_id)}
        )

    writer = stream_df.writeStream.foreachBatch(handle_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def windowed_event_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the standard
    late-data-tolerant rollup (drops events later than the watermark)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_stream(
    stream_df: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
):
    """Custom stateful streaming operator: per-user gap sessionization
    with `applyInPandasWithState` (Arrow-batched state, event-time
    timeout) — the shape Spark's built-in windowed aggs cannot express
    (a session ends `gap` after its LAST event, not on a fixed grid).

    Emits one row per COMPLETED session: a session closes when a later
    event of the same user arrives past the gap, or when event time
    passes last_event + gap (watermark-driven timeout). Open sessions
    ride in state — bounded: one (start, last, count) triple per active
    user, so state size is O(active users), never O(events).

    Inside a batch the per-user work is vectorized (numpy diff for
    session boundaries); only the stitch with carried state is scalar.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ns = gap_minutes * 60 * 1_000_000_000
    out_cols = ["user_id", "session_start", "session_end", "n_events"]

    def fn(key, pdfs, state: GroupState):
        uid = key[0]
        carried = state.get if state.exists else None  # (start, last, n) in ns

        if state.hasTimedOut:
            # watermark passed last_event + gap: the open session is done
            s, e, n = carried
            state.remove()
            yield pd.DataFrame(
                [[uid, pd.Timestamp(s), pd.Timestamp(e), n]], columns=out_cols
            )
            return

        ts = np.sort(
            np.concatenate(
                [pdf[ts_col].values.astype("datetime64[ns]").astype("int64") for pdf in pdfs]
            )
        )
        if ts.size == 0:
            return
        # vectorized session boundaries within the batch
        brk = np.flatnonzero(np.diff(ts) > gap_ns)
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [ts.size - 1]))
        sessions = [
            [int(ts[s]), int(ts[e]), int(e - s + 1)] for s, e in zip(starts, ends)
        ]
        # stitch the carried open session with the first batch session;
        # min/max both ends — a late-but-admitted event (within the
        # watermark) may sort BEFORE the carried last_ts, and taking the
        # batch end unconditionally would regress session_end and fire
        # the timeout early
        if carried is not None:
            cs, ce, cn = carried
            if sessions[0][0] - ce <= gap_ns:
                sessions[0] = [
                    min(cs, sessions[0][0]),
                    max(ce, sessions[0][1]),
                    cn + sessions[0][2],
                ]
            else:
                sessions.insert(0, [cs, ce, cn])
        *closed, last = sessions
        state.update((last[0], last[1], last[2]))
        state.setTimeoutTimestamp((last[1] + gap_ns) // 1_000_000)  # ms
        if closed:
            yield pd.DataFrame(
                [[uid, pd.Timestamp(s), pd.Timestamp(e), n] for s, e, n in closed],
                columns=out_cols,
            )

    return (
        stream_df.withWatermark(ts_col, f"{gap_minutes} minutes")
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "user_id bigint, session_start timestamp_ntz, "
                "session_end timestamp_ntz, n_events int"
            ),
            stateStructType="session_start long, last_ts long, n_events long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    stream_df: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    `dropDuplicatesWithinWatermark` keeps one row per key and expires
    key state once the watermark passes it — the ingestion-dedup shape
    for at-least-once upstream sources (kafka replays, retried batch
    loads). State is O(distinct keys per watermark window), never
    O(stream); the keyed state store shuffles once on the key columns,
    the same exchange a batch dropDuplicates would take."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


# changelog_poll cursor value meaning "positioned before the table's
# first snapshot" (established by polling an empty table). Snapshot ids
# are positive in this engine, so -1 cannot collide.
CHANGELOG_BEGINNING = -1


def changelog_poll(table, spark, cursor: Optional[int]):
    """One CDC consumption step — the poll-loop primitive a pipeline
    scheduler runs against a v3 table: refresh, diff against the
    consumer's cursor, advance. For append-only consumption the
    first-class `readStream` source (`iceberg_stream`, below) supersedes
    this loop; changelog_poll remains the row-level CDC surface
    (deletes/updates as delete+insert pairs), which the append-stream
    source deliberately refuses.

    Returns ``(changes_df | None, new_cursor)``:
      - first call with ``cursor=None`` establishes the position at the
        current snapshot and returns no rows (consume-from-now);
      - subsequent calls return the row-level changelog
        (`Table.changelog_scan`) between the cursor and the current
        snapshot, or ``None`` when nothing was committed.

    The cursor is a plain snapshot id — durable anywhere — or
    ``CHANGELOG_BEGINNING`` when the position was established on a
    still-empty table (the first commit's rows must not be skipped, so
    "positioned before any snapshot" is a real cursor value, distinct
    from the not-yet-positioned ``None``). Snapshot expiry must retain
    the consumer horizon (`expire_snapshots`'s retain-last / max-age
    knobs), the same contract every CDC log has. Cost per poll:
    metadata-only when idle (no job is launched until the returned
    frame is consumed); the changelog itself plans only the snapshots
    in (cursor, head]."""
    table.refresh()
    snap = table.current_snapshot()
    head = snap.snapshot_id if snap is not None else None
    if cursor is None:
        # establish position: at the head, or (empty table) at the
        # explicit beginning so rows committed later are not lost
        return None, (head if head is not None else CHANGELOG_BEGINNING)
    if head is None or head == cursor:
        return None, cursor
    return (
        table.changelog_scan(
            spark,
            from_snapshot_id=None if cursor == CHANGELOG_BEGINNING else cursor,
            to_snapshot_id=head,
        ),
        head,
    )


# ---------------------------------------------- streaming SOURCE (readStream)

def _load_stream_table(options):
    """Resolve the stream's table from source options: the common case
    is the FS catalog (`warehouse` + `table`); any registered catalog
    kind works via `catalog` + JSON `catalog_args` (ref
    catalog/registry.go:80-131 scheme dispatch)."""
    import json as _json

    kind = options.get("catalog", "fs")
    if kind == "fs":
        from .iceberg.catalog import FileSystemCatalog

        return FileSystemCatalog(options["warehouse"]).load_table(options["table"])
    from .iceberg.catalog import load_catalog

    args = _json.loads(options.get("catalog_args", "{}"))
    return load_catalog(kind, **args).load_table(options["table"])


def register_iceberg_stream_source(spark) -> None:
    """Register the `iceberg_inc` streaming source (idempotent)."""
    spark.dataSource.register(IcebergStreamDataSource)


def iceberg_stream(spark, warehouse: str, table: str, **options) -> DataFrame:
    """`spark.readStream` over an Iceberg table's append stream.

    Built on PySpark 4's Python Data Source API (DataSourceStreamReader)
    — the true DataSourceV2 micro-batch shape, upgrading changelog_poll's
    scheduler-driven loop to a first-class `readStream` source: offsets
    are snapshot ids (durable in the query checkpoint), each micro-batch
    is the appended-file set between two snapshots
    (`incremental_append_scan` semantics: append snapshots only,
    compaction `replace` skipped as already-delivered rewrites, an
    overwrite/delete in range raises — use changelog_poll for row-level
    CDC), and executors read ONLY the new files, resolving columns by
    parquet field id (renames survive; columns added later read their
    default/null). `max_files_per_trigger` bounds each batch whenever
    the reader knows its position (see _IcebergStreamReader); pass
    `position_path` (a file URI unique to the query, like
    checkpointLocation) to make that cap survive checkpoint restarts —
    commit() records the committed offset there, so even the first
    trigger after a restart admits at most the cap instead of the whole
    backlog. `stream_batch_rows` bounds executor memory per yielded
    record batch. Composes with every
    downstream Structured Streaming operator (watermarks, windowed aggs,
    applyInPandasWithState, append_stream back into another table)."""
    register_iceberg_stream_source(spark)
    reader = (
        spark.readStream.format("iceberg_inc")
        .option("warehouse", warehouse)
        .option("table", table)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def _project_batch(plan, batch, n):
    """One output RecordBatch from a (possibly absent) source batch:
    resolved columns pass through, unresolved ones fill with the field's
    initial-default (v3) or nulls."""
    import pyarrow as pa

    cols, names = [], []
    for name, src, typ, default in plan:
        if src is not None:
            cols.append(batch.column(batch.schema.get_field_index(src)))
        elif default is not None:
            cols.append(pa.array([default] * n, type=typ))
        else:
            cols.append(pa.nulls(n, type=typ))
        names.append(name)
    return pa.RecordBatch.from_arrays(cols, names=names)


try:  # pyspark >= 4: Python Data Source API
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _IcebergFilePartition(InputPartition):
        def __init__(self, path: str, fields: list, cfg: dict, batch_rows: int = 8192):
            self.path = path
            # [(field_id, current_name)] — executors resolve parquet
            # columns by FIELD ID (name-independent), so renamed columns
            # keep streaming; name match is the fallback for imported
            # (add_files / name-mapped) files without ids
            self.fields = fields
            self.cfg = cfg
            # rows per yielded record batch: the executor memory bound
            # (option stream_batch_rows)
            self.batch_rows = batch_rows

    class _IcebergStreamReader(DataSourceStreamReader):
        def __init__(self, options):
            self._options = dict(options)
            self._max_files = int(options.get("max_files_per_trigger", "0"))
            self._pos: Optional[int] = None  # last planned/committed end
            # optional durable position bookkeeping (option position_path):
            # commit() records the committed end offset so a
            # checkpoint-RESTART's first latestOffset knows its position
            # and the max_files_per_trigger cap applies to the very first
            # trigger too (otherwise that one trigger admits the whole
            # backlog). Unique per query, like checkpointLocation.
            self._position_path = self._options.get("position_path")
            from .iceberg import fileio

            self._cfg = fileio.env_config()

        def _recover_position(self) -> None:
            """Restart path: no initialOffset call, so _pos is None at the
            first latestOffset — recover it from the position file when
            bookkeeping is on. A torn/unreadable file degrades to the
            documented uncapped-first-trigger behavior, never to a wrong
            offset (offsets come exclusively from the checkpoint)."""
            if self._pos is not None or not self._position_path:
                return
            from .iceberg import fileio

            try:
                if fileio.exists(self._position_path):
                    self._pos = int(fileio.read_bytes(self._position_path))
            except (OSError, ValueError):
                pass

        def initialOffset(self) -> dict:
            self._pos = -1
            return {"snapshot_id": -1}

        def latestOffset(self) -> dict:
            t = _load_stream_table(self._options)
            s = t.current_snapshot()
            head = s.snapshot_id if s is not None else -1
            # admission control (best-effort): cap each micro-batch at
            # max_files_per_trigger appended files by stopping the end
            # offset early along main's ancestry. The cap applies
            # whenever the position is known: a FRESH query's first
            # trigger (initialOffset ran → position is "beginning", so a
            # large backlog drains in bounded batches) and every trigger
            # after partitions()/commit() taught this reader its
            # position. A checkpoint-RESTART's first trigger is capped
            # too when `position_path` bookkeeping is on (the runner
            # asks for latestOffset before replaying the committed start
            # offset, so without the position file that one trigger is
            # uncapped). Caveat: availableNow captures ONE end offset up
            # front and stops there, so with a cap it drains at most one
            # capped batch per run — use a processingTime trigger (or
            # rerun availableNow on a schedule) for capped backlog
            # drains.
            self._recover_position()
            if self._max_files > 0 and self._pos is not None and head != self._pos:
                chain = []
                cur = s
                by_id = {x.snapshot_id: x for x in t.metadata.snapshots}
                while cur is not None and cur.snapshot_id != self._pos:
                    chain.append(cur)
                    cur = by_id.get(cur.parent_snapshot_id)
                if cur is None and self._pos != -1:
                    # position not on head's ancestry (expired snapshot,
                    # stale/foreign position file): capping against it
                    # could pick an end offset BEHIND the checkpoint's
                    # start — fall back to uncapped, the unknown-position
                    # contract
                    return {"snapshot_id": head}
                budget = self._max_files
                capped, taken = head, 0
                for snap in reversed(chain):  # oldest first
                    n = int(snap.summary.properties.get("added-data-files", "0"))
                    if taken > 0 and n > budget:
                        break  # next snapshot won't fit; stop before it
                    capped, taken = snap.snapshot_id, taken + 1
                    budget -= n  # first snapshot always admitted
                    if budget <= 0:
                        break
                return {"snapshot_id": capped}
            return {"snapshot_id": head}

        def partitions(self, start: dict, end: dict):
            s_id, e_id = start["snapshot_id"], end["snapshot_id"]
            self._pos = e_id
            if e_id == -1 or s_id == e_id:
                return []
            t = _load_stream_table(self._options)
            scan = t.incremental_append_scan(
                from_snapshot_id=None if s_id == -1 else s_id,
                to_snapshot_id=e_id,
            )
            from .iceberg.write import _arrow_type

            fields = [
                (f.field_id, f.name, _arrow_type(f.field_type),
                 getattr(f, "initial_default", None))
                for f in t.metadata.current_schema().fields
            ]
            batch_rows = int(self._options.get("stream_batch_rows", "8192"))
            return [
                _IcebergFilePartition(
                    task.file.file_path, fields, self._cfg, batch_rows
                )
                for task in scan.plan_files()
            ]

        def read(self, partition):
            from .iceberg import fileio

            fileio.apply_config(partition.cfg)
            import pyarrow as pa

            # Stream the file batch-wise (pq.ParquetFile.iter_batches):
            # peak executor memory is one record batch, never the whole
            # decompressed file — at the 512 MiB default target file
            # size, materializing first would hold multi-GiB per task.
            with fileio.parquet_file(partition.path) as pf:
                file_schema = pf.schema_arrow
                by_id = {}
                for fld in file_schema:
                    fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                    if fid is not None:
                        by_id[int(fid)] = fld.name
                # files with ids resolve strictly by id; id-less
                # (imported) files fall back to the current name; a
                # column ADDED after this file was written reads its
                # initial-default (v3) or null — same as the batch scan
                plan = []  # (out_name, src_col | None, arrow_type, default)
                for fid, name, typ, default in partition.fields:
                    src = by_id.get(fid) if by_id else (
                        name if name in file_schema.names else None
                    )
                    if src is not None and src not in file_schema.names:
                        src = None
                    plan.append((name, src, typ, default))
                read_cols = [src for _, src, _, _ in plan if src is not None]
                if not read_cols:
                    # no physical column survives resolution (every field
                    # was added after this file): synthesize defaults from
                    # footer row counts alone, one batch per row group
                    for rg in range(pf.metadata.num_row_groups):
                        yield _project_batch(
                            plan, None, pf.metadata.row_group(rg).num_rows
                        )
                    return
                for batch in pf.iter_batches(
                    columns=read_cols,
                    batch_size=getattr(partition, "batch_rows", 8192),
                ):
                    yield _project_batch(plan, batch, batch.num_rows)

        def commit(self, end: dict) -> None:
            self._pos = end["snapshot_id"]
            if self._position_path:
                from .iceberg import fileio

                try:
                    fileio.write_bytes(
                        self._position_path, str(self._pos).encode()
                    )
                except OSError as exc:  # bookkeeping is best-effort:
                    # losing one position write only means a restart's
                    # first trigger may be uncapped again — never worth
                    # killing the query over
                    import warnings

                    warnings.warn(
                        f"stream position bookkeeping write failed: {exc}"
                    )

    class IcebergStreamDataSource(DataSource):
        """readStream source `iceberg_inc`: options warehouse + table
        (FileSystemCatalog identifier); offsets = snapshot ids."""

        @classmethod
        def name(cls) -> str:
            return "iceberg_inc"

        def schema(self):
            from .iceberg.types import schema_to_spark_struct

            t = _load_stream_table(self.options)
            return schema_to_spark_struct(t.metadata.current_schema())

        def streamReader(self, schema):
            return _IcebergStreamReader(self.options)

except ImportError:  # pragma: no cover — pyspark < 4
    IcebergStreamDataSource = None  # type: ignore[assignment]
