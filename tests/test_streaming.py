"""Structured Streaming → Iceberg table sink (foreachBatch append) +
watermarked windowed aggregation."""

from __future__ import annotations

import os

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
from iceberg_go_distributed_spark.streaming import append_stream, windowed_event_counts


def test_append_stream_sink(tmp_path, spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    events = load_table(spark, sf_dir, "events").limit(1000)
    src_dir = str(tmp_path / "src")
    events.coalesce(2).write.parquet(src_dir)

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.events_sink", schema_from_spark(events.schema))

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = append_stream(t, stream, checkpoint_dir=str(tmp_path / "cp"))
    q.awaitTermination(120)

    t.refresh()
    assert t.current_snapshot() is not None
    got = t.scan().to_df(spark).count()
    assert got == events.count()
    # batch id stamped on the snapshot for idempotent consumers
    assert "spark.streaming.batch-id" in t.current_snapshot().summary.properties


def test_windowed_event_counts_batch_parity(spark, sf_dir):
    """The streaming aggregation expressed on a batch frame must agree
    with a direct groupBy (same logical plan semantics)."""
    from iceberg_go_distributed_spark.datasets import load_table
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    rolled = windowed_event_counts(events)  # watermark is a no-op on batch
    direct = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    assert rolled.agg(F.sum("n")).first()[0] == events.count()
    assert rolled.count() == direct.count()


def test_sessionize_stream_matches_batch(tmp_path, spark, sf_dir):
    """Stateful sessionization (applyInPandasWithState) must agree with
    the batch lag-window definition on every CLOSED session; each
    user's final session stays open in state (nothing after it can
    close it in a bounded input)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.streaming import sessionize_stream

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    src_dir = str(tmp_path / "src")
    events.coalesce(2).write.parquet(src_dir)

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }

    # batch truth: sessions per user via lag-gap; drop each user's last
    w = Window.partitionBy("user_id").orderBy("us")
    e = (
        events.withColumn("us", F.unix_micros("ts"))
        .withColumn(
            "is_new",
            F.when(
                F.lag("us").over(w).isNull()
                | (F.col("us") - F.lag("us").over(w) > 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("is_new").over(w))
    )
    sessions = e.groupBy("user_id", "sess").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )
    last = sessions.groupBy("user_id").agg(F.max("sess").alias("sess"))
    closed = sessions.join(last, ["user_id", "sess"], "left_anti")
    want_closed = {
        (r.user_id, r.session_start, r.session_end, int(r.n_events))
        for r in closed.collect()
    }
    all_sessions = {
        (r.user_id, r.session_start, r.session_end, int(r.n_events))
        for r in sessions.collect()
    }
    # every gap-closed session is emitted, and nothing that isn't a true
    # session ever is
    assert want_closed <= got <= all_sessions and len(want_closed) > 0
    # the only extras are final sessions flushed by event-time TIMEOUT —
    # legal exactly when the watermark could pass last_event + gap
    import datetime

    max_ts = events.agg(F.max("ts")).first()[0]
    gap = datetime.timedelta(minutes=30)
    for _, _, session_end, _ in got - want_closed:
        assert session_end + gap <= max_ts


def test_sessionize_agrees_with_native_session_window(tmp_path, spark, sf_dir):
    """Independent cross-check of the custom stateful operator against
    Spark's built-in session_window aggregation (a different
    implementation of the same 30-minute-gap semantics): every closed
    session the stream emits appears verbatim in the session_window
    result, and the two batch formulations produce the identical
    session set. Boundary note: our rule starts a new session when the
    gap is STRICTLY greater than 30 min, session_window when >= —
    the testdata has no exact-gap pair, so the definitions coincide
    (asserted below so data drift can't silently weaken the test)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.streaming import sessionize_stream

    events = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("us")
    diffs = events.withColumn("us", F.unix_micros("ts")).withColumn(
        "_d", F.col("us") - F.lag("us").over(w)
    )
    assert diffs.where(F.col("_d") == 1_800_000_000).count() == 0

    native = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
    )
    native_set = {
        (r.user_id, r.session_start, r.session_end, int(r.n_events))
        for r in native.collect()
    }

    src_dir = str(tmp_path / "src")
    events.coalesce(2).write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        sessionize_stream(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName("sessions_native_check")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, int(r.n_events))
        for r in spark.sql("SELECT * FROM sessions_native_check").collect()
    }
    assert len(got) > 0
    assert got <= native_set  # every emitted session is a true session


def test_dedup_stream_drops_replayed_rows(tmp_path, spark, sf_dir):
    """dropDuplicatesWithinWatermark dedup: a replayed (duplicated)
    bounded stream yields exactly the batch-distinct row set."""
    from pyspark.sql import functions as F

    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.streaming import dedup_stream

    events = load_table(spark, sf_dir, "events").select("event_id", "ts").limit(500)
    src_dir = str(tmp_path / "src")
    # write the same rows twice → an at-least-once source with replays
    events.coalesce(1).write.mode("append").parquet(src_dir)
    events.coalesce(1).write.mode("append").parquet(src_dir)

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        dedup_stream(stream, key_cols=("event_id",))
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("dedup_out").select("event_id")
    assert got.count() == 500
    assert got.distinct().count() == 500
    assert (
        got.join(events.select("event_id"), "event_id", "left_anti").count() == 0
    )


def test_changelog_poll_consumes_commits_exactly_once(tmp_path, spark):
    """The CDC poll loop: establish position, see nothing while idle,
    then surface each commit's inserts/deletes exactly once as the
    cursor advances."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.types import (
        DoubleType,
        LongType,
        NestedField,
        Schema,
    )
    from iceberg_go_distributed_spark.streaming import changelog_poll

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "db.cdc",
        Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(2, "x", DoubleType()),
        ),
    )
    t.upgrade_format_version(3)
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "id long, x double").coalesce(1))

    # first poll: establishes position at the current snapshot, no rows
    df, cur = changelog_poll(t, spark, None)
    assert df is None and cur == t.current_snapshot().snapshot_id

    # idle poll: cursor unchanged, nothing to consume
    df, cur2 = changelog_poll(t, spark, cur)
    assert df is None and cur2 == cur

    # commit an append + a DV delete from a SECOND handle (the writer),
    # then poll from the consumer's stale handle
    w = cat.load_table("db.cdc")
    w.append(spark.createDataFrame([(3, 3.0)], "id long, x double").coalesce(1))
    w.delete_where(spark, E.equal("id", 1))

    df, cur3 = changelog_poll(t, spark, cur)
    assert df is not None and cur3 == w.current_snapshot().snapshot_id
    rows = {(r._change_type, r.id) for r in df.collect()}
    assert rows == {("insert", 3), ("delete", 1)}

    # next poll: consumed, nothing new
    df, cur4 = changelog_poll(t, spark, cur3)
    assert df is None and cur4 == cur3


def test_changelog_poll_empty_table_start(tmp_path, spark):
    """Review regression: polling a still-empty table must establish an
    explicit 'beginning' position so the first commit's rows are
    surfaced — not silently skipped when the next poll re-positions."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import (
        LongType,
        NestedField,
        Schema,
    )
    from iceberg_go_distributed_spark.streaming import (
        CHANGELOG_BEGINNING,
        changelog_poll,
    )

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "db.cdc0", Schema.of(0, NestedField(1, "id", LongType(), required=True))
    )
    t.upgrade_format_version(3)

    df, cur = changelog_poll(t, spark, None)
    assert df is None and cur == CHANGELOG_BEGINNING

    # idle poll on the still-empty table keeps the beginning position
    df, cur = changelog_poll(t, spark, cur)
    assert df is None and cur == CHANGELOG_BEGINNING

    w = cat.load_table("db.cdc0")
    w.append(spark.createDataFrame([(1,), (2,)], "id long").coalesce(1))

    df, cur2 = changelog_poll(t, spark, cur)
    assert df is not None and cur2 == w.current_snapshot().snapshot_id
    assert {(r._change_type, r.id) for r in df.collect()} == {
        ("insert", 1),
        ("insert", 2),
    }


def test_changelog_poll_expired_cursor_fails_loudly(tmp_path, spark):
    """The CDC contract: snapshot expiry must retain the consumer
    horizon. A cursor pointing at an expired snapshot raises instead of
    silently emitting a wrong (resynced) delta."""
    import time

    import pytest as _pytest

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import LongType, NestedField, Schema
    from iceberg_go_distributed_spark.streaming import changelog_poll

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "db.cdcx", Schema.of(0, NestedField(1, "id", LongType(), required=True))
    )
    t.upgrade_format_version(3)
    t.append(spark.createDataFrame([(1,)], "id long").coalesce(1))
    _, cur = changelog_poll(t, spark, None)
    t.append(spark.createDataFrame([(2,)], "id long").coalesce(1))
    t.append(spark.createDataFrame([(3,)], "id long").coalesce(1))

    # expire everything but the head — the consumer's cursor is gone
    tx = t.transaction()
    tx.expire_snapshots(older_than_ms=int(time.time() * 1000) + 10_000, retain_last=1)
    tx.commit()
    t.refresh()

    with _pytest.raises(Exception):
        df, _ = changelog_poll(t, spark, cur)
        if df is not None:
            df.collect()


def test_stream_dedup_into_iceberg_table(tmp_path, spark, sf_dir):
    """End-to-end streaming ingestion: a replayed event stream flows
    through dedup_stream into an Iceberg table via the foreachBatch
    append sink — the table ends up with exactly the distinct rows, one
    snapshot per micro-batch, batch-id stamped for idempotent readers."""
    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import append_stream, dedup_stream

    events = load_table(spark, sf_dir, "events").select("event_id", "ts").limit(300)
    src_dir = str(tmp_path / "src")
    events.coalesce(1).write.mode("append").parquet(src_dir)
    events.coalesce(1).write.mode("append").parquet(src_dir)  # replay

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.ingest", schema_from_spark(events.schema))

    stream = dedup_stream(
        spark.readStream.schema(events.schema).parquet(src_dir),
        key_cols=("event_id",),
    )
    q = append_stream(t, stream, checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    t.refresh()
    got = t.scan().to_df(spark)
    assert got.count() == 300
    assert got.select("event_id").distinct().count() == 300
    # every snapshot is an append stamped with its micro-batch id
    snaps = list(t.metadata.snapshots)
    assert snaps and all(
        "spark.streaming.batch-id" in (s.summary.properties or {}) for s in snaps
    )


def test_iceberg_stream_source_incremental(tmp_path, spark):
    """readStream over an Iceberg table (PySpark 4 Python Data Source
    API): the first run delivers everything committed so far; a second
    run from the same checkpoint delivers ONLY snapshots committed in
    between — offsets are snapshot ids, durable in the checkpoint."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    df1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"
    )
    cat = FileSystemCatalog(wh)
    t = cat.create_table("db.src", schema_from_spark(df1.schema))
    t.append(df1.coalesce(1))
    t.append(
        spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1)
    )

    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple] = []

    def run_once():
        q = (
            iceberg_stream(spark, wh, "db.src")
            .writeStream.foreachBatch(
                lambda b, _id: seen.extend(tuple(r) for r in b.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(seen) == [(1, "a"), (2, "b"), (3, "c")]

    # commit two more snapshots, restart from the checkpoint
    t.append(spark.createDataFrame([(4, "d")], "id long, v string").coalesce(1))
    t.append(spark.createDataFrame([(5, "e")], "id long, v string").coalesce(1))
    seen.clear()
    run_once()
    assert sorted(seen) == [(4, "d"), (5, "e")], "only the new snapshots"

    # idle restart: nothing new → nothing delivered
    seen.clear()
    run_once()
    assert seen == []

    # compaction (replace) snapshots are skipped as already-delivered
    assert t.rewrite_data_files(spark, target_file_size=1 << 30) is True
    seen.clear()
    run_once()
    assert seen == []


def test_iceberg_stream_source_sql_catalog(tmp_path, spark):
    """The stream source resolves tables through the catalog registry:
    a SQL-catalog table streams with catalog='sql' + JSON catalog_args."""
    import json

    from iceberg_go_distributed_spark.iceberg.catalog import SqlCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "sqlwh")
    db = str(tmp_path / "cat.db")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    cat = SqlCatalog(db, wh)
    cat.create_namespace("db")
    t = cat.create_table("db.s", schema_from_spark(df.schema))
    t.append(df.coalesce(1))

    seen: list[tuple] = []
    q = (
        iceberg_stream(
            spark,
            wh,  # ignored for non-fs catalogs but required by the helper
            "db.s",
            catalog="sql",
            catalog_args=json.dumps({"db_path": db, "warehouse": wh}),
        )
        .writeStream.foreachBatch(
            lambda b, _id: seen.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == [(1, "a"), (2, "b")]


def test_iceberg_stream_source_admission_control(tmp_path, spark):
    """max_files_per_trigger caps micro-batches whenever the reader
    knows its position (fresh query or post-first-trigger); a backlog
    committed mid-query drains in multiple bounded batches. (Only a
    checkpoint-restart's first trigger is uncapped — the runner asks
    for the latest offset before replaying the committed start.)"""
    import time

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    mk = lambda i: spark.createDataFrame([(i, f"v{i}")], "id long, v string")
    t = cat.create_table("db.rate", schema_from_spark(mk(0).schema))
    t.append(mk(0).coalesce(1))

    batches: list[list[tuple]] = []
    q = (
        iceberg_stream(
            spark, wh, "db.rate", max_files_per_trigger="2"
        )
        .writeStream.foreachBatch(
            lambda b, _id: batches.append([tuple(r) for r in b.collect()])
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and sum(len(b) for b in batches) < 1:
        time.sleep(0.5)
    n_first = len(batches)

    # backlog of 5 one-file snapshots committed while the query runs
    for i in range(1, 6):
        t.append(mk(i).coalesce(1))
    while time.time() < deadline and sum(len(b) for b in batches) < 6:
        time.sleep(0.5)
    q.stop()

    rows = sorted(r for b in batches for r in b)
    assert rows == [(i, f"v{i}") for i in range(6)], rows
    steady = [b for b in batches[n_first:] if b]
    assert len(steady) >= 3, f"5-file backlog must drain in >=3 capped batches: {batches}"
    assert all(len(b) <= 2 for b in steady), batches


def test_iceberg_stream_source_survives_column_rename(tmp_path, spark):
    """Executors resolve stream columns by FIELD ID: a column renamed
    after the first snapshots still streams, with the current name on
    every delivered row (old files carry the old physical name)."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t = cat.create_table("db.ren", schema_from_spark(df.schema))
    t.append(df.coalesce(1))  # file with physical column name 'v'
    t.update_schema().rename_column("v", "val").commit()
    t.append(
        spark.createDataFrame([(2, "b")], "id long, val string").coalesce(1)
    )

    seen: list[tuple] = []
    stream = iceberg_stream(spark, wh, "db.ren")
    assert "val" in stream.schema.names and "v" not in stream.schema.names
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: seen.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == [(1, "a"), (2, "b")]


def test_iceberg_stream_source_full_lineitem_types(tmp_path, spark, sf_dir):
    """Type fidelity through the Arrow bridge: timestamps, doubles,
    ints, and strings stream bit-identically to the batch scan."""
    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    li = load_table(spark, sf_dir, "lineitem").limit(300)
    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    t = cat.create_table("db.li", schema_from_spark(li.schema))
    t.append(li.coalesce(2))

    seen: list[tuple] = []
    stream = iceberg_stream(spark, wh, "db.li")
    assert stream.schema == t.scan().to_df(spark).schema
    q = (
        stream.writeStream.foreachBatch(
            lambda b, _id: seen.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = sorted(tuple(r) for r in t.scan().to_df(spark).collect())
    assert sorted(seen) == want


def test_iceberg_stream_source_redelivers_failed_batch(tmp_path, spark):
    """A batch whose sink crashes is re-delivered after restart from the
    same checkpoint — the offset log only advances on successful
    commits, so no snapshot is ever skipped."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t = cat.create_table("db.crash", schema_from_spark(df.schema))
    t.append(df.coalesce(1))

    ck = str(tmp_path / "ck")
    seen: list[tuple] = []

    def crashing(b, _id):
        rows = [tuple(r) for r in b.collect()]
        raise RuntimeError("sink crash before commit")

    q = (
        iceberg_stream(spark, wh, "db.crash")
        .writeStream.foreachBatch(crashing)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        q.awaitTermination(120)

    q2 = (
        iceberg_stream(spark, wh, "db.crash")
        .writeStream.foreachBatch(
            lambda b, _id: seen.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(seen) == [(1, "a"), (2, "b")], "crashed batch re-delivered"


def test_iceberg_stream_source_fills_added_columns(tmp_path, spark):
    """Files written BEFORE an add_column stream with null (or the v3
    initial-default) for the new column — same semantics as the batch
    scan, instead of wedging the stream."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    t = cat.create_table("db.addcol", schema_from_spark(df.schema))
    t.append(df.coalesce(1))  # file WITHOUT column x
    t.update_schema().add_column("x", __import__(
        "iceberg_go_distributed_spark.iceberg.types", fromlist=["LongType"]
    ).LongType()).commit()
    t.append(
        spark.createDataFrame([(2, "b", 7)], "id long, v string, x long").coalesce(1)
    )

    seen: list[tuple] = []
    q = (
        iceberg_stream(spark, wh, "db.addcol")
        .writeStream.foreachBatch(
            lambda b, _id: seen.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(seen) == [(1, "a", None), (2, "b", 7)]


def test_iceberg_stream_read_is_batchwise(tmp_path):
    """The stream source's executor read() streams record batches via
    pq.ParquetFile.iter_batches — it never materializes the whole file
    (peak memory = one batch, not decompressed-file-size). Verified by
    driving read() directly over a multi-row-group file and by pinning
    that the whole-file reader is never called."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_go_distributed_spark.iceberg import fileio
    from iceberg_go_distributed_spark.streaming import (
        _IcebergFilePartition,
        _IcebergStreamReader,
    )

    path = str(tmp_path / "multi_rg.parquet")
    sch = pa.schema(
        [
            pa.field("id", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("v", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]
    )
    n = 10_000
    tbl = pa.table(
        {"id": list(range(n)), "v": [f"v{i}" for i in range(n)]}, schema=sch
    )
    pq.write_table(tbl, path, row_group_size=1000)

    # fields as partitions() ships them: (field_id, current_name, type,
    # initial_default) — include a renamed column and an added-later one
    fields = [
        (1, "id_renamed", pa.int64(), None),
        (2, "v", pa.string(), None),
        (3, "added_later", pa.int64(), 42),
    ]
    part = _IcebergFilePartition(path, fields, {})

    orig = fileio.read_parquet_table
    fileio.read_parquet_table = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("stream read() must not materialize the whole file")
    )
    try:
        batches = list(_IcebergStreamReader.read(object.__new__(_IcebergStreamReader), part))
    finally:
        fileio.read_parquet_table = orig

    assert len(batches) > 1, "multi-row-group file must yield multiple batches"
    assert all(b.num_rows < n for b in batches)
    out = pa.Table.from_batches(batches)
    assert out.column_names == ["id_renamed", "v", "added_later"]
    assert out.num_rows == n
    assert out["id_renamed"].to_pylist() == list(range(n))
    assert set(out["added_later"].to_pylist()) == {42}

    # degenerate projection: every field added after the file was written
    # → defaults synthesized from footer row counts, still batch-wise
    part2 = _IcebergFilePartition(path, [(9, "only_new", pa.int64(), 7)], {})
    batches2 = list(
        _IcebergStreamReader.read(object.__new__(_IcebergStreamReader), part2)
    )
    assert len(batches2) == 10  # one per row group (no batch_size path here)
    assert sum(b.num_rows for b in batches2) == n
    assert set(pa.Table.from_batches(batches2)["only_new"].to_pylist()) == {7}


def test_iceberg_stream_restart_admission_protocol(tmp_path, spark):
    """With position_path bookkeeping, a checkpoint-restart's FIRST
    trigger is capped too: commit() records the committed end offset,
    and a fresh reader (restart: latestOffset before any initialOffset/
    partitions call) recovers its position from the file instead of
    admitting the whole backlog. Driven at the reader-protocol level —
    the exact call sequence the streaming runner makes."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import _IcebergStreamReader

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    mk = lambda i: spark.createDataFrame([(i, f"v{i}")], "id long, v string")
    t = cat.create_table("db.radm", schema_from_spark(mk(0).schema))
    t.append(mk(0).coalesce(1))

    pos_path = str(tmp_path / "pos")
    opts = {
        "warehouse": wh,
        "table": "db.radm",
        "max_files_per_trigger": "2",
        "position_path": pos_path,
    }

    # fresh query: initialOffset → latestOffset → partitions → commit
    r1 = _IcebergStreamReader(opts)
    start = r1.initialOffset()
    end = r1.latestOffset()
    assert len(r1.partitions(start, end)) == 1
    r1.commit(end)
    committed = end["snapshot_id"]
    assert int(open(pos_path).read()) == committed

    # 5-file backlog committed while the query is down
    for i in range(1, 6):
        t.append(mk(i).coalesce(1))
    t.refresh()
    head = t.current_snapshot().snapshot_id

    # restart: a NEW reader's first call is latestOffset (no
    # initialOffset) — it must recover the position and cap at 2 files
    r2 = _IcebergStreamReader(opts)
    capped = r2.latestOffset()
    assert capped["snapshot_id"] != head, "first restart trigger must be capped"
    parts = r2.partitions({"snapshot_id": committed}, capped)
    assert len(parts) == 2, f"cap is 2 files, planned {len(parts)}"
    r2.commit(capped)

    # and the rest of the backlog drains in capped steps to the head
    seen_files = len(parts)
    guard = 0
    while r2._pos != head and guard < 10:
        nxt = r2.latestOffset()
        ps = r2.partitions({"snapshot_id": r2._pos}, nxt)
        assert len(ps) <= 2
        seen_files += len(ps)
        r2.commit(nxt)
        guard += 1
    assert seen_files == 6 - 1  # snapshots 1..5; snapshot 0 was delivered pre-restart

    # WITHOUT position_path the restart trigger is uncapped (documented)
    r3 = _IcebergStreamReader({k: v for k, v in opts.items() if k != "position_path"})
    assert r3.latestOffset()["snapshot_id"] == head

    # a stale/foreign position (not on head's ancestry) must NOT produce
    # an end offset behind the checkpoint start: falls back to uncapped
    open(pos_path, "w").write("999999123")
    r4 = _IcebergStreamReader(opts)
    assert r4.latestOffset()["snapshot_id"] == head


def test_iceberg_stream_restart_admission_e2e(tmp_path, spark):
    """End-to-end: kill a capped query, commit a backlog, restart from
    the checkpoint with position_path — no trigger (including the first
    after restart) delivers more files than the cap."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    mk = lambda i: spark.createDataFrame([(i, f"v{i}")], "id long, v string")
    t = cat.create_table("db.re2e", schema_from_spark(mk(0).schema))
    t.append(mk(0).coalesce(1))

    batches: list[list[tuple]] = []

    def run_once():
        q = (
            iceberg_stream(
                spark,
                wh,
                "db.re2e",
                max_files_per_trigger="1",
                position_path=str(tmp_path / "pos"),
            )
            .writeStream.foreachBatch(
                lambda b, _id: batches.append([tuple(r) for r in b.collect()])
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()  # delivers snapshot 0, records the position

    for i in range(1, 5):  # backlog while the query is down
        t.append(mk(i).coalesce(1))

    # each availableNow restart drains exactly one capped batch (the
    # documented availableNow+cap contract); the FIRST restart trigger
    # must already be capped at 1 file — without position_path it would
    # deliver all 4 backlog rows at once
    for _ in range(4):
        run_once()

    nonempty = [b for b in batches if b]
    assert all(len(b) == 1 for b in nonempty), batches
    assert sorted(r for b in batches for r in b) == [(i, f"v{i}") for i in range(5)]


def test_iceberg_stream_cdc_mode_matches_changelog_poll(tmp_path, spark):
    """mode='cdc' readStream: row-level-delete snapshots are expanded
    into rows tagged `_change_type` ('insert'/'delete'), matching what a
    changelog_poll loop run once per commit would deliver — DV diffs for
    partial-file deletes, parent-live rows for whole-dropped files,
    equality-delete (upsert/MERGE) commits expanded to delete+insert
    pairs with already-dead rows (prior DVs AND prior eq-deletes)
    subtracted — and offsets survive a checkpoint restart mid-history."""
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import changelog_poll, iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    t = cat.create_table("db.cdc", schema_from_spark(df1.schema))
    t.upgrade_format_version(3)

    # reference consumer: changelog_poll once per commit
    cursor = changelog_poll(t, spark, None)[1]  # position at the beginning
    reference: list[tuple] = []

    def commit_and_poll(action):
        nonlocal cursor
        action()
        changes, cursor = changelog_poll(t, spark, cursor)
        if changes is not None:
            reference.extend(
                tuple(r)
                for r in changes.select(
                    "id", "v", "_change_type", "_row_id"
                ).collect()
            )

    commit_and_poll(lambda: t.append(df1.coalesce(1)))
    commit_and_poll(
        lambda: t.append(
            spark.createDataFrame([(3, "c"), (4, "d")], "id long, v string").coalesce(1)
        )
    )

    seen: list[tuple] = []

    def run_once():
        q = (
            iceberg_stream(spark, wh, "db.cdc", mode="cdc")
            .writeStream.foreachBatch(
                lambda b, _id: seen.extend(tuple(r) for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # row VALUES, change kinds, AND v3 row lineage all match the poll
    assert sorted(seen) == sorted(reference)  # 4 inserts so far
    assert all(r[2] == "insert" for r in seen)
    assert all(r[3] is not None for r in seen), "lineage missing"

    # partial-file delete (deletion-vector diff) and a whole-file drop
    # (strict match covers the entire second file), committed while the
    # stream is down; restart resumes from the checkpointed offset
    commit_and_poll(lambda: t.delete_where(spark, E.equal("id", 2)))
    commit_and_poll(lambda: t.delete_where(spark, E.greater_than_or_equal("id", 3)))
    run_once()
    assert sorted(seen) == sorted(reference), (sorted(seen), sorted(reference))
    kinds = {(r[0], r[2]) for r in seen}
    assert (2, "delete") in kinds and (3, "delete") in kinds and (4, "delete") in kinds
    assert sum(1 for r in seen if r[2] == "delete") == 3

    # idle restart delivers nothing
    n = len(seen)
    run_once()
    assert len(seen) == n

    # equality-delete upsert (the MERGE commit shape) expands to row
    # events executor-side: the old row version emits a delete, the new
    # file's rows emit inserts — and the id=2 position already dead via
    # the earlier DV must NOT re-emit (prior position subtraction)
    commit_and_poll(lambda: t.upsert(
        spark.createDataFrame([(1, "a2")], "id long, v string"),
        key_columns=["id"],
    ))
    run_once()
    assert sorted(seen) == sorted(reference), (sorted(seen), sorted(reference))
    assert ((1, "a", "delete") in {(r[0], r[1], r[2]) for r in seen})

    # a second upsert re-keying id=1: the (1,'a') version is already
    # dead via the PRIOR eq-delete — only the live (1,'a2') row may emit
    # a delete event (prior-eq subtraction), plus a brand-new key
    commit_and_poll(lambda: t.upsert(
        spark.createDataFrame([(1, "a3"), (5, "e")], "id long, v string"),
        key_columns=["id"],
    ))
    # and a multi-action MERGE committed while the stream is down; the
    # restart resumes from the checkpoint across both commits
    commit_and_poll(lambda: t.merge(
        spark,
        spark.createDataFrame([(5, "E2"), (6, "f")], "id long, v string"),
        on=["id"],
        matched_update="*",
    ))
    run_once()
    assert sorted(seen) == sorted(reference), (sorted(seen), sorted(reference))
    dels = [(r[0], r[1]) for r in seen if r[2] == "delete"]
    assert dels.count((1, "a")) == 1, "prior-eq-dead row re-emitted"
    assert (1, "a2") in dels and (5, "e") in dels
    ins = [(r[0], r[1]) for r in seen if r[2] == "insert"]
    assert (5, "E2") in ins and (6, "f") in ins and (1, "a3") in ins


def test_iceberg_stream_cdc_across_merge_append(tmp_path, spark):
    """Interplay of two r8 features: a merge-append commit rewrites old
    entries (EXISTING) into the same manifest that carries the new files
    (ADDED) — both the append stream and the CDC stream must deliver
    ONLY the newly appended rows for that snapshot, never re-deliver the
    rewritten history."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    mk = lambda i: spark.createDataFrame(
        [(i * 10 + j, f"v{i}_{j}") for j in range(3)], "id long, v string"
    )
    t = cat.create_table("db.cdcm", schema_from_spark(mk(0).schema))
    t.upgrade_format_version(3)
    tx = t.transaction()
    tx.set_properties(
        {
            "commit.manifest-merge.enabled": "true",
            "commit.manifest.min-count-to-merge": "2",
        }
    )
    tx.commit()

    seen: list[tuple] = []

    def run_once():
        q = (
            iceberg_stream(spark, wh, "db.cdcm", mode="cdc")
            .writeStream.foreachBatch(
                lambda b, _id: seen.extend(tuple(r) for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    t.append(mk(0).coalesce(1))
    run_once()
    assert len(seen) == 3

    # the next two appends merge manifests (min-count 2); each must still
    # stream exactly its own three rows
    for i in (1, 2):
        t.append(mk(i).coalesce(1))
        run_once()
        assert sorted(r[0] for r in seen) == sorted(
            x * 10 + j for x in range(i + 1) for j in range(3)
        ), f"after append {i}: {sorted(seen)}"
    t.refresh()
    assert len(t.current_snapshot().manifests()) == 1, "merge did not fire"
    assert all(r[2] == "insert" for r in seen)
    # lineage stayed stable across the merge: all ids unique
    ids = [r[3] for r in seen]
    assert len(ids) == len(set(ids)) and None not in ids


def test_iceberg_stream_cdc_fuzz_vs_changelog_poll(tmp_path, spark):
    """Randomized append/DV-delete histories: one bounded CDC stream run
    over the WHOLE history (multi-snapshot batch, per-snapshot
    decomposition) must deliver exactly the union of per-commit
    changelog_poll results — including rows appended and later deleted
    within the same range (both surfaces emit the insert AND the
    delete), whole-file drops, and repeat-delete DV replacement."""
    import random

    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import changelog_poll, iceberg_stream

    rng = random.Random(0xCDC)
    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    probe = spark.createDataFrame([(0, 0)], "id long, grp long")
    t = cat.create_table("db.cdcfz", schema_from_spark(probe.schema))
    t.upgrade_format_version(3)

    cursor = changelog_poll(t, spark, None)[1]
    reference: list[tuple] = []
    next_id = [0]

    def poll():
        nonlocal cursor
        changes, cursor = changelog_poll(t, spark, cursor)
        if changes is not None:
            reference.extend(
                tuple(r)
                for r in changes.select(
                    "id", "grp", "_change_type", "_row_id"
                ).collect()
            )

    def op_append():
        n = rng.randint(3, 8)
        rows = [(next_id[0] + i, (next_id[0] + i) % 5) for i in range(n)]
        next_id[0] += n
        t.append(
            spark.createDataFrame(rows, "id long, grp long").coalesce(
                rng.choice([1, 2])
            )
        )
        poll()

    def op_delete_grp():
        t.delete_where(spark, E.equal("grp", rng.randint(0, 4)))
        poll()

    def op_delete_range():
        hi = rng.randint(1, max(next_id[0], 1))
        t.delete_where(spark, E.less_than("id", hi))
        poll()

    op_append()
    ops = [op_append, op_append, op_delete_grp, op_delete_range]
    for _ in range(10):
        rng.choice(ops)()

    seen: list[tuple] = []
    q = (
        iceberg_stream(spark, wh, "db.cdcfz", mode="cdc")
        .writeStream.foreachBatch(
            lambda b, _id: seen.extend(tuple(r) for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert sorted(seen) == sorted(reference), (
        f"stream {len(seen)} events vs poll {len(reference)}"
    )
    # sanity: the history actually exercised deletes, and lineage rode
    # along on every event
    assert any(r[2] == "delete" for r in reference)
    assert all(r[3] is not None for r in reference)


def test_iceberg_stream_source_delivers_cherry_pick_once(tmp_path, spark):
    """Interplay pin: a cherry-picked append is a NEW snapshot on main
    whose manifest entries attribute to it, so the stream delivers its
    rows exactly once — with the original branch commit never leaking."""
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    cat = FileSystemCatalog(wh)
    t = cat.create_table("db.cp_src", schema_from_spark(df1.schema))
    t.append(df1.coalesce(1))

    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple] = []

    def run_once():
        q = (
            iceberg_stream(spark, wh, "db.cp_src")
            .writeStream.foreachBatch(
                lambda b, _id: seen.extend(tuple(r) for r in b.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert sorted(seen) == [(1, "a")]

    # stage on a branch, move main, publish via cherry-pick
    base = t.current_snapshot().snapshot_id
    t.transaction().set_ref("audit", base).commit()
    t.refresh()
    t.append(
        spark.createDataFrame([(2, "b")], "id long, v string").coalesce(1),
        branch="audit",
    )
    staged = t.metadata.refs["audit"].snapshot_id
    t.append(spark.createDataFrame([(3, "c")], "id long, v string").coalesce(1))
    assert t.cherry_pick(staged) is True
    t.refresh()

    seen.clear()
    run_once()
    assert sorted(seen) == [(2, "b"), (3, "c")], "picked rows exactly once"

    # nothing replays on the next idle run
    seen.clear()
    run_once()
    assert seen == []


def test_iceberg_stream_cdc_fuzz_matches_changelog(tmp_path, spark):
    """Randomized append / upsert / delete_where interleavings: the
    bounded CDC stream over the WHOLE history (run mid-way and again at
    the end — a checkpoint resume) must deliver exactly what a
    per-commit changelog_poll loop delivered. The fuzz hits the shapes
    the deterministic tests enumerate one at a time — eq-deletes over
    DV-dead rows, DVs over eq-dead rows, consecutive upserts re-keying
    the same ids — in interleavings they don't."""
    import random

    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.streaming import changelog_poll, iceberg_stream

    rng = random.Random(0xC9)
    for trial in range(2):
        wh = str(tmp_path / f"fzwh{trial}")
        cat = FileSystemCatalog(wh)
        df0 = spark.createDataFrame(
            [(i, f"t{trial}v{i}") for i in range(8)], "id long, v string"
        )
        t = cat.create_table("db.fz", schema_from_spark(df0.schema))
        t.upgrade_format_version(3)

        cursor = changelog_poll(t, spark, None)[1]
        reference: list[tuple] = []
        next_id = [8]
        live_ids = set()

        def commit_and_poll(action):
            nonlocal cursor
            action()
            changes, cursor = changelog_poll(t, spark, cursor)
            if changes is not None:
                reference.extend(
                    tuple(r)
                    for r in changes.select("id", "v", "_change_type").collect()
                )

        def do_append():
            n = rng.randint(2, 5)
            ids = list(range(next_id[0], next_id[0] + n))
            next_id[0] += n
            live_ids.update(ids)
            rows = [(i, f"t{trial}v{i}") for i in ids]
            commit_and_poll(lambda: t.append(
                spark.createDataFrame(rows, "id long, v string").coalesce(1)
            ))

        def do_upsert():
            pool = sorted(live_ids)
            picks = rng.sample(pool, min(len(pool), rng.randint(1, 4))) if pool else []
            picks.append(next_id[0])  # always one brand-new key too
            live_ids.add(next_id[0])
            next_id[0] += 1
            rows = [(i, f"t{trial}u{rng.randint(0, 9)}_{i}") for i in picks]
            commit_and_poll(lambda: t.upsert(
                spark.createDataFrame(rows, "id long, v string"),
                key_columns=["id"],
            ))

        def do_delete():
            k = rng.randint(3, 5)
            r = rng.randint(0, k - 1)
            doomed = {i for i in live_ids if i % k == r}
            if not doomed:
                return
            live_ids.difference_update(doomed)
            commit_and_poll(lambda: t.delete_where(
                spark,
                E.and_(E.greater_than_or_equal("id", 0), E.is_in("id", sorted(doomed))),
            ))

        commit_and_poll(lambda: t.append(df0.coalesce(1)))
        live_ids.update(range(8))

        seen: list[tuple] = []
        ck = str(tmp_path / f"fzck{trial}")

        def run_stream():
            q = (
                iceberg_stream(spark, wh, "db.fz", mode="cdc")
                .writeStream.foreachBatch(
                    lambda b, _id: seen.extend(
                        (r.id, r.v, r._change_type) for r in b.collect()
                    )
                )
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(180), "bounded stream did not finish"

        ops = [do_append, do_upsert, do_delete]
        for step in range(4):
            rng.choice(ops)()
        run_stream()  # mid-history consume
        for step in range(4):
            rng.choice(ops)()
        run_stream()  # checkpoint resume over the second half

        assert sorted(seen) == sorted(reference), (
            f"trial {trial}: stream diverged from per-commit changelog\n"
            f"stream-only: {sorted(set(seen) - set(reference))[:10]}\n"
            f"changelog-only: {sorted(set(reference) - set(seen))[:10]}"
        )


def test_iceberg_stream_cdc_refuses_oversized_eq_keys(tmp_path, spark):
    """A commit whose equality-delete key files exceed
    read.cdc.eq-keys-max-rows is refused AT PLAN TIME naming
    changelog_poll (the bounded route) — the executor-side expansion
    would load the key frame into every task's memory (r9 VERDICT
    'What's wrong' #1). The per-query option overrides the property."""
    import pytest

    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "id long, v string"
    )
    t = cat.create_table("db.cdcbig", schema_from_spark(df.schema))
    t.upgrade_format_version(3)
    t.append(df.coalesce(1))
    tx = t.transaction()
    tx.set_properties({"read.cdc.eq-keys-max-rows": "2"})
    tx.commit()
    t.refresh()
    # 3-key upsert: one eq-delete key file with 3 rows, above the bound
    t.upsert(
        spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "id long, v string"
        ),
        ["id"],
    )

    q = (
        iceberg_stream(spark, wh, "db.cdcbig", mode="cdc")
        .writeStream.format("memory")
        .queryName("cdc_refuse")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="changelog_poll"):
        q.awaitTermination(180)
        raise AssertionError("stream accepted an oversized eq expansion")

    # per-query option raises the bound: the same history now streams
    seen: list[tuple] = []
    q2 = (
        iceberg_stream(
            spark, wh, "db.cdcbig", mode="cdc",
            cdc_eq_keys_max_rows="1000000",
        )
        .writeStream.foreachBatch(
            lambda b, _id: seen.extend(
                (r.id, r.v, r._change_type) for r in b.collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180)
    kinds = {(r[0], r[2]) for r in seen}
    assert (1, "delete") in kinds and (1, "insert") in kinds
    assert sum(1 for r in seen if r[2] == "delete") == 3


def test_iceberg_stream_cdc_netted_catch_up(tmp_path, spark):
    """cdc_catch_up_snapshots=N (examples/cdc_consumer.catch_up promoted
    into the source): a stream resuming more than N commits behind
    plans ONE range-netted batch. Events must equal changelog_scan over
    the same range (the netted oracle), and a hot key merged 4 times in
    the gap costs exactly one delete+insert pair — the per-commit
    expansion would emit four. A compaction inside a later gap makes the
    range non-nettable: the source falls back to per-commit expansion
    (replace skipped), and the mirror reconstructed from ALL events
    still equals the live table."""
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
    from iceberg_go_distributed_spark.iceberg.write import rewrite_data_files
    from iceberg_go_distributed_spark.streaming import iceberg_stream

    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, v string")
    t = cat.create_table("db.cdcn", schema_from_spark(df.schema))
    t.upgrade_format_version(3)
    t.append(df.coalesce(1))

    seen: list[tuple] = []
    ck = str(tmp_path / "ck")

    def run_once():
        q = (
            iceberg_stream(
                spark, wh, "db.cdcn", mode="cdc",
                cdc_catch_up_snapshots="2",
            )
            .writeStream.foreachBatch(
                lambda b, _id: seen.extend(
                    tuple(r)
                    for r in b.select("id", "v", "_change_type", "_row_id").collect()
                )
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert len(seen) == 10 and all(r[2] == "insert" for r in seen)
    t.refresh()
    s_mid = t.current_snapshot().snapshot_id

    # gap churn while the stream is down: hot key re-merged 4×, two new
    # keys appended, a predicate delete — 6 commits > threshold 2
    for k in range(4):
        t.upsert(
            spark.createDataFrame([(1, f"hot{k}")], "id long, v string"),
            key_columns=["id"],
        )
    t.append(
        spark.createDataFrame([(20, "t"), (21, "u")], "id long, v string").coalesce(1)
    )
    t.delete_where(
        spark,
        E.and_(E.greater_than_or_equal("id", 8), E.less_than("id", 10)),
    )
    t.refresh()
    e_id = t.current_snapshot().snapshot_id

    n0 = len(seen)
    run_once()
    got = sorted(seen[n0:])
    oracle = sorted(
        tuple(r)
        for r in t.changelog_scan(spark, s_mid, e_id)
        .select("id", "v", "_change_type", "_row_id")
        .collect()
    )
    assert got == oracle, (got, oracle)
    # THE netting win: one delete (v0 version) + one insert (final) for
    # the hot key — per-commit expansion would emit four pairs
    hot = sorted(r for r in got if r[0] == 1)
    assert len(hot) == 2, hot
    assert {r[2] for r in hot} == {"insert", "delete"}
    assert next(r[1] for r in hot if r[2] == "insert") == "hot3"

    # compaction inside the next gap → range not nettable → per-commit
    # fallback (replace skipped); one more churn commit after it
    assert rewrite_data_files(t, spark)
    t.refresh()
    t.upsert(
        spark.createDataFrame([(20, "T2")], "id long, v string"),
        key_columns=["id"],
    )
    t.refresh()
    run_once()

    # mirror reconstruction over ALL delivered events equals the table
    mirror: dict = {}
    for rid_ev in seen:
        _id, v, ch, rid = rid_ev
        if ch == "insert":
            mirror[rid] = (_id, v)
        else:
            mirror.pop(rid, None)
    live = sorted((r.id, r.v) for r in t.scan().to_df(spark).collect())
    assert sorted(mirror.values()) == live, (sorted(mirror.values()), live)
