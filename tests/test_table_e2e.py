"""End-to-end table layer: create → append (distributed-snapshot write)
→ scan with pruning → verify vs the raw parquet. Plus catalog CRUD,
time travel, refs, metadata round-trips and the concurrent-commit
conflict (ports table/distributed_snapshot_test.go:56,131)."""

from __future__ import annotations

import os

import pytest

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import (
    CommitConflictError,
    FileSystemCatalog,
    NoSuchTableError,
    SqlCatalog,
    TableAlreadyExistsError,
)
from iceberg_go_distributed_spark.iceberg.metadata import (
    TableMetadata,
    parse_metadata_file,
)
from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

LINEITEM_SCHEMA = Schema.of(
    0,
    NestedField(1, "l_orderkey", ty.LongType(), required=True),
    NestedField(2, "l_partkey", ty.LongType()),
    NestedField(3, "l_suppkey", ty.LongType()),
    NestedField(4, "l_linenumber", ty.IntegerType()),
    NestedField(5, "l_quantity", ty.DoubleType()),
    NestedField(6, "l_extendedprice", ty.DoubleType()),
    NestedField(7, "l_discount", ty.DoubleType()),
    NestedField(8, "l_tax", ty.DoubleType()),
    NestedField(9, "l_returnflag", ty.StringType()),
    NestedField(10, "l_linestatus", ty.StringType()),
    NestedField(11, "l_shipdate", ty.TimestampType()),
)


@pytest.fixture()
def fs_catalog(tmp_path):
    return FileSystemCatalog(str(tmp_path / "warehouse"))


@pytest.fixture()
def lineitem_df(spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    df = load_table(spark, sf_dir, "lineitem")
    # testdata ship dates are timestamps already; cast to be safe
    return df


def test_catalog_crud(fs_catalog):
    s = Schema.of(0, NestedField(1, "id", ty.LongType(), required=True))
    t = fs_catalog.create_table("db.t1", s)
    assert fs_catalog.table_exists("db.t1")
    with pytest.raises(TableAlreadyExistsError):
        fs_catalog.create_table("db.t1", s)
    assert fs_catalog.list_tables("db") == [("db", "t1")]
    t2 = fs_catalog.rename_table("db.t1", "db.t2")
    assert t2.schema().fields[0].name == "id"
    assert not fs_catalog.table_exists("db.t1")
    fs_catalog.drop_table("db.t2")
    with pytest.raises(NoSuchTableError):
        fs_catalog.load_table("db.t2")


def test_sql_catalog_crud(tmp_path):
    cat = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "wh"))
    s = Schema.of(0, NestedField(1, "id", ty.LongType(), required=True))
    cat.create_namespace("db", {"owner": "x"})
    cat.create_table("db.t1", s)
    assert cat.table_exists("db.t1")
    assert cat.list_tables("db") == [("db", "t1")]
    assert cat.load_namespace_properties("db") == {"owner": "x"}
    cat.update_namespace_properties("db", updates={"k": "v"})
    assert cat.load_namespace_properties("db")["k"] == "v"
    with pytest.raises(ValueError):
        cat.drop_namespace("db")
    cat.rename_table("db.t1", "db.t2")
    cat.drop_table("db.t2")
    cat.drop_namespace("db")


def test_metadata_roundtrip(fs_catalog):
    s = Schema.of(
        0,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "cat", ty.StringType()),
    )
    spec = spec_from(s, ("cat", "identity"), ("id", "bucket[4]"))
    t = fs_catalog.create_table("db.part", s, spec=spec, properties={"k": "v"})
    md2 = parse_metadata_file(t.metadata_location)
    assert md2.table_uuid == t.metadata.table_uuid
    assert md2.current_schema().fields == s.fields
    assert md2.default_spec().fields[1].transform.num_buckets == 4
    assert md2.properties == {"k": "v"}


def test_append_scan_roundtrip(fs_catalog, spark, lineitem_df, ducks):
    t = fs_catalog.create_table("db.lineitem", LINEITEM_SCHEMA)
    t.append(lineitem_df)

    snap = t.current_snapshot()
    assert snap is not None
    assert snap.summary.operation == "append"
    n_expected = lineitem_df.count()
    assert int(snap.summary.properties["total-records"]) == n_expected

    # full scan
    df = t.scan().to_df(spark)
    assert df.count() == n_expected

    # filtered scan matches raw-parquet filter
    expr = E.greater_than("l_quantity", 45.0)
    got = t.scan(row_filter=expr).to_df(spark).count()
    want = lineitem_df.where("l_quantity > 45.0").count()
    assert got == want > 0

    # projection + limit
    df3 = t.scan(row_filter=expr).select("l_orderkey", "l_quantity").with_limit(7).to_df(spark)
    assert df3.columns == ["l_orderkey", "l_quantity"]
    assert df3.count() == 7


def test_append_twice_and_time_travel(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.li2", LINEITEM_SCHEMA)
    small = lineitem_df.limit(100)
    t.append(small)
    first = t.current_snapshot()
    t.append(small)
    second = t.current_snapshot()
    assert second.parent_snapshot_id == first.snapshot_id
    assert second.sequence_number == first.sequence_number + 1
    assert t.scan().to_df(spark).count() == 200
    # snapshot-id time travel
    assert t.scan(snapshot_id=first.snapshot_id).to_df(spark).count() == 100
    # as-of-timestamp travel
    assert (
        t.scan().as_of(first.timestamp_ms).to_df(spark).count() == 100
    )
    assert len(t.history()) == 2
    assert int(second.summary.properties["total-records"]) == 200


def test_branches_and_tags(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.li3", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(50))
    first = t.current_snapshot()
    tx = t.transaction()
    tx.set_ref("v1_tag", first.snapshot_id, ref_type="tag")
    tx.commit()
    t.append(lineitem_df.limit(100))
    assert t.scan().to_df(spark).count() == 150
    assert t.scan(use_ref="v1_tag").to_df(spark).count() == 50
    assert t.refs()["v1_tag"].snapshot_ref_type == "tag"


def test_partitioned_append_and_pruning(fs_catalog, spark, lineitem_df):
    spec = spec_from(LINEITEM_SCHEMA, ("l_shipdate", "year"), ("l_returnflag", "identity"))
    t = fs_catalog.create_table("db.li_part", LINEITEM_SCHEMA, spec=spec)
    small = lineitem_df.limit(2000)
    t.append(small)

    # partition paths are hive-style
    snap = t.current_snapshot()
    files = [
        e.data_file.file_path
        for m in snap.manifests()
        for e in __import__(
            "iceberg_go_distributed_spark.iceberg.manifest", fromlist=["read_manifest"]
        ).read_manifest(m.manifest_path)
    ]
    assert all("l_shipdate_year=" in p and "l_returnflag=" in p for p in files)

    # identity-partition pruning: only R-flag files planned
    expr = E.equal("l_returnflag", "R")
    tasks = t.scan(row_filter=expr).plan_files()
    assert tasks and all("l_returnflag=R" in x.file.file_path for x in tasks)

    # correctness: pruned scan == unpruned filter (soundness check)
    got = t.scan(row_filter=expr).to_df(spark).count()
    want = small.where("l_returnflag = 'R'").count()
    assert got == want > 0

    # year-transform pruning on the timestamp column
    expr2 = E.greater_than_or_equal("l_shipdate", "1997-01-01T00:00:00")
    n_all = len(t.scan().plan_files())
    n_pruned = len(t.scan(row_filter=expr2).plan_files())
    assert n_pruned < n_all
    got2 = t.scan(row_filter=expr2).to_df(spark).count()
    want2 = small.where("l_shipdate >= timestamp'1997-01-01'").count()
    assert got2 == want2 > 0


def test_metrics_pruning_skips_files(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.li_metrics", LINEITEM_SCHEMA)
    # two appends with disjoint orderkey ranges → per-file bounds disjoint
    lo = lineitem_df.where("l_orderkey < 500")
    hi = lineitem_df.where("l_orderkey >= 1000")
    t.append(lo)
    t.append(hi)
    all_tasks = t.scan().plan_files()
    hit = t.scan(row_filter=E.less_than("l_orderkey", 250)).plan_files()
    assert len(hit) < len(all_tasks), "metrics pruning should drop the hi files"
    got = t.scan(row_filter=E.less_than("l_orderkey", 250)).to_df(spark).count()
    want = lineitem_df.where("l_orderkey < 250").count()
    assert got == want > 0


def test_concurrent_commit_conflict(fs_catalog, spark, lineitem_df):
    """Port of table/distributed_snapshot_test.go:131 — two writers on
    the same base: the second CAS must fail, and the retry loop in
    commit_data_files must succeed."""
    from iceberg_go_distributed_spark.iceberg.write import (
        begin_distributed_snapshot,
        commit_data_files,
        write_data_files,
    )

    t = fs_catalog.create_table("db.li_conflict", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10))

    t_a = fs_catalog.load_table("db.li_conflict")
    t_b = fs_catalog.load_table("db.li_conflict")

    ds_a = begin_distributed_snapshot(t_a)
    files_a = write_data_files(
        lineitem_df.limit(5), t_a.schema(), t_a.spec(), t_a.location, ds_a.commit_uuid
    )
    ds_b = begin_distributed_snapshot(t_b)
    files_b = write_data_files(
        lineitem_df.limit(5), t_b.schema(), t_b.spec(), t_b.location, ds_b.commit_uuid
    )

    # writer A commits first
    commit_data_files(t_a, files_a, max_retries=0)
    # writer B's first CAS fails against the stale base…
    with pytest.raises(CommitConflictError):
        commit_data_files(t_b, files_b, max_retries=0)
    # …and succeeds with the retry loop (refresh + re-reserve)
    commit_data_files(t_b, files_b, max_retries=2)
    t_b.refresh()
    assert t_b.scan().to_df(spark).count() == 20


def test_stale_commit_lock_reclaimed(fs_catalog, spark, lineitem_df):
    """A lock left by a hard-crashed committer must not block the
    version forever: locks older than LOCK_TTL_SECONDS are broken."""
    import os
    import time

    t = fs_catalog.create_table("db.li_lock", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    v = int(open(os.path.join(t.location, "metadata", "version-hint.text")).read())
    stale = os.path.join(t.location, "metadata", f"v{v + 1}.metadata.json.lock")
    with open(stale, "w"):
        pass
    # fresh lock → genuine conflict
    with pytest.raises(CommitConflictError):
        t.append(lineitem_df.limit(5).coalesce(1))
    # aged past the TTL → reclaimed, commit goes through
    old = time.time() - fs_catalog.LOCK_TTL_SECONDS - 5
    os.utime(stale, (old, old))
    t.append(lineitem_df.limit(5).coalesce(1))
    assert t.scan().to_df(spark).count() == 15
    assert not os.path.exists(stale)


def test_resumed_stalled_committer_cannot_clobber(fs_catalog, spark, lineitem_df):
    """If committer A stalls past the TTL and committer B reclaims the lock
    and commits v{N}, A's resumed write must fail with a conflict — NOT
    silently replace B's committed v{N}.metadata.json."""
    import os

    t = fs_catalog.create_table("db.li_clobber", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    v = int(open(os.path.join(t.location, "metadata", "version-hint.text")).read())

    # Simulate B's committed version file landing (written by the racer
    # that broke A's stale lock) while A is about to write the same path.
    # A's base check still passes — the hint swap is what A's write races.
    committed = os.path.join(t.location, "metadata", f"v{v + 1}.metadata.json")
    sentinel = b'{"committed-by": "B"}'
    with open(committed, "wb") as f:
        f.write(sentinel)

    with pytest.raises(CommitConflictError):
        fs_catalog.commit_table("db.li_clobber", t.metadata_location, t.metadata)
    # B's committed bytes are untouched — tmp+rename would have clobbered
    assert open(committed, "rb").read() == sentinel


def test_reclaimed_zombie_cannot_swap_hint(fs_catalog, spark, lineitem_df):
    """A committer whose stale lock was reclaimed (its token overwritten)
    must lose the hint swap instead of making its version visible after
    the reclaimer has decided that version is dead (ADVICE r5, medium)."""
    import os

    t = fs_catalog.create_table("db.li_zombie", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    v = fs_catalog._current_version("db.li_zombie")
    lock = fs_catalog._version_path("db.li_zombie", v + 1) + ".lock"
    with open(lock, "w") as f:  # reclaimer B now owns the lock
        f.write("token-of-B")
    with pytest.raises(CommitConflictError, match="reclaimed"):
        fs_catalog._swap_hint(
            "db.li_zombie", v + 1, expect=v, commit_lock=lock, token="token-of-A"
        )
    assert fs_catalog._current_version("db.li_zombie") == v  # hint untouched
    os.unlink(lock)


def test_failed_swap_never_unlinks_foreign_version(fs_catalog, spark, lineitem_df, monkeypatch):
    """If the hint swap fails AFTER a reclaimer replaced our published
    v{N} with its own committed file, the failure path must not unlink
    the reclaimer's file — neither on a conflict (CAS/token loss) nor on
    a non-conflict failure (inode guard) (ADVICE r5, medium)."""
    import os

    t = fs_catalog.create_table("db.li_guard", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    t = fs_catalog.load_table("db.li_guard")  # fresh base for commit_table
    v = fs_catalog._current_version("db.li_guard")
    new_path = fs_catalog._version_path("db.li_guard", v + 1)
    sentinel = b'{"committed-by": "B"}'
    orig_swap = fs_catalog._swap_hint

    def replace_then_fail(exc):
        def swap(identifier, new_version, expect, commit_lock=None, token=None):
            # A reclaimer always takes the commit lock (rewriting its
            # token) BEFORE discarding our orphan and publishing its own.
            with open(commit_lock, "w") as f:
                f.write("token-of-B")
            os.unlink(new_path)
            with open(new_path, "wb") as f:
                f.write(sentinel)
            raise exc

        return swap

    for exc in (CommitConflictError("hint moved"), RuntimeError("io error")):
        monkeypatch.setattr(fs_catalog, "_swap_hint", replace_then_fail(exc))
        with pytest.raises(type(exc)):
            fs_catalog.commit_table("db.li_guard", t.metadata_location, t.metadata)
        assert open(new_path, "rb").read() == sentinel, type(exc).__name__
        os.unlink(new_path)
        # our committer must NOT have removed B's lock either
        lock = new_path + ".lock"
        assert open(lock).read() == "token-of-B"
        os.unlink(lock)

    # sanity: a genuine non-conflict failure with OUR file still in place
    # does unpublish it (no wedge until TTL reclaim)
    def just_fail(identifier, new_version, expect, commit_lock=None, token=None):
        raise RuntimeError("io error")

    monkeypatch.setattr(fs_catalog, "_swap_hint", just_fail)
    with pytest.raises(RuntimeError):
        fs_catalog.commit_table("db.li_guard", t.metadata_location, t.metadata)
    assert not os.path.exists(new_path)
    monkeypatch.setattr(fs_catalog, "_swap_hint", orig_swap)
    fs_catalog.commit_table("db.li_guard", t.metadata_location, t.metadata)
    assert fs_catalog._current_version("db.li_guard") == v + 1


def test_orphaned_unpublished_version_is_healed(fs_catalog, spark, lineitem_df):
    """A committer that hard-crashed between publishing v{N} and swapping
    the version hint leaves an orphan v{N} (possibly truncated, under the
    old O_EXCL+write scheme) plus its lock. Once the lock ages past the
    TTL the next commit must clear the never-visible orphan and go
    through — not raise CommitConflictError forever (ADVICE r4, medium)."""
    import os
    import time

    t = fs_catalog.create_table("db.li_orphan", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    v = int(open(os.path.join(t.location, "metadata", "version-hint.text")).read())

    meta = os.path.join(t.location, "metadata")
    orphan = os.path.join(meta, f"v{v + 1}.metadata.json")
    with open(orphan, "wb") as f:
        f.write(b'{"truncated-by-crash')  # partial JSON — unreadable
    lock = orphan + ".lock"
    with open(lock, "w"):
        pass
    old = time.time() - fs_catalog.LOCK_TTL_SECONDS - 5
    os.utime(lock, (old, old))

    t.append(lineitem_df.limit(5).coalesce(1))  # must heal, not wedge
    assert t.scan().to_df(spark).count() == 15
    # the healed v{N} is complete, parseable metadata, not the orphan bytes
    import json as _json

    _json.load(open(orphan))
    # and no stray tmp files remain
    assert not [p for p in os.listdir(meta) if ".tmp-" in p]


def test_transaction_properties_and_expire(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.li_props", LINEITEM_SCHEMA)
    tx = t.transaction()
    tx.set_properties({"owner": "me", "write.target-file-size-bytes": "1048576"})
    tx.commit()
    assert t.properties["owner"] == "me"

    t.append(lineitem_df.limit(10))
    t.append(lineitem_df.limit(10))
    t.append(lineitem_df.limit(10))
    assert len(t.metadata.snapshots) == 3
    tx = t.transaction()
    tx.expire_snapshots(retain_last=1)
    tx.commit()
    assert len(t.metadata.snapshots) == 1
    assert t.scan().to_df(spark).count() == 30  # current snapshot untouched


def test_metadata_tables(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.li_meta", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(20))
    assert t.inspect_snapshots(spark).count() == 1
    assert t.inspect_manifests(spark).count() == 1
    assert t.inspect_files(spark).count() >= 1
    assert t.inspect_history(spark).count() == 1
    assert t.inspect_refs(spark).count() == 1
    row = t.inspect_files(spark).first()
    assert row.record_count > 0 and row.file_format == "PARQUET"
    ent = t.inspect_entries(spark).first()
    assert ent.status == 1 and ent.record_count == 20  # ADDED
    part = t.inspect_partitions(spark).collect()
    assert len(part) == 1  # unpartitioned → one "{}" tuple
    assert part[0].record_count == 20 and part[0].file_count >= 1


def test_partitions_metadata_table_partitioned(fs_catalog, spark, lineitem_df):
    from pyspark.sql import functions as F

    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

    spec = spec_from(LINEITEM_SCHEMA, ("l_returnflag", "identity"))
    t = fs_catalog.create_table("db.li_part_meta", LINEITEM_SCHEMA, spec=spec)
    t.append(lineitem_df)
    parts = {r.partition: r.record_count for r in t.inspect_partitions(spark).collect()}
    want = {
        f"{{'l_returnflag': '{r.l_returnflag}'}}": r.n
        for r in lineitem_df.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert parts == want


def test_nested_types_roundtrip(fs_catalog, spark, sf_dir):
    """embeddings table (array<float>) through the full table layer."""
    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    emb = load_table(spark, sf_dir, "embeddings")
    t = fs_catalog.create_table("db.emb", schema_from_spark(emb.schema))
    t.append(emb.coalesce(1))
    df = t.scan().to_df(spark)
    assert df.count() == emb.count()
    row = df.orderBy("vec_id").first()
    want = emb.orderBy("vec_id").first()
    assert row.vec_id == want.vec_id
    assert row.embedding == want.embedding  # list<float> values intact
    got = t.scan(row_filter=E.less_than("vec_id", 10)).to_df(spark).count()
    assert got == emb.where("vec_id < 10").count()


def test_sql_over_table_view(fs_catalog, spark, lineitem_df):
    """spark.sql over a registered table view — the user-facing SQL path."""
    t = fs_catalog.create_table("db.li_sql", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(300).coalesce(1))
    t.create_or_replace_view(spark, "li_sql")
    row = spark.sql(
        "SELECT l_returnflag, COUNT(*) n FROM li_sql GROUP BY 1 ORDER BY 2 DESC"
    ).first()
    want = (
        lineitem_df.limit(300)
        .groupBy("l_returnflag")
        .count()
        .orderBy("count", ascending=False)
        .first()
    )
    assert row.l_returnflag == want.l_returnflag and row.n == want["count"]


def test_branch_targeted_writes(fs_catalog, spark, lineitem_df):
    """Write-audit-publish: append to an audit branch, main unchanged;
    publish = fast-forward main's ref to the branch head."""
    t = fs_catalog.create_table("db.li_wap", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(100).coalesce(1))
    main_head = t.current_snapshot().snapshot_id

    # create the audit branch at main, then write to it twice
    tx = t.transaction()
    tx.set_ref("audit", main_head, ref_type="branch")
    tx.commit()
    t.append(lineitem_df.limit(50).coalesce(1), branch="audit")
    t.append(lineitem_df.limit(25).coalesce(1), branch="audit")

    # main unchanged, audit sees everything
    assert t.current_snapshot().snapshot_id == main_head
    assert t.scan().to_df(spark).count() == 100
    assert t.scan(use_ref="audit").to_df(spark).count() == 175

    # publish: fast-forward main to the audit head
    audit_head = t.refs()["audit"].snapshot_id
    tx = t.transaction()
    tx.set_ref("main", audit_head)
    tx.commit()
    assert t.scan().to_df(spark).count() == 175


def test_expire_honors_ref_retention(fs_catalog, spark, lineitem_df):
    """refs.go retention: stale tags dropped via max-ref-age-ms; branch
    ancestors protected via min-snapshots-to-keep."""
    from iceberg_go_distributed_spark.iceberg.transaction import (
        AssertTableUUID,
        SetSnapshotRef,
    )
    from iceberg_go_distributed_spark.iceberg.metadata import SnapshotRef

    t = fs_catalog.create_table("db.li_ret", LINEITEM_SCHEMA)
    for _ in range(4):
        t.append(lineitem_df.limit(20).coalesce(1))
    snaps = [s.snapshot_id for s in sorted(t.metadata.snapshots, key=lambda s: s.timestamp_ms)]
    now = t.metadata.last_updated_ms

    # stale tag on the oldest snapshot (max-ref-age 1ms → expired)
    tx = t.transaction()
    tx.apply([SetSnapshotRef("old_tag", snaps[0], "tag")], [AssertTableUUID(t.metadata.table_uuid)])
    tx.commit()
    t.metadata.refs["old_tag"] = SnapshotRef(snaps[0], "tag", max_ref_age_ms=1)
    # main branch protects its last 3 ancestors
    main = t.metadata.refs["main"]
    t.metadata.refs["main"] = SnapshotRef(
        main.snapshot_id, "branch", min_snapshots_to_keep=3, max_snapshot_age_ms=1
    )

    tx = t.transaction()
    tx.expire_snapshots(retain_last=1, now_ms=now + 10_000)
    tx.commit()

    ids = {s.snapshot_id for s in t.metadata.snapshots}
    assert "old_tag" not in t.metadata.refs, "stale tag must be dropped"
    # head + 2 ancestors protected by min-snapshots-to-keep=3
    assert snaps[3] in ids and snaps[2] in ids and snaps[1] in ids
    assert snaps[0] not in ids, "beyond branch retention and tag gone"
    assert t.scan().to_df(spark).count() == 80


def test_ref_retention_survives_commits(fs_catalog, spark, lineitem_df):
    """Code-review regression: a branch advance must not wipe the ref's
    retention settings, and retention is settable through the public API."""
    t = fs_catalog.create_table("db.li_keepret", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    tx = t.transaction()
    tx.set_ref(
        "main",
        t.current_snapshot().snapshot_id,
        min_snapshots_to_keep=7,
        max_ref_age_ms=123456,
    )
    tx.commit()
    assert t.refs()["main"].min_snapshots_to_keep == 7

    # two more appends advance main — retention must survive
    t.append(lineitem_df.limit(10).coalesce(1))
    t.append(lineitem_df.limit(10).coalesce(1))
    r = t.refs()["main"]
    assert r.min_snapshots_to_keep == 7 and r.max_ref_age_ms == 123456
    # retention survives a metadata JSON round-trip too
    t2 = fs_catalog.load_table("db.li_keepret")
    assert t2.refs()["main"].min_snapshots_to_keep == 7


def test_expire_drops_statistics_of_removed_snapshots(fs_catalog, spark, lineitem_df):
    from iceberg_go_distributed_spark.iceberg.puffin import compute_ndv_statistics

    t = fs_catalog.create_table("db.li_statexp", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))
    compute_ndv_statistics(t, spark, columns=["l_orderkey"])
    first = t.current_snapshot().snapshot_id
    t.append(lineitem_df.limit(10).coalesce(1))
    tx = t.transaction()
    tx.expire_snapshots(retain_last=1)
    tx.commit()
    assert all(s.snapshot_id != first for s in t.metadata.snapshots)
    assert all(st["snapshot-id"] != first for st in t.metadata.statistics)


def test_count_metadata_fast_path(fs_catalog, spark, lineitem_df):
    """Filter-free count of a delete-free snapshot comes from manifest
    record counts (metadata only) and must agree with the executed
    plan; any delete or filter falls back to the real scan."""
    t = fs_catalog.create_table("db.li_count", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(300).coalesce(2))
    assert t.scan().count(spark) == 300 == t.scan().to_df(spark).count()
    # filter → executed plan
    n_filtered = t.scan(row_filter=E.greater_than("l_quantity", 30.0)).count(spark)
    assert n_filtered == lineitem_df.limit(300).where("l_quantity > 30.0").count()
    # delete files present → executed plan (counts reflect the deletes)
    t.delete_where(spark, E.equal("l_linenumber", 1))
    want = lineitem_df.limit(300).where("l_linenumber != 1").count()
    assert t.scan().count(spark) == want


def test_manual_distributed_protocol_carries_totals(fs_catalog, spark, lineitem_df):
    """The raw coordinator/worker protocol (begin → worker manifests →
    commit_distributed_snapshot) maintains the running total-* counters
    from the manifest-list counts, like every other commit path."""
    import os

    from iceberg_go_distributed_spark.iceberg.manifest import (
        ManifestEntry,
        ManifestEntryStatus,
        write_manifest,
    )
    from iceberg_go_distributed_spark.iceberg.write import write_data_files

    t = fs_catalog.create_table("db.li_proto", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(10).coalesce(1))

    ds = t.begin_distributed_snapshot()
    files = write_data_files(
        lineitem_df.limit(7).coalesce(1), t.schema(), t.spec(), t.location,
        ds.commit_uuid,
    )
    entries = [
        ManifestEntry(
            status=ManifestEntryStatus.ADDED,
            snapshot_id=ds.snapshot_id,
            sequence_number=None,
            file_sequence_number=None,
            data_file=f,
        )
        for f in files
    ]
    path = os.path.join(t.location, "metadata", f"{ds.commit_uuid}-w0.avro")
    mf = write_manifest(path, t.spec(), t.schema(), ds.snapshot_id, entries)
    t.commit_distributed_snapshot(ds, [mf])
    t.refresh()
    props = t.current_snapshot().summary.properties
    assert props["total-records"] == "17"
    assert props["total-data-files"] == "2"
    assert props["added-records"] == "7"
    assert t.scan().to_df(spark).count() == 17


def test_dml_retries_on_concurrent_commit(fs_catalog, spark, lineitem_df):
    """Review fix: row-level DML used to fail permanently when a
    concurrent commit won the CAS; it now refreshes, RE-PLANS from the
    new base, and re-executes — both writers' effects land."""
    t = fs_catalog.create_table("db.li_dmlrace", LINEITEM_SCHEMA)
    rows = [r.asDict() for r in lineitem_df.limit(60).collect()]
    for i, r in enumerate(rows):
        r["l_orderkey"] = i
    df = spark.createDataFrame(rows, lineitem_df.schema)
    t.append(df.coalesce(1))

    a = fs_catalog.load_table("db.li_dmlrace")
    b = fs_catalog.load_table("db.li_dmlrace")  # stale after A commits

    from iceberg_go_distributed_spark.iceberg import expressions as E

    a.delete_where(spark, E.less_than("l_orderkey", 5))
    b.delete_where(
        spark,
        E.and_(E.greater_than_or_equal("l_orderkey", 50), E.less_than("l_orderkey", 55)),
    )  # first CAS loses against A's commit → retried against fresh base
    b.refresh()
    got = sorted(r.l_orderkey for r in b.scan().to_df(spark).select("l_orderkey").collect())
    assert got == [k for k in range(60) if not (k < 5 or 50 <= k < 55)]

    # upsert racing a delete likewise converges
    a.refresh()
    a.delete_where(spark, E.equal("l_orderkey", 10))
    b.upsert(df.where("l_orderkey = 20").coalesce(1), ["l_orderkey"])
    b.refresh()
    assert b.scan().to_df(spark).where("l_orderkey = 10").count() == 0
    assert b.scan().to_df(spark).where("l_orderkey = 20").count() == 1
