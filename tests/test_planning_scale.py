"""Metadata-plane scalability: planning cost is O(manifests + entries),
pruning drops work before anything touches Spark. Builds a synthetic
2,000-file / 20-manifest table (no Spark, no parquet — metadata only)
and checks pruning ratios + planning latency."""

from __future__ import annotations

import os
import time

import pytest

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.conversions import to_bytes
from iceberg_go_distributed_spark.iceberg.manifest import (
    DataFile,
    ManifestEntry,
    ManifestEntryStatus,
    write_manifest,
)
from iceberg_go_distributed_spark.iceberg.metadata import Snapshot, Summary
from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
from iceberg_go_distributed_spark.iceberg.transaction import (
    AddSnapshotUpdate,
    AssertTableUUID,
    SetSnapshotRef,
)
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

SCHEMA = Schema.of(
    0,
    NestedField(1, "id", ty.LongType(), required=True),
    NestedField(2, "day_key", ty.IntegerType(), required=True),
)

N_MANIFESTS = 20
FILES_PER_MANIFEST = 100  # → 2,000 files


@pytest.fixture()
def big_table(tmp_path):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    spec = spec_from(SCHEMA, ("day_key", "identity"))
    t = cat.create_table("db.big", SCHEMA, spec=spec)
    manifests = []
    for m_i in range(N_MANIFESTS):
        entries = []
        for f_i in range(FILES_PER_MANIFEST):
            day = m_i * FILES_PER_MANIFEST + f_i  # each file its own day
            id_lo, id_hi = day * 1000, day * 1000 + 999
            entries.append(
                ManifestEntry(
                    status=ManifestEntryStatus.ADDED,
                    snapshot_id=1,
                    sequence_number=1,
                    file_sequence_number=1,
                    data_file=DataFile(
                        file_path=f"/data/day={day}/f{f_i}.parquet",
                        partition={"day_key": day},
                        record_count=1000,
                        file_size_in_bytes=10_000,
                        value_counts={1: 1000, 2: 1000},
                        null_value_counts={1: 0, 2: 0},
                        lower_bounds={
                            1: to_bytes(ty.LongType(), id_lo),
                            2: to_bytes(ty.IntegerType(), day),
                        },
                        upper_bounds={
                            1: to_bytes(ty.LongType(), id_hi),
                            2: to_bytes(ty.IntegerType(), day),
                        },
                    ),
                )
            )
        path = os.path.join(t.location, "metadata", f"synthetic-m{m_i}.avro")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        mf = write_manifest(path, spec, SCHEMA, 1, entries)
        mf.sequence_number = mf.min_sequence_number = 1
        manifests.append(mf)
    from iceberg_go_distributed_spark.iceberg.manifest import write_manifest_list

    list_path = os.path.join(t.location, "metadata", "snap-1.avro")
    write_manifest_list(list_path, manifests)
    snap = Snapshot(
        snapshot_id=1,
        sequence_number=1,
        timestamp_ms=t.metadata.last_updated_ms + 1,
        manifest_list=list_path,
        summary=Summary("append"),
        schema_id=0,
    )
    tx = t.transaction()
    tx.apply(
        [AddSnapshotUpdate(snap), SetSnapshotRef("main", 1)],
        [AssertTableUUID(t.metadata.table_uuid)],
    )
    tx.commit()
    return t


def test_full_plan_counts(big_table):
    tasks = big_table.scan().plan_files()
    assert len(tasks) == N_MANIFESTS * FILES_PER_MANIFEST


def test_manifest_level_pruning(big_table):
    """A single-day filter must prune 19/20 manifests via partition
    summaries before any manifest is even read."""
    tasks = big_table.scan(row_filter=E.equal("day_key", 1234)).plan_files()
    assert len(tasks) == 1
    assert tasks[0].file.partition["day_key"] == 1234


def test_metrics_level_pruning(big_table):
    tasks = big_table.scan(row_filter=E.equal("id", 1_234_567)).plan_files()
    assert len(tasks) == 1
    assert tasks[0].file.file_path.startswith("/data/day=1234/")


def test_range_pruning_ratio(big_table):
    tasks = big_table.scan(
        row_filter=E.and_(
            E.greater_than_or_equal("day_key", 500), E.less_than("day_key", 600)
        )
    ).plan_files()
    assert len(tasks) == 100


def test_planning_latency(big_table):
    """2,000 files must plan in well under a second once manifests are
    warm — the metadata plane is O(entries) pure Python."""
    big_table.scan(row_filter=E.equal("day_key", 7)).plan_files()  # warm
    t0 = time.perf_counter()
    for day in (3, 777, 1500):
        big_table.scan(row_filter=E.equal("day_key", day)).plan_files()
    dt = (time.perf_counter() - t0) / 3
    assert dt < 1.0, f"planning too slow: {dt:.3f}s per pruned scan"


def test_distributed_planning_matches_local_under_deletes(tmp_path, spark, sf_dir):
    """Equivalence on a real table carrying positional + equality deletes
    AND a pruning filter: identical (file → delete set) maps."""
    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.table import plan_files_distributed
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    li = load_table(spark, sf_dir, "lineitem").limit(400)
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.dp_eq", schema_from_spark(li.schema))
    for lo, hi in ((0, 500), (500, 1200), (1200, 1 << 60)):
        t.append(li.where(f"l_orderkey >= {lo} AND l_orderkey < {hi}").coalesce(1))
    t.delete_where(spark, E.greater_than("l_quantity", 40.0))
    victims = li.where("l_linenumber = 5").select("l_orderkey").distinct()
    t.delete_by_keys(victims, ["l_orderkey"])

    for expr in (None, E.less_than("l_orderkey", 900)):
        scan = t.scan(row_filter=expr) if expr is not None else t.scan()
        as_map = lambda tasks: {
            x.file.file_path: sorted(d.file_path for d in x.delete_files)
            for x in tasks
        }
        local, dist = scan.plan_files(), plan_files_distributed(scan, spark)
        assert as_map(dist) == as_map(local) and local


def test_distributed_planning_matches_local(big_table, spark):
    """plan_files_distributed must produce exactly the local planner's
    file set (executor-side pruning, driver gets only descriptors)."""
    from iceberg_go_distributed_spark.iceberg.table import plan_files_distributed

    for expr in (
        E.equal("day_key", 1234),
        E.and_(E.greater_than_or_equal("day_key", 500), E.less_than("day_key", 600)),
        E.equal("id", 1_234_567),
    ):
        local = {t.file.file_path for t in big_table.scan(row_filter=expr).plan_files()}
        dist = {
            t.file.file_path
            for t in plan_files_distributed(big_table.scan(row_filter=expr), spark)
        }
        assert dist == local and local


def test_auto_route_to_distributed_planning(big_table, spark, monkeypatch):
    """Scan.plan_files_auto routes through plan_files_distributed once
    the snapshot's manifest count crosses the (property-tunable)
    threshold, and the routed plan is identical to the local one —
    to_df/count pick the route up transparently."""
    from iceberg_go_distributed_spark.iceberg import table as table_mod

    scan = big_table.scan(row_filter=E.equal("day_key", 1234))
    local = {t.file.file_path for t in scan.plan_files()}

    # default threshold (64) > 20 manifests: local planning
    calls = []
    orig = table_mod.plan_files_distributed
    monkeypatch.setattr(
        table_mod,
        "plan_files_distributed",
        lambda s, sp: calls.append(1) or orig(s, sp),
    )
    auto = {t.file.file_path for t in scan.plan_files_auto(spark)}
    assert auto == local and not calls

    # lowered threshold: the same call fans out to executors. Clear the
    # plan memo first — a repeated identical scan would (by design) be
    # served from it before the router ever runs, and this test is
    # about the ROUTER.
    big_table.metadata.properties["read.distributed-planning.min-manifests"] = "2"
    table_mod._PLAN_CACHE.clear()
    auto2 = {t.file.file_path for t in scan.plan_files_auto(spark)}
    assert auto2 == local and calls
    # the metadata-only count fast path rides the same router
    assert big_table.scan().count(spark) == N_MANIFESTS * FILES_PER_MANIFEST * 1000
    big_table.metadata.properties.pop("read.distributed-planning.min-manifests")


def test_planbench_builder_local_dist_auto_agree(tmp_path, spark):
    """The planning-bench synthetic snapshot (bench.py's `planning`
    block) is a REAL table committed through the distributed-snapshot
    protocol: local, distributed, and auto-routed planning must return
    the identical task set, and the data-column filter must survive
    manifest pruning everywhere (every manifest read) while metrics
    pruning cuts files."""
    from iceberg_go_distributed_spark.iceberg.planbench import (
        build_wide_metadata_table,
        selective_filter,
    )
    from iceberg_go_distributed_spark.iceberg.table import plan_files_distributed

    n_manifests, files_per = 70, 20  # above the 64-manifest auto threshold
    t = build_wide_metadata_table(
        str(tmp_path / "wh"), n_manifests, files_per
    )
    flt, n_match = selective_filter(n_manifests, files_per)

    scan = t.scan(row_filter=flt)
    local = sorted(x.file.file_path for x in scan.plan_files())
    dist = sorted(x.file.file_path for x in plan_files_distributed(scan, spark))
    auto = sorted(x.file.file_path for x in scan.plan_files_auto(spark))
    assert local == dist == auto
    assert len(local) == n_match
    # entry-level pruning did the cutting: far fewer files than total
    assert len(local) < n_manifests * files_per / 10
    # and an unfiltered plan sees every fabricated file
    assert len(t.scan().plan_files()) == n_manifests * files_per


def test_auto_route_triggers_on_file_count_for_fat_manifests(tmp_path, spark):
    """Merge-append produces FEW but FAT manifests — a table can hold
    millions of files in under 64 manifests, so routing on manifest
    count alone would plan it on the driver. The file-count trigger
    (read.distributed-planning.min-files, computed from manifest-list
    added+existing counts, O(manifests)) must route it distributed."""
    from iceberg_go_distributed_spark.iceberg import table as table_mod
    from iceberg_go_distributed_spark.iceberg.planbench import (
        build_wide_metadata_table,
        selective_filter,
    )

    n_manifests, files_per = 4, 50  # 200 files, far below 64 manifests
    t = build_wide_metadata_table(str(tmp_path / "wh"), n_manifests, files_per)
    tx = t.transaction()
    tx.set_properties({"read.distributed-planning.min-files": "100"})
    tx.commit()
    flt, n_match = selective_filter(n_manifests, files_per)

    calls = []
    orig = table_mod.plan_files_distributed

    def spy(scan, sp):
        calls.append(1)
        return orig(scan, sp)

    table_mod.plan_files_distributed = spy
    try:
        got = t.scan(row_filter=flt).plan_files_auto(spark)
    finally:
        table_mod.plan_files_distributed = orig
    assert calls, "fat-manifest table did not route to distributed planning"
    assert len(got) == n_match

    # raising the file threshold back above the table size routes local
    tx = t.transaction()
    tx.set_properties({"read.distributed-planning.min-files": "1000000"})
    tx.commit()
    calls.clear()
    table_mod.plan_files_distributed = spy
    try:
        got2 = t.scan(row_filter=flt).plan_files_auto(spark)
    finally:
        table_mod.plan_files_distributed = orig
    assert not calls and len(got2) == n_match


def test_plan_cache_repeat_scan_skips_manifest_reads(tmp_path, spark, monkeypatch):
    """Planning memoizes per (metadata location, snapshot, filter): a
    repeated scan of an unchanged table reads zero manifests, returns
    the identical file set, and any commit invalidates by construction
    (new metadata location). Distinct filters get distinct entries."""
    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg import table as TBL
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    TBL._PLAN_CACHE.clear()
    df = spark.createDataFrame([(i, float(i)) for i in range(40)], "id long, v double")
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.pc", schema_from_spark(df.schema))
    for s in range(4):
        t.append(df.where((df.id >= s * 10) & (df.id < (s + 1) * 10)).coalesce(1))
    t.refresh()

    reads = []
    real_read = TBL.read_manifest
    real_scan = TBL.scan_manifest

    def spy_read(path, **kw):
        reads.append(path)
        return real_read(path, **kw)

    def spy_scan(path, keep, **kw):
        # the planner's filtered read (r15): counts as a manifest read
        reads.append(path)
        return real_scan(path, keep, **kw)

    monkeypatch.setattr(TBL, "read_manifest", spy_read)
    monkeypatch.setattr(TBL, "scan_manifest", spy_scan)

    first = t.scan().plan_files()
    assert len(first) == 4 and reads, "first plan must read manifests"
    n = len(reads)
    second = t.scan().plan_files()
    assert len(reads) == n, "repeat plan re-read manifests (cache miss)"
    assert [x.file.file_path for x in second] == [x.file.file_path for x in first]

    # a different filter is a different entry — and prunes correctly
    flt = E.and_(E.greater_than_or_equal("id", 10), E.less_than("id", 20))
    filtered = t.scan(flt).plan_files()
    assert len(filtered) == 1 and len(reads) > n
    n = len(reads)
    assert len(t.scan(flt).plan_files()) == 1 and len(reads) == n  # hit

    # commit → new metadata location → miss → the new file is planned
    t.append(df.where("id < 5").coalesce(1))
    t.refresh()
    assert len(t.scan().plan_files()) == 5 and len(reads) > n

    # property kill switch
    tx = t.transaction()
    tx.set_properties({"read.plan-cache.enabled": "false"})
    tx.commit()
    t.refresh()
    t.scan().plan_files()
    n = len(reads)
    t.scan().plan_files()
    assert len(reads) > n, "disabled cache must re-plan"
    TBL._PLAN_CACHE.clear()


def test_auto_route_prefers_local_when_cache_warm(big_table, spark, monkeypatch):
    """A re-plan of a snapshot whose manifests are already decoded (an
    UNFILTERED scan populated the manifest cache) must plan locally —
    replaying cached prototype entries beats launching a Spark job —
    unless read.distributed-planning.skip-when-cached is off."""
    from iceberg_go_distributed_spark.iceberg import manifest as manifest_mod
    from iceberg_go_distributed_spark.iceberg import table as table_mod

    # broad scan: every manifest survives level-2 pruning → cache warm
    scan = big_table.scan()
    local = {t.file.file_path for t in scan.plan_files()}
    snap = scan.snapshot()
    assert all(
        m.manifest_path in manifest_mod._OCF_CACHE for m in snap.manifests()
    ), "broad plan should have cached every manifest"

    calls = []
    orig = table_mod.plan_files_distributed
    monkeypatch.setattr(
        table_mod,
        "plan_files_distributed",
        lambda s, sp: calls.append(1) or orig(s, sp),
    )
    big_table.metadata.properties["read.distributed-planning.min-manifests"] = "2"
    try:
        table_mod._PLAN_CACHE.clear()
        auto = {t.file.file_path for t in scan.plan_files_auto(spark)}
        assert auto == local and not calls, (
            "warm-cache re-plan must stay on the local planner"
        )
        # opting out restores width-based routing
        big_table.metadata.properties[
            "read.distributed-planning.skip-when-cached"
        ] = "false"
        table_mod._PLAN_CACHE.clear()
        auto2 = {t.file.file_path for t in scan.plan_files_auto(spark)}
        assert auto2 == local and calls
    finally:
        big_table.metadata.properties.pop(
            "read.distributed-planning.min-manifests", None
        )
        big_table.metadata.properties.pop(
            "read.distributed-planning.skip-when-cached", None
        )
