"""Table maintenance: orphan-file cleanup, manifest merging, metadata
housekeeping, location providers.

  - delete_orphan_files   — ref table/orphan_cleanup.go:164-456
  - merge_manifests       — ref table/snapshot_producers.go:245-418
                            (merge-append bin-packing: 8MB target,
                            min-count 100 — commit.manifest.* props)
  - location providers    — ref table/locations.go:38-171 (simple vs
                            object-store hashed paths)
"""

from __future__ import annotations

import os
import time
import urllib.parse
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

from .manifest import (
    ManifestContent,
    ManifestEntry,
    ManifestEntryStatus,
    read_manifest,
    write_manifest,
)

MANIFEST_MERGE_ENABLED = "commit.manifest-merge.enabled"
MANIFEST_TARGET_SIZE = "commit.manifest.target-size-bytes"  # default 8MB
MANIFEST_MIN_MERGE_COUNT = "commit.manifest.min-count-to-merge"  # default 100
OBJECT_STORE_ENABLED = "write.object-storage.enabled"


# ------------------------------------------------------------------ orphans

def _statistics_paths(md) -> set[str]:
    """Paths of table-statistics puffins and partition-statistics files
    tracked in metadata (spec: `statistics-path` on both entry kinds)."""
    out: set[str] = set()
    for entry in list(md.statistics) + list(md.partition_statistics):
        p = entry.get("statistics-path") if isinstance(entry, dict) else None
        if p:
            out.add(p)
    return out


def referenced_files(table) -> set[str]:
    """Every file any snapshot can reach — ref orphan_cleanup.go:229
    (getReferencedFiles): data files, manifests, manifest lists,
    metadata JSONs (current + log), statistics files."""
    refs: set[str] = {table.metadata_location}
    refs |= _statistics_paths(table.metadata)
    for entry in table.metadata.metadata_log:
        refs.add(entry.metadata_file)
    for snap in table.metadata.snapshots:
        refs.add(snap.manifest_list)
        for m in snap.manifests():
            refs.add(m.manifest_path)
            for e in read_manifest(m.manifest_path, discard_deleted=False):
                refs.add(e.data_file.file_path)
    return refs


def _normalize(p: str) -> str:
    """Scheme/authority-insensitive comparison — ref orphan_cleanup.go
    URI normalization (file:///a == /a)."""
    u = urllib.parse.urlparse(p)
    return u.path if u.scheme in ("", "file") else p


_PROTECTED_SUFFIXES = (".lock", ".flock")


def _is_protected(filename: str) -> bool:
    # never touch catalog control files: the version hint and lock
    # files (unlinking a held .flock would let two racing commits lock
    # DIFFERENT inodes, voiding the CAS)
    return filename == "version-hint.text" or filename.endswith(_PROTECTED_SUFFIXES)


def delete_orphan_files(
    table,
    older_than_ms: Optional[int] = None,
    dry_run: bool = False,
    concurrency: int = 8,
    spark=None,
) -> list[str]:
    """List the table location, diff against referenced files, delete
    unreferenced files older than the cutoff (default 3 days, matching
    the reference's safety default). Returns the orphan list.

    Two execution shapes:
      * `spark=None` — driver-side os.walk + set diff. LOCAL locations
        only (an object-store URI would silently list nothing and
        report zero orphans, so it raises instead); fine at test scale.
      * `spark=...` — the 100 TB shape: executors LIST the location
        (one recursive pyarrow-FS listing task per second-level prefix,
        so a million-file data/ dir fans out across the cluster) and
        READ every manifest for its referenced paths; the diff is a
        Spark left-anti join, and only the O(orphans) result returns to
        the driver. Works on any fileio-supported location (local, S3,
        GCS, Azure)."""
    cutoff = older_than_ms if older_than_ms is not None else int(time.time() * 1000) - 3 * 86400_000
    location = table.location
    if spark is not None:
        return _delete_orphans_distributed(
            table, spark, cutoff, dry_run, concurrency
        )
    from . import fileio

    if not fileio.is_local(location):
        raise ValueError(
            f"driver-side orphan listing cannot walk {location!r}; pass "
            "spark= for the distributed listing (os.walk on an object-"
            "store URI would silently report zero orphans)"
        )
    refs = {_normalize(p) for p in referenced_files(table)}
    orphans: list[str] = []
    for root, _dirs, files in os.walk(location):
        for fn in files:
            if _is_protected(fn):
                continue
            p = os.path.join(root, fn)
            if _normalize(p) in refs:
                continue
            try:
                mtime_ms = int(os.path.getmtime(p) * 1000)
            except OSError:
                continue
            if mtime_ms < cutoff:
                orphans.append(p)
    if not dry_run and orphans:
        with ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(pool.map(lambda p: os.path.exists(p) and os.unlink(p), orphans))
    return sorted(orphans)


def _location_fs(location: str):
    """(pyarrow FileSystem, fs-native root path, scheme_prefix) for any
    supported location. scheme_prefix restores a user-facing URI from an
    fs-native path (empty for local)."""
    from pyarrow import fs as pafs

    from . import fileio

    if fileio.is_local(location):
        return pafs.LocalFileSystem(), fileio.local_path(location), ""
    fs, root = fileio.resolve(location)
    scheme = location.split("://", 1)[0] + "://"
    return fs, root, scheme


def _delete_orphans_distributed(table, spark, cutoff, dry_run, concurrency):
    """Executor-side listing + manifest reads, Spark anti-join diff."""
    import pandas as pd
    from pyarrow import fs as pafs

    from . import fileio
    from .table import strip_scheme

    location = table.location
    fs, root, scheme = _location_fs(location)
    cfg = fileio.env_config()
    is_local = scheme == ""

    # partition the listing work: second-level prefixes (data/<dir>,
    # metadata/<dir>, ...) discovered with two shallow driver LISTs —
    # O(dirs), not O(files) — so executors each walk one subtree
    prefixes: list[str] = []
    shallow_files: list[tuple[str, int]] = []

    def shallow(dirpath, collect_dirs):
        try:
            infos = fs.get_file_info(pafs.FileSelector(dirpath, recursive=False))
        except (OSError, FileNotFoundError):
            return
        for fi in infos:
            if fi.type == pafs.FileType.Directory:
                collect_dirs.append(fi.path)
            elif fi.type == pafs.FileType.File:
                shallow_files.append(
                    (fi.path, _mtime_ms(fi))
                )

    level1: list[str] = []
    shallow(root, level1)
    for d in level1:
        shallow(d, prefixes)

    listing_parts = []
    if prefixes:
        pref_df = spark.createDataFrame(
            [(p,) for p in sorted(prefixes)], "prefix string"
        ).repartition(min(len(prefixes), 64))

        def list_prefix(batches):
            from pyarrow import fs as pafs2

            from . import fileio as fio

            fio.apply_config(cfg)
            if is_local:
                lfs = pafs2.LocalFileSystem()
            else:
                lfs, _ = fio.resolve(location)
            for pdf in batches:
                paths, mtimes = [], []
                for prefix in pdf["prefix"]:
                    try:
                        infos = lfs.get_file_info(
                            pafs2.FileSelector(prefix, recursive=True)
                        )
                    except (OSError, FileNotFoundError):
                        continue
                    for fi in infos:
                        if fi.type == pafs2.FileType.File:
                            paths.append(fi.path)
                            mtimes.append(_mtime_ms(fi))
                yield pd.DataFrame({"path": paths, "mtime_ms": mtimes})

        listing_parts.append(
            pref_df.mapInPandas(list_prefix, "path string, mtime_ms long")
        )
    if shallow_files:
        listing_parts.append(
            spark.createDataFrame(
                list(shallow_files), "path string, mtime_ms long"
            )
        )
    if not listing_parts:
        return []
    listing = listing_parts[0]
    for part in listing_parts[1:]:
        listing = listing.unionByName(part)

    # referenced paths: driver knows the metadata-plane files (O(snapshots
    # + manifests)); executors read each manifest once for its data/delete
    # file paths — the O(entries) work never touches the driver
    meta_refs = {strip_scheme(table.metadata_location)}
    meta_refs |= {strip_scheme(p) for p in _statistics_paths(table.metadata)}
    for entry in table.metadata.metadata_log:
        meta_refs.add(strip_scheme(entry.metadata_file))
    manifest_paths: set[str] = set()
    for snap in table.metadata.snapshots:
        meta_refs.add(strip_scheme(snap.manifest_list))
        for m in snap.manifests():
            meta_refs.add(strip_scheme(m.manifest_path))
            manifest_paths.add(m.manifest_path)

    refs_parts = [
        spark.createDataFrame([(p,) for p in sorted(meta_refs)], "ref string")
    ]
    if manifest_paths:
        man_df = spark.createDataFrame(
            [(p,) for p in sorted(manifest_paths)], "path string"
        ).repartition(min(len(manifest_paths), 64))

        def read_refs(batches):
            from . import fileio as fio
            from .manifest import read_manifest as rm
            from .table import strip_scheme as strip

            fio.apply_config(cfg)
            for pdf in batches:
                out = []
                for mp in pdf["path"]:
                    for e in rm(mp, discard_deleted=False):
                        out.append(strip(e.data_file.file_path))
                yield pd.DataFrame({"ref": out})

        refs_parts.append(man_df.mapInPandas(read_refs, "ref string"))
    refs = refs_parts[0]
    for part in refs_parts[1:]:
        refs = refs.unionByName(part)

    from pyspark.sql import functions as F

    protected = F.col("_name") == "version-hint.text"
    for suf in _PROTECTED_SUFFIXES:
        protected = protected | F.col("_name").endswith(suf)
    candidates = (
        listing.withColumn(
            "_name", F.element_at(F.split(F.col("path"), "/"), -1)
        )
        .where(~protected)
        .where(F.col("mtime_ms") < F.lit(cutoff))
        .drop("_name")
    )
    # pafs listing paths are scheme-less already; refs were stripped
    orphan_rows = candidates.join(
        refs, candidates["path"] == refs["ref"], "left_anti"
    ).collect()
    orphans = sorted(scheme + r.path if scheme else r.path for r in orphan_rows)
    if not dry_run and orphans:
        with ThreadPoolExecutor(max_workers=concurrency) as pool:

            def rm_one(p):
                try:
                    fileio.remove(p)
                except (OSError, FileNotFoundError):
                    pass

            list(pool.map(rm_one, orphans))
    return orphans


def _mtime_ms(fi) -> int:
    """FileInfo mtime in epoch ms; unknown mtimes report as NOW so the
    age cutoff never deletes a file whose age cannot be established."""
    mt = getattr(fi, "mtime", None)
    if mt is None:
        return int(time.time() * 1000)
    return int(mt.timestamp() * 1000)


# ----------------------------------------------------------- manifest merge

def merge_manifests(table, target_size_bytes: Optional[int] = None, min_count: Optional[int] = None) -> bool:
    """Bin-pack small data manifests of the current snapshot into merged
    manifests — ref snapshot_producers.go:245-373 (mergeManager). A new
    snapshot ('replace') referencing the merged manifests is committed.
    Returns True if a merge happened."""
    from .write import _commit_manifests, begin_distributed_snapshot

    md = table.metadata
    props = md.properties
    target = target_size_bytes or int(props.get(MANIFEST_TARGET_SIZE, str(8 * 1024 * 1024)))
    minc = min_count if min_count is not None else int(props.get(MANIFEST_MIN_MERGE_COUNT, "100"))
    snap = md.current_snapshot()
    if snap is None:
        return False
    manifests = snap.manifests()
    data_m = [m for m in manifests if m.content == ManifestContent.DATA]
    other_m = [m for m in manifests if m.content != ManifestContent.DATA]
    small = [m for m in data_m if m.manifest_length < target]
    if len(small) < minc:
        return False

    # Bin-pack small manifests into ≥target groups (greedy by size), but
    # never mix partition specs in one bin: a merged manifest is written
    # under a single spec, and re-keying a foreign-spec entry's partition
    # tuple by that spec's field names would silently null its partition
    # values (and then wrongly prune the file at scan time). The reference
    # groups per spec before merging — ref snapshot_producers.go:255-257.
    by_spec: dict[int, list] = {}
    for m in small:
        by_spec.setdefault(m.partition_spec_id, []).append(m)
    bins: list[list] = []
    for spec_manifests in by_spec.values():
        cur: list = []
        cur_size = 0
        for m in sorted(spec_manifests, key=lambda m: m.manifest_length):
            cur.append(m)
            cur_size += m.manifest_length
            if cur_size >= target:
                bins.append(cur)
                cur, cur_size = [], 0
        if cur:
            bins.append(cur)
    # single-manifest bins gain nothing from a rewrite — keep them as-is
    singletons = [b[0] for b in bins if len(b) == 1]
    bins = [b for b in bins if len(b) > 1]
    if not bins:
        return False

    ds = begin_distributed_snapshot(table)
    merged = []
    schema = md.current_schema()
    for i, group in enumerate(bins):
        entries: list[ManifestEntry] = []
        spec_id = group[0].partition_spec_id
        for m in group:
            # v3: materialize each file's inherited first_row_id into the
            # merged manifest — without this the merged manifest (null
            # first_row_id) would be assigned a FRESH range at the next
            # manifest-list write, silently renumbering every row's
            # _row_id. The merged ManifestFile itself stays null, so the
            # list writer allocates a covering (unused) range — burned
            # ids are safe, reused ids are not.
            for e in read_manifest(
                m.manifest_path,
                inherit_sequence_number=m.sequence_number,
                inherit_first_row_id=m.first_row_id,
            ):
                e.status = ManifestEntryStatus.EXISTING
                entries.append(e)
        path = os.path.join(md.location, "metadata", f"{ds.commit_uuid}-merged-m{i}.avro")
        mf = write_manifest(path, md.spec_by_id(spec_id), schema, ds.snapshot_id, entries)
        mf.sequence_number = min(m.sequence_number for m in group)
        mf.min_sequence_number = min(m.min_sequence_number for m in group)
        merged.append(mf)

    keep = [m for m in data_m if m.manifest_length >= target] + singletons + other_m
    n_merged = sum(len(b) for b in bins)
    _commit_manifests(
        table,
        [],
        merged + keep,
        operation="replace",
        extra_summary={"manifests-merged": str(n_merged)},
        snapshot_id=ds.snapshot_id,
        commit_uuid=ds.commit_uuid,
        parent_snapshot_id=ds.parent_snapshot_id,
    )
    return True


# ------------------------------------------------- deletion-vector compaction

def rewrite_position_deletes(
    table,
    spark,
    target_file_size: Optional[int] = None,
    min_input_files: int = 2,
) -> bool:
    """Consolidate deletion-vector puffin files — the DV analogue of the
    reference's delete maintenance (Spark's rewrite_position_deletes
    procedure; ref table/properties.go delete-file sizing intent).

    A steady delete stream writes one small puffin file per delete_where
    per touched task, so live DVs end up scattered over many tiny files
    even though the spec keeps at most one DV *blob* per data file.
    This pass repacks every live DV blob into ceil(total/target) puffin
    files (one per executor task, bin-sized by the blobs' byte size) and
    replaces the delete manifests with ONE consolidated manifest — no
    data files are rewritten and no delete is re-derived.

    Correctness-critical: each blob keeps its ORIGINAL data sequence
    number and snapshot id (entry-level, explicit in the new manifest)
    — the scan's `delete.seq >= data.seq` gate must keep producing
    exactly the same matches, so a consolidated DV never leaks onto a
    data file compacted/added after the delete. Executor work is
    decode+re-encode of roaring bitmaps (O(deleted positions) per task);
    the driver only ever sees O(files) descriptors.

    Also sweeps DANGLING deletion vectors — DVs whose referenced data
    file is no longer live (compaction rewrote it): they can never match
    again, but they inflate total-position-deletes and every scan's
    delete-manifest read until removed (the remove-dangling-deletes half
    of Spark's rewrite_position_deletes procedure). The liveness check
    rides `scan().plan_files()`, so it auto-routes through distributed
    planning on large snapshots.

    Returns True if a consolidation snapshot was committed."""
    import json as _json
    import math

    from . import fileio as _fileio
    from .manifest import (
        DataFile,
        DataFileContent,
        ManifestContent,
        ManifestEntry,
        ManifestEntryStatus,
        read_manifest,
        write_manifest,
    )
    from .write import (
        _commit_manifests,
        _decode_partition,
        _encode_partition,
        begin_distributed_snapshot,
    )

    md = table.metadata
    snap = md.current_snapshot()
    if snap is None:
        return False
    target = target_file_size or int(
        md.properties.get("write.delete.target-file-size-bytes", str(64 * 1024 * 1024))
    )
    delete_m = [m for m in snap.manifests() if m.content == ManifestContent.DELETES]
    keep = [m for m in snap.manifests() if m.content != ManifestContent.DELETES]
    if not delete_m:
        return False

    dv_rows = []  # one row per live DV blob
    mixed_rewrites = []  # (manifest, non-DV entries) needing a rewrite
    for m in delete_m:
        entries = read_manifest(m.manifest_path, inherit_sequence_number=m.sequence_number)
        dvs = [e for e in entries if e.data_file.content_offset is not None]
        others = [e for e in entries if e.data_file.content_offset is None]
        for e in dvs:
            d = e.data_file
            dv_rows.append(
                (
                    d.referenced_data_file,
                    d.file_path,
                    int(d.content_offset),
                    int(d.content_size_in_bytes),
                    int(d.record_count),
                    int(e.sequence_number or 0),
                    int(e.file_sequence_number or e.sequence_number or 0),
                    int(e.snapshot_id or snap.snapshot_id),
                    # spec-required: a position-delete entry carries the
                    # referenced data file's partition tuple; preserve it
                    # (and its spec id) verbatim through the repack
                    _json.dumps(_encode_partition(d.partition or {})),
                    int(m.partition_spec_id),
                )
            )
        if dvs and others:
            mixed_rewrites.append((m, others))
        elif others:
            keep.append(m)  # no DVs — carry untouched
        # all-DV manifests are dropped (replaced by the consolidated one)

    if not dv_rows:
        return False
    # dangling sweep: a DV whose referenced data file is gone can never
    # match again — drop it instead of repacking it (plan_files_auto
    # routes the manifest reads through executors on large snapshots)
    live_paths = {t.file.file_path for t in table.scan().plan_files_auto(spark)}
    dangling = [r for r in dv_rows if r[0] not in live_paths]
    live_rows = [r for r in dv_rows if r[0] in live_paths]

    src_puffins = {r[1] for r in dv_rows}
    total_bytes = sum(r[3] for r in live_rows)
    n_out = max(1, math.ceil(total_bytes / target))
    if not dangling and len(src_puffins) < max(min_input_files, n_out + 1):
        return False  # already as consolidated as the target allows

    ds = begin_distributed_snapshot(table)
    location = md.location
    commit_uuid = ds.commit_uuid
    fileio_cfg = _fileio.env_config()

    files_df = (
        spark.createDataFrame(
            live_rows,
            "data_file string, dv_path string, dv_offset bigint, dv_size bigint, "
            "cardinality bigint, seq bigint, file_seq bigint, snap_id bigint, "
            "part string, spec_id int",
        ).repartition(n_out)
        if live_rows
        else None
    )

    def task(batches):
        import pandas as pd

        from pyspark import TaskContext

        from . import fileio
        from .puffin import (
            BlobMetadata,
            read_deletion_vector,
            serialize_deletion_vector,
            write_puffin,
        )
        from .write import _encode_descriptor

        fileio.apply_config(fileio_cfg)
        tc = TaskContext.get()
        # partition id + ATTEMPT id: speculative/retried attempts of the
        # same task must never write the same path concurrently (the
        # attempt id is unique per attempt; Iceberg writers embed one in
        # the filename for the same reason)
        task_id = f"{tc.partitionId()}-{tc.taskAttemptId()}" if tc else "0-0"
        blobs, refs = [], []
        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                positions = read_deletion_vector(
                    rec.dv_path, int(rec.dv_offset), int(rec.dv_size)
                )
                blobs.append(
                    (
                        BlobMetadata(
                            type="deletion-vector-v1",
                            fields=[],
                            snapshot_id=int(rec.snap_id),
                            sequence_number=int(rec.seq),
                            properties={
                                "referenced-data-file": rec.data_file,
                                "cardinality": str(len(positions)),
                            },
                        ),
                        serialize_deletion_vector(positions),
                    )
                )
                refs.append(rec)
        if not blobs:
            yield pd.DataFrame(
                {"descriptor": [], "seq": [], "file_seq": [], "snap_id": [], "spec_id": []}
            ).astype(
                {"descriptor": "string", "seq": "int64", "file_seq": "int64",
                 "snap_id": "int64", "spec_id": "int64"}
            )
            return
        d = os.path.join(location, "data")
        fileio.makedirs(d)
        path = os.path.join(d, f"00000-{task_id}-{commit_uuid}-dv-rewrite.puffin")
        write_puffin(path, blobs)
        size = fileio.size(path)
        out = {"descriptor": [], "seq": [], "file_seq": [], "snap_id": [], "spec_id": []}
        for (meta, _), rec in zip(blobs, refs):
            out["descriptor"].append(
                _encode_descriptor(
                    DataFile(
                        file_path=path,
                        file_format="PUFFIN",
                        partition=_decode_partition(_json.loads(rec.part)),
                        record_count=int(meta.properties["cardinality"]),
                        file_size_in_bytes=size,
                        content=DataFileContent.POSITION_DELETES,
                        referenced_data_file=rec.data_file,
                        content_offset=meta.offset,
                        content_size_in_bytes=meta.length,
                    )
                )
            )
            out["seq"].append(int(rec.seq))
            out["file_seq"].append(int(rec.file_seq))
            out["snap_id"].append(int(rec.snap_id))
            out["spec_id"].append(int(rec.spec_id))
        yield pd.DataFrame(out)

    from .write import _decode_descriptor

    schema = md.current_schema()
    new_entries = []
    carried = list(keep)
    if files_df is not None:
        collected = files_df.mapInPandas(
            task,
            "descriptor string, seq bigint, file_seq bigint, snap_id bigint, "
            "spec_id int",
        ).collect()
        by_spec: dict = {}
        for r in collected:
            if not r.descriptor:
                continue
            df = _decode_descriptor(r.descriptor)
            df.content = DataFileContent.POSITION_DELETES
            e = ManifestEntry(
                status=ManifestEntryStatus.EXISTING,
                snapshot_id=int(r.snap_id),
                sequence_number=int(r.seq),
                file_sequence_number=int(r.file_seq),
                data_file=df,
            )
            new_entries.append(e)
            by_spec.setdefault(int(r.spec_id), []).append(e)
        assert len(new_entries) == len(live_rows), "a DV blob went missing in repack"

        # one consolidated manifest PER SPEC ID: entries keep their
        # original partition tuples, and a manifest never mixes specs
        for i, (spec_id, entries) in enumerate(sorted(by_spec.items())):
            path = os.path.join(
                md.location, "metadata", f"{commit_uuid}-dv-consolidated-m{i}.avro"
            )
            mf = write_manifest(
                path, md.spec_by_id(spec_id), schema, snap.snapshot_id, entries,
                content=ManifestContent.DELETES,
            )
            # entry-level sequence numbers are explicit (EXISTING);
            # manifest-level bounds must still gate correctly
            mf.sequence_number = max(e.sequence_number for e in entries)
            mf.min_sequence_number = min(e.sequence_number for e in entries)
            carried.append(mf)
    for m, others in mixed_rewrites:
        for e in others:
            e.status = ManifestEntryStatus.EXISTING
        p = os.path.join(
            md.location, "metadata", f"{commit_uuid}-dvkeep-{len(carried)}.avro"
        )
        spec = md.spec_by_id(m.partition_spec_id)
        kept_mf = write_manifest(
            p, spec, schema, snap.snapshot_id, others, content=ManifestContent.DELETES
        )
        kept_mf.sequence_number = m.sequence_number
        kept_mf.min_sequence_number = m.min_sequence_number
        carried.append(kept_mf)

    n_new_puffins = len({e.data_file.file_path for e in new_entries})
    # added/removed pairs feed update_snapshot_totals: the live blobs
    # net to zero, the dangling ones leave total-position-deletes /
    # total-delete-files for good
    _commit_manifests(
        table,
        [],
        carried,
        operation="replace",
        extra_summary={
            "rewritten-delete-files": str(len(src_puffins)),
            "consolidated-puffin-files": str(n_new_puffins),
            "removed-dangling-deletes": str(len(dangling)),
            "added-delete-files": str(len(new_entries)),
            "removed-delete-files": str(len(dv_rows)),
            "added-position-deletes": str(
                sum(e.data_file.record_count for e in new_entries)
            ),
            "removed-position-deletes": str(sum(r[4] for r in dv_rows)),
            "added-files-size": str(
                sum(e.data_file.content_size_in_bytes for e in new_entries)
            ),
            "removed-files-size": str(sum(r[3] for r in dv_rows)),
        },
        snapshot_id=ds.snapshot_id,
        commit_uuid=ds.commit_uuid,
        parent_snapshot_id=ds.parent_snapshot_id,
    )
    return True


# ------------------------------------------------------- location providers

def simple_location(table_location: str, partition_path: str, filename: str) -> str:
    """<loc>/data/<partition>/<file> — ref locations.go:38-76."""
    parts = [table_location, "data"]
    if partition_path:
        parts.append(partition_path)
    parts.append(filename)
    return os.path.join(*parts)


def object_store_location(table_location: str, partition_path: str, filename: str) -> str:
    """Base2 entropy dirs spread object-store prefixes —
    ref locations.go:114-160 (objectStoreLocationProvider). The hash is
    over the data-file name, rendered as 4 x 4-bit binary dirs."""
    from .transforms import murmur3_32

    h = murmur3_32(filename.encode("utf-8"))
    dirs = "/".join(format((h >> (28 - 4 * i)) & 0xF, "04b") for i in range(4))
    parts = [table_location, "data", dirs]
    if partition_path:
        parts.append(partition_path)
    parts.append(filename)
    return os.path.join(*parts)


# --------------------------------------------------- partition statistics

def compute_partition_statistics(table) -> dict:
    """Compute the spec's partition-statistics file for the current
    snapshot and commit a SetPartitionStatistics entry — ref
    table/statistics.go:79-87 (PartitionStatisticsFile).

    One parquet file of per-partition rollups (partition struct,
    spec_id, data file/record/byte counts, delete-file counts,
    last-updated snapshot), sorted by partition for reader-side binary
    search. Driver cost is O(live files) descriptor iteration — the
    same order as scan planning — and no row data is touched.
    """
    import pyarrow as pa

    from . import fileio
    from .manifest import DataFileContent, ManifestContent, read_manifest
    from .transaction import AssertTableUUID, SetPartitionStatistics

    md = table.metadata
    snap = md.current_snapshot()
    if snap is None:
        raise ValueError("table has no snapshot to analyze")

    # unified partition tuple: union of field names across specs
    all_names: list[str] = []
    for spec in md.partition_specs:
        for f in spec.fields:
            if f.name not in all_names:
                all_names.append(f.name)
    if not all_names:
        # Java PartitionStatsHandler refuses unpartitioned tables; an
        # empty partition struct is also unwritable as parquet.
        raise ValueError("partition statistics require a partitioned table")

    agg: dict[tuple, dict] = {}
    for m in snap.manifests():
        for e in read_manifest(m.manifest_path, inherit_sequence_number=m.sequence_number):
            df = e.data_file
            key = tuple(df.partition.get(n) for n in all_names)
            row = agg.setdefault(
                key,
                {
                    "spec_id": m.partition_spec_id,
                    "data_record_count": 0,
                    "data_file_count": 0,
                    "total_data_file_size_in_bytes": 0,
                    "position_delete_record_count": 0,
                    "position_delete_file_count": 0,
                    "equality_delete_record_count": 0,
                    "equality_delete_file_count": 0,
                    "last_updated_snapshot_id": e.snapshot_id or snap.snapshot_id,
                    "_last_seq": e.sequence_number or 0,
                },
            )
            # "last updated" = the HIGHEST-sequence snapshot touching the
            # partition, not whichever manifest happened to come first
            seq = e.sequence_number or 0
            if seq > row["_last_seq"]:
                row["_last_seq"] = seq
                row["last_updated_snapshot_id"] = e.snapshot_id or snap.snapshot_id
            if m.content == ManifestContent.DATA:
                row["data_record_count"] += df.record_count
                row["data_file_count"] += 1
                row["total_data_file_size_in_bytes"] += df.file_size_in_bytes
            elif df.content == DataFileContent.POSITION_DELETES:
                row["position_delete_record_count"] += df.record_count
                row["position_delete_file_count"] += 1
            elif df.content == DataFileContent.EQUALITY_DELETES:
                row["equality_delete_record_count"] += df.record_count
                row["equality_delete_file_count"] += 1

    keys = sorted(agg.keys(), key=lambda k: tuple(str(v) for v in k))
    cols: dict[str, list] = {
        "partition": [
            {n: k[i] for i, n in enumerate(all_names)} if all_names else {}
            for k in keys
        ],
        "spec_id": [agg[k]["spec_id"] for k in keys],
    }
    for stat in (
        "data_record_count",
        "data_file_count",
        "total_data_file_size_in_bytes",
        "position_delete_record_count",
        "position_delete_file_count",
        "equality_delete_record_count",
        "equality_delete_file_count",
        "last_updated_snapshot_id",
    ):
        cols[stat] = [agg[k][stat] for k in keys]

    # pyarrow infers the partition struct type from the dicts
    tbl = pa.table(cols)

    path = os.path.join(
        md.location, "metadata", f"partition-stats-{snap.snapshot_id}.parquet"
    )
    fileio.makedirs(os.path.dirname(path))
    with fileio.parquet_writer(path, tbl.schema) as w:
        w.write_table(tbl)

    entry = {
        "snapshot-id": snap.snapshot_id,
        "statistics-path": path,
        "file-size-in-bytes": fileio.size(path),
    }
    tx = table.transaction()
    tx.apply([SetPartitionStatistics(entry)], [AssertTableUUID(md.table_uuid)])
    tx.commit()
    return entry


# Per-worker LRU of decoded equality-delete key frames for the
# conversion fast path (same pattern as streaming._EQ_FRAME_CACHE):
# resolved at unpickle time in each reused Python worker, so the ~32
# conversion tasks read each key file ~once per worker instead of once
# per task. Bounded by slot count × the keys-max-rows routing bound.
_EQ_KEY_FRAME_CACHE: dict = {}
_EQ_KEY_FRAME_CACHE_MAX = 4


def _eq_convert_key_frame(path, ids):
    """Executor-side load of one equality-delete key file as a pandas
    frame (columns f{fid}), LRU-cached per worker process. MODULE-LEVEL
    on purpose: a loader nested inside the conversion task would be
    cloudpickled BY VALUE with a fresh globals dict per task
    deserialization — every task would see an empty cache and the
    claimed cross-task reuse would never happen. A module-level function
    pickles by reference and resolves `_EQ_KEY_FRAME_CACHE` in the
    worker's imported module, the same pattern that makes
    streaming._load_eq_sets' cache real. Caller applies fileio config
    first. Frames are under maintenance.eq-convert.keys-max-rows by
    routing and key-file paths are immutable, so the cache is bounded
    and can never go stale."""
    from . import fileio

    k = (path, tuple(ids))
    cached = _EQ_KEY_FRAME_CACHE.pop(k, None)
    if cached is not None:
        _EQ_KEY_FRAME_CACHE[k] = cached  # LRU refresh
        return cached
    with fileio.parquet_file(path) as kf:
        kby = {}
        for fld in kf.schema_arrow:
            fid = (fld.metadata or {}).get(b"PARQUET:field_id")
            if fid is not None:
                kby[int(fid)] = fld.name
        cols = [kby[i] for i in ids]
        pdf = kf.read(columns=cols).to_pandas()
    pdf.columns = [f"f{i}" for i in ids]
    while len(_EQ_KEY_FRAME_CACHE) >= _EQ_KEY_FRAME_CACHE_MAX:
        _EQ_KEY_FRAME_CACHE.pop(next(iter(_EQ_KEY_FRAME_CACHE)), None)
    _EQ_KEY_FRAME_CACHE[k] = pdf
    return pdf


def _eq_matched_positions(pf, eq_sets, batch_rows: int = 131072):
    """Global row positions of `pf` (an open ParquetFile) whose key tuple
    appears in any equality-delete key set. Executor-side; memory is one
    record batch + the (small, distinct) key frames.

    eq_sets: [(field_ids, pandas frame with columns f{fid})]. Data
    columns resolve by parquet FIELD ID (renames survive); a key column
    absent from the file (added after it was written) reads as nulls.
    Null semantics match the scan's eq-delete anti-join: NULL == NULL.
    """
    import numpy as np
    import pandas as pd

    by_id = {}
    for fld in pf.schema_arrow:
        fid = (fld.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            by_id[int(fid)] = fld.name
    needed_ids = sorted({fid for ids, _ in eq_sets for fid in ids})
    phys = [by_id[f] for f in needed_ids if f in by_id]

    # split each key set: vectorized merge for fully-non-null key rows,
    # tuple-set fallback for null-carrying ones (NULL must match NULL)
    prepared = []
    for ids, keys in eq_sets:
        cols = [f"f{f}" for f in ids]
        nn = keys.dropna(subset=cols) if len(keys) else keys
        withnull = keys[keys[cols].isna().any(axis=1)] if len(keys) else keys
        null_tuples = {
            tuple(None if pd.isna(v) else v for v in row)
            for row in withnull[cols].itertuples(index=False)
        }
        prepared.append((ids, cols, nn.drop_duplicates(), null_tuples))

    out = []
    off = 0
    for batch in pf.iter_batches(columns=phys, batch_size=batch_rows):
        pdf = batch.to_pandas()
        pdf.columns = [f"f{f}" for f in needed_ids if f in by_id]
        for f in needed_ids:
            if f not in by_id:
                pdf[f"f{f}"] = None  # column added after this file
        n = len(pdf)
        mask = np.zeros(n, dtype=bool)
        pdf = pdf.reset_index(drop=True)
        for ids, cols, nn, null_tuples in prepared:
            if len(nn):
                hit = (
                    pdf[cols]
                    .reset_index()
                    .merge(nn, on=cols, how="inner")["index"]
                    .to_numpy()
                )
                mask[hit] = True
            if null_tuples:
                rows_with_null = pdf[cols].isna().any(axis=1).to_numpy()
                for i in np.flatnonzero(rows_with_null):
                    t = tuple(
                        None if pd.isna(v) else v for v in pdf[cols].iloc[i]
                    )
                    if t in null_tuples:
                        mask[i] = True
        out.append(np.flatnonzero(mask).astype("uint64") + np.uint64(off))
        off += n
    if not out:
        return np.empty(0, dtype="uint64")
    return np.concatenate(out)


def convert_equality_deletes(table, spark) -> bool:
    """Materialize every applicable equality delete into deletion vectors
    and drop the equality-delete files — WITHOUT rewriting any data file.

    Upsert/MERGE streams add one equality-delete file per commit, and
    every subsequent read pays a keyed anti-join per delete file. This
    pass computes, per affected data file, the positions its applicable
    (sequence-gated, exactly as the scan matched them) equality keys
    name, unions them with the file's existing deletion vector, writes
    fresh puffin DVs executor-side, and commits ONE 'replace' snapshot
    that adds the DVs and drops every equality-delete entry. The visible
    row set is unchanged — reads just get cheaper (bitmap skips instead
    of anti-joins), which is the point at 100 TB where eq-delete debt
    compounds. Streams skip the snapshot as a rewrite, like compaction.

    Equality-delete files whose keys match no live rows are dropped
    outright. v3 only (DVs); on v2 run binpack compaction instead, which
    materializes deletes by rewriting the data. Returns True when a
    conversion snapshot was committed."""
    import json as _json

    from . import fileio as _fileio
    from .manifest import (
        DataFileContent,
        ManifestContent,
        ManifestEntry,
        ManifestEntryStatus,
        read_manifest,
        write_manifest,
    )
    from .write import (
        _commit_manifests,
        _decode_partition,
        _encode_partition,
        _rewrite_parent_manifests,
        begin_distributed_snapshot,
    )

    md = table.metadata
    if md.format_version < 3:
        raise ValueError(
            "equality-delete conversion writes deletion vectors (format "
            "v3); on v2 run rewrite_data_files (binpack) to materialize "
            "deletes by rewriting the data"
        )
    snap = md.current_snapshot()
    if snap is None:
        return False
    has_eq = False
    for m in snap.manifests():
        if m.content != ManifestContent.DELETES:
            continue
        for e in read_manifest(m.manifest_path, inherit_sequence_number=m.sequence_number):
            if e.data_file.content == DataFileContent.EQUALITY_DELETES:
                has_eq = True
                break
        if has_eq:
            break
    if not has_eq:
        return False

    schema = md.current_schema()
    by_id = {f.field_id: f for f in schema.fields}
    tasks = table.scan().plan_files_auto(spark)
    # Executor-memory bound (style of read.mor.driver-decode-max-positions):
    # the fast path loads each applicable key file as ONE pandas frame per
    # task — right for typical CDC commits (one small key file per
    # commit), an OOM for a bulk-MERGE key file at 100 TB. Above the
    # bound, the file routes to the distributed join path instead of
    # degrading into an unbounded frame. Manifest record_count is the
    # exact key-row count, known driver-side for free.
    try:
        keys_max = int(
            md.properties.get("maintenance.eq-convert.keys-max-rows", "2000000")
        )
    except (TypeError, ValueError):
        keys_max = 2_000_000
    rows = []
    big_tasks = []
    for t in tasks:
        eqs = [
            d for d in t.delete_files
            if d.content == DataFileContent.EQUALITY_DELETES
        ]
        if not eqs:
            continue
        for d in eqs:
            missing = [i for i in (d.equality_ids or []) if i not in by_id]
            if missing:
                raise ValueError(
                    f"equality-delete file {d.file_path} keys on dropped "
                    f"field ids {missing}; the delete cannot be evaluated "
                    "against the current schema"
                )
        if sum(int(d.record_count or 0) for d in eqs) > keys_max:
            big_tasks.append(t)
            continue
        dv = next(
            (d for d in t.delete_files if d.content_offset is not None), None
        )
        rows.append(
            (
                t.file.file_path,
                _json.dumps(
                    [[d.file_path, list(d.equality_ids or [])] for d in eqs]
                ),
                dv.file_path if dv else None,
                int(dv.content_offset) if dv else None,
                int(dv.content_size_in_bytes) if dv else None,
                _json.dumps(_encode_partition(t.file.partition or {})),
            )
        )

    ds = begin_distributed_snapshot(table)
    location = md.location
    commit_uuid = ds.commit_uuid
    fileio_cfg = _fileio.env_config()

    collected = []
    if rows:
        files_df = spark.createDataFrame(
            rows,
            "data_file string, eq_json string, dv_path string, "
            "dv_offset bigint, dv_size bigint, part string",
        ).repartition(min(len(rows), 32))

        def task(batches):
            import numpy as np
            import pandas as pd

            from pyspark import TaskContext

            from . import fileio
            from .manifest import DataFile as _DF
            from .puffin import (
                BlobMetadata,
                read_deletion_vector,
                serialize_deletion_vector,
                write_puffin,
            )
            from .write import _encode_descriptor

            fileio.apply_config(fileio_cfg)
            tc = TaskContext.get()
            task_id = f"{tc.partitionId()}-{tc.taskAttemptId()}" if tc else "0-0"
            blobs, refs, newly = [], [], []

            # per-WORKER bounded LRU (Spark reuses Python workers):
            # without it each of the ~32 tasks re-reads every key file.
            # _eq_convert_key_frame is module-level so cloudpickle
            # resolves it (and its cache) by reference in the worker's
            # imported module — a nested closure got a fresh globals
            # dict per task and the cache never actually shared.
            key_frame = _eq_convert_key_frame

            for pdfs in batches:
                for rec in pdfs.itertuples(index=False):
                    eq_sets = [
                        (ids, key_frame(path, ids))
                        for path, ids in __import__("json").loads(rec.eq_json)
                    ]
                    with fileio.parquet_file(rec.data_file) as pf:
                        pos = _eq_matched_positions(pf, eq_sets)
                    if rec.dv_path is not None:
                        existing = read_deletion_vector(
                            rec.dv_path, int(rec.dv_offset), int(rec.dv_size)
                        )
                    else:
                        existing = np.empty(0, dtype="uint64")
                    union = np.union1d(pos, existing.astype("uint64"))
                    if union.size == 0:
                        continue  # keys matched nothing; no DV needed
                    blobs.append(
                        (
                            BlobMetadata(
                                type="deletion-vector-v1",
                                fields=[],
                                snapshot_id=0,
                                sequence_number=0,
                                properties={
                                    "referenced-data-file": rec.data_file,
                                    "cardinality": str(int(union.size)),
                                },
                            ),
                            serialize_deletion_vector(union),
                        )
                    )
                    refs.append(rec)
                    newly.append(int(union.size - existing.size))
            if not blobs:
                yield pd.DataFrame({"descriptor": [], "newly": [], "had_dv": []}).astype(
                    {"descriptor": "string", "newly": "int64", "had_dv": "bool"}
                )
                return
            d = os.path.join(location, "data")
            fileio.makedirs(d)
            path = os.path.join(d, f"00000-{task_id}-{commit_uuid}-eqconv.puffin")
            write_puffin(path, blobs)
            size = fileio.size(path)
            out = {"descriptor": [], "newly": [], "had_dv": []}
            for (meta, _), rec, nw in zip(blobs, refs, newly):
                out["descriptor"].append(
                    _encode_descriptor(
                        _DF(
                            file_path=path,
                            file_format="PUFFIN",
                            partition=_decode_partition(
                                __import__("json").loads(rec.part)
                            ),
                            record_count=int(meta.properties["cardinality"]),
                            file_size_in_bytes=size,
                            content=DataFileContent.POSITION_DELETES,
                            referenced_data_file=rec.data_file,
                            content_offset=meta.offset,
                            content_size_in_bytes=meta.length,
                        )
                    )
                )
                out["newly"].append(nw)
                out["had_dv"].append(rec.dv_path is not None)
            yield pd.DataFrame(out)

        collected = files_df.mapInPandas(
            task, "descriptor string, newly bigint, had_dv boolean"
        ).collect()

    if big_tasks:
        collected = list(collected) + _eq_convert_join_rows(
            table, spark, big_tasks, location, commit_uuid
        )

    from .write import _decode_descriptor

    new_entries = []
    replaced_dv_refs: set = set()
    newly_total = 0
    for r in collected:
        if not r.descriptor:
            continue
        df = _decode_descriptor(r.descriptor)
        df.content = DataFileContent.POSITION_DELETES
        new_entries.append(
            ManifestEntry(
                status=ManifestEntryStatus.ADDED,
                snapshot_id=ds.snapshot_id,
                sequence_number=None,  # inherit the conversion commit's seq
                file_sequence_number=None,
                data_file=df,
            )
        )
        newly_total += int(r.newly)
        if r.had_dv:
            replaced_dv_refs.add(df.referenced_data_file)

    new_manifests = []
    if new_entries:
        p = os.path.join(
            md.location, "metadata", f"{commit_uuid}-eqconv-m0.avro"
        )
        new_manifests.append(
            write_manifest(
                p, md.default_spec(), schema, ds.snapshot_id, new_entries,
                content=ManifestContent.DELETES,
            )
        )
    carried, rm = _rewrite_parent_manifests(
        md, set(), commit_uuid, "eqconv",
        replaced_dv_refs=replaced_dv_refs or None,
        drop_equality_deletes=True,
    )
    summary = {
        "converted-equality-delete-files": str(rm["removed-delete-files"]),
        "removed-delete-files": str(rm["removed-delete-files"]),
        "removed-equality-deletes": str(rm["removed-equality-deletes"]),
        "removed-files-size": str(rm["removed-files-size"]),
        "removed-position-deletes": str(rm["removed-position-deletes"]),
    }
    if new_entries:
        summary.update(
            {
                "added-delete-files": str(len(new_entries)),
                "added-position-delete-files": str(len(new_entries)),
                "added-dvs": str(len(new_entries)),
                "added-position-deletes": str(newly_total),
                "added-files-size": str(
                    sum(
                        e.data_file.content_size_in_bytes or 0
                        for e in new_entries
                    )
                ),
            }
        )
    _commit_manifests(
        table,
        new_manifests,
        carried,
        operation="replace",
        extra_summary=summary,
        snapshot_id=ds.snapshot_id,
        commit_uuid=ds.commit_uuid,
        parent_snapshot_id=ds.parent_snapshot_id,
    )
    return True


def _eq_keys_df_arrow(spark, path: str, fields):
    """Distributed DataFrame over one equality-delete key file for URIs
    the JVM has no FileSystem for — ROW-GROUP-parallel executor-side
    arrow read. The join path exists precisely because the key file
    exceeded `maintenance.eq-convert.keys-max-rows`, so a whole-file
    driver read here (the old `read_parquet_table(...).to_pandas()`
    fallback) would re-introduce the unbounded materialization the
    routing bound was built to prevent. One task reads ONE row group
    (peak memory = one row group, writer-bounded), columns resolved by
    parquet FIELD ID so renamed key columns still resolve — same
    contract as the JVM branch; the driver only reads the footer."""
    from . import fileio as _fileio
    from .types import Schema, schema_to_spark_ddl

    want_ids = [f.field_id for f in fields]
    names = [f.name for f in fields]
    n_rg = max(_fileio.read_parquet_metadata(path).num_row_groups, 1)
    rg_df = spark.createDataFrame(
        [(path, i) for i in range(n_rg)], "path string, rg int"
    ).repartition(min(n_rg, 64))
    rg_cfg = _fileio.env_config()

    def read_rg(batches):
        from . import fileio

        fileio.apply_config(rg_cfg)
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                with fileio.parquet_file(row.path) as kf:
                    by_fid = {}
                    for fld in kf.schema_arrow:
                        fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                        if fid is not None:
                            by_fid[int(fid)] = fld.name
                    cols = [by_fid[i] for i in want_ids]
                    frame = kf.read_row_group(
                        int(row.rg), columns=cols
                    ).to_pandas()
                frame.columns = names
                yield frame

    ddl = schema_to_spark_ddl(Schema(0, tuple(fields)))
    return rg_df.mapInPandas(read_rg, ddl).dropDuplicates()


def _eq_convert_join_rows(table, spark, tasks, location, commit_uuid):
    """Distributed join-based DV computation for data files whose
    applicable equality-delete key files exceed
    `maintenance.eq-convert.keys-max-rows` (default 2M key rows).

    The fast path loads each key file as ONE pandas frame per executor
    task (`_eq_matched_positions`) — right for typical CDC commits, an
    OOM for a bulk-MERGE commit whose key file carries 100M+ rows. This
    path is the scan's distributed eq anti-join (table.py:862) turned
    LEFT SEMI: read the affected data files with `_metadata.row_index`
    positions (JVM scan, key columns only — pushdown and split planning
    intact), semi-join per eq-delete file (null-safe: NULL keys match
    NULL, the eq-delete contract), union matches across eq files, and
    write one DV per data file from a groupBy().applyInPandas whose peak
    memory is ONE file's matched positions (bounded by file row count).
    Keys and data both stay distributed; nothing unbounded ever
    materializes per task — degrade, don't OOM, the reference's
    bounded-memory standard (table/arrow_scanner.go batch pipelines).
    Layout note: this path writes one puffin per affected data file
    (the fast path batches blobs per task) — after a huge conversion,
    `rewrite_position_deletes` repacks the small DVs, the existing
    consolidation tier.

    Returns rows shaped like the fast path's collect():
    (descriptor, newly, had_dv)."""
    import json as _json
    from dataclasses import replace as _replace

    from pyspark.sql import functions as F

    from . import fileio as _fileio
    from .manifest import DataFileContent
    from .table import strip_scheme
    from .types import Schema, schema_to_spark_struct
    from .write import _encode_partition

    md = table.metadata
    schema = md.current_schema()
    by_id = {f.field_id: f for f in schema.fields}

    # group data files by their applicable eq-file set (plan_files already
    # sequence-gated the per-file sets); files sharing a set share one
    # positional read and one join pipeline
    groups: dict[tuple, list] = {}
    for t in tasks:
        key = tuple(sorted(
            (d.file_path, tuple(d.equality_ids or []))
            for d in t.delete_files
            if d.content == DataFileContent.EQUALITY_DELETES
        ))
        groups.setdefault(key, []).append(t)

    def keys_df(path, fields):
        if _fileio.is_local(path):
            # distributed read — the key file is big by construction
            # here. Field-id resolution (schema struct carries
            # parquet.field.id metadata) so renamed key columns still
            # resolve, same contract as the fast path's by-id read.
            from .table import _ensure_field_id_reads

            _ensure_field_id_reads(spark)
            return (
                spark.read.schema(
                    schema_to_spark_struct(Schema(0, tuple(fields)))
                )
                .parquet(path)
                .dropDuplicates()
            )
        return _eq_keys_df_arrow(spark, path, fields)

    matched = None
    for key, gtasks in groups.items():
        need_ids = sorted({i for _, ids in key for i in ids})
        key_schema = Schema(0, tuple(by_id[i] for i in need_ids))
        stripped = [_replace(t, delete_files=()) for t in gtasks]
        df = table.scan()._read_with_pos_deletes_jvm(
            spark, stripped, key_schema, keep_pos=True
        )
        for path, ids in key:
            fields = [by_id[i] for i in ids]
            kdf = keys_df(path, fields)
            cond = None
            for f in fields:
                c = df[f.name].eqNullSafe(kdf[f.name])
                cond = c if cond is None else (cond & c)
            hit = df.join(kdf, on=cond, how="left_semi").select("_fp", "_pos")
            matched = hit if matched is None else matched.unionByName(hit)
    if matched is None:
        return []
    matched = matched.dropDuplicates(["_fp", "_pos"])

    # per-file metadata the DV writer needs, O(files), broadcast
    meta = {}
    for t in tasks:
        dv = next(
            (d for d in t.delete_files if d.content_offset is not None), None
        )
        meta[strip_scheme(t.file.file_path)] = (
            t.file.file_path,
            (
                (dv.file_path, int(dv.content_offset),
                 int(dv.content_size_in_bytes))
                if dv else None
            ),
            _json.dumps(_encode_partition(t.file.partition or {})),
        )
    meta_b = spark.sparkContext.broadcast(meta)
    fileio_cfg = _fileio.env_config()

    def write_dv(pdf):
        import hashlib

        import numpy as np
        import pandas as pd

        from . import fileio
        from .manifest import DataFile as _DF
        from .puffin import (
            BlobMetadata,
            read_deletion_vector,
            serialize_deletion_vector,
            write_puffin,
        )
        from .write import _decode_partition, _encode_descriptor

        fileio.apply_config(fileio_cfg)
        fp = pdf["_fp"].iloc[0]
        data_file, dv, part_json = meta_b.value[fp]
        pos = np.unique(pdf["_pos"].to_numpy().astype("uint64"))
        existing = (
            read_deletion_vector(*dv).astype("uint64")
            if dv is not None
            else np.empty(0, dtype="uint64")
        )
        union = np.union1d(pos, existing)
        empty = pd.DataFrame(
            {"descriptor": pd.Series([], dtype="string"),
             "newly": pd.Series([], dtype="int64"),
             "had_dv": pd.Series([], dtype="bool")}
        )
        if union.size == 0:  # pragma: no cover - matched is non-empty here
            return empty
        digest = hashlib.md5(fp.encode()).hexdigest()[:12]
        d = os.path.join(location, "data")
        fileio.makedirs(d)
        path = os.path.join(
            d, f"00000-{digest}-{commit_uuid}-eqconvj.puffin"
        )
        blob = BlobMetadata(
            type="deletion-vector-v1",
            fields=[],
            snapshot_id=0,
            sequence_number=0,
            properties={
                "referenced-data-file": data_file,
                "cardinality": str(int(union.size)),
            },
        )
        write_puffin(path, [(blob, serialize_deletion_vector(union))])
        return pd.DataFrame(
            {
                "descriptor": [
                    _encode_descriptor(
                        _DF(
                            file_path=path,
                            file_format="PUFFIN",
                            partition=_decode_partition(_json.loads(part_json)),
                            record_count=int(union.size),
                            file_size_in_bytes=fileio.size(path),
                            content=DataFileContent.POSITION_DELETES,
                            referenced_data_file=data_file,
                            content_offset=blob.offset,
                            content_size_in_bytes=blob.length,
                        )
                    )
                ],
                "newly": [int(union.size - existing.size)],
                "had_dv": [dv is not None],
            }
        )

    return (
        matched.groupBy("_fp")
        .applyInPandas(write_dv, "descriptor string, newly bigint, had_dv boolean")
        .collect()
    )


def convert_position_deletes(table, spark) -> bool:
    """Upgrade legacy v2 positional-delete PARQUET files into v3 deletion
    vectors — the spec's upgrade expectation for v3 tables, and the one
    delete shape `rewrite_position_deletes` (DV repack) never touches.

    Per referenced data file, the positions named by every applicable
    (sequence-gated, exactly as the scan matched them) v2 delete file are
    decoded executor-side, unioned with the file's existing DV, and
    written as fresh puffin blobs; ONE 'replace' snapshot adds the DVs
    and drops every v2 positional entry. Row set unchanged; reads stop
    re-filtering (file_path, pos) parquet per scan. v3 only. Returns
    True when a conversion snapshot was committed."""
    import json as _json

    from . import fileio as _fileio
    from .manifest import (
        DataFileContent,
        ManifestContent,
        ManifestEntry,
        ManifestEntryStatus,
        read_manifest,
        write_manifest,
    )
    from .write import (
        _commit_manifests,
        _decode_partition,
        _encode_partition,
        _rewrite_parent_manifests,
        begin_distributed_snapshot,
    )

    md = table.metadata
    if md.format_version < 3:
        raise ValueError(
            "positional-delete conversion writes deletion vectors "
            "(format v3); upgrade_format_version(3) first"
        )
    snap = md.current_snapshot()
    if snap is None:
        return False

    def is_v2_pos(d):
        return (
            d.content == DataFileContent.POSITION_DELETES
            and d.content_offset is None
        )

    has_pos = False
    for m in snap.manifests():
        if m.content != ManifestContent.DELETES:
            continue
        for e in read_manifest(m.manifest_path, inherit_sequence_number=m.sequence_number):
            if is_v2_pos(e.data_file):
                has_pos = True
                break
        if has_pos:
            break
    if not has_pos:
        return False

    schema = md.current_schema()
    tasks = table.scan().plan_files_auto(spark)
    rows = []
    for t in tasks:
        pos_files = [d for d in t.delete_files if is_v2_pos(d)]
        if not pos_files:
            continue
        dv = next(
            (d for d in t.delete_files if d.content_offset is not None), None
        )
        rows.append(
            (
                t.file.file_path,
                _json.dumps([d.file_path for d in pos_files]),
                dv.file_path if dv else None,
                int(dv.content_offset) if dv else None,
                int(dv.content_size_in_bytes) if dv else None,
                _json.dumps(_encode_partition(t.file.partition or {})),
            )
        )

    ds = begin_distributed_snapshot(table)
    location = md.location
    commit_uuid = ds.commit_uuid
    fileio_cfg = _fileio.env_config()

    collected = []
    if rows:
        files_df = spark.createDataFrame(
            rows,
            "data_file string, pos_json string, dv_path string, "
            "dv_offset bigint, dv_size bigint, part string",
        ).repartition(min(len(rows), 32))

        def task(batches):
            import numpy as np
            import pandas as pd
            import pyarrow.compute as pc

            from pyspark import TaskContext

            from . import fileio
            from .manifest import DataFile as _DF
            from .puffin import (
                BlobMetadata,
                read_deletion_vector,
                serialize_deletion_vector,
                write_puffin,
            )
            from .table import strip_scheme
            from .write import _encode_descriptor

            fileio.apply_config(fileio_cfg)
            tc = TaskContext.get()
            task_id = f"{tc.partitionId()}-{tc.taskAttemptId()}" if tc else "0-0"
            blobs, refs, newly = [], [], []
            pos_cache: dict = {}

            def pos_table(path):
                if path not in pos_cache:
                    with fileio.parquet_file(path) as pf:
                        pos_cache[path] = pf.read(columns=["file_path", "pos"])
                return pos_cache[path]

            for pdfs in batches:
                for rec in pdfs.itertuples(index=False):
                    want = strip_scheme(rec.data_file)
                    parts = []
                    for path in __import__("json").loads(rec.pos_json):
                        tbl = pos_table(path)
                        stripped = pc.replace_substring_regex(
                            tbl["file_path"],
                            pattern="^[a-z0-9]+:(//)?",
                            replacement="",
                        )
                        parts.append(
                            tbl["pos"]
                            .filter(pc.equal(stripped, want))
                            .to_numpy(zero_copy_only=False)
                            .astype("uint64")
                        )
                    pos = (
                        np.unique(np.concatenate(parts))
                        if parts
                        else np.empty(0, dtype="uint64")
                    )
                    if rec.dv_path is not None:
                        existing = read_deletion_vector(
                            rec.dv_path, int(rec.dv_offset), int(rec.dv_size)
                        ).astype("uint64")
                    else:
                        existing = np.empty(0, dtype="uint64")
                    union = np.union1d(pos, existing)
                    if union.size == 0:
                        continue
                    blobs.append(
                        (
                            BlobMetadata(
                                type="deletion-vector-v1",
                                fields=[],
                                snapshot_id=0,
                                sequence_number=0,
                                properties={
                                    "referenced-data-file": rec.data_file,
                                    "cardinality": str(int(union.size)),
                                },
                            ),
                            serialize_deletion_vector(union),
                        )
                    )
                    refs.append(rec)
                    newly.append(int(union.size - existing.size))
            if not blobs:
                yield pd.DataFrame({"descriptor": [], "newly": [], "had_dv": []}).astype(
                    {"descriptor": "string", "newly": "int64", "had_dv": "bool"}
                )
                return
            d = os.path.join(location, "data")
            fileio.makedirs(d)
            path = os.path.join(d, f"00000-{task_id}-{commit_uuid}-posconv.puffin")
            write_puffin(path, blobs)
            size = fileio.size(path)
            out = {"descriptor": [], "newly": [], "had_dv": []}
            for (meta, _), rec, nw in zip(blobs, refs, newly):
                out["descriptor"].append(
                    _encode_descriptor(
                        _DF(
                            file_path=path,
                            file_format="PUFFIN",
                            partition=_decode_partition(
                                __import__("json").loads(rec.part)
                            ),
                            record_count=int(meta.properties["cardinality"]),
                            file_size_in_bytes=size,
                            content=DataFileContent.POSITION_DELETES,
                            referenced_data_file=rec.data_file,
                            content_offset=meta.offset,
                            content_size_in_bytes=meta.length,
                        )
                    )
                )
                out["newly"].append(nw)
                out["had_dv"].append(rec.dv_path is not None)
            yield pd.DataFrame(out)

        collected = files_df.mapInPandas(
            task, "descriptor string, newly bigint, had_dv boolean"
        ).collect()

    from .write import _decode_descriptor

    new_entries = []
    replaced_dv_refs: set = set()
    newly_total = 0
    for r in collected:
        if not r.descriptor:
            continue
        df = _decode_descriptor(r.descriptor)
        df.content = DataFileContent.POSITION_DELETES
        new_entries.append(
            ManifestEntry(
                status=ManifestEntryStatus.ADDED,
                snapshot_id=ds.snapshot_id,
                sequence_number=None,
                file_sequence_number=None,
                data_file=df,
            )
        )
        newly_total += int(r.newly)
        if r.had_dv:
            replaced_dv_refs.add(df.referenced_data_file)

    new_manifests = []
    if new_entries:
        p = os.path.join(md.location, "metadata", f"{commit_uuid}-posconv-m0.avro")
        new_manifests.append(
            write_manifest(
                p, md.default_spec(), schema, ds.snapshot_id, new_entries,
                content=ManifestContent.DELETES,
            )
        )
    carried, rm = _rewrite_parent_manifests(
        md, set(), commit_uuid, "posconv",
        replaced_dv_refs=replaced_dv_refs or None,
        drop_position_files=True,
    )
    summary = {
        "converted-position-delete-files": str(rm["removed-delete-files"]),
        "removed-delete-files": str(rm["removed-delete-files"]),
        "removed-position-deletes": str(rm["removed-position-deletes"]),
        "removed-files-size": str(rm["removed-files-size"]),
    }
    if new_entries:
        summary.update(
            {
                "added-delete-files": str(len(new_entries)),
                "added-position-delete-files": str(len(new_entries)),
                "added-dvs": str(len(new_entries)),
                "added-position-deletes": str(newly_total),
                "added-files-size": str(
                    sum(
                        e.data_file.content_size_in_bytes or 0
                        for e in new_entries
                    )
                ),
            }
        )
    _commit_manifests(
        table,
        new_manifests,
        carried,
        operation="replace",
        extra_summary=summary,
        snapshot_id=ds.snapshot_id,
        commit_uuid=ds.commit_uuid,
        parent_snapshot_id=ds.parent_snapshot_id,
    )
    return True
