"""Catalogs: the 13-method interface (ref catalog/catalog.go:89-126)
with two backends:

  - FileSystemCatalog — metadata files under <table>/metadata/ with a
    `version-hint.text` pointer; commit atomicity via os.rename (POSIX
    atomic within a filesystem), mirroring iceberg's HadoopCatalog
    layout;
  - SqlCatalog — sqlite3 with the reference's two-table layout
    {catalog_name, table_namespace, table_name, metadata_location,
    previous_metadata_location} and the transactional compare-and-swap
    UPDATE commit (ref catalog/sql/sql.go:136-154, 328-397).

Both raise CommitConflictError on a lost CAS race — the retry loop
lives in Transaction/distributed-snapshot commit, matching the
reference's optimistic-concurrency design.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import sqlite3
import time
from contextlib import closing
import uuid as _uuid
from typing import Iterable, Optional

from .metadata import (
    MetadataBuilder,
    TableMetadata,
    new_table_metadata,
    parse_metadata_file,
)
from .partitioning import PartitionSpec
from .types import Schema


class NoSuchTableError(Exception):
    pass


class TableAlreadyExistsError(Exception):
    pass


class NoSuchNamespaceError(Exception):
    pass


class NoSuchViewError(Exception):
    """ref catalog/catalog.go:61 (ErrNoSuchView)."""


class ViewAlreadyExistsError(Exception):
    """ref catalog/catalog.go:62 (ErrViewAlreadyExists)."""


class CommitConflictError(Exception):
    """Optimistic-concurrency CAS failure — caller may refresh + retry."""


def _identifier(name: str | tuple) -> tuple[str, str]:
    """(namespace, table) from 'ns.table' or ('ns','table')."""
    if isinstance(name, tuple):
        ns, tbl = name
        return ns, tbl
    parts = name.split(".")
    if len(parts) == 1:
        return "default", parts[0]
    return ".".join(parts[:-1]), parts[-1]


class Catalog:
    """ref catalog/catalog.go:89-126."""

    name = "catalog"

    # -- tables
    def create_table(
        self,
        identifier,
        schema: Schema,
        spec: Optional[PartitionSpec] = None,
        properties: Optional[dict] = None,
        location: Optional[str] = None,
    ):
        raise NotImplementedError

    def load_table(self, identifier):
        raise NotImplementedError

    def drop_table(self, identifier) -> None:
        raise NotImplementedError

    def rename_table(self, src, dst):
        raise NotImplementedError

    def register_table(self, identifier, metadata_location: str):
        """Register an EXISTING table (its current metadata file) under
        this catalog — ref catalog.go RegisterTable (REST/Glue in the
        reference; all three backends here). No data or metadata is
        rewritten beyond what the backend's resolution layout needs; the
        table keeps its original `location`, so data/manifest paths
        resolve unchanged."""
        raise NotImplementedError

    def table_exists(self, identifier) -> bool:
        try:
            self.load_table(identifier)
            return True
        except NoSuchTableError:
            return False

    def list_tables(self, namespace: str) -> list[tuple[str, str]]:
        raise NotImplementedError

    def commit_table(
        self, identifier, base_metadata_location: Optional[str], new_metadata: TableMetadata
    ) -> str:
        """CAS commit; returns the new metadata location."""
        raise NotImplementedError

    # -- namespaces
    def create_namespace(self, namespace: str, properties: Optional[dict] = None) -> None:
        raise NotImplementedError

    def drop_namespace(self, namespace: str) -> None:
        raise NotImplementedError

    def list_namespaces(self) -> list[str]:
        raise NotImplementedError

    def namespace_exists(self, namespace: str) -> bool:
        return namespace in self.list_namespaces()

    def load_namespace_properties(self, namespace: str) -> dict:
        raise NotImplementedError

    def update_namespace_properties(
        self, namespace: str, removals: Iterable[str] = (), updates: Optional[dict] = None
    ) -> None:
        raise NotImplementedError

    # shared helper
    def _new_metadata(self, schema, spec, location, properties) -> TableMetadata:
        return new_table_metadata(
            schema, spec or PartitionSpec.unpartitioned(), location, properties
        )


# write.metadata.compression-codec — ref table/properties.go:76-77,120
# (default none, gzip supported; anything else refused with the
# reference's error text, locations.go:74).
METADATA_COMPRESSION_KEY = "write.metadata.compression-codec"


def _metadata_codec(metadata: TableMetadata) -> str:
    codec = metadata.properties.get(METADATA_COMPRESSION_KEY, "none").lower()
    if codec not in ("none", "gzip"):
        raise ValueError(f"unsupported write metadata compression codec: {codec}")
    return codec


def metadata_file_ext(metadata: TableMetadata) -> str:
    """.gz.metadata.json when the table asks for gzip — ref
    locations.go:66-75 (the extension signals the codec to readers that
    dispatch on the name; ours also sniff the gzip magic)."""
    return ".gz.metadata.json" if _metadata_codec(metadata) == "gzip" else ".metadata.json"


def _metadata_payload(metadata: TableMetadata) -> bytes:
    """Single source of truth for the on-disk metadata.json encoding —
    shared by initial writes and FS-catalog commits so the two can't
    drift. Honors write.metadata.compression-codec (mtime=0 keeps the
    gzip bytes deterministic for a given metadata)."""
    raw = json.dumps(metadata.to_json(), indent=2).encode()
    if _metadata_codec(metadata) == "gzip":
        import gzip

        return gzip.compress(raw, mtime=0)
    return raw


def _write_metadata_file(metadata: TableMetadata, path: str) -> None:
    from . import fileio

    payload = _metadata_payload(metadata)
    if fileio.is_local(path):
        # local: write-temp + rename for atomic visibility
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{_uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, path)
    else:
        # object stores: PUT is already all-or-nothing; commit atomicity
        # comes from the catalog CAS (SQL/REST), not the filesystem
        fileio.write_bytes(path, payload)


class FileSystemCatalog(Catalog):
    """Hadoop-style catalog: table dir layout
    <warehouse>/<ns>/<table>/metadata/v{N}.metadata.json + version-hint."""

    name = "fs"
    # commit locks older than this are treated as crash leftovers
    LOCK_TTL_SECONDS = 60.0

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _table_dir(self, identifier) -> str:
        ns, tbl = _identifier(identifier)
        return os.path.join(self.warehouse, ns, tbl)

    def _meta_dir(self, identifier) -> str:
        return os.path.join(self._table_dir(identifier), "metadata")

    def _hint_path(self, identifier) -> str:
        return os.path.join(self._meta_dir(identifier), "version-hint.text")

    def _version_path(self, identifier, version: int) -> str:
        return os.path.join(self._meta_dir(identifier), f"v{version}.metadata.json")

    @staticmethod
    def _reject_gzip(metadata: TableMetadata) -> None:
        """The version-hint layout resolves v{N} paths by exact name, so
        a codec-dependent extension would break the hint/lock machinery;
        gzip metadata lives behind the SQL/REST catalogs instead."""
        if _metadata_codec(metadata) == "gzip":
            raise ValueError(
                "FileSystemCatalog does not support "
                f"{METADATA_COMPRESSION_KEY}=gzip; use the SQL or REST catalog"
            )

    def _current_version(self, identifier) -> Optional[int]:
        try:
            with open(self._hint_path(identifier)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def create_table(self, identifier, schema, spec=None, properties=None, location=None):
        from .table import Table

        if self._current_version(identifier) is not None:
            raise TableAlreadyExistsError(str(identifier))
        location = location or self._table_dir(identifier)
        md = self._new_metadata(schema, spec, location, properties)
        self._reject_gzip(md)
        path = self._version_path(identifier, 1)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # exclusive create: a racing creator loses HERE instead of
        # silently overwriting the winner's v1 metadata via tmp+rename
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise TableAlreadyExistsError(str(identifier)) from None
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(md.to_json(), f, indent=2)
        except BaseException:
            os.unlink(path)
            raise
        self._swap_hint(identifier, 1, expect=None)
        return Table(identifier, md, path, self)

    def load_table(self, identifier):
        from .table import Table

        v = self._current_version(identifier)
        if v is None:
            raise NoSuchTableError(str(identifier))
        path = self._version_path(identifier, v)
        return Table(identifier, parse_metadata_file(path), path, self)

    def register_table(self, identifier, metadata_location: str):
        """FS layout resolves the current version from files under the
        catalog's own metadata dir, so registration copies the metadata
        file in as v1 (exclusive-create, same race rule as create_table).
        The bytes are copied VERBATIM — re-serializing through our model
        would silently drop any field an external writer set that we
        don't round-trip — and parsed once for validation. The metadata's
        `location` is untouched, so data and manifests keep resolving
        against the original table location."""
        from . import fileio
        from .table import Table

        if self._current_version(identifier) is not None:
            raise TableAlreadyExistsError(str(identifier))
        with fileio.open_input(metadata_location) as f:
            payload = f.read()
        # validate before adopting; gzip-compressed metadata (magic
        # 1f 8b) parses fine, but THIS catalog can never commit on top
        # of it (_reject_gzip fires on every commit_table) — surface the
        # incompatibility at adoption, not at the first commit
        text = payload
        if text[:2] == b"\x1f\x8b":
            raise ValueError(
                "FileSystemCatalog cannot adopt gzip-compressed metadata: "
                f"{METADATA_COMPRESSION_KEY}=gzip is rejected on every "
                "subsequent commit; register into the SQL or REST catalog"
            )
        md = TableMetadata.from_json(json.loads(text.decode("utf-8")))
        self._reject_gzip(md)
        path = self._version_path(identifier, 1)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise TableAlreadyExistsError(str(identifier)) from None
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
        except BaseException:
            os.unlink(path)
            raise
        self._swap_hint(identifier, 1, expect=None)
        return Table(identifier, md, path, self)

    def drop_table(self, identifier) -> None:
        import shutil

        if self._current_version(identifier) is None:
            raise NoSuchTableError(str(identifier))
        shutil.rmtree(self._table_dir(identifier), ignore_errors=True)

    def rename_table(self, src, dst):
        if self._current_version(src) is None:
            raise NoSuchTableError(str(src))
        if self._current_version(dst) is not None:
            raise TableAlreadyExistsError(str(dst))
        os.makedirs(os.path.dirname(self._table_dir(dst)), exist_ok=True)
        os.rename(self._table_dir(src), self._table_dir(dst))
        return self.load_table(dst)

    def list_tables(self, namespace: str) -> list[tuple[str, str]]:
        ns_dir = os.path.join(self.warehouse, namespace)
        if not os.path.isdir(ns_dir):
            raise NoSuchNamespaceError(namespace)
        return [
            (namespace, t)
            for t in sorted(os.listdir(ns_dir))
            if os.path.isdir(os.path.join(ns_dir, t, "metadata"))
        ]

    @contextlib.contextmanager
    def _hint_flock(self, identifier):
        """Serialize hint-CAS decisions (swap, reclaim-time orphan clear)
        for one table. flock is released by the kernel when the holder
        dies, so unlike the TTL commit lock this cannot go stale; it only
        serializes sub-millisecond critical sections on one host (this
        catalog is local-filesystem by construction)."""
        path = os.path.join(self._meta_dir(identifier), ".hint.flock")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)  # close releases the flock

    @staticmethod
    def _lock_token(lock_path: str) -> Optional[str]:
        try:
            with open(lock_path) as f:
                return f.read().strip() or None
        except OSError:
            return None

    def _swap_hint(
        self,
        identifier,
        new_version: int,
        expect: Optional[int],
        commit_lock: Optional[str] = None,
        token: Optional[str] = None,
    ) -> None:
        """Hint CAS: write hint to temp + rename, with the expect-check and
        the rename under the hint flock so the check-then-rename pair is
        atomic against every other swap and against reclaim-time orphan
        clearing. When ``commit_lock``/``token`` are given, additionally
        verify (under the same flock) that the commit lock still carries
        OUR token — a committer whose stale lock was reclaimed by another
        process must lose here instead of publishing a version the
        reclaimer has already decided is dead."""
        hint = self._hint_path(identifier)
        with self._hint_flock(identifier):
            current = self._current_version(identifier)
            if current != expect:
                raise CommitConflictError(
                    f"expected version {expect}, found {current} for {identifier}"
                )
            if commit_lock is not None and self._lock_token(commit_lock) != token:
                raise CommitConflictError(
                    f"commit lock for {identifier} was reclaimed while stalled"
                )
            tmp = f"{hint}.tmp-{_uuid.uuid4().hex[:8]}"
            os.makedirs(os.path.dirname(hint), exist_ok=True)
            with open(tmp, "w") as f:
                f.write(str(new_version))
            os.rename(tmp, hint)

    def commit_table(self, identifier, base_metadata_location, new_metadata) -> str:
        self._reject_gzip(new_metadata)
        current = self._current_version(identifier)
        if current is None:
            raise NoSuchTableError(str(identifier))
        current_path = self._version_path(identifier, current)
        if base_metadata_location is not None and current_path != base_metadata_location:
            raise CommitConflictError(
                f"base {base_metadata_location} is stale; current is {current_path}"
            )
        new_version = current + 1
        new_path = self._version_path(identifier, new_version)
        # exclusive create: the loser of a race fails here. A lock left by
        # a hard-crashed committer (SIGKILL between create and cleanup)
        # would otherwise block this version forever — locks older than
        # the TTL are reclaimable. Breaking one can't clobber a committed
        # version: the version file itself is also exclusive-create.
        lock = f"{new_path}.lock"
        # Per-attempt token written into the lock file: _swap_hint re-reads
        # it under the hint flock, so a committer whose stale lock was
        # broken can never publish the hint after a reclaimer took over.
        token = _uuid.uuid4().hex
        reclaimed_stale_lock = False
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                age = 0.0  # lock vanished — the racer is live, not stale
            if age < self.LOCK_TTL_SECONDS:
                raise CommitConflictError(
                    f"concurrent commit in flight for {identifier}"
                )
            try:  # stale: break it and retry the exclusive create once
                os.unlink(lock)
            except FileNotFoundError:
                pass
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                reclaimed_stale_lock = True
            except FileExistsError:
                raise CommitConflictError(
                    f"concurrent commit in flight for {identifier}"
                )
        try:
            os.write(fd, token.encode())
            os.fsync(fd)
            if reclaimed_stale_lock and os.path.exists(new_path):
                # The dead lock holder published v{N} but died before
                # swapping the hint — the commit never became visible, so
                # the orphan would wedge this version forever. The check
                # and the unlink sit under the SAME flock that serializes
                # every hint swap: if the presumed-dead holder is in fact
                # a stalled zombie, its later swap re-reads the lock file,
                # finds OUR token, and loses — so once we observe
                # hint==current here, v{N} is unpublishable for good and
                # safe to clear.
                with self._hint_flock(identifier):
                    if self._current_version(identifier) == current:
                        with contextlib.suppress(OSError):
                            os.unlink(new_path)
            # Publish via tmp-write + hard-link: the link is atomic (no
            # reader or crash can observe a partial v{N}) AND exclusive
            # (EEXIST — if a TTL-reclaimer broke our lock and committed
            # v{N} while we were stalled, our resumed publish must LOSE,
            # not silently replace committed metadata).
            tmp = f"{new_path}.tmp-{_uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(_metadata_payload(new_metadata))
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, new_path)
            except FileExistsError:
                raise CommitConflictError(
                    f"version {new_version} already committed for {identifier}"
                ) from None
            finally:
                with contextlib.suppress(OSError):
                    os.unlink(tmp)
            try:
                self._swap_hint(
                    identifier,
                    new_version,
                    expect=current,
                    commit_lock=lock,
                    token=token,
                )
            except CommitConflictError:
                # Hint CAS or lock-token check failed: another committer
                # owns this version now and new_path may be THEIR committed
                # file — never unlink on this path. If it is still our
                # never-published orphan, TTL reclaim heals it.
                raise
            except BaseException:
                # Non-conflict failure (I/O error, interrupt) with the hint
                # still at `current`: unpublish our invisible v{N} so it
                # can't wedge the next committer until TTL reclaim — but
                # only while we still own the commit lock (token check
                # under the flock). A reclaimer always rewrites the token
                # BEFORE touching v{N}, so owning the token proves the
                # file is ours; an inode comparison would not (freed
                # inodes are reused immediately on most filesystems).
                # The exception may also have fired AFTER _swap_hint's
                # rename landed (flock-release failure, interrupt at the
                # boundary) — then v{N} IS the committed current version
                # and must never be unlinked, so re-check the hint too.
                with self._hint_flock(identifier):
                    cur_now = self._current_version(identifier)
                    # unlink ONLY while the table is still below our
                    # version: at == our rename landed (v{N} is current),
                    # and at > a successor already built on v{N} (its
                    # metadata-log references it) — both committed states
                    if (
                        self._lock_token(lock) == token
                        and cur_now is not None
                        and cur_now < new_version
                    ):
                        with contextlib.suppress(OSError):
                            os.unlink(new_path)
                raise
        finally:
            os.close(fd)
            read_back = self._lock_token(lock)
            # Unlink when the lock carries our token — or a strict PREFIX
            # of it (our own partial/failed token write: reclaimers write
            # their own full token, which can never be a prefix of ours).
            # Leaving a fresh-mtime lock with a garbled token behind would
            # wedge this version for a full LOCK_TTL even though we
            # provably still owned it.
            if read_back is not None and token.startswith(read_back):
                with contextlib.suppress(OSError):
                    os.unlink(lock)
            # else: a TTL-reclaimer owns the lock now — leave theirs alone;
            # the version file + flock'd hint CAS decide correctness.
        return new_path

    def create_namespace(self, namespace: str, properties=None) -> None:
        os.makedirs(os.path.join(self.warehouse, namespace), exist_ok=True)
        if properties:
            with open(os.path.join(self.warehouse, namespace, ".props.json"), "w") as f:
                json.dump(properties, f)

    def drop_namespace(self, namespace: str) -> None:
        ns_dir = os.path.join(self.warehouse, namespace)
        if not os.path.isdir(ns_dir):
            raise NoSuchNamespaceError(namespace)
        if any(os.path.isdir(os.path.join(ns_dir, d, "metadata")) for d in os.listdir(ns_dir)):
            raise ValueError(f"namespace {namespace} is not empty")
        import shutil

        shutil.rmtree(ns_dir)

    def list_namespaces(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def load_namespace_properties(self, namespace: str) -> dict:
        p = os.path.join(self.warehouse, namespace, ".props.json")
        if not os.path.isdir(os.path.dirname(p)):
            raise NoSuchNamespaceError(namespace)
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def update_namespace_properties(self, namespace, removals=(), updates=None) -> None:
        props = self.load_namespace_properties(namespace)
        for k in removals:
            props.pop(k, None)
        props.update(updates or {})
        with open(os.path.join(self.warehouse, namespace, ".props.json"), "w") as f:
            json.dump(props, f)


class SqlCatalog(Catalog):
    """SQL-database catalog — two-table layout + CAS UPDATE commit
    (ref catalog/sql/sql.go:136-154 schema, :328-397 commit)."""

    name = "sql"

    def __init__(self, db_path: str, warehouse: str, catalog_name: str = "default"):
        from . import fileio

        self.db_path = db_path
        self.warehouse = warehouse
        self.catalog_name = catalog_name
        fileio.makedirs(warehouse)  # object-store warehouses need no mkdir
        with closing(self._conn()) as con, con:
            con.execute(
                """CREATE TABLE IF NOT EXISTS iceberg_tables (
                    catalog_name TEXT NOT NULL,
                    table_namespace TEXT NOT NULL,
                    table_name TEXT NOT NULL,
                    metadata_location TEXT,
                    previous_metadata_location TEXT,
                    PRIMARY KEY (catalog_name, table_namespace, table_name))"""
            )
            con.execute(
                """CREATE TABLE IF NOT EXISTS iceberg_namespace_properties (
                    catalog_name TEXT NOT NULL,
                    namespace TEXT NOT NULL,
                    property_key TEXT NOT NULL,
                    property_value TEXT,
                    PRIMARY KEY (catalog_name, namespace, property_key))"""
            )

    def _conn(self):
        con = sqlite3.connect(self.db_path, timeout=30)
        con.isolation_level = None  # manual transactions
        return con

    def _table_dir(self, identifier) -> str:
        ns, tbl = _identifier(identifier)
        return os.path.join(self.warehouse, ns, tbl)

    def _metadata_path(self, identifier, version: int, metadata=None) -> str:
        ext = metadata_file_ext(metadata) if metadata is not None else ".metadata.json"
        return os.path.join(
            self._table_dir(identifier),
            "metadata",
            f"{version:05d}-{_uuid.uuid4()}{ext}",
        )

    def create_table(self, identifier, schema, spec=None, properties=None, location=None):
        from .table import Table

        ns, tbl = _identifier(identifier)
        if ns not in self.list_namespaces():
            # match the reference sql catalog: tables need a namespace row
            raise NoSuchNamespaceError(ns)
        location = location or self._table_dir(identifier)
        md = self._new_metadata(schema, spec, location, properties)
        path = self._metadata_path(identifier, 1, md)
        _write_metadata_file(md, path)
        with closing(self._conn()) as con, con:
            try:
                con.execute(
                    "INSERT INTO iceberg_tables VALUES (?, ?, ?, ?, NULL)",
                    (self.catalog_name, ns, tbl, path),
                )
            except sqlite3.IntegrityError:
                raise TableAlreadyExistsError(str(identifier)) from None
        return Table(identifier, md, path, self)

    def load_table(self, identifier):
        from .table import Table

        ns, tbl = _identifier(identifier)
        with closing(self._conn()) as con, con:
            row = con.execute(
                "SELECT metadata_location FROM iceberg_tables "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.catalog_name, ns, tbl),
            ).fetchone()
        if row is None or row[0] is None:
            raise NoSuchTableError(str(identifier))
        return Table(identifier, parse_metadata_file(row[0]), row[0], self)

    def register_table(self, identifier, metadata_location: str):
        """SQL catalogs point rows at metadata files, so registration is
        one INSERT naming the existing location — nothing is copied; the
        metadata is parsed once to validate it before the row lands."""
        from .table import Table

        ns, tbl = _identifier(identifier)
        if ns not in self.list_namespaces():
            raise NoSuchNamespaceError(ns)
        md = parse_metadata_file(metadata_location)
        with closing(self._conn()) as con, con:
            try:
                con.execute(
                    "INSERT INTO iceberg_tables VALUES (?, ?, ?, ?, NULL)",
                    (self.catalog_name, ns, tbl, metadata_location),
                )
            except sqlite3.IntegrityError:
                raise TableAlreadyExistsError(str(identifier)) from None
        return Table(identifier, md, metadata_location, self)

    def drop_table(self, identifier) -> None:
        ns, tbl = _identifier(identifier)
        with closing(self._conn()) as con, con:
            cur = con.execute(
                "DELETE FROM iceberg_tables "
                "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                (self.catalog_name, ns, tbl),
            )
            if cur.rowcount == 0:
                raise NoSuchTableError(str(identifier))

    def rename_table(self, src, dst):
        ns_s, t_s = _identifier(src)
        ns_d, t_d = _identifier(dst)
        with closing(self._conn()) as con, con:
            try:
                cur = con.execute(
                    "UPDATE iceberg_tables SET table_namespace=?, table_name=? "
                    "WHERE catalog_name=? AND table_namespace=? AND table_name=?",
                    (ns_d, t_d, self.catalog_name, ns_s, t_s),
                )
            except sqlite3.IntegrityError:
                raise TableAlreadyExistsError(str(dst)) from None
            if cur.rowcount == 0:
                raise NoSuchTableError(str(src))
        return self.load_table(dst)

    def list_tables(self, namespace: str) -> list[tuple[str, str]]:
        with closing(self._conn()) as con, con:
            rows = con.execute(
                "SELECT table_namespace, table_name FROM iceberg_tables "
                "WHERE catalog_name=? AND table_namespace=? ORDER BY table_name",
                (self.catalog_name, namespace),
            ).fetchall()
        return [(r[0], r[1]) for r in rows]

    def commit_table(self, identifier, base_metadata_location, new_metadata) -> str:
        """Transactional compare-and-swap — ref catalog/sql/sql.go:328-397."""
        ns, tbl = _identifier(identifier)
        version = len(new_metadata.metadata_log) + 1
        new_path = self._metadata_path(identifier, version, new_metadata)
        _write_metadata_file(new_metadata, new_path)
        with closing(self._conn()) as con, con:
            con.execute("BEGIN IMMEDIATE")
            try:
                if base_metadata_location is None:
                    # staged-create first commit: CAS against NULL needs
                    # IS NULL ('= NULL' never matches in SQL)
                    cur = con.execute(
                        "UPDATE iceberg_tables SET metadata_location=?, "
                        "previous_metadata_location=NULL "
                        "WHERE catalog_name=? AND table_namespace=? AND table_name=? "
                        "AND metadata_location IS NULL",
                        (new_path, self.catalog_name, ns, tbl),
                    )
                else:
                    cur = con.execute(
                        "UPDATE iceberg_tables SET metadata_location=?, "
                        "previous_metadata_location=? "
                        "WHERE catalog_name=? AND table_namespace=? AND table_name=? "
                        "AND metadata_location=?",
                        (new_path, base_metadata_location, self.catalog_name, ns, tbl,
                         base_metadata_location),
                    )
                if cur.rowcount != 1:
                    con.execute("ROLLBACK")
                    os.unlink(new_path)
                    raise CommitConflictError(
                        f"CAS failed for {identifier}: base {base_metadata_location} is stale"
                    )
                con.execute("COMMIT")
            except sqlite3.Error:
                con.execute("ROLLBACK")
                raise
        return new_path

    def create_namespace(self, namespace: str, properties=None) -> None:
        with closing(self._conn()) as con, con:
            con.execute(
                "INSERT OR REPLACE INTO iceberg_namespace_properties VALUES (?, ?, 'exists', 'true')",
                (self.catalog_name, namespace),
            )
            for k, v in (properties or {}).items():
                con.execute(
                    "INSERT OR REPLACE INTO iceberg_namespace_properties VALUES (?, ?, ?, ?)",
                    (self.catalog_name, namespace, k, str(v)),
                )

    def drop_namespace(self, namespace: str) -> None:
        if self.list_tables(namespace):
            raise ValueError(f"namespace {namespace} is not empty")
        with closing(self._conn()) as con, con:
            cur = con.execute(
                "DELETE FROM iceberg_namespace_properties WHERE catalog_name=? AND namespace=?",
                (self.catalog_name, namespace),
            )
            if cur.rowcount == 0:
                raise NoSuchNamespaceError(namespace)

    def list_namespaces(self) -> list[str]:
        with closing(self._conn()) as con, con:
            rows = con.execute(
                "SELECT DISTINCT namespace FROM iceberg_namespace_properties "
                "WHERE catalog_name=? ORDER BY namespace",
                (self.catalog_name,),
            ).fetchall()
        return [r[0] for r in rows]

    def load_namespace_properties(self, namespace: str) -> dict:
        with closing(self._conn()) as con, con:
            rows = con.execute(
                "SELECT property_key, property_value FROM iceberg_namespace_properties "
                "WHERE catalog_name=? AND namespace=?",
                (self.catalog_name, namespace),
            ).fetchall()
        if not rows:
            raise NoSuchNamespaceError(namespace)
        return {k: v for k, v in rows if k != "exists"}

    def update_namespace_properties(self, namespace, removals=(), updates=None) -> None:
        self.load_namespace_properties(namespace)
        with closing(self._conn()) as con, con:
            for k in removals:
                con.execute(
                    "DELETE FROM iceberg_namespace_properties "
                    "WHERE catalog_name=? AND namespace=? AND property_key=?",
                    (self.catalog_name, namespace, k),
                )
            for k, v in (updates or {}).items():
                con.execute(
                    "INSERT OR REPLACE INTO iceberg_namespace_properties VALUES (?, ?, ?, ?)",
                    (self.catalog_name, namespace, k, str(v)),
                )


def _make_rest(**kwargs) -> "Catalog":
    from .rest_catalog import RestCatalog

    return RestCatalog(**kwargs)


def _make_glue(**kwargs) -> "Catalog":
    from .glue_catalog import GlueCatalog

    return GlueCatalog(**kwargs)


_CATALOG_REGISTRY = {
    "fs": FileSystemCatalog,
    "sql": SqlCatalog,
    "rest": _make_rest,
    "glue": _make_glue,
}


def load_catalog(kind: str, **kwargs) -> Catalog:
    """scheme→factory registry — ref catalog/registry.go:80-131 (the
    reference registers glue/rest/sql the same way via init())."""
    if kind not in _CATALOG_REGISTRY:
        raise ValueError(f"unknown catalog kind {kind!r}; have {sorted(_CATALOG_REGISTRY)}")
    return _CATALOG_REGISTRY[kind](**kwargs)
