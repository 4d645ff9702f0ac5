"""FileSystemCatalog commit CAS under REAL process concurrency.

Round 6 verified the conflict/retry semantics in-process
(test_table_e2e.py::test_concurrent_commit_conflict); these tests put
the same machinery — flock'd hint CAS, TTL commit lock, exclusive-create
version files, stale-lock reclaim with orphan clearing — under actual
OS-process races: N workers hammering one table, and workers SIGKILL'd
mid-commit at both crash points (before the version file is published,
and after publish but before the hint swap).  This is the coordinator
story a 100 TB deployment relies on: exactly-one-wins, no committed
version is ever unlinked, and a dead committer can never wedge the
table past the lock TTL.

Reference semantics: catalog/sql/sql.go:328-397 (CAS update),
table/distributed_snapshot_test.go:131 (conflicting writers).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import (
    CommitConflictError,
    FileSystemCatalog,
)
from iceberg_go_distributed_spark.iceberg.metadata import parse_metadata_file
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Worker run in a separate interpreter.  Modes:
#   race <wid> <k>        — commit k property-set transactions with
#                           refresh-and-retry on conflict
#   crash_before_publish  — die (os._exit, i.e. no cleanup handlers; the
#                           kernel reaps the process like SIGKILL) after
#                           the commit lock is created+tokened but before
#                           the v{N} metadata file is linked
#   crash_after_publish   — die after v{N} is on disk but before the
#                           hint swap makes it current (the orphan case)
WORKER = r"""
import os, sys, time

warehouse, table, mode = sys.argv[1], sys.argv[2], sys.argv[3]

from iceberg_go_distributed_spark.iceberg.catalog import (
    CommitConflictError,
    FileSystemCatalog,
)

cat = FileSystemCatalog(warehouse)

if mode == "race":
    wid, k = int(sys.argv[4]), int(sys.argv[5])
    done = retries = 0
    while done < k:
        t = cat.load_table(table)
        try:
            t.transaction().set_properties({f"w{wid}.c{done}": "1"}).commit()
            done += 1
        except CommitConflictError:
            retries += 1
            if retries > 2000:
                print("livelock", file=sys.stderr)
                sys.exit(3)
            time.sleep(0.001 * (1 + wid))
    print(f"ok {done} retries={retries}")
elif mode == "crash_before_publish":
    import iceberg_go_distributed_spark.iceberg.catalog as C
    # commit_table publishes via os.link(tmp, new_path); dying here
    # leaves the tokened lock file and NO version file.
    C.os.link = lambda *a, **kw: os._exit(9)
    t = cat.load_table(table)
    t.transaction().set_properties({"crashed": "1"}).commit()
    sys.exit(4)  # unreachable if the crash fired
elif mode == "crash_after_publish":
    # dying in _swap_hint leaves the tokened lock AND an orphan v{N}
    # that the hint never points to.
    FileSystemCatalog._swap_hint = lambda self, *a, **kw: os._exit(9)
    t = cat.load_table(table)
    t.transaction().set_properties({"crashed": "1"}).commit()
    sys.exit(4)
else:
    sys.exit(2)
"""

SCHEMA = Schema.of(0, NestedField(1, "id", ty.LongType(), required=True))


def _spawn(worker_py: str, *args: str) -> subprocess.Popen:
    env = dict(os.environ, PYTHONPATH=REPO_ROOT)
    return subprocess.Popen(
        [sys.executable, worker_py, *args],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


@pytest.fixture()
def worker_py(tmp_path):
    p = tmp_path / "commit_worker.py"
    p.write_text(WORKER)
    return str(p)


def test_multiprocess_commit_race(tmp_path, worker_py):
    """4 OS processes × 5 commits on one table: every commit must land
    exactly once (no lost updates), versions must be contiguous, and the
    hint must point at the top."""
    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    cat.create_table("db.race", SCHEMA)

    n_workers, k = 4, 5
    procs = [
        _spawn(worker_py, wh, "db.race", "race", str(w), str(k))
        for w in range(n_workers)
    ]
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed: {err}\n{out}"
        assert out.startswith(f"ok {k}")

    t = cat.load_table("db.race")
    # no lost update: every worker's every property key is present
    for w in range(n_workers):
        for c in range(k):
            assert t.properties.get(f"w{w}.c{c}") == "1", (w, c)
    # exactly-one-wins: 20 commits on top of v1 → v21, contiguous files
    final_v = n_workers * k + 1
    meta = os.path.join(t.location, "metadata")
    with open(os.path.join(meta, "version-hint.text")) as f:
        assert int(f.read().strip()) == final_v
    for v in range(1, final_v + 1):
        path = os.path.join(meta, f"v{v}.metadata.json")
        assert os.path.exists(path), f"missing v{v}"
        parse_metadata_file(path)  # every committed file parses
    assert not os.path.exists(os.path.join(meta, f"v{final_v + 1}.metadata.json"))
    # no commit locks left behind
    assert not [f for f in os.listdir(meta) if f.endswith(".lock")]


def _age_locks(meta_dir: str, by_seconds: float) -> None:
    aged = False
    for f in os.listdir(meta_dir):
        if f.endswith(".lock"):
            p = os.path.join(meta_dir, f)
            old = time.time() - by_seconds
            os.utime(p, (old, old))
            aged = True
    assert aged, "expected a leftover commit lock to age"


def test_kill_before_publish_then_reclaim(tmp_path, worker_py):
    """A committer SIGKILL'd after taking the commit lock but before
    publishing v2 must only block the table until the lock TTL; the next
    committer then reclaims and wins."""
    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    t = cat.create_table("db.k1", SCHEMA)
    meta = os.path.join(t.location, "metadata")

    p = _spawn(worker_py, wh, "db.k1", "crash_before_publish")
    p.communicate(timeout=60)
    assert p.returncode == 9, "worker must die at the injected crash point"
    assert os.path.exists(os.path.join(meta, "v2.metadata.json.lock"))
    assert not os.path.exists(os.path.join(meta, "v2.metadata.json"))

    # fresh lock → genuine conflict for a live committer
    t = cat.load_table("db.k1")
    with pytest.raises(CommitConflictError):
        t.transaction().set_properties({"mine": "1"}).commit()

    _age_locks(meta, cat.LOCK_TTL_SECONDS + 5)
    t = cat.load_table("db.k1")
    t.transaction().set_properties({"mine": "1"}).commit()
    t = cat.load_table("db.k1")
    assert t.properties.get("mine") == "1"
    assert "crashed" not in t.properties
    with open(os.path.join(meta, "version-hint.text")) as f:
        assert int(f.read().strip()) == 2


def test_kill_after_publish_clears_orphan(tmp_path, worker_py):
    """A committer SIGKILL'd after linking v2 but before the hint swap
    leaves an unpublished orphan v2; the TTL reclaimer must clear it and
    commit its own v2 — the crashed transaction must never surface."""
    wh = str(tmp_path / "wh")
    cat = FileSystemCatalog(wh)
    t = cat.create_table("db.k2", SCHEMA)
    meta = os.path.join(t.location, "metadata")

    p = _spawn(worker_py, wh, "db.k2", "crash_after_publish")
    p.communicate(timeout=60)
    assert p.returncode == 9
    # orphan: v2 on disk, hint still 1
    assert os.path.exists(os.path.join(meta, "v2.metadata.json"))
    with open(os.path.join(meta, "version-hint.text")) as f:
        assert int(f.read().strip()) == 1

    t = cat.load_table("db.k2")
    with pytest.raises(CommitConflictError):
        t.transaction().set_properties({"mine": "1"}).commit()

    _age_locks(meta, cat.LOCK_TTL_SECONDS + 5)
    t = cat.load_table("db.k2")
    t.transaction().set_properties({"mine": "1"}).commit()
    t = cat.load_table("db.k2")
    # exactly-one-wins: OUR v2 is current, the dead committer's payload
    # is gone
    assert t.properties.get("mine") == "1"
    assert "crashed" not in t.properties
    with open(os.path.join(meta, "version-hint.text")) as f:
        assert int(f.read().strip()) == 2
    md = parse_metadata_file(os.path.join(meta, "v2.metadata.json"))
    assert md.properties.get("mine") == "1"
