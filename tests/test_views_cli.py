"""Views + CLI command set (cmd/iceberg/main.go:39-93)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog, NoSuchTableError
from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema
from iceberg_go_distributed_spark.iceberg.view import create_view, drop_view, load_view


def test_view_roundtrip(tmp_path, spark):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    spark.range(10).createOrReplaceTempView("nums")
    v = create_view(cat, "db.even_nums", "SELECT id FROM nums WHERE id % 2 = 0")
    v2 = load_view(cat, "db.even_nums")
    assert v2.metadata.view_uuid == v.metadata.view_uuid
    assert v2.sql() == "SELECT id FROM nums WHERE id % 2 = 0"
    df = v2.register(spark)
    assert df.count() == 5
    assert spark.sql("SELECT COUNT(*) c FROM even_nums").first().c == 5
    drop_view(cat, "db.even_nums")
    with pytest.raises(NoSuchTableError):
        load_view(cat, "db.even_nums")


def _cli(tmp_path, *argv):
    out = subprocess.run(
        [sys.executable, "-m", "iceberg_go_distributed_spark",
         "--warehouse", str(tmp_path / "wh"), *argv],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_cli_lifecycle(tmp_path):
    schema = Schema.of(
        0,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "ts", ty.TimestampType()),
    )
    sj = json.dumps(schema.to_json())
    assert "created" in _cli(tmp_path, "create", "db.t1", "--schema-json", sj,
                             "--partition-spec", "ts:day")
    assert "db.t1" in _cli(tmp_path, "list", "db")
    desc = json.loads(_cli(tmp_path, "describe", "db.t1"))
    assert desc["partition-spec"]["fields"][0]["transform"] == "day"
    assert len(_cli(tmp_path, "uuid", "db.t1").strip()) == 36
    _cli(tmp_path, "properties", "set", "db.t1", "owner", "cli")
    assert _cli(tmp_path, "properties", "get", "db.t1", "owner").strip() == "cli"
    _cli(tmp_path, "properties", "remove", "db.t1", "owner")
    assert _cli(tmp_path, "properties", "get", "db.t1", "owner").strip() == ""
    assert desc["format-version"] == 2 and "next-row-id" not in desc
    assert "format-version 3" in _cli(tmp_path, "upgrade", "db.t1")
    desc3 = json.loads(_cli(tmp_path, "describe", "db.t1"))
    assert desc3["format-version"] == 3 and desc3["next-row-id"] == 0
    _cli(tmp_path, "rename", "db.t1", "db.t2")
    assert "db.t2" in _cli(tmp_path, "list", "db")
    _cli(tmp_path, "drop", "db.t2")
    assert "db.t2" not in _cli(tmp_path, "list", "db")


def test_cli_register(tmp_path):
    schema = Schema.of(0, NestedField(1, "id", ty.LongType(), required=True))
    sj = json.dumps(schema.to_json())
    _cli(tmp_path, "create", "db.orig", "--schema-json", sj)
    meta = json.loads(_cli(tmp_path, "describe", "db.orig"))
    import os

    wh = tmp_path / "wh"
    meta_dir = wh / "db" / "orig" / "metadata"
    [v1] = [f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")]
    out = _cli(tmp_path, "register", "db.copy", str(meta_dir / v1))
    assert "registered db.copy" in out
    assert json.loads(_cli(tmp_path, "describe", "db.copy"))["uuid"] == meta["uuid"]


def test_cli_maintenance(tmp_path, spark, sf_dir):
    """`expire` + `orphans`: metadata-only maintenance from the CLI."""
    import os
    import time

    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    li = load_table(spark, sf_dir, "lineitem").limit(60)
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.m", schema_from_spark(li.schema))
    for i in range(3):
        t.append(li.limit(20).coalesce(1))

    out = _cli(tmp_path, "expire", "db.m", "--retain-last", "1")
    assert "expired 2 snapshots" in out

    future = str(int(time.time() * 1000) + 60_000)
    listed = _cli(tmp_path, "orphans", "db.m", "--older-than-ms", future)
    n_listed = len([line for line in listed.splitlines() if line.startswith("/")])
    assert n_listed > 0 and f"found {n_listed} orphan" in listed
    # dry run deleted nothing
    assert all(
        os.path.exists(line)
        for line in listed.splitlines()
        if line.startswith("/")
    )
    deleted = _cli(
        tmp_path, "orphans", "db.m", "--older-than-ms", future, "--delete"
    )
    assert f"deleted {n_listed} orphan" in deleted
    assert t.refresh().scan().to_df(spark).count() == 60  # table intact


def test_cli_rollback_and_cherry_pick(tmp_path, spark, sf_dir):
    """`rollback` rewinds main; `cherry-pick` reapplies a staged append
    after main moved — both metadata-only, both from the CLI."""
    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    li = load_table(spark, sf_dir, "lineitem").limit(30)
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.sm", schema_from_spark(li.schema))
    t.append(li.limit(10).coalesce(1))
    s1 = t.current_snapshot().snapshot_id
    t.append(li.limit(20).coalesce(1))

    out = _cli(tmp_path, "rollback", "db.sm", str(s1))
    assert f"main is now at snapshot {s1}" in out
    t.refresh()
    assert t.scan().to_df(spark).count() == 10

    # stage on a branch, move main, publish via cherry-pick
    t.transaction().set_ref("audit", s1).commit()
    t.refresh()
    t.append(li.limit(5).coalesce(1), branch="audit")
    staged = t.metadata.refs["audit"].snapshot_id
    t.append(li.limit(7).coalesce(1))  # main moves

    out = _cli(tmp_path, "cherry-pick", "db.sm", str(staged))
    assert f"applied {staged} as snapshot" in out
    t.refresh()
    assert t.scan().to_df(spark).count() == 10 + 5 + 7
    # picking an already-published id is a no-op
    out = _cli(tmp_path, "cherry-pick", "db.sm", str(s1))
    assert "already on main" in out
