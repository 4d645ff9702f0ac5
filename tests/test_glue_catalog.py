"""Glue catalog conformance — ref catalog/glue/glue.go + schema.go.

Runs against an in-memory double implementing the boto3 Glue response
shapes (PascalCase kwargs/dicts, NextToken pagination, VersionId
optimistic locking, AWS-named exceptions) — the same strategy the REST
catalog tests use with their local conformance server. Pins:

  * table lifecycle: create/load/list/drop/register/rename, with
    non-Iceberg Glue tables invisible to list and rejected by load;
  * the Parameters contract: table_type=ICEBERG, metadata_location,
    previous_metadata_location carried across commits;
  * commits: VersionId optimistic locking — a stale base OR a
    concurrent Glue-side bump maps to CommitConflictError (and the
    transaction layer's retry makes racing appends serialize);
  * namespaces: Description/LocationUri round-trip, parameter updates,
    flat-only (parent rejected), paginated listings;
  * schema conversion: Iceberg types → Glue/Hive type strings, current
    + historical columns merged by name and sorted by field id.
"""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg import types as ty
from iceberg_go_distributed_spark.iceberg.catalog import (
    CommitConflictError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
)
from iceberg_go_distributed_spark.iceberg.glue_catalog import (
    FIELD_CURRENT_KEY,
    FIELD_ID_KEY,
    FIELD_OPTIONAL_KEY,
    PARAM_METADATA_LOCATION,
    PARAM_PREV_METADATA_LOCATION,
    PARAM_TABLE_TYPE,
    GlueCatalog,
    glue_type,
    metadata_to_glue_columns,
)
from iceberg_go_distributed_spark.iceberg.types import (
    NestedField,
    Schema,
    schema_from_spark,
)


class EntityNotFoundException(Exception):
    pass


class AlreadyExistsException(Exception):
    pass


class ConcurrentModificationException(Exception):
    pass


class FakeGlue:
    """boto3-Glue-shaped in-memory double: dict responses, NextToken
    pagination, VersionId bumps on update_table (the optimistic lock
    the real service enforces)."""

    def __init__(self, page_size=None):
        self.databases: dict[str, dict] = {}
        self.tables: dict[tuple[str, str], dict] = {}
        self.page_size = page_size
        self.update_calls: list[dict] = []

    # -- databases
    def create_database(self, DatabaseInput=None, CatalogId=None):
        name = DatabaseInput["Name"]
        if name in self.databases:
            raise AlreadyExistsException(name)
        self.databases[name] = dict(DatabaseInput)
        return {}

    def get_database(self, Name=None, CatalogId=None):
        if Name not in self.databases:
            raise EntityNotFoundException(Name)
        return {"Database": dict(self.databases[Name])}

    def get_databases(self, NextToken=None, CatalogId=None):
        names = sorted(self.databases)
        start = int(NextToken or 0)
        if self.page_size is None:
            page, nxt = names[start:], None
        else:
            page = names[start : start + self.page_size]
            nxt = (
                str(start + self.page_size)
                if start + self.page_size < len(names)
                else None
            )
        out = {"DatabaseList": [dict(self.databases[n]) for n in page]}
        if nxt:
            out["NextToken"] = nxt
        return out

    def delete_database(self, Name=None, CatalogId=None):
        if Name not in self.databases:
            raise EntityNotFoundException(Name)
        del self.databases[Name]
        return {}

    def update_database(self, Name=None, DatabaseInput=None, CatalogId=None):
        if Name not in self.databases:
            raise EntityNotFoundException(Name)
        self.databases[Name] = dict(DatabaseInput)
        return {}

    # -- tables
    def create_table(self, DatabaseName=None, TableInput=None, CatalogId=None):
        if DatabaseName not in self.databases:
            raise EntityNotFoundException(DatabaseName)
        key = (DatabaseName, TableInput["Name"])
        if key in self.tables:
            raise AlreadyExistsException(str(key))
        stored = dict(TableInput)
        stored["DatabaseName"] = DatabaseName
        stored["VersionId"] = "1"
        self.tables[key] = stored
        return {}

    def get_table(self, DatabaseName=None, Name=None, CatalogId=None):
        key = (DatabaseName, Name)
        if key not in self.tables:
            raise EntityNotFoundException(str(key))
        return {"Table": dict(self.tables[key])}

    def get_tables(self, DatabaseName=None, NextToken=None, CatalogId=None):
        if DatabaseName not in self.databases:
            raise EntityNotFoundException(DatabaseName)
        names = sorted(n for d, n in self.tables if d == DatabaseName)
        start = int(NextToken or 0)
        if self.page_size is None:
            page, nxt = names[start:], None
        else:
            page = names[start : start + self.page_size]
            nxt = (
                str(start + self.page_size)
                if start + self.page_size < len(names)
                else None
            )
        out = {
            "TableList": [dict(self.tables[(DatabaseName, n)]) for n in page]
        }
        if nxt:
            out["NextToken"] = nxt
        return out

    def update_table(
        self,
        DatabaseName=None,
        TableInput=None,
        VersionId=None,
        SkipArchive=None,
        CatalogId=None,
    ):
        key = (DatabaseName, TableInput["Name"])
        if key not in self.tables:
            raise EntityNotFoundException(str(key))
        current = self.tables[key]
        self.update_calls.append(
            {"VersionId": VersionId, "SkipArchive": SkipArchive}
        )
        if VersionId is not None and VersionId != current["VersionId"]:
            raise ConcurrentModificationException(str(key))
        stored = dict(TableInput)
        stored["DatabaseName"] = DatabaseName
        stored["VersionId"] = str(int(current["VersionId"]) + 1)
        self.tables[key] = stored
        return {}

    def delete_table(self, DatabaseName=None, Name=None, CatalogId=None):
        key = (DatabaseName, Name)
        if key not in self.tables:
            raise EntityNotFoundException(str(key))
        del self.tables[key]
        return {}


@pytest.fixture()
def glue(tmp_path):
    fake = FakeGlue()
    cat = GlueCatalog(str(tmp_path / "wh"), client=fake)
    cat.create_namespace("db")
    return cat, fake


SCHEMA = Schema.of(
    0,
    NestedField(1, "id", ty.LongType(), required=True),
    NestedField(2, "data", ty.StringType()),
)


def test_glue_table_lifecycle(glue, spark):
    cat, fake = glue
    t = cat.create_table("db.events", SCHEMA)
    params = fake.tables[("db", "events")]["Parameters"]
    assert params[PARAM_TABLE_TYPE] == "ICEBERG"
    assert params[PARAM_METADATA_LOCATION] == t.metadata_location
    # spark write → commit (through GlueCatalog.commit_table) → read back
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, data string"))
    t.refresh()
    assert sorted(
        (r.id, r.data) for r in t.scan().to_df(spark).collect()
    ) == [(1, "a"), (2, "b")]
    # the commit recorded previous_metadata_location and bumped VersionId
    params = fake.tables[("db", "events")]["Parameters"]
    assert params[PARAM_PREV_METADATA_LOCATION]  # the v1 location
    assert fake.tables[("db", "events")]["VersionId"] == "2"
    assert fake.update_calls[-1]["SkipArchive"] is True  # glue.go:65 default

    loaded = cat.load_table("db.events")
    assert loaded.metadata.table_uuid == t.metadata.table_uuid
    assert cat.table_exists("db.events")
    assert not cat.table_exists("db.ghost")
    assert cat.list_tables("db") == [("db", "events")]
    cat.drop_table("db.events")
    assert not cat.table_exists("db.events")
    with pytest.raises(NoSuchTableError):
        cat.drop_table("db.events")


def test_glue_non_iceberg_tables_invisible(glue):
    cat, fake = glue
    cat.create_table("db.ice", SCHEMA)
    # a Hive/CSV table in the same database: listed by Glue, not by us
    fake.tables[("db", "plain_hive")] = {
        "Name": "plain_hive",
        "DatabaseName": "db",
        "TableType": "EXTERNAL_TABLE",
        "Parameters": {"classification": "csv"},
        "VersionId": "1",
    }
    assert cat.list_tables("db") == [("db", "ice")]
    with pytest.raises(NoSuchTableError, match="not an Iceberg table"):
        cat.load_table("db.plain_hive")
    with pytest.raises(NoSuchNamespaceError):
        cat.list_tables("ghost")


def test_glue_commit_conflicts(glue, spark):
    cat, fake = glue
    t = cat.create_table("db.race", SCHEMA)
    df = spark.createDataFrame([(1, "a")], "id long, data string")
    # stale handle: another writer commits first → CommitConflictError
    # at the CAS, and the transaction layer's conflict retry makes the
    # stale handle's append land afterwards (two rows, two snapshots)
    t2 = cat.load_table("db.race")
    t.append(df)
    t2.append(spark.createDataFrame([(2, "b")], "id long, data string"))
    t2.refresh()
    assert t2.scan().count(spark) == 2
    # a Glue-side concurrent bump between get and update maps to
    # CommitConflictError (the transaction retry then succeeds, so call
    # commit_table DIRECTLY to see the raw error)
    t2.refresh()
    real_update = fake.update_table

    def racing_update(**kwargs):
        raise ConcurrentModificationException("boom")

    fake.update_table = racing_update
    from copy import deepcopy

    md = deepcopy(t2.metadata)
    md.properties["x"] = "1"
    with pytest.raises(CommitConflictError, match="concurrent Glue commit"):
        cat.commit_table("db.race", t2.metadata_location, md)
    fake.update_table = real_update
    # stale base: CAS must refuse before even calling update_table
    with pytest.raises(CommitConflictError, match="is stale"):
        cat.commit_table("db.race", "s3://stale/path.json", md)


def test_glue_register_and_rename(glue, tmp_path, spark):
    cat, fake = glue
    src = cat.create_table("db.orig", SCHEMA)
    src.append(spark.createDataFrame([(7, "x")], "id long, data string"))
    src.refresh()
    # adopt the existing metadata under a new name — nothing rewritten
    reg = cat.register_table("db.adopted", src.metadata_location)
    assert reg.metadata.table_uuid == src.metadata.table_uuid
    assert reg.metadata_location == src.metadata_location
    with pytest.raises(TableAlreadyExistsError):
        cat.register_table("db.adopted", src.metadata_location)
    # rename: new Glue object carries the parameters, old one is gone
    cat.create_namespace("db2")
    renamed = cat.rename_table("db.adopted", "db2.moved")
    assert renamed.metadata.table_uuid == src.metadata.table_uuid
    assert ("db", "adopted") not in fake.tables
    assert ("db2", "moved") in fake.tables
    assert [r.id for r in renamed.scan().to_df(spark).collect()] == [7]
    with pytest.raises(NoSuchNamespaceError):
        cat.rename_table("db2.moved", "ghost.x")


def test_glue_rename_rolls_back_on_delete_failure(glue):
    cat, fake = glue
    cat.create_table("db.keep", SCHEMA)
    real_delete = fake.delete_table

    def failing_delete(DatabaseName=None, Name=None, CatalogId=None):
        if Name == "keep":
            raise RuntimeError("transient AWS error")
        return real_delete(DatabaseName=DatabaseName, Name=Name)

    fake.delete_table = failing_delete
    with pytest.raises(RuntimeError, match="transient"):
        cat.rename_table("db.keep", "db.kept2")
    # best-effort rollback removed the half-created target
    assert ("db", "kept2") not in fake.tables
    assert ("db", "keep") in fake.tables


def test_glue_namespaces(tmp_path):
    fake = FakeGlue(page_size=2)
    cat = GlueCatalog(str(tmp_path / "wh"), client=fake)
    cat.create_namespace(
        "sales",
        {"Description": "sales data", "location": "s3://b/sales", "team": "rev"},
    )
    for n in ("a_ns", "b_ns", "c_ns"):
        cat.create_namespace(n)
    # Description/LocationUri become first-class Database fields
    db = fake.databases["sales"]
    assert db["Description"] == "sales data"
    assert db["LocationUri"] == "s3://b/sales"
    assert db["Parameters"] == {"team": "rev"}
    props = cat.load_namespace_properties("sales")
    assert props == {
        "Description": "sales data",
        "location": "s3://b/sales",
        "team": "rev",
    }
    # paginated listing (page_size=2 → 2 pages minimum)
    assert cat.list_namespaces() == ["a_ns", "b_ns", "c_ns", "sales"]
    with pytest.raises(ValueError, match="hierarchical"):
        cat.list_namespaces(parent="sales")
    cat.update_namespace_properties(
        "sales", removals=["team"], updates={"owner": "bi"}
    )
    props = cat.load_namespace_properties("sales")
    assert "team" not in props and props["owner"] == "bi"
    with pytest.raises(ValueError, match="both removals and updates"):
        cat.update_namespace_properties("sales", ["x"], {"x": "1"})
    cat.drop_namespace("a_ns")
    assert not cat.namespace_exists("a_ns")
    with pytest.raises(NoSuchNamespaceError):
        cat.drop_namespace("a_ns")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_namespace("sales")


def test_glue_type_mapping():
    """ref schema.go:95-149 — the full primitive + nested surface."""
    cases = [
        (ty.BooleanType(), "boolean"),
        (ty.IntegerType(), "int"),
        (ty.LongType(), "bigint"),
        (ty.FloatType(), "float"),
        (ty.DoubleType(), "double"),
        (ty.DateType(), "date"),
        (ty.TimeType(), "string"),
        (ty.TimestampType(), "timestamp"),
        (ty.TimestampTzType(), "timestamp"),
        (ty.StringType(), "string"),
        (ty.UUIDType(), "string"),
        (ty.BinaryType(), "binary"),
        (ty.DecimalType(12, 2), "decimal(12,2)"),
        (ty.FixedType(16), "binary(16)"),
    ]
    for t, expected in cases:
        assert glue_type(t) == expected, t
    assert (
        glue_type(
            ty.StructType(
                NestedField(10, "a", ty.LongType()),
                NestedField(11, "b", ty.StringType()),
            )
        )
        == "struct<a:bigint,b:string>"
    )
    assert glue_type(ty.ListType(12, ty.DoubleType())) == "array<double>"
    assert (
        glue_type(ty.MapType(13, ty.StringType(), 14, ty.LongType()))
        == "map<string,bigint>"
    )


def test_glue_columns_merge_current_and_historical(glue, spark):
    """ref schema.go:33-62: current schema's columns win; names only in
    historical schemas ride along flagged current=false; sorted by id."""
    cat, fake = glue
    df = spark.createDataFrame([(1, "x")], "id long, old_name string")
    t = cat.create_table("db.evo", schema_from_spark(df.schema))
    t.update_schema().rename_column("old_name", "new_name").add_column(
        "extra", ty.DoubleType()
    ).commit()
    t.refresh()
    cols = metadata_to_glue_columns(t.metadata)
    by_name = {c["Name"]: c for c in cols}
    assert [c["Name"] for c in cols] == ["id", "new_name", "old_name", "extra"]
    assert by_name["new_name"]["Parameters"][FIELD_CURRENT_KEY] == "true"
    assert by_name["old_name"]["Parameters"][FIELD_CURRENT_KEY] == "false"
    # rename keeps the field id: old and new name share it
    assert (
        by_name["new_name"]["Parameters"][FIELD_ID_KEY]
        == by_name["old_name"]["Parameters"][FIELD_ID_KEY]
    )
    assert by_name["id"]["Parameters"][FIELD_OPTIONAL_KEY] == "true"
    # the committed Glue object carries the merged columns
    stored = fake.tables[("db", "evo")]["StorageDescriptor"]["Columns"]
    assert [c["Name"] for c in stored] == ["id", "new_name", "old_name", "extra"]


def test_glue_in_catalog_registry(tmp_path):
    """ref catalog/registry.go + glue.go:83-92: the glue kind resolves
    through load_catalog like fs/sql/rest."""
    from iceberg_go_distributed_spark.iceberg.catalog import load_catalog

    fake = FakeGlue()
    cat = load_catalog("glue", warehouse=str(tmp_path / "wh"), client=fake)
    assert isinstance(cat, GlueCatalog)
    cat.create_namespace("db")
    cat.create_table("db.t", SCHEMA)
    assert cat.table_exists("db.t")


def test_cli_catalog_switch(tmp_path, monkeypatch):
    """--catalog rest/glue route through load_catalog like the
    reference CLI's switch (main.go:169-199)."""
    import iceberg_go_distributed_spark.cli as cli
    from iceberg_go_distributed_spark.iceberg import catalog as catmod

    seen = {}

    def fake_load(kind, **kwargs):
        seen["kind"], seen["kwargs"] = kind, kwargs
        raise SystemExit(0)  # stop before touching any backend

    monkeypatch.setattr(catmod, "load_catalog", fake_load)
    with pytest.raises(SystemExit):
        cli.main(["--catalog", "glue", "--warehouse", str(tmp_path),
                  "--prop", "glue.region=us-east-1", "list"])
    assert seen["kind"] == "glue"
    assert seen["kwargs"]["properties"] == {"glue.region": "us-east-1"}
    with pytest.raises(SystemExit):
        cli.main(["--catalog", "rest", "--uri", "http://x", "list"])
    assert seen["kind"] == "rest" and seen["kwargs"]["uri"] == "http://x"
    with pytest.raises(SystemExit, match="requires --uri"):
        cli.main(["--catalog", "rest", "list"])
