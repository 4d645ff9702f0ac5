"""Catalog.register_table across all three backends — ref catalog.go
RegisterTable (REST in the reference; FS/SQL are beyond-ref parity).

The contract: a table written under catalog A is adopted by catalog B
from its current metadata file alone; B's copy scans identically, the
original `location` is preserved (data/manifest paths untouched), and
double registration raises TableAlreadyExistsError.
"""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import (
    FileSystemCatalog,
    NoSuchTableError,
    SqlCatalog,
    TableAlreadyExistsError,
)
from iceberg_go_distributed_spark.iceberg.types import (
    DoubleType,
    LongType,
    NestedField,
    Schema,
)


@pytest.fixture()
def source_table(tmp_path, spark):
    cat = FileSystemCatalog(str(tmp_path / "src_wh"))
    t = cat.create_table(
        "db.src",
        Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(2, "x", DoubleType()),
        ),
    )
    t.append(
        spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 3.0)], "id long, x double")
        .coalesce(1)
    )
    return t


def _rows(t, spark):
    return sorted((r.id, r.x) for r in t.scan().to_df(spark).collect())


def test_register_into_fs_catalog(tmp_path, spark, source_table):
    dst = FileSystemCatalog(str(tmp_path / "dst_wh"))
    reg = dst.register_table("db.adopted", source_table.metadata_location)
    assert _rows(reg, spark) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    # original location preserved: data files still live under src_wh
    assert "src_wh" in reg.metadata.location
    # reload through the catalog works (the copy is the catalog's v1)
    assert _rows(dst.load_table("db.adopted"), spark) == _rows(source_table, spark)
    with pytest.raises(TableAlreadyExistsError):
        dst.register_table("db.adopted", source_table.metadata_location)

    # the adopted table is writable through the new catalog
    reg.append(spark.createDataFrame([(4, 4.0)], "id long, x double").coalesce(1))
    assert len(_rows(dst.load_table("db.adopted"), spark)) == 4
    # and the source catalog's view is unchanged (independent histories)
    assert len(_rows(source_table, spark)) == 3


def test_register_into_sql_catalog(tmp_path, spark, source_table):
    dst = SqlCatalog(str(tmp_path / "cat.db"), str(tmp_path / "sql_wh"))
    dst.create_namespace("db")
    reg = dst.register_table("db.adopted", source_table.metadata_location)
    assert _rows(reg, spark) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    # SQL registration points at the original file — no copy
    assert reg.metadata_location == source_table.metadata_location
    with pytest.raises(TableAlreadyExistsError):
        dst.register_table("db.adopted", source_table.metadata_location)


def test_register_gzip_metadata(tmp_path, spark, source_table):
    """gzip-compressed metadata is valid for the SQL catalog (which
    names versions codec-independently) but the FS catalog rejects
    write.metadata.compression-codec=gzip on every commit — so adopting
    it there must fail AT REGISTRATION, not at the first commit."""
    import gzip

    gz = str(tmp_path / "meta.json.gz")
    with open(source_table.metadata_location, "rb") as f:
        raw = f.read()
    with open(gz, "wb") as f:
        f.write(gzip.compress(raw))
    fs_dst = FileSystemCatalog(str(tmp_path / "gz_wh"))
    with pytest.raises(ValueError, match="gzip"):
        fs_dst.register_table("db.gz", gz)
    # nothing half-adopted: the identifier is still free
    with pytest.raises(NoSuchTableError):
        fs_dst.load_table("db.gz")
    # the SQL catalog CAN adopt it (registration points at the file)
    sql_dst = SqlCatalog(str(tmp_path / "gz_cat.db"), warehouse=str(tmp_path / "gz_sql_wh"))
    sql_dst.create_namespace("db")
    reg = sql_dst.register_table("db.gz", gz)
    assert _rows(reg, spark) == [(1, 1.0), (2, 2.0), (3, 3.0)]
    assert _rows(sql_dst.load_table("db.gz"), spark) == _rows(reg, spark)
