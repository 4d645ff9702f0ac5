"""Cross-engine wire-format validation (SURVEY §5.4 inverted): another
independent Iceberg implementation reads tables THIS engine wrote and
must see identical rows. pyiceberg is the public reference reader;
the whole module skips when it is not installed (it is not baked into
the CI container — no network, no installs — but the test is the
strongest possible format proof wherever pyiceberg exists)."""

from __future__ import annotations

import pytest

pyiceberg = pytest.importorskip("pyiceberg")

from pyiceberg.table import StaticTable  # noqa: E402

from iceberg_go_distributed_spark.iceberg import expressions as E  # noqa: E402
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog  # noqa: E402

from tests.test_table_e2e import LINEITEM_SCHEMA  # noqa: E402


@pytest.fixture()
def fs_catalog(tmp_path):
    return FileSystemCatalog(str(tmp_path / "warehouse"))


@pytest.fixture()
def lineitem_df(spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    return load_table(spark, sf_dir, "lineitem")


def _pyiceberg_rows(table, column="l_orderkey"):
    st = StaticTable.from_metadata(table.metadata_location)
    return sorted(st.scan().to_arrow()[column].to_pylist())


def _our_rows(table, spark, column="l_orderkey"):
    return sorted(
        r[0] for r in table.scan().to_df(spark).select(column).collect()
    )


def test_pyiceberg_reads_unpartitioned_v2(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.xe_plain", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(150).coalesce(1))
    assert _pyiceberg_rows(t) == _our_rows(t, spark)


def test_pyiceberg_reads_partitioned_fanout(fs_catalog, spark, lineitem_df):
    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

    spec = spec_from(LINEITEM_SCHEMA, ("l_shipdate", "year"))
    t = fs_catalog.create_table("db.xe_part", LINEITEM_SCHEMA, spec=spec)
    t.append(lineitem_df.limit(300))
    assert _pyiceberg_rows(t) == _our_rows(t, spark)


def test_pyiceberg_reads_positional_deletes(fs_catalog, spark, lineitem_df):
    t = fs_catalog.create_table("db.xe_del", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(200).coalesce(1))
    t.delete_where(spark, E.greater_than("l_quantity", 45.0))
    assert _pyiceberg_rows(t) == _our_rows(t, spark)
