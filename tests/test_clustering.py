"""Sort / z-order layout rewrites (rewrite_data_files strategies).

The payoff under test is PRUNING: after a clustering rewrite, file-level
min/max bounds become selective on the cluster key(s), so the inclusive
metrics evaluator (the same four-level cascade every scan takes) skips
most files for a selective filter — the layout-side half of the
reference's metrics pruning (ref table/scanner.go metrics evaluation),
which matters at 100 TB where pruning is the difference between reading
a few files and reading a partition.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_go_distributed_spark.iceberg import expressions as E
from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
from iceberg_go_distributed_spark.iceberg.partitioning import spec_from
from iceberg_go_distributed_spark.iceberg.types import schema_from_spark


@pytest.fixture()
def fs_catalog(tmp_path):
    return FileSystemCatalog(str(tmp_path / "wh"))


def _xy_df(spark, n=40_000, seed=7):
    """Two independent uniform columns in random row order: before
    clustering, every file spans nearly the full range of BOTH."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("rid"),
            (F.xxhash64(F.col("id"), F.lit(seed)) % 1000).alias("x"),
            (F.xxhash64(F.col("id"), F.lit(seed + 1)) % 1000).alias("y"),
        )
        .select(
            "rid",
            F.abs(F.col("x")).alias("x"),
            F.abs(F.col("y")).alias("y"),
        )
    )


def _xy_table(fs_catalog, spark, name, v3=False, n=40_000):
    df = _xy_df(spark, n)
    t = fs_catalog.create_table(f"db.{name}", schema_from_spark(df.schema))
    if v3:
        t.upgrade_format_version(3)
    t.append(df.repartition(8))  # 8 files, each spanning ~full x and y
    return t, df


BOX = E.and_(
    E.and_(E.greater_than_or_equal("x", 100), E.less_than("x", 220)),
    E.and_(E.greater_than_or_equal("y", 100), E.less_than("y", 220)),
)


def _rows(t, spark, flt=None):
    scan = t.scan(row_filter=flt) if flt is not None else t.scan()
    return sorted(
        (r.rid, r.x, r.y) for r in scan.to_df(spark).collect()
    )


def test_zorder_improves_two_col_pruning(fs_catalog, spark):
    t, _ = _xy_table(fs_catalog, spark, "zorder2")
    before_rows = _rows(t, spark, BOX)
    n_files = len(t.scan().plan_files())
    assert n_files == 8
    # unclustered: the 1.4%-of-space box prunes nothing
    assert len(t.scan(row_filter=BOX).plan_files()) == n_files

    # target size chosen to produce >= 8 output files so pruning has
    # granularity to work with
    total = sum(task.file.file_size_in_bytes for task in t.scan().plan_files())
    assert t.rewrite_data_files(
        spark, target_file_size=max(total // 12, 1), strategy="zorder",
        sort_cols=["x", "y"],
    ) is True
    t.refresh()
    assert t.current_snapshot().summary.operation == "replace"

    after_all = len(t.scan().plan_files())
    after_hit = len(t.scan(row_filter=BOX).plan_files())
    assert after_all >= 8
    # z-order clusters BOTH columns: the box now touches a minority of files
    assert after_hit < after_all / 2, f"{after_hit}/{after_all} files hit"
    # and the rows are bit-identical
    assert _rows(t, spark, BOX) == before_rows


def test_sort_rewrite_prunes_on_sort_key(fs_catalog, spark):
    t, _ = _xy_table(fs_catalog, spark, "sortx")
    flt = E.and_(E.greater_than_or_equal("x", 500), E.less_than("x", 560))
    before_rows = _rows(t, spark, flt)
    assert len(t.scan(row_filter=flt).plan_files()) == 8  # no pruning yet

    total = sum(task.file.file_size_in_bytes for task in t.scan().plan_files())
    assert t.rewrite_data_files(
        spark, target_file_size=max(total // 12, 1), strategy="sort",
        sort_cols=["x"],
    ) is True
    t.refresh()
    after_all = len(t.scan().plan_files())
    after_hit = len(t.scan(row_filter=flt).plan_files())
    # a 6% x-range over a sorted layout touches ~1-2 files
    assert after_hit <= max(2, after_all // 4), f"{after_hit}/{after_all}"
    assert _rows(t, spark, flt) == before_rows
    # disjoint-ish bounds: files ordered by lower bound must not overlap
    # beyond adjacent boundaries
    from iceberg_go_distributed_spark.iceberg.conversions import from_bytes
    from iceberg_go_distributed_spark.iceberg.types import LongType

    xid = next(f.field_id for f in t.metadata.current_schema().fields if f.name == "x")
    bounds = sorted(
        (
            from_bytes(LongType(), task.file.lower_bounds[xid]),
            from_bytes(LongType(), task.file.upper_bounds[xid]),
        )
        for task in t.scan().plan_files()
    )
    for (lo1, hi1), (lo2, _hi2) in zip(bounds, bounds[1:]):
        assert lo2 >= lo1 and hi1 <= bounds[-1][1]
        assert lo2 >= hi1 or hi1 - lo2 <= 1, f"overlapping files: {bounds}"


def test_zorder_materializes_deletes_and_preserves_lineage(fs_catalog, spark):
    t, _ = _xy_table(fs_catalog, spark, "zorder_v3", v3=True, n=10_000)
    t.delete_where(spark, E.less_than("rid", 500))
    before = {
        r.rid: (r._row_id, r._last_updated_sequence_number)
        for r in t.scan().with_row_lineage().to_df(spark).collect()
    }
    assert t.rewrite_data_files(spark, strategy="zorder", sort_cols=["x", "y"]) is True
    t.refresh()
    after = {
        r.rid: (r._row_id, r._last_updated_sequence_number)
        for r in t.scan().with_row_lineage().to_df(spark).collect()
    }
    assert after == before  # exact lineage through the layout rewrite
    assert all(not task.delete_files for task in t.scan().plan_files())


def test_sort_rewrite_partitioned_clusters_within_partitions(fs_catalog, spark):
    df = _xy_df(spark, 20_000).withColumn("bucket", F.pmod(F.col("rid"), F.lit(4)))
    schema = schema_from_spark(df.schema)
    t = fs_catalog.create_table(
        "db.sort_part", schema, spec=spec_from(schema, ("bucket", "identity"))
    )
    t.append(df.repartition(8))
    flt = E.and_(
        E.equal("bucket", 2),
        E.and_(E.greater_than_or_equal("x", 500), E.less_than("x", 560)),
    )
    before_rows = _rows_part(t, spark, flt)
    total = sum(task.file.file_size_in_bytes for task in t.scan().plan_files())
    assert t.rewrite_data_files(
        spark, target_file_size=max(total // 16, 1), strategy="sort",
        sort_cols=["x"],
    ) is True
    t.refresh()
    # partition pruning still works AND the x-range prunes within it
    bucket2_files = len(t.scan(row_filter=E.equal("bucket", 2)).plan_files())
    hit = len(t.scan(row_filter=flt).plan_files())
    all_files = len(t.scan().plan_files())
    assert bucket2_files < all_files  # partition pruning intact
    assert hit < bucket2_files  # sort-key pruning inside the partition
    assert _rows_part(t, spark, flt) == before_rows


def _rows_part(t, spark, flt):
    return sorted(
        (r.rid, r.x, r.y, r.bucket)
        for r in t.scan(row_filter=flt).to_df(spark).collect()
    )


def test_sort_rewrite_stamps_declared_sort_order(fs_catalog, spark):
    from iceberg_go_distributed_spark.iceberg.metadata import SortField, SortOrder
    from iceberg_go_distributed_spark.iceberg.transaction import (
        AddSortOrderUpdate,
        SetDefaultSortOrder,
    )

    t, _ = _xy_table(fs_catalog, spark, "sort_declared", n=5_000)
    xid = next(f.field_id for f in t.metadata.current_schema().fields if f.name == "x")
    order = SortOrder(order_id=1, fields=(SortField(source_id=xid),))
    tx = t.transaction()
    tx.apply([AddSortOrderUpdate(order), SetDefaultSortOrder(1)], [])
    tx.commit()
    t.refresh()
    assert t.metadata.default_sort_order_id == 1

    assert t.rewrite_data_files(spark, strategy="sort", sort_cols=["x"]) is True
    t.refresh()
    for task in t.scan().plan_files():
        assert task.file.sort_order_id == 1


def test_clustering_rejects_bad_arguments(fs_catalog, spark):
    t, _ = _xy_table(fs_catalog, spark, "zorder_bad", n=1_000)
    with pytest.raises(ValueError, match="expected binpack"):
        t.rewrite_data_files(spark, strategy="cluster", sort_cols=["x"])
    with pytest.raises(ValueError, match="requires sort_cols"):
        t.rewrite_data_files(spark, strategy="zorder")
    with pytest.raises(ValueError, match="at least 2"):
        t.rewrite_data_files(spark, strategy="zorder", sort_cols=["x"])
    with pytest.raises(ValueError, match="at most 4"):
        t.rewrite_data_files(
            spark, strategy="zorder", sort_cols=["x", "y", "rid", "x", "y"]
        )
    with pytest.raises(ValueError, match="not in schema"):
        t.rewrite_data_files(spark, strategy="zorder", sort_cols=["x", "nope"])


def test_zorder_rejects_binary_columns(fs_catalog, spark):
    df = _xy_df(spark, 1_000).withColumn(
        "b", F.encode(F.col("rid").cast("string"), "UTF-8")
    )
    t = fs_catalog.create_table("db.zorder_bin", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    with pytest.raises(ValueError, match="unsupported type"):
        t.rewrite_data_files(spark, strategy="zorder", sort_cols=["x", "b"])


def test_zorder_string_column_prunes(fs_catalog, spark):
    """Z-order on a STRING key (url/domain/lang — the text-corpus
    clustering shape): the fixed-width 7-byte big-endian prefix encoding
    slots strings into the bit interleave, so a string-range filter
    prunes files after the rewrite. Null strings must survive (they
    normalize to 0, like null numerics)."""
    rows = [
        (
            i,
            None if i % 97 == 0 else f"{chr(97 + (i * 7) % 26)}-{i % 50:02d}.example.com",
            (i * 13) % 1000,
        )
        for i in range(40_000)
    ]
    df = spark.createDataFrame(rows, "rid long, dom string, y long")
    t = fs_catalog.create_table("db.zorder_dom", schema_from_spark(df.schema))
    t.append(df.repartition(8))  # 8 files, each spanning the full domain space
    n_files = len(t.scan().plan_files())
    assert n_files == 8

    box = E.and_(
        E.and_(E.greater_than_or_equal("dom", "m"), E.less_than("dom", "o")),
        E.and_(E.greater_than_or_equal("y", 0), E.less_than("y", 120)),
    )
    before = sorted(
        (r.rid, r.dom, r.y) for r in t.scan(row_filter=box).to_df(spark).collect()
    )
    assert len(t.scan(row_filter=box).plan_files()) == n_files  # no pruning yet

    total = sum(task.file.file_size_in_bytes for task in t.scan().plan_files())
    assert t.rewrite_data_files(
        spark, target_file_size=max(total // 12, 1), strategy="zorder",
        sort_cols=["dom", "y"],
    ) is True
    t.refresh()
    after_all = len(t.scan().plan_files())
    after_hit = len(t.scan(row_filter=box).plan_files())
    assert after_all >= 8
    assert after_hit < after_all / 2, f"{after_hit}/{after_all} files hit"
    after = sorted(
        (r.rid, r.dom, r.y) for r in t.scan(row_filter=box).to_df(spark).collect()
    )
    assert after == before
    # null domains survived the rewrite
    assert t.scan(row_filter=E.is_null("dom")).to_df(spark).count() == sum(
        1 for _, d, _ in rows if d is None
    )


def test_zorder_string_prefix_encoding_property(spark):
    """Property: the JVM prefix encoding (hex/conv string functions, no
    UDF) is byte-identical to the driver-side twin, and monotone in
    lexicographic UTF-8 byte order on the 7-byte prefix — the invariant
    that makes string min/max normalization sound."""
    import random

    rng = random.Random(0x5EED)
    alphabet = "abcxyz09-._/üß€日"
    samples = [""] + [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    P = 7
    hx = F.hex(F.substring(F.encode(F.col("s"), "UTF-8"), 1, P))
    num = F.conv(F.rpad(hx, 2 * P, "0"), 16, 10).cast("long")
    got = {r.s: r.n for r in df.select("s", num.alias("n")).collect()}

    def twin(s):
        b = s.encode("utf-8")[:P]
        return int.from_bytes(b.ljust(P, b"\x00"), "big")

    for s in samples:
        assert got[s] == twin(s), s
    ordered = sorted(set(samples), key=lambda s: s.encode("utf-8")[:P])
    nums = [twin(s) for s in ordered]
    assert nums == sorted(nums)


# ------------------------------------------------- metadata-only MIN/MAX
# (here because the fixtures match: bound-bearing tables under a fresh
# catalog; the positive path is driver-verified via ice_metadata_minmax)

def test_min_max_refusals(fs_catalog, spark):
    import math

    from iceberg_go_distributed_spark.iceberg import expressions as E

    df = _xy_df(spark, 2_000).withColumn("s", F.col("rid").cast("string"))
    t = fs_catalog.create_table("db.mm", schema_from_spark(df.schema))
    t.append(df.coalesce(2))

    # positive: matches the full scan
    mm = t.scan().min_max(spark, "x", "y")
    got = t.scan().to_df(spark).agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    assert (mm["x"][0], mm["x"][1], mm["y"][0], mm["y"][1]) == tuple(got)

    with pytest.raises(ValueError, match="truncated"):
        t.scan().min_max(spark, "s")
    with pytest.raises(ValueError, match="unknown column"):
        t.scan().min_max(spark, "nope")
    with pytest.raises(ValueError, match="filter-free"):
        t.scan(row_filter=E.greater_than("x", 10)).min_max(spark, "x")

    # deletes make the fold unsound: refuse
    t2 = fs_catalog.create_table("db.mm_del", schema_from_spark(df.schema))
    t2.upgrade_format_version(3)
    t2.append(df.coalesce(1))
    t2.delete_where(spark, E.greater_than("x", 900))
    with pytest.raises(ValueError, match="delete files"):
        t2.scan().min_max(spark, "x")

    # NaNs poison min/max: refuse
    nan_df = spark.createDataFrame(
        [(1, 1.0), (2, float("nan"))], "id long, v double"
    )
    t3 = fs_catalog.create_table("db.mm_nan", schema_from_spark(nan_df.schema))
    t3.append(nan_df.coalesce(1))
    with pytest.raises(ValueError, match="NaN"):
        t3.scan().min_max(spark, "v")
    assert math.isnan(
        t3.scan().to_df(spark).agg(F.max("v")).collect()[0][0]
    )  # the refusal was load-bearing

    # metrics mode none drops bounds: refuse rather than guess
    t4 = fs_catalog.create_table(
        "db.mm_none",
        schema_from_spark(_xy_df(spark, 100).schema),
        properties={"write.metadata.metrics.default": "none"},
    )
    t4.append(_xy_df(spark, 100).coalesce(1))
    with pytest.raises(ValueError, match="no bounds"):
        t4.scan().min_max(spark, "x")


def test_plan_report_counters(fs_catalog, spark):
    """plan_report: per-level pruning counters are arithmetically
    consistent and attribute skips to the right level."""
    df = _xy_df(spark, 20_000).withColumn("bucket", F.pmod(F.col("rid"), F.lit(4)))
    schema = schema_from_spark(df.schema)
    t = fs_catalog.create_table(
        "db.report", schema, spec=spec_from(schema, ("bucket", "identity"))
    )
    # one append per bucket → partition-disjoint manifests
    for b in range(4):
        t.append(df.where(F.col("bucket") == b).coalesce(2))

    full = t.scan().plan_report()
    assert full["manifests_pruned"] == 0 and full["entries_pruned_metrics"] == 0
    assert full["files_planned"] == len(t.scan().plan_files())
    assert full["records_planned"] == 20_000

    # a partition filter prunes at the manifest level (summaries cover it)
    rep = t.scan(row_filter=E.equal("bucket", 2)).plan_report()
    assert rep["manifests_pruned"] > 0
    assert rep["files_planned"] < full["files_planned"]
    assert (
        rep["entries_total"]
        == rep["entries_pruned_partition"]
        + rep["entries_pruned_metrics"]
        + rep["files_planned"]
    )
    assert rep["records_planned"] == 5_000

    # a data-column filter survives levels 1-3 and prunes on metrics only
    # after clustering
    t2, _ = _xy_table(fs_catalog, spark, "report2")
    flt = E.and_(E.greater_than_or_equal("x", 500), E.less_than("x", 540))
    before = t2.scan(row_filter=flt).plan_report()
    assert before["entries_pruned_metrics"] == 0  # unclustered: no skips
    total = sum(k.file.file_size_in_bytes for k in t2.scan().plan_files())
    t2.rewrite_data_files(
        spark, target_file_size=max(total // 12, 1), strategy="sort",
        sort_cols=["x"],
    )
    t2.refresh()
    after = t2.scan(row_filter=flt).plan_report()
    assert after["entries_pruned_metrics"] > 0  # clustering made level 4 bite
    assert after["bytes_planned"] < before["bytes_planned"]

    # deletes show up as matched delete files
    t3, _ = _xy_table(fs_catalog, spark, "report3", v3=True, n=2_000)
    t3.delete_where(spark, E.less_than("rid", 100))
    rep3 = t3.scan().plan_report()
    assert rep3["delete_files_matched"] > 0


def test_zvalue_interleave_properties(fs_catalog, spark):
    """The z-value must be monotone in each dimension with the others
    fixed (what makes a range partition on it cluster every dimension),
    and distinct grid cells must map to distinct z-values (no bit
    collisions between interleaved columns)."""
    from iceberg_go_distributed_spark.iceberg.write import _cluster_expr

    df = spark.createDataFrame(
        [(x, y) for x in range(0, 1000, 125) for y in range(0, 1000, 125)],
        "x long, y long",
    )
    t = fs_catalog.create_table("db.zprops", schema_from_spark(df.schema))
    t.append(df.coalesce(1))
    victims = t.scan().plan_files()
    [z] = _cluster_expr(df, victims, t.metadata.current_schema(), ["x", "y"], "zorder")
    rows = df.select("x", "y", z).collect()
    zmap = {(r.x, r.y): r["__zval"] for r in rows}
    xs = sorted({r.x for r in rows})
    ys = sorted({r.y for r in rows})
    for y in ys:  # monotone in x with y fixed
        vals = [zmap[(x, y)] for x in xs]
        assert vals == sorted(vals), f"x-monotonicity broken at y={y}"
    for x in xs:  # monotone in y with x fixed
        vals = [zmap[(x, y)] for y in ys]
        assert vals == sorted(vals), f"y-monotonicity broken at x={x}"
    assert len(set(zmap.values())) == len(zmap), "grid cells collided"
    assert all(v >= 0 for v in zmap.values()), "sign bit leaked"


def test_zorder_tolerates_null_cluster_values(fs_catalog, spark):
    """Null values in a z-order column normalize to bucket 0 (layout
    choice only): the rewrite succeeds and no row is lost or mutated."""
    df = spark.createDataFrame(
        [(i, None if i % 10 == 0 else i % 100, (i * 7) % 100) for i in range(2_000)],
        "rid long, x long, y long",
    )
    t = fs_catalog.create_table("db.zorder_null", schema_from_spark(df.schema))
    t.append(df.repartition(4))
    before = sorted((r.rid, r.x, r.y) for r in t.scan().to_df(spark).collect())
    assert t.rewrite_data_files(spark, strategy="zorder", sort_cols=["x", "y"]) is True
    t.refresh()
    after = sorted((r.rid, r.x, r.y) for r in t.scan().to_df(spark).collect())
    assert after == before


def test_sample_files(fs_catalog, spark):
    """File-level sampling: deterministic, nested across fractions,
    prunes first, refuses MOR ambiguity."""
    t, _ = _xy_table(fs_catalog, spark, "sampler", n=32_000)  # 8 files
    all_rows = t.scan().to_df(spark).count()

    s3a = set(t.scan().sample_files(spark, 0.4, seed=3).inputFiles())
    s3b = set(t.scan().sample_files(spark, 0.4, seed=3).inputFiles())
    assert s3a == s3b and 0 < len(s3a) < 8  # deterministic, proper subset
    s6 = set(t.scan().sample_files(spark, 0.8, seed=3).inputFiles())
    assert s3a <= s6  # nested: growing the fraction only adds files
    n = t.scan().sample_files(spark, 0.4, seed=3).count()
    assert 0 < n < all_rows

    # pruning applies before sampling: a filtered scan samples survivors
    flt = E.and_(E.greater_than_or_equal("x", 0), E.less_than("x", 2000))
    assert t.scan(row_filter=flt).sample_files(spark, 1.0).count() == all_rows

    # tiny fraction still returns at least one file
    assert t.scan().sample_files(spark, 1e-9).count() > 0

    with pytest.raises(ValueError, match="fraction"):
        t.scan().sample_files(spark, 0.0)

    t2, _ = _xy_table(fs_catalog, spark, "sampler_mor", v3=True, n=4_000)
    t2.delete_where(spark, E.less_than("rid", 10))
    with pytest.raises(ValueError, match="merge-on-read"):
        t2.scan().sample_files(spark, 0.5)
