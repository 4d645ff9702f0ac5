"""Theta-sketch wire format: canonical murmur3 hashing (SMHasher
known-answer verification), compact-sketch round trips in all three
modes, and the statistics-file end-to-end (compute_ndv_statistics
payloads parse as real apache-datasketches-theta-v1 sketches whose
estimates agree with the exact NDV)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_go_distributed_spark.iceberg.theta import (
    _MAX_THETA,
    murmur3_x64_128,
    parse_compact_theta,
    serialize_compact_theta,
    theta_hash_value,
)


def test_murmur3_smhasher_verification():
    """The SMHasher verification procedure pins bit-exactness against
    the canonical MurmurHash3_x64_128: hash keys [0..i-1] with seed
    256-i, hash the concatenated digests with seed 0, and compare the
    low 32 bits to the published constant 0x6384BA69."""
    buf = b""
    for i in range(256):
        h1, h2 = murmur3_x64_128(bytes(range(i)), 256 - i)
        buf += struct.pack("<QQ", h1, h2)
    h1, _ = murmur3_x64_128(buf, 0)
    assert h1 & 0xFFFFFFFF == 0x6384BA69


def test_exact_mode_roundtrip():
    hashes = [theta_hash_value(i) for i in range(1000)]
    blob = serialize_compact_theta(hashes)
    out = parse_compact_theta(blob)
    assert not out["empty"]
    assert out["theta"] == _MAX_THETA
    assert out["count"] == 1000
    assert out["estimate"] == 1000.0
    assert out["hashes"] == sorted(set(hashes))


def test_estimation_mode_roundtrip():
    """More distinct values than k → KMV estimation mode: k retained
    hashes, theta = (k+1)-th smallest, estimate within ~4 RSE of truth
    (RSE = 1/sqrt(k) ≈ 1.6% at k=4096; the check is deterministic)."""
    n = 50_000
    hashes = [theta_hash_value(f"value-{i}") for i in range(n)]
    blob = serialize_compact_theta(hashes)
    out = parse_compact_theta(blob)
    assert out["theta"] < _MAX_THETA
    assert out["count"] == 4096
    assert all(h < out["theta"] for h in out["hashes"])
    assert abs(out["estimate"] - n) / n < 0.065  # 4 × RSE


def test_empty_sketch_roundtrip():
    blob = serialize_compact_theta([])
    assert len(blob) == 8  # single preamble long
    out = parse_compact_theta(blob)
    assert out["empty"] and out["count"] == 0 and out["estimate"] == 0.0


def test_seed_mismatch_rejected():
    blob = serialize_compact_theta([theta_hash_value(1)], seed=9001)
    with pytest.raises(ValueError, match="seed hash"):
        parse_compact_theta(blob, seed=12345)


def test_duplicate_and_zero_hashes_dropped():
    hashes = [0, 5, 5, 7, _MAX_THETA]  # 0 and MAX are never retained
    out = parse_compact_theta(serialize_compact_theta(hashes))
    assert out["hashes"] == [5, 7]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.one_of(st.integers(-(2**62), 2**62), st.text(max_size=40)),
        max_size=300,
    )
)
def test_roundtrip_property(values):
    hashes = [theta_hash_value(v) for v in values]
    out = parse_compact_theta(serialize_compact_theta(hashes))
    distinct = {h for h in hashes if 0 < h < _MAX_THETA}
    assert out["count"] == len(distinct)
    assert out["hashes"] == sorted(distinct)


def test_compute_ndv_statistics_writes_real_sketches(spark, sf_dir, tmp_path):
    """End to end: the statistics Puffin blobs are labeled
    apache-datasketches-theta-v1 AND their payloads parse as compact
    theta sketches whose estimate matches properties.ndv (exact mode at
    test cardinalities)."""
    from iceberg_go_distributed_spark.datasets import load_table
    from iceberg_go_distributed_spark.iceberg.catalog import FileSystemCatalog
    from iceberg_go_distributed_spark.iceberg.puffin import (
        compute_ndv_statistics,
        read_puffin,
    )
    from iceberg_go_distributed_spark.iceberg.types import schema_from_spark

    cat = FileSystemCatalog(str(tmp_path / "wh"))
    li = load_table(spark, sf_dir, "lineitem").limit(800)
    t = cat.create_table("db.li_theta", schema_from_spark(li.schema))
    t.append(li.coalesce(1))
    entry = compute_ndv_statistics(t, spark, columns=["l_orderkey", "l_returnflag"])

    metas, _, payloads = read_puffin(entry["statistics-path"])
    assert {m.type for m in metas} == {"apache-datasketches-theta-v1"}
    for i, m in enumerate(metas):
        out = parse_compact_theta(payloads[i])
        assert out["count"] == int(m.properties["ndv"])  # exact mode here
        assert out["estimate"] == float(m.properties["ndv"])


def test_hash_value_edge_cases():
    """Java-parity edges (ADVICE r5, low): -0.0 hashes like +0.0, every
    NaN payload hashes like the canonical NaN, and ints outside int64
    fall back to str hashing instead of raising executor-side."""
    import struct

    from iceberg_go_distributed_spark.iceberg.theta import theta_hash_value

    assert theta_hash_value(-0.0) == theta_hash_value(0.0)
    weird_nan = struct.unpack("<d", struct.pack("<Q", 0x7FF0000000000001))[0]
    assert theta_hash_value(weird_nan) == theta_hash_value(float("nan"))
    big = 1 << 80
    assert theta_hash_value(big) == theta_hash_value(str(big))
    assert theta_hash_value(-(1 << 80)) == theta_hash_value(str(-(1 << 80)))
    # int64 boundary values still take the long path (≠ their str hash)
    for edge in ((1 << 63) - 1, -(1 << 63)):
        assert theta_hash_value(edge) != theta_hash_value(str(edge))
