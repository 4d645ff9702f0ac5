"""Puffin statistics files: the container format + NDV collection.

Implements the Puffin spec's binary layout (magic `PFA1`, concatenated
blobs, JSON footer with blob metadata, footer size + flags + trailing
magic) so files we write are structurally valid for any Puffin reader.

INTEROP NOTE (NDV consumption path). Iceberg engines that use NDV for
cost-based planning (Trino, Spark, the reference's statistics.go parse)
read the distinct count from the statistics entry's
``blob-metadata[].properties.ndv`` string — they do NOT need to
deserialize the blob payload. We put the exact NDV in
``properties.ndv`` (the consumed field; `test_ndv_properties_consumption`
pins that path) AND write the payload as a genuine
``apache-datasketches-theta-v1`` compact sketch (theta.py implements
the public serial-version-3 wire format with canonical
murmur3-x64-128 hashing, pinned bit-exact by the SMHasher verification
value in tests), so engines that merge sketches across snapshots can
consume the blobs too.

ref table/statistics.go:26-90 (StatisticsFile metadata entries, which
`Table.compute_statistics` fills in via SetStatistics).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass, field
from typing import Optional

MAGIC = b"PFA1"
FLAG_FOOTER_COMPRESSED = 0x01  # we always write uncompressed footers


@dataclass
class BlobMetadata:
    type: str
    fields: list[int]
    snapshot_id: int
    sequence_number: int
    offset: int = 0
    length: int = 0
    properties: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        out = {
            "type": self.type,
            "fields": self.fields,
            "snapshot-id": self.snapshot_id,
            "sequence-number": self.sequence_number,
            "offset": self.offset,
            "length": self.length,
        }
        if self.properties:
            out["properties"] = self.properties
        return out

    @staticmethod
    def from_json(obj: dict) -> "BlobMetadata":
        return BlobMetadata(
            type=obj["type"],
            fields=list(obj.get("fields", [])),
            snapshot_id=obj.get("snapshot-id", 0),
            sequence_number=obj.get("sequence-number", 0),
            offset=obj.get("offset", 0),
            length=obj.get("length", 0),
            properties=obj.get("properties", {}),
        )


def write_puffin(
    path: str,
    blobs: list[tuple[BlobMetadata, bytes]],
    properties: Optional[dict] = None,
) -> dict:
    """Write a Puffin file; returns {size, footer_size} for the
    metadata statistics entry."""
    from . import fileio

    with fileio.open_output(path) as f:
        f.write(MAGIC)
        metas = []
        for meta, payload in blobs:
            meta.offset = f.tell()
            meta.length = len(payload)
            f.write(payload)
            metas.append(meta)
        footer_payload = json.dumps(
            {"blobs": [m.to_json() for m in metas], "properties": properties or {}}
        ).encode()
        footer_start = f.tell()
        f.write(MAGIC)
        f.write(footer_payload)
        f.write(struct.pack("<i", len(footer_payload)))
        f.write(struct.pack("<i", 0))  # flags: uncompressed footer
        f.write(MAGIC)
        size = f.tell()
    return {"size": size, "footer_size": size - footer_start}


def read_puffin(path: str) -> tuple[list[BlobMetadata], dict, dict[int, bytes]]:
    """Returns (blob metadatas, file properties, payloads by index)."""
    from . import fileio

    data = fileio.read_bytes(path)
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise ValueError("not a puffin file (bad magic)")
    flags = struct.unpack("<i", data[-8:-4])[0]
    if flags & FLAG_FOOTER_COMPRESSED:
        raise ValueError("compressed puffin footers not supported")
    payload_size = struct.unpack("<i", data[-12:-8])[0]
    footer_payload = data[-12 - payload_size : -12]
    footer = json.loads(footer_payload)
    metas = [BlobMetadata.from_json(b) for b in footer.get("blobs", [])]
    payloads = {
        i: data[m.offset : m.offset + m.length] for i, m in enumerate(metas)
    }
    return metas, footer.get("properties", {}), payloads


# ------------------------------------------------------- deletion vectors

# Iceberg v3 `deletion-vector-v1` blob layout (Iceberg spec, Deletion
# Vectors): u32 BE length of (magic + vector), 4 magic bytes D1 D3 39 64,
# the 64-bit portable Roaring bitmap, u32 BE CRC-32 of (magic + vector).
# DataFile.content_offset points at the length word; content_size_in_bytes
# covers the whole framed blob.
DV_MAGIC = b"\xd1\xd3\x39\x64"


def serialize_deletion_vector(positions) -> bytes:
    """Frame sorted deleted-row positions as a `deletion-vector-v1` blob."""
    import zlib

    from .roaring import serialize_portable64

    body = DV_MAGIC + serialize_portable64(positions)
    return (
        struct.pack(">I", len(body)) + body + struct.pack(">I", zlib.crc32(body))
    )


def parse_deletion_vector(blob: bytes):
    """Decode a `deletion-vector-v1` blob → sorted uint64 positions.
    Verifies framing and CRC so a truncated/corrupt vector fails loudly
    (deleting the wrong rows is silent data corruption)."""
    import zlib

    from .roaring import deserialize_portable64

    (length,) = struct.unpack_from(">I", blob, 0)
    body = blob[4 : 4 + length]
    if len(body) != length:
        raise ValueError("deletion vector truncated")
    if body[:4] != DV_MAGIC:
        raise ValueError("bad deletion-vector magic")
    (crc,) = struct.unpack_from(">I", blob, 4 + length)
    if zlib.crc32(body) != crc:
        raise ValueError("deletion vector CRC mismatch")
    return deserialize_portable64(body[4:])


def read_deletion_vector(path: str, offset: int, size: int):
    """Read one DV from a puffin file by manifest pointer
    (referenced via DataFile.content_offset/content_size_in_bytes)."""
    from . import fileio

    with fileio.open_input(path) as f:
        f.seek(offset)
        blob = f.read(size)
    if len(blob) != size:
        raise ValueError(f"short read of deletion vector at {path}:{offset}")
    return parse_deletion_vector(blob)


def _column_theta_hashes(df, c: str, k: int) -> list:
    """The <= k+1 smallest DataSketches update hashes of the column's
    distinct values. Hashing runs executor-side over the distinct frame
    (per-value Python, but only on distinct values of a maintenance
    pass); the k+1-smallest selection is a distributed TakeOrdered, so
    the driver receives at most k+1 longs no matter the column's
    cardinality."""
    import pandas as pd
    from pyspark.sql import functions as F

    from .theta import theta_hash_value

    def hash_part(batches):
        for pdf in batches:
            vals = pdf[c].dropna().unique()
            yield pd.DataFrame(
                {"h": [theta_hash_value(v) for v in vals]}, dtype="int64"
            )

    hashed = df.select(c).distinct().mapInPandas(hash_part, "h bigint")
    return [r.h for r in hashed.where(F.col("h") > 0).orderBy("h").limit(k + 1).collect()]


def compute_ndv_statistics(table, spark, columns: Optional[list[str]] = None) -> dict:
    """Compute per-column NDVs for the current snapshot, write one
    Puffin file of `apache-datasketches-theta-v1` blobs (exact NDV in
    properties.ndv, a real compact theta sketch as the payload), and
    commit a SetStatistics entry. Returns the entry."""
    import os

    from pyspark.sql import functions as F

    from .theta import DEFAULT_LG_K, serialize_compact_theta
    from .transaction import AssertTableUUID, SetStatistics

    md = table.metadata
    snap = md.current_snapshot()
    if snap is None:
        raise ValueError("table has no snapshot to analyze")
    schema = md.current_schema()
    cols = columns or [f.name for f in schema.fields if f.field_type.is_primitive()]
    df = table.scan().to_df(spark)
    row = df.agg(
        *[F.countDistinct(F.col(c)).alias(c) for c in cols]
    ).first()
    by_name = {f.name: f.field_id for f in schema.fields}
    blobs = []
    for c in cols:
        ndv = int(row[c])
        hashes = _column_theta_hashes(df, c, 1 << DEFAULT_LG_K)
        blobs.append(
            (
                BlobMetadata(
                    type="apache-datasketches-theta-v1",
                    fields=[by_name[c]],
                    snapshot_id=snap.snapshot_id,
                    sequence_number=snap.sequence_number,
                    properties={"ndv": str(ndv)},
                ),
                serialize_compact_theta(hashes),
            )
        )
    from . import fileio

    path = os.path.join(
        md.location, "metadata", f"stats-{snap.snapshot_id}.puffin"
    )
    fileio.makedirs(os.path.dirname(path))
    info = write_puffin(path, blobs, {"created-by": "iceberg_go_distributed_spark"})
    entry = {
        "snapshot-id": snap.snapshot_id,
        "statistics-path": path,
        "file-size-in-bytes": info["size"],
        "file-footer-size-in-bytes": info["footer_size"],
        "blob-metadata": [m.to_json() for m, _ in blobs],
    }
    tx = table.transaction()
    tx.apply([SetStatistics(entry)], [AssertTableUUID(md.table_uuid)])
    tx.commit()
    return entry
