"""Apache DataSketches compact theta sketch — wire-format writer/reader.

Implements the public serialization (serial version 3, family COMPACT)
documented at datasketches.apache.org and fixed by the Java/C++
implementations, so the `apache-datasketches-theta-v1` Puffin blobs we
write (table/statistics.go:26-31 names the type; the reference never
deserializes payloads) are parseable by real DataSketches consumers:

    Long 0   byte 0   preamble longs (1 empty / 2 exact / 3 estimation)
             byte 1   serial version = 3
             byte 2   family id = 3 (COMPACT)
             byte 3   lgNomLongs (informational for compact)
             byte 4   lgArrLongs (unused for compact, 0)
             byte 5   flags: 1=BIG_ENDIAN 2=READ_ONLY 4=EMPTY 8=COMPACT
                      16=ORDERED
             bytes 6-7 seed hash (low 16 bits of murmur3(seed, seed=0))
    Long 1   bytes 8-11 retained-entry count, 12-15 float p (1.0)
    Long 2   thetaLong (only in estimation mode, preLongs = 3)
    then     retained hash longs, ascending, little-endian

Hashing is canonical MurmurHash3 x64 128 (Austin Appleby's public
domain algorithm; bit-exactness is pinned by the SMHasher verification
value 0x6384BA69 in tests) with the DataSketches default seed 9001;
update values are the first 64 output bits right-shifted by one
(unsigned) per the DataSketches convention. Long values hash as their
8 little-endian bytes, strings as UTF-8 bytes (the cross-language
convention shared with the C++ implementation).

The sketch we build is KMV-style: if NDV <= k every hash is retained
and theta = 2^63 - 1 (exact mode, estimate == NDV); otherwise the k
smallest hashes are retained and thetaLong = the (k+1)-th smallest
(estimation mode, relative standard error ~ 1/sqrt(k)).
"""

from __future__ import annotations

import struct

DEFAULT_SEED = 9001
DEFAULT_LG_K = 12  # k = 4096 → RSE ≈ 1.6%
_MAX_THETA = (1 << 63) - 1  # Long.MAX_VALUE

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Canonical MurmurHash3_x64_128 (public domain algorithm)."""
    h1 = seed & _M64
    h2 = seed & _M64
    length = len(data)
    n_blocks = length // 16
    for i in range(n_blocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= _M64
        k2 &= _M64
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64

    tail = data[n_blocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t > 8:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def theta_hash_bytes(data: bytes, seed: int = DEFAULT_SEED) -> int:
    """DataSketches update hash: first 64 murmur bits, unsigned >> 1.
    Returns a value in [0, 2^63); 0 is excluded by callers (the library
    never retains hash 0)."""
    return murmur3_x64_128(data, seed)[0] >> 1


def theta_hash_value(v) -> int:
    """Hash one column value with the type conventions documented in the
    module header. Bytes pass through; ints hash as 8-byte LE longs;
    floats as their 8-byte LE double bits; everything else as the UTF-8
    of str(v).

    Java-parity edges: update(double) canonicalizes -0.0 to +0.0 before
    doubleToLongBits, so sketches merge consistently across engines; a
    Python int outside int64 (no Java update() accepts one — it would be
    a BigInteger) falls back to the str convention instead of raising
    executor-side and failing the whole statistics job."""
    if isinstance(v, bytes):
        data = v
    elif isinstance(v, bool):
        data = struct.pack("<q", int(v))
    elif isinstance(v, int):
        if -(1 << 63) <= v < (1 << 63):
            data = struct.pack("<q", v)
        else:
            data = str(v).encode("utf-8")
    elif isinstance(v, float):
        if v != v:  # all NaN payloads → Java doubleToLongBits canonical NaN
            data = struct.pack("<Q", 0x7FF8000000000000)
        else:
            if v == 0.0:
                v = 0.0  # canonicalize -0.0 (Java update(double) parity)
            data = struct.pack("<d", v)
    else:
        data = str(v).encode("utf-8")
    return theta_hash_bytes(data)


def _seed_hash(seed: int) -> int:
    sh = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if sh == 0:
        raise ValueError(f"seed {seed} hashes to 0; choose another seed")
    return sh


_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16


def serialize_compact_theta(
    hashes, lg_k: int = DEFAULT_LG_K, seed: int = DEFAULT_SEED
) -> bytes:
    """Serialize pre-computed update hashes as an ordered compact theta
    sketch. `hashes` may contain duplicates/unsorted values; retention
    and theta follow the KMV rule described in the module header."""
    k = 1 << lg_k
    uniq = sorted({int(h) for h in hashes if 0 < int(h) < _MAX_THETA})
    if len(uniq) > k:
        theta = uniq[k]
        retained = uniq[:k]
    else:
        theta = _MAX_THETA
        retained = uniq
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if not retained:
        flags |= _FLAG_EMPTY
        return struct.pack("<BBBBBBH", 1, 3, 3, lg_k, 0, flags, _seed_hash(seed))
    estimation = theta != _MAX_THETA
    pre_longs = 3 if estimation else 2
    out = [
        struct.pack("<BBBBBBH", pre_longs, 3, 3, lg_k, 0, flags, _seed_hash(seed)),
        struct.pack("<if", len(retained), 1.0),
    ]
    if estimation:
        out.append(struct.pack("<q", theta))
    out.extend(struct.pack("<q", h) for h in retained)
    return b"".join(out)


def parse_compact_theta(blob: bytes, seed: int = DEFAULT_SEED) -> dict:
    """Independent reader for the same format: returns
    {count, theta, hashes, estimate, empty}. Raises on malformed input
    or a seed-hash mismatch (a sketch hashed with another seed must not
    be silently combined)."""
    if len(blob) < 8:
        raise ValueError("theta sketch too short")
    pre_longs, ser_ver, family, lg_k, _, flags, seed_hash = struct.unpack_from(
        "<BBBBBBH", blob, 0
    )
    if ser_ver != 3:
        raise ValueError(f"unsupported theta serial version {ser_ver}")
    if family != 3:
        raise ValueError(f"not a compact theta sketch (family {family})")
    if seed_hash != _seed_hash(seed):
        raise ValueError("theta sketch seed hash mismatch")
    if flags & _FLAG_EMPTY or pre_longs == 1:
        return {"count": 0, "theta": _MAX_THETA, "hashes": [], "estimate": 0.0,
                "empty": True}
    count, _p = struct.unpack_from("<if", blob, 8)
    if pre_longs == 3:
        (theta,) = struct.unpack_from("<q", blob, 16)
        off = 24
    elif pre_longs == 2:
        theta = _MAX_THETA
        off = 16
    else:
        raise ValueError(f"unsupported preamble longs {pre_longs}")
    need = off + 8 * count
    if len(blob) < need:
        raise ValueError("theta sketch truncated")
    hashes = list(struct.unpack_from(f"<{count}q", blob, off))
    estimate = count * (_MAX_THETA / theta)
    return {"count": count, "theta": theta, "hashes": hashes,
            "estimate": estimate, "empty": False}
