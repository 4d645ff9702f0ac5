"""Minimal pure-Python Avro Object Container File codec.

The environment ships no Avro library (no fastavro/avro), and manifests
MUST be Avro per the Iceberg spec (ref manifest.go:798 ReadManifestList,
:1521 WriteManifestList), so this implements the subset of the Avro 1.11
spec the manifest schemas use: records, unions, arrays, maps with
non-string keys encoded as array-of-record (Iceberg's k*_v* pattern is a
plain array schema), primitives, fixed, and null/deflate codecs.

Generic datum model: records ↔ dicts, arrays ↔ lists, unions resolved by
value shape. Schemas are plain JSON dicts (the same objects are embedded
in the OCF header, so round-trips preserve field-ids and docs).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO, Iterable, Iterator

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
DEFAULT_BLOCK_RECORDS = 1000


# ------------------------------------------------------------ primitives

def _write_long(out: BinaryIO, n: int) -> None:
    """zigzag varint."""
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_long(buf: BinaryIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("unexpected end of avro data")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(out: BinaryIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_exact(buf: BinaryIO, n: int) -> bytes:
    """Read exactly n bytes; short reads mean a truncated/corrupt file
    and must fail loudly, never silently decode short values."""
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"unexpected end of avro data: wanted {n} bytes, got {len(data)}")
    return data


def _read_bytes(buf: BinaryIO) -> bytes:
    n = _read_long(buf)
    if n < 0:
        raise ValueError(f"negative avro bytes length {n}")
    return _read_exact(buf, n)


# ------------------------------------------------------------- datum codec

def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _matches(value: Any, schema: Any) -> bool:
    t = _schema_type(schema)
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t == "string":
        return isinstance(value, str)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return True


def write_datum(out: BinaryIO, schema: Any, value: Any) -> None:
    t = _schema_type(schema)
    if t == "union":
        for i, branch in enumerate(schema):
            if _matches(value, branch):
                _write_long(out, i)
                write_datum(out, branch, value)
                return
        raise TypeError(f"value {value!r} matches no union branch {schema}")
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "string":
        _write_bytes(out, str(value).encode("utf-8"))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(
                f"fixed({schema['size']}) value has {len(b)} bytes"
            )
        out.write(b)
    elif t == "record":
        for f in schema["fields"]:
            try:
                write_datum(out, f["type"], value.get(f["name"]))
            except TypeError as e:
                raise TypeError(f"field {f['name']!r}: {e}") from None
    elif t == "array":
        items = list(value)
        if items:
            _write_long(out, len(items))
            for item in items:
                write_datum(out, schema["items"], item)
        _write_long(out, 0)
    elif t == "map":
        entries = dict(value)
        if entries:
            _write_long(out, len(entries))
            for k, v in entries.items():
                _write_bytes(out, str(k).encode("utf-8"))
                write_datum(out, schema["values"], v)
        _write_long(out, 0)
    else:
        raise TypeError(f"unsupported avro type {t!r}")


def read_datum(buf: BinaryIO, schema: Any) -> Any:
    t = _schema_type(schema)
    if t == "union":
        idx = _read_long(buf)
        return read_datum(buf, schema[idx])
    if t == "null":
        return None
    if t == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("unexpected end of avro data")
        return b != b"\x00"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "bytes":
        return _read_bytes(buf)
    if t == "fixed":
        return _read_exact(buf, schema["size"])
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(read_datum(buf, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"])
        return out
    raise TypeError(f"unsupported avro type {t!r}")


# --------------------------------------------- codegen'd block reader
#
# r14 compiled the schema walk into closure trees; the remaining cold
# decode cost was the byte walk itself — BytesIO.read(1) per varint byte
# allocates a bytes object and pays a C-call per BYTE, and every value
# still costs one closure call. The block reader generates one Python
# function per writer schema (exec'd once, memoized) that decodes a
# whole OCF block from a bytes object with a local integer cursor:
# varints are inlined as direct byte indexing, strings/bytes are single
# slices, records build dict literals. Same generic datum model
# (records ↔ dicts, arrays ↔ lists), pinned by the byte-golden
# wire-format and reference-manifest suites.


class _SrcGen:
    """Emits source lines that decode one datum into a target variable.

    Generated code runs over locals `data` (bytes), `pos` (int cursor)
    and `_dlen` (len(data), bound once); runtime helpers (struct
    unpack_from, EOFError) are injected via the exec namespace. Length
    reads guard against truncated data so corrupt files fail loudly
    (IndexError from direct indexing is mapped to EOFError by read_ocf).
    """

    def __init__(self):
        self.n = 0
        self.ns: dict[str, Any] = {"_EOF": EOFError}

    def fresh(self, stem="t"):
        self.n += 1
        return f"_{stem}{self.n}"

    def bind(self, stem, value):
        name = self.fresh(stem)
        self.ns[name] = value
        return name

    def varint(self, lines, ind, var):
        """zigzag-varint decode into `var` — avro encodes longs, lengths,
        union indexes and block counts all this way."""
        b = self.fresh("b")
        lines.append(f"{ind}{b} = data[pos]; pos += 1")
        lines.append(f"{ind}if {b} < 128:")
        lines.append(f"{ind}    {var} = ({b} >> 1) ^ -({b} & 1)")
        lines.append(f"{ind}else:")
        lines.append(f"{ind}    _n = {b} & 127; _s = 7")
        lines.append(f"{ind}    while True:")
        lines.append(f"{ind}        {b} = data[pos]; pos += 1")
        lines.append(f"{ind}        _n |= ({b} & 127) << _s")
        lines.append(f"{ind}        if {b} < 128: break")
        lines.append(f"{ind}        _s += 7")
        lines.append(f"{ind}    {var} = (_n >> 1) ^ -(_n & 1)")

    def sized(self, lines, ind, var, length_expr, decode=False):
        """Bounds-checked slice of `length_expr` bytes into `var`."""
        end = self.fresh("E")
        lines.append(f"{ind}{end} = pos + {length_expr}")
        lines.append(
            f"{ind}if {end} > _dlen: "
            "raise _EOF('unexpected end of avro data')"
        )
        dec = ".decode()" if decode else ""
        lines.append(f"{ind}{var} = data[pos:{end}]{dec}; pos = {end}")

    def block_loop(self, lines, ind, body):
        """Avro array/map block framing: count (negative ⇒ byte-size
        prefix follows), `body(ind)` per item, 0 terminates."""
        cnt = self.fresh("n")
        lines.append(f"{ind}while True:")
        self.varint(lines, ind + "    ", cnt)
        lines.append(f"{ind}    if {cnt} == 0: break")
        lines.append(f"{ind}    if {cnt} < 0:")
        sk = self.fresh("sk")
        self.varint(lines, ind + "        ", sk)
        lines.append(f"{ind}        {cnt} = -{cnt}")
        lines.append(f"{ind}    for _ in range({cnt}):")
        body(ind + "        ")

    def emit(self, lines, ind, schema, var):
        t = _schema_type(schema)
        if t == "null":
            lines.append(f"{ind}{var} = None")
        elif t == "boolean":
            lines.append(f"{ind}{var} = data[pos] != 0; pos += 1")
        elif t in ("int", "long"):
            self.varint(lines, ind, var)
        elif t == "float":
            u = self.bind("uf", struct.Struct("<f").unpack_from)
            lines.append(
                f"{ind}if pos + 4 > _dlen: "
                "raise _EOF('unexpected end of avro data')"
            )
            lines.append(f"{ind}{var} = {u}(data, pos)[0]; pos += 4")
        elif t == "double":
            u = self.bind("ud", struct.Struct("<d").unpack_from)
            lines.append(
                f"{ind}if pos + 8 > _dlen: "
                "raise _EOF('unexpected end of avro data')"
            )
            lines.append(f"{ind}{var} = {u}(data, pos)[0]; pos += 8")
        elif t in ("string", "bytes"):
            ln = self.fresh("L")
            self.varint(lines, ind, ln)
            lines.append(
                f"{ind}if {ln} < 0: "
                f"raise ValueError('negative avro bytes length %d' % {ln})"
            )
            self.sized(lines, ind, var, ln, decode=(t == "string"))
        elif t == "fixed":
            self.sized(lines, ind, var, schema["size"])
        elif t == "union":
            idx = self.fresh("u")
            self.varint(lines, ind, idx)
            for i, branch in enumerate(schema):
                kw = "if" if i == 0 else "elif"
                lines.append(f"{ind}{kw} {idx} == {i}:")
                self.emit(lines, ind + "    ", branch, var)
            lines.append(f"{ind}else:")
            lines.append(
                f"{ind}    raise IndexError('bad union index %d' % {idx})"
            )
        elif t == "record":
            fvars = []
            for f in schema["fields"]:
                fv = self.fresh("f")
                self.emit(lines, ind, f["type"], fv)
                fvars.append((f["name"], fv))
            items = ", ".join(f"{name!r}: {fv}" for name, fv in fvars)
            lines.append(f"{ind}{var} = {{{items}}}")
        elif t == "array":
            item = self.fresh("i")
            ap = self.fresh("ap")
            lines.append(f"{ind}{var} = []")
            lines.append(f"{ind}{ap} = {var}.append")

            def body(ind2):
                self.emit(lines, ind2, schema["items"], item)
                lines.append(f"{ind2}{ap}({item})")

            self.block_loop(lines, ind, body)
        elif t == "map":
            key, val, kl = self.fresh("k"), self.fresh("v"), self.fresh("KL")
            lines.append(f"{ind}{var} = {{}}")

            def body(ind2):
                self.varint(lines, ind2, kl)
                self.sized(lines, ind2, key, kl, decode=True)
                self.emit(lines, ind2, schema["values"], val)
                lines.append(f"{ind2}{var}[{key}] = {val}")

            self.block_loop(lines, ind, body)
        else:
            raise TypeError(f"unsupported avro type {t!r}")

    def compile(self, lines, name="_decode_block"):
        src = "\n".join(lines)
        ns = dict(self.ns)
        exec(compile(src, f"<avro:{name}>", "exec"), ns)
        fn = ns[name]
        fn._src = src  # for debugging/tests
        return fn


def compile_block_reader(schema: Any):
    """schema → fn(data, pos, count, append) -> end_pos decoding `count`
    generic datums (records ↔ dicts) from `data` starting at `pos`."""
    g = _SrcGen()
    lines = [
        "def _decode_block(data, pos, count, append):",
        "    _dlen = len(data)",
        "    for _ in range(count):",
    ]
    g.emit(lines, "        ", schema, "_rec")
    lines.append("        append(_rec)")
    lines.append("    return pos")
    return g.compile(lines)


# ----------------------------------------------------------------- OCF IO

def write_ocf(
    path_or_file,
    schema: dict,
    records: Iterable[dict],
    metadata: dict[str, str] | None = None,
    codec: str = "deflate",
) -> None:
    own = isinstance(path_or_file, (str, os.PathLike))
    if own:
        from . import fileio

        out: BinaryIO = fileio.open_output(str(path_or_file))
    else:
        out = path_or_file
    try:
        sync = os.urandom(SYNC_SIZE)
        out.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        }
        for k, v in (metadata or {}).items():
            meta[k] = v.encode() if isinstance(v, str) else v
        _write_long(out, len(meta))
        for k, v in meta.items():
            _write_bytes(out, k.encode())
            _write_bytes(out, v)
        _write_long(out, 0)
        out.write(sync)

        batch: list[dict] = []

        def flush():
            if not batch:
                return
            body = io.BytesIO()
            for rec in batch:
                write_datum(body, schema, rec)
            payload = body.getvalue()
            if codec == "deflate":
                co = zlib.compressobj(wbits=-15)  # raw deflate per avro spec
                payload = co.compress(payload) + co.flush()
            _write_long(out, len(batch))
            _write_long(out, len(payload))
            out.write(payload)
            out.write(sync)
            batch.clear()

        for rec in records:
            batch.append(rec)
            if len(batch) >= DEFAULT_BLOCK_RECORDS:
                flush()
        flush()
    finally:
        if own:
            out.close()


# compiled block readers memoized by the file's raw schema JSON bytes: a
# snapshot's manifests share one writer schema, so a 2000-manifest plan
# would otherwise re-codegen the same schema 2000 times (FIFO-bounded;
# the schema population of a session is a handful). Eviction runs under
# a lock: planner threads share this memo, and an unlocked
# pop(next(iter(...))) can race a concurrent insert into
# RuntimeError('dictionary changed size during iteration').
_BLOCK_READER_MEMO: dict[bytes, Any] = {}
_BLOCK_READER_MEMO_MAX = 64
_BLOCK_READER_LOCK = __import__("threading").Lock()


def read_ocf(
    path_or_file, record_reader_factory=None
) -> tuple[dict, dict[str, bytes], list]:
    """Returns (schema, metadata, records).

    `record_reader_factory(schema, raw_schema_bytes)` may supply a
    specialized BLOCK reader `fn(data, pos, count, append) -> end_pos`
    (e.g. the manifest module's fused schema→ManifestEntry decoder);
    returning None falls back to the generic codegen'd block reader
    (records ↔ dicts)."""
    own = isinstance(path_or_file, (str, os.PathLike))
    if own:
        from . import fileio

        f: BinaryIO = fileio.open_input(str(path_or_file))
    else:
        f = path_or_file
    try:
        if f.read(4) != MAGIC:
            raise ValueError("not an avro object container file")
        meta: dict[str, bytes] = {}
        while True:
            n = _read_long(f)
            if n == 0:
                break
            if n < 0:
                _read_long(f)
                n = -n
            for _ in range(n):
                k = _read_bytes(f).decode()
                meta[k] = _read_bytes(f)
        raw_schema = meta["avro.schema"]
        schema = json.loads(raw_schema)
        codec = meta.get("avro.codec", b"null").decode()
        sync = f.read(SYNC_SIZE)
        # codegen'd once per SCHEMA (memoized): both the schema walk AND
        # the byte walk leave the per-record loop (planner hot path)
        read_block = None
        if record_reader_factory is not None:
            read_block = record_reader_factory(schema, raw_schema)
        if read_block is None:
            with _BLOCK_READER_LOCK:
                read_block = _BLOCK_READER_MEMO.get(raw_schema)
            if read_block is None:
                read_block = compile_block_reader(schema)
                with _BLOCK_READER_LOCK:
                    while len(_BLOCK_READER_MEMO) >= _BLOCK_READER_MEMO_MAX:
                        _BLOCK_READER_MEMO.pop(
                            next(iter(_BLOCK_READER_MEMO)), None
                        )
                    _BLOCK_READER_MEMO[raw_schema] = read_block
        records: list = []
        append = records.append
        while True:
            try:
                count = _read_long(f)
            except EOFError:
                break
            size = _read_long(f)
            payload = _read_exact(f, size)
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            elif codec != "null":
                raise ValueError(f"unsupported codec {codec!r}")
            try:
                read_block(payload, 0, count, append)
            except (IndexError, struct.error):
                raise EOFError("unexpected end of avro data") from None
            if f.read(SYNC_SIZE) != sync:
                raise ValueError("sync marker mismatch")
        return schema, meta, records
    finally:
        if own:
            f.close()
