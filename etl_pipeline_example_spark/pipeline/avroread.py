"""Generic Avro Object Container File decoder — pure stdlib.

Iceberg's manifest lists and manifests are Avro OCF files; reading an
Iceberg table without the iceberg runtime jar therefore needs an Avro
binary decoder. Avro binary is published arithmetic (the Apache Avro
spec): zigzag-varint longs, length-prefixed UTF-8/bytes,
little-endian IEEE float/double, records as field concatenation,
unions as a branch index, arrays/maps as signed block counts — the
same decode-by-spec discipline as the JPEG modules. The decoder is
GENERIC: it follows the writer schema embedded in the file header, so
any conformant OCF decodes, not just the Iceberg shapes.

Codecs: ``null`` and ``deflate`` (raw DEFLATE via zlib, wbits=-15) —
the two the Avro spec requires/recommends for interoperability;
anything else raises naming the codec.

Reference: N/A (305-LoC Glue ETL); engine surface (Iceberg interop
substrate), SURVEY.md §2.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"


class _Reader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("truncated Avro data")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        """zigzag varint (int and long share the wire format)."""
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 70:
                raise ValueError("varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        if n < 0:
            raise ValueError("negative bytes length")
        return self.read(n)

    def string(self) -> str:
        return self.bytes_().decode("utf-8")


def _decode(r: _Reader, schema, named: dict):
    """One datum per the (writer) schema; named-type registry for
    record/fixed/enum references by full name."""
    if isinstance(schema, str):
        if schema in named:
            return _decode(r, named[schema], named)
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1) != b"\x00"
        if t in ("int", "long"):
            return r.long()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.bytes_()
        if t == "string":
            return r.string()
        raise ValueError(f"unknown Avro type {t!r}")
    if isinstance(schema, list):  # union: branch index then datum
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _decode(r, schema[idx], named)
    t = schema["type"]
    if t == "record":
        name = schema.get("name")
        if name:
            named.setdefault(name, schema)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(r, f["type"], named)
        return out
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:  # block with byte size prefix
                n = -n
                r.long()
            for _ in range(n):
                out.append(_decode(r, schema["items"], named))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                # key MUST be read before the value (dict-assignment
                # evaluates the right-hand side first)
                key = r.string()
                out[key] = _decode(r, schema["values"], named)
        return out
    if t == "fixed":
        name = schema.get("name")
        if name:
            named.setdefault(name, schema)
        return r.read(int(schema["size"]))
    if t == "enum":
        name = schema.get("name")
        if name:
            named.setdefault(name, schema)
        return schema["symbols"][r.long()]
    # logical types ride on a base "type" that is itself a schema
    return _decode(r, t, named)


def _register_named(schema, named: dict) -> None:
    """Pre-walk the schema so forward references by name resolve."""
    if isinstance(schema, list):
        for s in schema:
            _register_named(s, named)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "fixed", "enum") and schema.get("name"):
        named[schema["name"]] = schema
        ns = schema.get("namespace")
        if ns:
            named[f"{ns}.{schema['name']}"] = schema
    if t == "record":
        for f in schema.get("fields", []):
            _register_named(f["type"], named)
    elif t == "array":
        _register_named(schema.get("items"), named)
    elif t == "map":
        _register_named(schema.get("values"), named)


def read_avro_ocf(data: bytes) -> tuple[dict, list]:
    """(writer schema, decoded records) of an Avro Object Container
    File. Pure stdlib; ``null`` and ``deflate`` codecs."""
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.string()
            meta[k] = r.bytes_()
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    named: dict = {}
    _register_named(schema, named)
    out: list = []
    while r.pos < len(r.data):
        count = r.long()
        size = r.long()
        payload = r.read(size)
        if r.read(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        br = _Reader(payload)
        for _ in range(count):
            out.append(_decode(br, schema, named))
        if br.pos != len(payload):
            raise ValueError("Avro block not fully consumed")
    return schema, out
