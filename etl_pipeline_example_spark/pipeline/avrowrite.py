"""Generic Avro Object Container File encoder — pure stdlib.

The write-side twin of avroread.py: encodes records per a writer
schema into a spec-conformant OCF (zigzag varints, length-prefixed
strings/bytes, union branch indices, block framing with a sync
marker). Used by the Iceberg EXPORT path (icebergexport.py) to emit
manifest lists and manifests any Iceberg runtime can decode; kept
generic so any conformant schema encodes.

The encoder is intentionally NOT shared with the decoder beyond this
module boundary — avroread decodes by its own arithmetic, so an
encode→decode round-trip through the pair is a real check, and the
pytest suite additionally pins the byte layout against the
INDEPENDENT test-side encoder in tests/test_icebergread.py.

Codec: ``null`` (the always-supported baseline; Iceberg manifests are
small metadata files — compression is a non-goal here).

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

import hashlib
import json
import struct


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> bytes:
    return _uvarint((n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


def _encode(out: bytearray, schema, value, named: dict) -> None:
    if isinstance(schema, str):
        if schema in named:
            _encode(out, named[schema], value, named)
            return
        t = schema
        if t == "null":
            return
        if t == "boolean":
            out += b"\x01" if value else b"\x00"
        elif t in ("int", "long"):
            out += _zigzag(int(value))
        elif t == "float":
            out += struct.pack("<f", float(value))
        elif t == "double":
            out += struct.pack("<d", float(value))
        elif t == "bytes":
            out += _zigzag(len(value))
            out += value
        elif t == "string":
            b = value.encode("utf-8")
            out += _zigzag(len(b))
            out += b
        else:
            raise ValueError(f"unknown Avro type {t!r}")
        return
    if isinstance(schema, list):  # union: pick the branch by value
        idx = _union_branch(schema, value)
        out += _zigzag(idx)
        _encode(out, schema[idx], value, named)
        return
    t = schema["type"]
    if t == "record":
        if schema.get("name"):
            named.setdefault(schema["name"], schema)
        for f in schema["fields"]:
            if f["name"] in value:
                _encode(out, f["type"], value[f["name"]], named)
            elif "default" in f:
                # substitute the declared default (per Avro's
                # default-to-first-branch rule for unions) instead of
                # encoding None — an int default would otherwise raise
                # TypeError and a nullable union would silently write
                # the null branch (round-16 ADVICE)
                _encode(out, f["type"], f["default"], named)
            elif isinstance(f["type"], list) and "null" in f["type"]:
                _encode(out, f["type"], None, named)
            else:
                raise ValueError(f"missing record field {f['name']!r}")
    elif t == "array":
        items = list(value or [])
        if items:
            out += _zigzag(len(items))
            for it in items:
                _encode(out, schema["items"], it, named)
        out += _zigzag(0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            out += _zigzag(len(entries))
            for k, v in entries.items():
                kb = k.encode("utf-8")
                out += _zigzag(len(kb))
                out += kb
                _encode(out, schema["values"], v, named)
        out += _zigzag(0)
    elif t == "fixed":
        if len(value) != int(schema["size"]):
            raise ValueError("fixed size mismatch")
        out += value
    elif t == "enum":
        out += _zigzag(schema["symbols"].index(value))
    else:
        _encode(out, t, value, named)  # logical type wrapper


def _union_branch(schemas: list, value) -> int:
    def kind(s):
        return s if isinstance(s, str) else s.get("type")

    if value is None:
        for i, s in enumerate(schemas):
            if kind(s) == "null":
                return i
        raise ValueError("no null branch for None")
    for i, s in enumerate(schemas):
        k = kind(s)
        if k == "null":
            continue
        if isinstance(value, bool):
            if k == "boolean":
                return i
        elif isinstance(value, int):
            if k in ("int", "long"):
                return i
        elif isinstance(value, float):
            if k in ("float", "double"):
                return i
        elif isinstance(value, str):
            if k in ("string", "enum"):
                return i
        elif isinstance(value, bytes):
            if k in ("bytes", "fixed"):
                return i
        elif isinstance(value, dict):
            if k in ("record", "map"):
                return i
        elif isinstance(value, (list, tuple)):
            if k == "array":
                return i
    raise ValueError(f"no union branch for {type(value).__name__}")


def write_avro_ocf(
    schema: dict, records: list, extra_meta: dict | None = None
) -> bytes:
    """Encode ``records`` under ``schema`` as one Avro OCF (one block,
    null codec, deterministic sync marker from the content hash).
    ``extra_meta`` adds file-metadata pairs (str -> bytes) — Iceberg
    manifests carry their table schema / partition spec there."""
    body = bytearray()
    named: dict = {}
    for rec in records:
        _encode(body, schema, rec, named)
    schema_json = json.dumps(schema).encode()
    # deterministic sync marker: exports are reproducible byte-for-byte
    sync = hashlib.md5(schema_json + bytes(body)).digest()
    out = bytearray(b"Obj\x01")
    meta = {"avro.schema": schema_json, "avro.codec": b"null"}
    for k, v in (extra_meta or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb))
        out += kb
        out += _zigzag(len(v))
        out += v
    out += _zigzag(0)
    out += sync
    out += _zigzag(len(records))
    out += _zigzag(len(body))
    out += body
    out += sync
    return bytes(out)
