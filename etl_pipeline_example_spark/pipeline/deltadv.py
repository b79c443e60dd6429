"""Delta Lake DELETION VECTOR decode — stdlib, per PROTOCOL.md.

Modern Delta writers (DML on reader-version-3 tables) mark deleted
ROWS, not rewritten files: an ``add`` action carries a
``deletionVector`` descriptor and the row positions to skip live in a
serialized 64-bit RoaringBitmap ("RoaringBitmapArray") — either
inline in the descriptor (Base85/Z85) or in a
``deletion_vector_<uuid>.bin`` file at a byte offset. Until round 17
this reader rejected the feature loudly; this module decodes it:

- **Z85** (the RFC-32/Z85 alphabet Delta uses for inline DVs and the
  UUID in ``u``-storage paths): 5 chars -> 4 bytes, big-endian base-85;
- **portable 32-bit Roaring** (the published RoaringFormatSpec):
  cookie 12346 (no runs, int32 container count) or 12347 (runs,
  count-1 in the cookie's high 16 bits + a run-flag bitset),
  descriptive (key, cardinality-1) headers, optional offsets,
  then array (sorted uint16s) / bitmap (8192 bytes) / run
  (numRuns + (start, length) pairs) containers — all little-endian;
- **RoaringBitmapArray**: int32 magic + int64 bitmap count + per-
  bucket (int32 high-key + portable 32-bit bitmap); absolute value =
  (high key << 32) | low value;
- **DV file framing**: a 1-byte format version, then each vector at
  its descriptor offset as <int32 BE length><data><int32 BE CRC-32
  of data>.

DEFENSIVE VALIDATION is the load-bearing design: every decode checks
the CRC-32 frame checksum, the magic number, cookie values, container
bounds, monotone keys, AND that the decoded position count equals the
descriptor's ``cardinality`` (metadata the log carries redundantly).
A real-world DV that deviates from this module's reading of the spec
therefore RAISES with the mismatch named — it can never silently drop
the wrong rows. The in-repo encoder (used by tests and round-trip
pins) writes the same layout, the avroread/avrowrite
independent-codec discipline.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

import struct
import zlib

# Z85 alphabet (ZeroMQ RFC 32 — the Delta inline-DV encoding)
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}

_MAGIC_PORTABLE = 1681511377  # RoaringBitmapArray portable magic
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347
_DV_FORMAT_VERSION = 1


def z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for ch in s[i:i + 5]:
            if ch not in _Z85_INV:
                raise ValueError(f"invalid Z85 character {ch!r}")
            v = v * 85 + _Z85_INV[ch]
        if v > 0xFFFFFFFF:
            raise ValueError("Z85 quintet overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"Z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out += reversed(chunk)
    return "".join(out)


class _Rd:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.p = pos

    def take(self, n: int) -> bytes:
        if self.p + n > len(self.d):
            raise ValueError("deletion vector truncated")
        b = self.d[self.p:self.p + n]
        self.p += n
        return b

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.take(8))[0]


def _decode_roaring32(r: _Rd) -> list[int]:
    """One portable 32-bit roaring bitmap -> sorted uint32 values."""
    cookie = r.i32()
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        run_flags = r.take((n + 7) // 8)
        has_run = [
            bool(run_flags[i // 8] & (1 << (i % 8))) for i in range(n)
        ]
    elif cookie == _COOKIE_NO_RUN:
        n = r.i32()
        has_run = [False] * n
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    heads = [(r.u16(), r.u16() + 1) for _ in range(n)]
    keys = [k for k, _c in heads]
    if keys != sorted(set(keys)):
        raise ValueError("roaring container keys not strictly increasing")
    if (cookie == _COOKIE_NO_RUN) or n >= 4:
        _offsets = [r.i32() for _ in range(n)]  # trusted but unused:
        # containers are read sequentially and validated by count
    out: list[int] = []
    for i, (key, card) in enumerate(heads):
        base = key << 16
        if has_run[i]:
            n_runs = r.u16()
            got = 0
            for _ in range(n_runs):
                start, length = r.u16(), r.u16()
                out.extend(base | v for v in range(start, start + length + 1))
                got += length + 1
            if got != card:
                raise ValueError(
                    f"run container cardinality {got} != header {card}"
                )
        elif card > 4096:
            words = r.take(8192)
            vals = [
                base | (w * 8 + b)
                for w, byte in enumerate(words)
                for b in range(8)
                if byte & (1 << b)
            ]
            if len(vals) != card:
                raise ValueError(
                    f"bitmap container cardinality {len(vals)} !="
                    f" header {card}"
                )
            out.extend(vals)
        else:
            prev = -1
            for _ in range(card):
                v = r.u16()
                if v <= prev:
                    raise ValueError("array container values not sorted")
                prev = v
                out.append(base | v)
    return out


def decode_rbm_array(data: bytes) -> list[int]:
    """Serialized RoaringBitmapArray -> sorted 64-bit positions."""
    r = _Rd(data)
    magic = r.i32()
    if magic != _MAGIC_PORTABLE:
        raise ValueError(
            f"unsupported RoaringBitmapArray magic {magic}"
            f" (expected portable {_MAGIC_PORTABLE})"
        )
    n_maps = r.i64()
    if n_maps < 0 or n_maps > 2**32:
        raise ValueError(f"implausible bitmap count {n_maps}")
    out: list[int] = []
    last_high = -1
    for _ in range(n_maps):
        high = r.i32()
        if high <= last_high:
            raise ValueError("bitmap high keys not strictly increasing")
        last_high = high
        out.extend((high << 32) | v for v in _decode_roaring32(r))
    if r.p != len(r.d):
        raise ValueError(
            f"{len(r.d) - r.p} trailing bytes after RoaringBitmapArray"
        )
    return out


def decode_dv_frame(blob: bytes, offset: int, size: int) -> list[int]:
    """One framed DV inside a .bin file: <i32 BE len><data><i32 BE
    crc32(data)> at ``offset``; ``size`` is the descriptor's
    sizeInBytes for the data."""
    if offset < 1:
        raise ValueError("DV offset must follow the 1-byte version")
    if blob[0] != _DV_FORMAT_VERSION:
        raise ValueError(f"unsupported DV file format version {blob[0]}")
    if offset + 4 + size + 4 > len(blob):
        raise ValueError("DV frame exceeds file size")
    (length,) = struct.unpack(">i", blob[offset:offset + 4])
    if length != size:
        raise ValueError(
            f"DV frame length {length} != descriptor sizeInBytes {size}"
        )
    data = blob[offset + 4:offset + 4 + size]
    (crc,) = struct.unpack(
        ">i", blob[offset + 4 + size:offset + 8 + size]
    )
    if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
        raise ValueError("DV frame CRC-32 mismatch")
    return decode_rbm_array(data)


def decode_descriptor(dv: dict, table_blob_loader) -> list[int]:
    """A ``deletionVector`` descriptor dict -> validated sorted
    positions. ``table_blob_loader(rel_or_abs_path) -> bytes`` supplies
    DV file contents for 'u'/'p' storage."""
    st = dv.get("storageType")
    card = int(dv.get("cardinality", -1))
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        size = int(dv.get("sizeInBytes", len(data)))
        if not (len(data) - 3 <= size <= len(data)):
            raise ValueError(
                f"inline DV sizeInBytes {size} inconsistent with"
                f" {len(data)} decoded bytes (Z85 pads to 4)"
            )
        positions = decode_rbm_array(data[:size])
    elif st in ("u", "p"):
        if st == "u":
            enc = dv["pathOrInlineDv"]
            prefix, uuid_part = enc[:-20], enc[-20:]
            raw = z85_decode(uuid_part)
            import uuid as _uuid

            name = f"deletion_vector_{_uuid.UUID(bytes=raw)}.bin"
            rel = f"{prefix}/{name}" if prefix else name
        else:
            rel = dv["pathOrInlineDv"]
        blob = table_blob_loader(rel)
        positions = decode_dv_frame(
            blob, int(dv["offset"]), int(dv["sizeInBytes"])
        )
    else:
        raise ValueError(f"unsupported DV storageType {st!r}")
    if card >= 0 and len(positions) != card:
        raise ValueError(
            f"decoded DV cardinality {len(positions)} != descriptor"
            f" cardinality {card} — refusing a possibly-misread vector"
        )
    return positions


# ------------------------------------------------------- test encoder
def _encode_roaring32(values: list[int]) -> bytes:
    """Portable 32-bit roaring encode (array/bitmap containers only —
    the decoder additionally accepts run containers)."""
    buckets: dict[int, list[int]] = {}
    for v in sorted(values):
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    n = len(buckets)
    out = bytearray()
    out += struct.pack("<i", _COOKIE_NO_RUN)
    out += struct.pack("<i", n)
    for key in sorted(buckets):
        out += struct.pack("<HH", key, len(buckets[key]) - 1)
    # offsets (always present for the no-run cookie)
    pos = len(out) + 4 * n
    offs = []
    for key in sorted(buckets):
        offs.append(pos)
        vals = buckets[key]
        pos += 8192 if len(vals) > 4096 else 2 * len(vals)
    for o in offs:
        out += struct.pack("<i", o)
    for key in sorted(buckets):
        vals = buckets[key]
        if len(vals) > 4096:
            words = bytearray(8192)
            for v in vals:
                words[v // 8] |= 1 << (v % 8)
            out += words
        else:
            for v in vals:
                out += struct.pack("<H", v)
    return bytes(out)


def encode_rbm_array(positions: list[int]) -> bytes:
    buckets: dict[int, list[int]] = {}
    for p in sorted(positions):
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<i", _MAGIC_PORTABLE)
    out += struct.pack("<q", len(buckets))
    for high in sorted(buckets):
        out += struct.pack("<i", high)
        out += _encode_roaring32(buckets[high])
    return bytes(out)


def encode_dv_file(dvs: list[list[int]]) -> tuple[bytes, list[tuple[int, int]]]:
    """A .bin DV file holding each positions-list; returns (blob,
    [(offset, sizeInBytes)] per vector)."""
    blob = bytearray([_DV_FORMAT_VERSION])
    spans = []
    for positions in dvs:
        data = encode_rbm_array(positions)
        spans.append((len(blob), len(data)))
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(blob), spans
