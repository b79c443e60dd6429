"""Iceberg metadata-replay reader (pipeline/icebergread.py): tables
built BY HAND to the public spec — metadata.json + Avro manifest
list + Avro manifests encoded byte-by-byte in this file — then read
back without any iceberg jar. The deltaread test shape, round 16."""

from __future__ import annotations

import json
import os
import struct
import zlib

import pytest

from etl_pipeline_example_spark.pipeline.avroread import read_avro_ocf
from etl_pipeline_example_spark.pipeline.icebergread import (
    iceberg_snapshots,
    read_iceberg,
)

# ---------------------------------------------------------------------
# a tiny INDEPENDENT Avro binary encoder (test-side twin of the
# decoder — encoding here, decoding in the package, so a shared bug
# cannot self-certify)

SYNC = bytes(range(16))


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


def _along(n: int) -> bytes:
    return _uvarint((n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


def _astr(s: str) -> bytes:
    b = s.encode()
    return _along(len(b)) + b


def _ocf(schema: dict, payloads: list[bytes], codec: str = "null") -> bytes:
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out = bytearray(b"Obj\x01")
    out += _along(len(meta))
    for k, v in meta.items():
        out += _astr(k) + _along(len(v)) + v
    out += _along(0)
    out += SYNC
    block = b"".join(payloads)
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        block = co.compress(block) + co.flush()
    out += _along(len(payloads)) + _along(len(block)) + block + SYNC
    return bytes(out)


MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
    ],
}

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                ],
            },
        },
    ],
}


def _mlist_entry(path: str, content: int = 0) -> bytes:
    return _astr(path) + _along(1) + _along(0) + _along(content)


def _manifest_entry(
    path: str, status: int = 1, content: int = 0, fmt: str = "PARQUET"
) -> bytes:
    return (
        _along(status)
        + _along(1)  # union branch 1: long
        + _along(7)
        + _along(content)
        + _astr(path)
        + _astr(fmt)
        + _along(3)
        + _along(100)
    )


SCHEMA_FIELDS = [
    {"id": 1, "name": "k", "required": False, "type": "long"},
    {"id": 2, "name": "val", "required": False, "type": "string"},
]


def _data_file(spark, root, name, rows):
    tmp = f"{root}/_stage_{name}"
    spark.createDataFrame(rows, "k bigint, val string").coalesce(
        1
    ).write.mode("overwrite").parquet(tmp)
    part = next(
        f
        for f in os.listdir(tmp)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.makedirs(f"{root}/data", exist_ok=True)
    os.replace(f"{tmp}/{part}", f"{root}/data/{name}")
    import shutil

    shutil.rmtree(tmp)
    return f"{root}/data/{name}"


def _build_table(spark, root, *, renamed=False, fv=2):
    """Two snapshots: 1 = {fa}, 2 = {fa, fb}; current = 2."""
    os.makedirs(f"{root}/metadata", exist_ok=True)
    fa = _data_file(spark, root, "a.parquet", [(1, "a"), (2, "b")])
    fb = _data_file(spark, root, "b.parquet", [(3, "c")])
    m1 = f"{root}/metadata/m1.avro"
    m2 = f"{root}/metadata/m2.avro"
    with open(m1, "wb") as f:
        f.write(_ocf(MANIFEST_SCHEMA, [_manifest_entry(fa)]))
    with open(m2, "wb") as f:
        f.write(_ocf(MANIFEST_SCHEMA, [_manifest_entry(fb)]))
    ml1 = f"{root}/metadata/ml1.avro"
    ml2 = f"{root}/metadata/ml2.avro"
    with open(ml1, "wb") as f:
        f.write(_ocf(MANIFEST_LIST_SCHEMA, [_mlist_entry(m1)]))
    with open(ml2, "wb") as f:
        f.write(
            _ocf(
                MANIFEST_LIST_SCHEMA,
                [_mlist_entry(m1), _mlist_entry(m2)],
            )
        )
    schemas = [
        {"schema-id": 0, "type": "struct", "fields": SCHEMA_FIELDS}
    ]
    if renamed:
        schemas.append(
            {
                "schema-id": 1,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k2", "required": False, "type": "long"},
                    SCHEMA_FIELDS[1],
                ],
            }
        )
    meta = {
        "format-version": fv,
        "table-uuid": "0000",
        "location": root,
        "schemas": schemas,
        "current-schema-id": schemas[-1]["schema-id"],
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1000, "manifest-list": ml1},
            {"snapshot-id": 2, "timestamp-ms": 2000, "manifest-list": ml2},
        ],
    }
    # two numbered metadata files: the listing must pick the newest
    old = dict(meta, **{"current-snapshot-id": 1})
    with open(
        f"{root}/metadata/00001-aaaa-bbbb.metadata.json", "w"
    ) as f:
        json.dump(old, f)
    with open(
        f"{root}/metadata/00002-aaaa-bbbb.metadata.json", "w"
    ) as f:
        json.dump(meta, f)
    return meta


def test_avro_decoder_primitives_unions_arrays_maps_deflate():
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "b", "type": "boolean"},
            {"name": "d", "type": "double"},
            {"name": "u", "type": ["null", "string"]},
            {"name": "a", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "int"}},
        ],
    }
    rec = (
        _along(-3)
        + _along(1 << 40)
        + _astr("hé")
        + b"\x01"
        + struct.pack("<d", 2.5)
        + _along(1)
        + _astr("x")
        + _along(2) + _along(7) + _along(-8) + _along(0)
        + _along(1) + _astr("k") + _along(9) + _along(0)
    )
    for codec in ("null", "deflate"):
        got_schema, rows = read_avro_ocf(_ocf(schema, [rec, rec], codec))
        assert got_schema["name"] == "t"
        assert rows == [
            {
                "i": -3,
                "l": 1 << 40,
                "s": "hé",
                "b": True,
                "d": 2.5,
                "u": "x",
                "a": [7, -8],
                "m": {"k": 9},
            }
        ] * 2
    with pytest.raises(ValueError, match="magic"):
        read_avro_ocf(b"PK\x03\x04" + b"\x00" * 30)
    bad = bytearray(_ocf(schema, [rec]))
    bad[-1] ^= 0xFF  # corrupt the block sync
    with pytest.raises(ValueError, match="sync"):
        read_avro_ocf(bytes(bad))


def test_read_iceberg_latest_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _build_table(spark, root)
    df = read_iceberg(spark, root)
    assert df.columns == ["k", "val"]
    got = {r["k"]: r["val"] for r in df.collect()}
    assert got == {1: "a", 2: "b", 3: "c"}
    old = {
        r["k"]: r["val"]
        for r in read_iceberg(spark, root, snapshot_id=1).collect()
    }
    assert old == {1: "a", 2: "b"}
    assert iceberg_snapshots(spark, root) == [
        {"snapshot_id": 1, "timestamp_ms": 1000},
        {"snapshot_id": 2, "timestamp_ms": 2000},
    ]
    with pytest.raises(ValueError, match="snapshot 99"):
        read_iceberg(spark, root, snapshot_id=99)


def test_read_iceberg_deleted_entries_skipped(spark, tmp_path):
    """A manifest entry with status=2 (DELETED) is dead — its file
    must not be scanned even though the file still exists."""
    root = str(tmp_path / "tbl")
    _build_table(spark, root)
    # rewrite m2 marking b.parquet deleted
    fb = f"{root}/data/b.parquet"
    with open(f"{root}/metadata/m2.avro", "wb") as f:
        f.write(
            _ocf(MANIFEST_SCHEMA, [_manifest_entry(fb, status=2)])
        )
    got = {r["k"]: r["val"] for r in read_iceberg(spark, root).collect()}
    assert got == {1: "a", 2: "b"}


def test_read_iceberg_v1_shape_and_inline_manifests(spark, tmp_path):
    """v1: single ``schema`` key and a snapshot with inline
    ``manifests`` instead of a manifest list."""
    root = str(tmp_path / "tbl")
    os.makedirs(f"{root}/metadata", exist_ok=True)
    fa = _data_file(spark, root, "a.parquet", [(5, "e")])
    m1 = f"{root}/metadata/m1.avro"
    with open(m1, "wb") as f:
        f.write(_ocf(MANIFEST_SCHEMA, [_manifest_entry(fa)]))
    meta = {
        "format-version": 1,
        "location": root,
        "schema": {"type": "struct", "fields": SCHEMA_FIELDS},
        "current-snapshot-id": 10,
        "snapshots": [
            {"snapshot-id": 10, "timestamp-ms": 1, "manifests": [m1]}
        ],
    }
    with open(f"{root}/metadata/v1.metadata.json", "w") as f:
        json.dump(meta, f)
    got = {r["k"]: r["val"] for r in read_iceberg(spark, root).collect()}
    assert got == {5: "e"}


def test_read_iceberg_empty_and_missing(spark, tmp_path):
    root = str(tmp_path / "tbl")
    os.makedirs(f"{root}/metadata", exist_ok=True)
    meta = {
        "format-version": 2,
        "location": root,
        "schemas": [
            {"schema-id": 0, "type": "struct", "fields": SCHEMA_FIELDS}
        ],
        "current-schema-id": 0,
        "current-snapshot-id": -1,
        "snapshots": [],
    }
    with open(f"{root}/metadata/v1.metadata.json", "w") as f:
        json.dump(meta, f)
    df = read_iceberg(spark, root)
    assert df.columns == ["k", "val"] and df.count() == 0
    with pytest.raises(FileNotFoundError, match="not an Iceberg table"):
        read_iceberg(spark, str(tmp_path / "nope"))


def test_read_iceberg_loud_rejections(spark, tmp_path):
    root = str(tmp_path / "tbl")
    meta = _build_table(spark, root)

    def rewrite(mutate):
        m = json.loads(json.dumps(meta))
        mutate(m)
        with open(
            f"{root}/metadata/00002-aaaa-bbbb.metadata.json", "w"
        ) as f:
            json.dump(m, f)

    # format-version 3
    rewrite(lambda m: m.update({"format-version": 3}))
    with pytest.raises(ValueError, match="format-version 3"):
        read_iceberg(spark, root)
    # unsupported primitive type
    rewrite(
        lambda m: m["schemas"][0]["fields"].append(
            {"id": 9, "name": "u", "required": False, "type": "uuid"}
        )
    )
    with pytest.raises(ValueError, match="uuid"):
        read_iceberg(spark, root)
    # renamed field across schema history
    rewrite(
        lambda m: (
            m["schemas"].append(
                {
                    "schema-id": 1,
                    "type": "struct",
                    "fields": [
                        dict(SCHEMA_FIELDS[0], name="k_renamed"),
                        SCHEMA_FIELDS[1],
                    ],
                }
            ),
            m.update({"current-schema-id": 1}),
        )
    )
    # top-level renames route through field-id resolution (r17); these
    # files embed NO parquet field ids, so the read fails LOUDLY at
    # materialization instead of silently nulling the renamed column
    with pytest.raises(Exception, match="field ids"):
        read_iceberg(spark, root).collect()
    rewrite(lambda m: None)  # restore
    # delete manifest in the manifest list
    with open(f"{root}/metadata/ml2.avro", "wb") as f:
        f.write(
            _ocf(
                MANIFEST_LIST_SCHEMA,
                [_mlist_entry(f"{root}/metadata/m1.avro", content=1)],
            )
        )
    with pytest.raises(ValueError, match="DELETE manifest"):
        read_iceberg(spark, root)
    # delete DATA file inside a manifest
    with open(f"{root}/metadata/ml2.avro", "wb") as f:
        f.write(
            _ocf(
                MANIFEST_LIST_SCHEMA,
                [_mlist_entry(f"{root}/metadata/m2.avro")],
            )
        )
    with open(f"{root}/metadata/m2.avro", "wb") as f:
        f.write(
            _ocf(
                MANIFEST_SCHEMA,
                [_manifest_entry(f"{root}/data/b.parquet", content=1)],
            )
        )
    with pytest.raises(ValueError, match="delete file"):
        read_iceberg(spark, root)
    # non-parquet data file
    with open(f"{root}/metadata/m2.avro", "wb") as f:
        f.write(
            _ocf(
                MANIFEST_SCHEMA,
                [_manifest_entry(f"{root}/data/b.orc", fmt="ORC")],
            )
        )
    with pytest.raises(ValueError, match="ORC"):
        read_iceberg(spark, root)


def test_renamed_columns_resolve_by_parquet_field_id(spark, tmp_path):
    """Round-17: a table whose schema history renamed a top-level
    column reads correctly when the data files embed parquet field ids
    (the Iceberg contract) — old files written under the OLD name
    surface under the CURRENT name; a field id absent from an old file
    (column added later) reads as null."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "renamed")
    os.makedirs(f"{root}/metadata", exist_ok=True)
    # file written under the ORIGINAL names k/val with field ids 1/2
    sch_old = pa.schema(
        [
            pa.field("k", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field(
                "val", pa.string(), metadata={b"PARQUET:field_id": b"2"}
            ),
        ]
    )
    pq.write_table(
        pa.table({"k": [1, 2], "val": ["a", "b"]}, schema=sch_old),
        f"{root}/a.parquet",
    )
    # newer file already under the RENAMED name k2 plus the NEW col n
    sch_new = pa.schema(
        [
            pa.field("k2", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field(
                "val", pa.string(), metadata={b"PARQUET:field_id": b"2"}
            ),
            pa.field("n", pa.int64(), metadata={b"PARQUET:field_id": b"3"}),
        ]
    )
    pq.write_table(
        pa.table(
            {"k2": [3], "val": ["c"], "n": [30]}, schema=sch_new
        ),
        f"{root}/b.parquet",
    )
    m1 = f"{root}/metadata/m1.avro"
    with open(m1, "wb") as f:
        f.write(
            _ocf(
                MANIFEST_SCHEMA,
                [
                    _manifest_entry(f"{root}/a.parquet"),
                    _manifest_entry(f"{root}/b.parquet"),
                ],
            )
        )
    ml1 = f"{root}/metadata/ml1.avro"
    with open(ml1, "wb") as f:
        f.write(_ocf(MANIFEST_LIST_SCHEMA, [_mlist_entry(m1)]))
    meta = {
        "format-version": 2,
        "table-uuid": "0000",
        "location": root,
        "schemas": [
            {
                "schema-id": 0,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "val", "required": False,
                     "type": "string"},
                ],
            },
            {
                "schema-id": 1,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "k2", "required": False,
                     "type": "long"},
                    {"id": 2, "name": "val", "required": False,
                     "type": "string"},
                    {"id": 3, "name": "n", "required": False,
                     "type": "long"},
                ],
            },
        ],
        "current-schema-id": 1,
        "current-snapshot-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1000,
             "manifest-list": ml1},
        ],
    }
    with open(f"{root}/metadata/00001-aaaa.metadata.json", "w") as f:
        json.dump(meta, f)
    df = read_iceberg(spark, root)
    assert df.columns == ["k2", "val", "n"]
    got = {r["k2"]: (r["val"], r["n"]) for r in df.collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 30)}, got
