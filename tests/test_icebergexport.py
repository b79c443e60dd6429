"""Iceberg export (pipeline/icebergexport.py): versioned tables
published as Iceberg v2 metadata, round-tripped through our own
metadata-replay reader and inspected at the byte level."""

from __future__ import annotations

import json
import os

import pytest

from etl_pipeline_example_spark.pipeline.avroread import read_avro_ocf
from etl_pipeline_example_spark.pipeline.avrowrite import write_avro_ocf
from etl_pipeline_example_spark.pipeline.icebergexport import export_iceberg
from etl_pipeline_example_spark.pipeline.icebergread import (
    iceberg_snapshots,
    read_iceberg,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, val string, ver int")


def test_avro_writer_roundtrips_through_independent_decoder():
    """Encode with avrowrite, decode with avroread — two separately
    written codecs agreeing is the in-repo proof of the byte layout
    (plus the hand-built encoder in test_icebergread.py)."""
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
            {
                "name": "r",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "int"}],
                },
            },
        ],
    }
    rows = [
        {
            "i": -5,
            "l": 1 << 45,
            "s": "héllo",
            "b": True,
            "d": -2.25,
            "u": None,
            "a": [1, -2, 3],
            "m": {"a": 1},
            "r": {"x": 9},
        },
        {
            "i": 0,
            "l": 0,
            "s": "",
            "b": False,
            "d": 0.0,
            "u": "y",
            "a": [],
            "m": {},
            "r": {"x": -1},
        },
    ]
    got_schema, got = read_avro_ocf(write_avro_ocf(schema, rows))
    assert got_schema["name"] == "t"
    assert got == rows


def test_export_iceberg_roundtrips_and_time_travels(spark, tmp_path):
    from etl_pipeline_example_spark.pipeline.versioned import (
        read_versioned,
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(
        spark, _df(spark, [(k, f"v{k}", 1) for k in range(20)]), path,
        key="k", nbuckets=4,
    )
    s1 = export_iceberg(spark, path)
    assert s1 == 1
    assert export_iceberg(spark, path) == 1  # idempotent
    got = {r["k"]: r["val"] for r in read_iceberg(spark, path).collect()}
    want = {r["k"]: r["val"] for r in read_versioned(spark, path).collect()}
    assert got == want and len(got) == 20
    upsert_versioned(spark, path, _df(spark, [(3, "NEW", 2)]), "k", "ver")
    s2 = export_iceberg(spark, path)
    assert s2 == 2
    latest = {r["k"]: r["val"] for r in read_iceberg(spark, path).collect()}
    assert latest[3] == "NEW" and len(latest) == 20
    old = {
        r["k"]: r["val"]
        for r in read_iceberg(spark, path, snapshot_id=1).collect()
    }
    assert old[3] == "v3" and len(old) == 20
    snaps = iceberg_snapshots(spark, path)
    assert [s["snapshot_id"] for s in snaps] == [1, 2]


def test_export_iceberg_manifest_counts_and_statuses(spark, tmp_path):
    """Parse the published Avro back: record counts are the REAL
    parquet row counts; after an upsert the untouched buckets carry
    status EXISTING (0) and only rewritten buckets are ADDED (1)."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(
        spark, _df(spark, [(k, "x", 1) for k in range(40)]), path,
        key="k", nbuckets=4,
    )
    export_iceberg(spark, path)
    upsert_versioned(spark, path, _df(spark, [(0, "Y", 2)]), "k", "ver")
    export_iceberg(spark, path)
    meta = max(
        (f for f in os.listdir(f"{path}/metadata") if f.endswith(".metadata.json"))
    )
    m = json.load(open(f"{path}/metadata/{meta}"))
    snap = next(s for s in m["snapshots"] if s["snapshot-id"] == 2)
    _s, mlist = read_avro_ocf(open(snap["manifest-list"], "rb").read())
    assert len(mlist) == 1
    assert mlist[0]["content"] == 0
    _s, entries = read_avro_ocf(open(mlist[0]["manifest_path"], "rb").read())
    assert len(entries) == 4  # one live file per bucket
    statuses = sorted(e["status"] for e in entries)
    assert statuses == [0, 0, 0, 1]  # 3 carried, 1 rewritten bucket
    total_rows = sum(e["data_file"]["record_count"] for e in entries)
    assert total_rows == 40
    for e in entries:
        df = e["data_file"]
        assert df["file_format"] == "PARQUET"
        assert df["file_size_in_bytes"] == os.path.getsize(df["file_path"])


def test_export_iceberg_schema_evolution_keeps_field_ids(spark, tmp_path):
    from etl_pipeline_example_spark.pipeline.versioned import (
        add_columns_versioned,
        clone_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(spark, _df(spark, [(1, "a", 1)]), path)
    export_iceberg(spark, path)
    add_columns_versioned(spark, path, {"note": "string"})
    export_iceberg(spark, path)
    df = read_iceberg(spark, path)
    assert df.columns == ["k", "val", "ver", "note"]
    assert df.collect()[0]["note"] is None
    meta = max(
        f for f in os.listdir(f"{path}/metadata") if f.endswith(".metadata.json")
    )
    m = json.load(open(f"{path}/metadata/{meta}"))
    assert len(m["schemas"]) == 2
    by_id = {
        s["schema-id"]: {f["name"]: f["id"] for f in s["fields"]}
        for s in m["schemas"]
    }
    # ids stable by name across the evolution; the new column minted a
    # fresh id (read_iceberg's rename check depends on this)
    assert by_id[0]["k"] == by_id[1]["k"]
    assert by_id[0]["val"] == by_id[1]["val"]
    assert by_id[1]["note"] == m["last-column-id"]
    # clone refusal, the deltaexport contract
    dst = str(tmp_path / "clone")
    clone_versioned(spark, path, dst)
    with pytest.raises(ValueError, match="compact_versioned"):
        export_iceberg(spark, dst)


def test_export_iceberg_rejects_array_columns(spark, tmp_path):
    from etl_pipeline_example_spark.pipeline.versioned import (
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(
        spark,
        spark.createDataFrame([(1, [1, 2])], "k bigint, xs array<bigint>"),
        path,
    )
    with pytest.raises(ValueError, match="array"):
        export_iceberg(spark, path)


def test_export_iceberg_existing_sequence_numbers_stable(spark, tmp_path):
    """Round-17 (round-16 ADVICE): a file carried across 2+ exports
    keeps its ORIGINAL data sequence number (not seq-1), and EXISTING
    entries carry an explicit file_sequence_number (the spec allows
    null/inheritance only for status ADDED). min_sequence_number of
    the manifest-list entry reflects the oldest live entry."""
    from etl_pipeline_example_spark.pipeline.versioned import (
        upsert_versioned,
        write_versioned,
    )

    path = str(tmp_path / "tbl")
    write_versioned(
        spark, _df(spark, [(k, "x", 1) for k in range(40)]), path,
        key="k", nbuckets=4,
    )
    export_iceberg(spark, path)  # seq 1: all 4 buckets ADDED
    upsert_versioned(spark, path, _df(spark, [(0, "Y", 2)]), "k", "ver")
    export_iceberg(spark, path)  # seq 2: 1 rewritten, 3 carried
    upsert_versioned(spark, path, _df(spark, [(0, "Z", 3)]), "k", "ver")
    export_iceberg(spark, path)  # seq 3: same bucket rewritten again

    meta = max(
        f for f in os.listdir(f"{path}/metadata")
        if f.endswith(".metadata.json")
    )
    m = json.load(open(f"{path}/metadata/{meta}"))
    snap = next(s for s in m["snapshots"] if s["snapshot-id"] == 3)
    _s, mlist = read_avro_ocf(open(snap["manifest-list"], "rb").read())
    assert mlist[0]["sequence_number"] == 3
    # three files were added at seq 1 and carried twice
    assert mlist[0]["min_sequence_number"] == 1
    _s, entries = read_avro_ocf(open(mlist[0]["manifest_path"], "rb").read())
    ex = [e for e in entries if e["status"] == 0]
    ad = [e for e in entries if e["status"] == 1]
    assert len(ex) == 3 and len(ad) == 1
    for e in ex:
        # original add sequence, stable across BOTH carries — and both
        # sequence fields explicit (no null inheritance for EXISTING)
        assert e["sequence_number"] == 1, e
        assert e["file_sequence_number"] == 1, e
    for e in ad:
        assert e["sequence_number"] is None  # ADDED: inherits seq 3
        assert e["file_sequence_number"] is None
    # the table still reads correctly through our replay reader
    got = {r["k"]: r["val"] for r in read_iceberg(spark, path).collect()}
    assert len(got) == 40 and got[0] == "Z"


def test_avro_writer_encodes_declared_defaults():
    """Round-17 (round-16 ADVICE): an absent field with a declared
    default encodes the DEFAULT value — not None (which raised
    TypeError for primitives and silently wrote the null branch for
    nullable unions)."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "int", "default": 7},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": ["string", "null"], "default": "x"},
            {"name": "d", "type": "long"},
        ],
    }
    blob = write_avro_ocf(schema, [{"d": 5}, {"a": 1, "c": None, "d": 6}])
    _s, rows = read_avro_ocf(blob)
    assert rows == [
        {"a": 7, "b": None, "c": "x", "d": 5},
        {"a": 1, "b": None, "c": None, "d": 6},
    ]
    with pytest.raises(ValueError, match="missing record field 'd'"):
        write_avro_ocf(schema, [{"a": 1}])
