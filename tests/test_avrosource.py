"""Distributed Avro source (sources/avrosource.py): OCF files written
by the stdlib encoder, decoded back as a DataFrame on executors."""

from __future__ import annotations

import os

import pytest

from etl_pipeline_example_spark.pipeline.avrowrite import write_avro_ocf
from etl_pipeline_example_spark.sources.avrosource import read_avro

SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "note", "type": ["null", "string"]},
    ],
}


def _file(dirpath, name, rows, schema=SCHEMA):
    os.makedirs(dirpath, exist_ok=True)
    with open(f"{dirpath}/{name}", "wb") as f:
        f.write(write_avro_ocf(schema, rows))


def test_read_avro_multi_file_with_nullable_union(spark, tmp_path):
    d = str(tmp_path / "land")
    _file(d, "a.avro", [
        {"k": 1, "name": "x", "score": 1.5, "note": "hi"},
        {"k": 2, "name": "y", "score": -2.0, "note": None},
    ])
    _file(d, "b.avro", [{"k": 3, "name": "z", "score": 0.0, "note": None}])
    df = read_avro(spark, d)
    assert df.columns == ["k", "name", "score", "note"]
    got = sorted(tuple(r) for r in df.collect())
    assert got == [
        (1, "x", 1.5, "hi"),
        (2, "y", -2.0, None),
        (3, "z", 0.0, None),
    ]


def test_read_avro_schema_drift_names_the_file(spark, tmp_path):
    d = str(tmp_path / "land")
    _file(d, "a.avro", [{"k": 1, "name": "x", "score": 0.0, "note": None}])
    other = dict(SCHEMA, fields=SCHEMA["fields"][:3])
    _file(d, "b.avro", [{"k": 2, "name": "y", "score": 1.0}], other)
    with pytest.raises(Exception, match="drift"):
        read_avro(spark, d).collect()


def test_read_avro_rejects_nested_and_missing(spark, tmp_path):
    d = str(tmp_path / "land")
    nested = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "xs", "type": {"type": "array", "items": "long"}},
        ],
    }
    _file(d, "a.avro", [{"k": 1, "for_schema_only": None, "xs": [1]}][:0]
          or [{"k": 1, "xs": [1]}], nested)
    with pytest.raises(ValueError, match="flat-record"):
        read_avro(spark, d)
    with pytest.raises(FileNotFoundError):
        read_avro(spark, str(tmp_path / "nope" / "*.avro"))
