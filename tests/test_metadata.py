"""Metadata subsystem: spec parsing, schema mapping, align_df_to_meta.

Mirrors the semantics of the reference's gluejobutils ``align_df_to_meta``
usage (reference: glue_jobs/example_job/job.py:60,66) and its etl_manager
JSON specs (reference: meta_data/curated/calculated.json).
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_pipeline_example_spark.metadata import TableSpec, align_df_to_meta, spark_schema_for
from etl_pipeline_example_spark.metadata.spec import parse_type

CALCULATED = {
    "name": "calculated",
    "data_format": "parquet",
    "columns": [
        {"name": "european_electoral_region", "type": "character"},
        {"name": "n", "type": "int"},
        {"name": "dea_version", "type": "character"},
        {"name": "dea_snapshot_date", "type": "date"},
    ],
    "location": "calculated",
    "partitions": ["dea_snapshot_date"],
}


def test_parse_types():
    assert parse_type("character") == T.StringType()
    assert parse_type("int") == T.IntegerType()
    assert parse_type("long") == T.LongType()
    assert parse_type("datetime") == T.TimestampType()
    assert parse_type("decimal(10,2)") == T.DecimalType(10, 2)
    assert parse_type("array<double>") == T.ArrayType(T.DoubleType())
    with pytest.raises(ValueError):
        parse_type("wibble")


def test_schema_excludes_partitions():
    spec = TableSpec.from_dict(CALCULATED)
    schema = spark_schema_for(spec, exclude=spec.partitions)
    assert [f.name for f in schema.fields] == ["european_electoral_region", "n", "dea_version"]


def test_align_reorders_casts_fills_and_drops(spark):
    spec = TableSpec.from_dict(CALCULATED)
    df = spark.createDataFrame(
        [("1.0.0", 5, "london", "extra")],
        ["dea_version", "n", "european_electoral_region", "junk"],
    )
    out = align_df_to_meta(df, spec, drop_columns=spec.partitions)
    assert out.columns == ["european_electoral_region", "n", "dea_version"]
    row = out.collect()[0]
    assert row.european_electoral_region == "london"
    assert row.n == 5
    # long→int cast applied
    assert dict(out.dtypes)["n"] == "int"


def test_align_fills_missing_with_typed_nulls(spark):
    spec = TableSpec.from_dict(CALCULATED)
    df = spark.createDataFrame([("london",)], ["european_electoral_region"])
    out = align_df_to_meta(df, spec)
    assert out.columns == [c["name"] for c in CALCULATED["columns"]]
    row = out.collect()[0]
    assert row.n is None and row.dea_version is None and row.dea_snapshot_date is None


def test_align_strict_raises(spark):
    spec = TableSpec.from_dict(CALCULATED)
    df = spark.createDataFrame([("london",)], ["european_electoral_region"])
    with pytest.raises(ValueError, match="missing columns"):
        align_df_to_meta(df, spec, strict=True)
