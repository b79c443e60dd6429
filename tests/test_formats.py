"""Format coverage: write_curated + read_with_meta roundtrip every
supported sink format (parquet, orc, csv, jsonl) with value fidelity."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from etl_pipeline_example_spark.metadata.spec import TableSpec
from etl_pipeline_example_spark.sinks.writers import write_curated
from etl_pipeline_example_spark.sources.readers import read_with_meta

SPEC_DICT = {
    "name": "fmt_roundtrip",
    "columns": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "character"},
        {"name": "score", "type": "double"},
        {"name": "flag", "type": "boolean"},
    ],
}


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "jsonl"])
def test_roundtrip_preserves_values(spark, fmt):
    spec = TableSpec.from_dict({**SPEC_DICT, "data_format": fmt})
    df = spark.range(100).select(
        F.col("id"),
        F.concat(F.lit("row_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
        (F.col("id") % 2 == 0).alias("flag"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/{fmt}_table"
        write_curated(df, spec, path)
        back = read_with_meta(spark, path, spec)
        assert back.dtypes == df.dtypes  # names+types; nullability may widen
        got = sorted(tuple(r) for r in back.collect())
        want = sorted(tuple(r) for r in df.collect())
        assert got == want


def test_unknown_format_raises_on_write(spark):
    spec = TableSpec.from_dict({**SPEC_DICT, "data_format": "avroo"})
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("name"),
                               F.lit(1.0).alias("score"), F.lit(True).alias("flag"))
    with tempfile.TemporaryDirectory() as tmp:
        with pytest.raises(ValueError, match="unsupported data_format"):
            write_curated(df, spec, f"{tmp}/t")
