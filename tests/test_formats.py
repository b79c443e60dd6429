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


def test_read_evolved_merges_additive_schemas(spark, tmp_path):
    """Snapshot 1 has (k, v); snapshot 2 adds c. The merged read
    surfaces c as NULL for snapshot-1 rows, and the report names the
    missing column for exactly the old snapshot."""
    from etl_pipeline_example_spark.sources.evolution import (
        read_evolved,
        schema_evolution_report,
    )

    p1, p2 = f"{tmp_path}/snap1", f"{tmp_path}/snap2"
    spark.createDataFrame([(1, "a")], "k bigint, v string").write.parquet(p1)
    spark.createDataFrame(
        [(2, "b", 9.0)], "k bigint, v string, c double"
    ).write.parquet(p2)

    df = read_evolved(spark, [p1, p2])
    assert set(df.columns) == {"k", "v", "c"}
    rows = {r["k"]: r["c"] for r in df.collect()}
    assert rows == {1: None, 2: 9.0}

    rep = {r["path"]: r["missing"] for r in
           schema_evolution_report(spark, [p1, p2])}
    assert rep == {p1: ["c"], p2: []}


def test_read_evolved_surfaces_type_conflicts(spark, tmp_path):
    """A column that changes TYPE between snapshots is an evolution
    break: the merged read must raise, not silently cast."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from etl_pipeline_example_spark.sources.evolution import read_evolved

    p1, p2 = f"{tmp_path}/snap1", f"{tmp_path}/snap2"
    spark.createDataFrame([(1, 5)], "k bigint, v bigint").write.parquet(p1)
    spark.createDataFrame([(2, "s")], "k bigint, v string").write.parquet(p2)
    with pytest.raises(Exception) as exc:
        read_evolved(spark, [p1, p2]).collect()
    assert "merge" in str(exc.value).lower() or "incompatible" in str(exc.value).lower()
