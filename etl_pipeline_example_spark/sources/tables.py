"""Testdata catalog helpers.

One place that knows the benchmark table set so queries and tests agree on
names. ``register_views`` mirrors the reference job's temp-view pattern
(reference: glue_jobs/example_job/job.py:40,48 ``createOrReplaceTempView``)
so every query can be written in SQL against stable names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.sources.readers import read_table

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    names = names or TESTDATA_TABLES
    return {n: read_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
