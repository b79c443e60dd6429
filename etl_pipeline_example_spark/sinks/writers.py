"""Curated-zone writers.

The reference writes curated tables two ways (reference:
glue_jobs/example_job/job.py:60-73): a whole-table overwrite, and a
write-directly-into-one-partition-path overwrite for snapshot tables. Both
unify here as ``write_curated``: align to meta, then either a plain
overwrite or a ``partitionBy`` write under dynamic partition-overwrite mode —
at 100 TB replacing only the partitions present in the incoming frame is the
difference between rewriting gigabytes and rewriting the lake.

``write_jsonl_gz`` covers the reference's extract-side jsonl.gz output
(reference: python_scripts/custom_functions.py:17-25) — distributed, via
Spark's json sink with gzip codec, not a driver-side string build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_example_spark.metadata.align import align_df_to_meta
from etl_pipeline_example_spark.metadata.spec import TableSpec


def write_curated(
    df: DataFrame,
    spec: TableSpec,
    path: str,
    partition_values: dict[str, str] | None = None,
    catalog_table: str | None = None,
) -> None:
    """Align ``df`` to ``spec`` and write parquet at ``path``.

    ``partition_values`` supplies constant values for partition columns not
    present in the frame (the reference's ``dea_snapshot_date=<run date>``);
    they are attached as literal columns and written via ``partitionBy`` so
    the layout is standard hive-style and dynamic overwrite replaces only
    the affected partitions.
    """
    from etl_pipeline_example_spark.sources.readers import resolve_format

    fmt = resolve_format(spec.data_format)
    partition_values = partition_values or {}
    out = align_df_to_meta(df, spec, drop_columns=spec.partitions)
    if spec.partitions:
        for p in spec.partitions:
            ptype = next(c.spark_type for c in spec.columns if c.name == p)
            if p in partition_values:
                out = out.withColumn(p, F.lit(partition_values[p]).cast(ptype))
            elif p in df.columns:
                out = out.withColumn(p, df[p].cast(ptype))
            else:
                raise ValueError(f"no value for partition column {p!r}")
        writer = out.write.mode("overwrite").partitionBy(*spec.partitions)
    else:
        writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)
    # Invalidate cached file listings for this location: a stale cache would
    # serve the pre-rewrite file names (FileNotFoundException on next query).
    # Path-based reads are covered by refreshByPath; a registered catalog
    # table caches by name, so pass ``catalog_table`` to refresh that too
    # (and discover any new partitions).
    spark = df.sparkSession
    spark.catalog.refreshByPath(path)
    if catalog_table:
        spark.sql(f"MSCK REPAIR TABLE {catalog_table}")
        spark.catalog.refreshTable(catalog_table)


def write_jsonl_gz(df: DataFrame, path: str, coalesce: int | None = None) -> None:
    """Write a frame as gzipped JSONL (land-zone format)."""
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode("overwrite").option("compression", "gzip").json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Write a catalog table bucketed (and optionally sorted) on a key.

    Bucketing is the co-location contract for repeated big-big joins: two
    tables bucketed on the same key with the same bucket count join with
    ZERO exchange — each task reads matching bucket files from both sides.
    At 100 TB that turns every recurring fact-fact join on the bucket key
    from a full shuffle into a local merge, which is why curated fact
    tables should be bucket-written once at load time. Requires
    ``saveAsTable`` (bucket metadata lives in the catalog, not the files).
    """
    writer = df.write.mode("overwrite").format("parquet")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
