"""Streaming land-zone ingestion: continuous arrival → curated parquet.

The reference's pipeline is a batch DAG over a land zone that files
arrive in periodically (reference: dags/example_etl_dag.py); its
streaming analogue is a file-source stream watching the land directory
and appending to the curated table with exactly-once semantics. The
checkpoint directory carries source offsets (which files are consumed)
AND the sink's file-commit log, so a crash/restart resumes without
dropping or duplicating rows — the property the batch DAG gets from
re-runnable snapshot overwrites, carried over to continuous arrival.

``AvailableNow`` drains whatever has landed and stops — the same code
is a 24/7 ingest on a cluster by switching the trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_pipeline_example_spark.metadata.align import align_df_to_meta
from etl_pipeline_example_spark.metadata.spec import TableSpec, spark_schema_for


def stream_land_to_curated(
    spark: SparkSession,
    land_path: str,
    curated_path: str,
    checkpoint_path: str,
    spec: TableSpec,
) -> int:
    """Drain newly-landed JSONL into curated parquet; returns rows in
    curated after the drain. Re-invoking with the same checkpoint is
    exactly-once: already-consumed files are skipped, a re-run after a
    sink failure does not duplicate committed batches.
    """
    schema = spark_schema_for(spec, exclude=spec.partitions)
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.jsonl*")
        .json(land_path)
    )
    aligned = align_df_to_meta(stream, spec, drop_columns=spec.partitions)
    q = (
        aligned.writeStream.format("parquet")
        .option("path", curated_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(curated_path)
    return out.count()
