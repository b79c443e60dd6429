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
from pyspark.errors.exceptions.captured import AnalysisException

from etl_pipeline_example_spark.metadata.align import align_df_to_meta
from etl_pipeline_example_spark.metadata.spec import TableSpec, spark_schema_for


def stream_land_to_curated(
    spark: SparkSession,
    land_path: str,
    curated_path: str,
    checkpoint_path: str,
    spec: TableSpec,
    path_glob: str | None = None,
) -> int:
    """Drain newly-landed JSONL into curated parquet; returns rows in
    curated after the drain. Re-invoking with the same checkpoint is
    exactly-once: already-consumed files are skipped, a re-run after a
    sink failure does not duplicate committed batches.

    No default file glob: Spark's file source already skips hidden and
    ``_``-prefixed files, and the land zone's writers produce different
    data extensions (``part-*.txt.gz`` from extract_to_land,
    ``part-*.json.gz`` from write_jsonl_gz, hand-named ``*.jsonl.gz``) —
    a narrow default silently drains nothing from valid landings. Pass
    ``path_glob`` to restrict explicitly.
    """
    schema = spark_schema_for(spec, exclude=spec.partitions)
    reader = spark.readStream.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    stream = reader.json(land_path)
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
    try:
        return spark.read.parquet(curated_path).count()
    except AnalysisException:
        # nothing drained yet and no prior batches: sink dir was never
        # created — that's zero rows, not an error
        return 0
