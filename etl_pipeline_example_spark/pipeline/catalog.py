"""Catalog deployment — the Spark-native analogue of Glue-database creation.

The reference's final DAG step rebuilds a Glue database from the metadata
folder and refreshes partitions (reference:
python_scripts/create_database_schema.py:4-9). Spark-first, the catalog IS
Spark's catalog: create the database, register each table as an external
(unmanaged) table over its curated path with the spec's schema and
partitioning, then ``MSCK REPAIR`` to discover partitions. Query engines on
the cluster (Spark SQL, Athena/Trino via the same metastore) see the tables
immediately.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from etl_pipeline_example_spark.metadata.spec import DatabaseSpec, spark_schema_for


def _ensure_location(spark: SparkSession, location: str) -> None:
    """Create the table location if absent, through the Hadoop FS layer.

    Deploying the catalog before the first curated write is legal (the
    reference's DAG order is rebuildable in any order); on local FS a
    partition-discovery scan over a missing dir raises where S3 would just
    list empty, so level the two by creating the directory.
    """
    from etl_pipeline_example_spark.fsutil import hadoop_fs

    fs, path = hadoop_fs(spark, location)
    if not fs.exists(path):
        fs.mkdirs(path)


def deploy_database(
    spark: SparkSession,
    db: DatabaseSpec,
    curated_root: str,
    recreate: bool = True,
) -> list[str]:
    """(Re)create ``db`` in the Spark catalog; returns registered table names."""
    if recreate:
        spark.sql(f"DROP DATABASE IF EXISTS {db.name} CASCADE")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db.name}")
    registered: list[str] = []
    for spec in db.tables:
        fq = f"{db.name}.{spec.name}"
        spark.sql(f"DROP TABLE IF EXISTS {fq}")
        schema = spark_schema_for(spec, exclude=spec.partitions)
        ddl_cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
        part_schema = spark_schema_for(
            spec, exclude=[c.name for c in spec.columns if c.name not in spec.partitions]
        )
        location = f"{curated_root}/{spec.location or spec.name}"
        _ensure_location(spark, location)
        stmt = f"CREATE TABLE {fq} ({ddl_cols}) USING {spec.data_format}"
        if spec.partitions:
            part_cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in part_schema.fields
            )
            stmt += f" PARTITIONED BY ({part_cols})"
        stmt += f" LOCATION '{location}'"
        spark.sql(stmt)
        if spec.partitions:
            spark.sql(f"MSCK REPAIR TABLE {fq}")
        registered.append(fq)
    return registered
