"""Schema-evolution reads over heterogeneous parquet snapshots.

A long-lived table accretes columns: yesterday's snapshot has
(a, b), today's has (a, b, c). The reference handles this with its
metadata system (align every frame to the table spec — re-expressed
here as ``metadata/align.py``); this module adds the SOURCE-side
capability: read ALL snapshots as one frame (parquet footer schema
merge — absent columns surface as NULL for old files) and report, per
snapshot, exactly which columns it is missing — the audit a backfill
planner reads.

Scale notes: ``mergeSchema`` reads every file footer at planning time
— cheap per file but per-FILE, so on 100 TB tables you enable it per
evolved-read, not as a session default, and compaction
(pipeline/maintain.py) keeps the file count bounded. The report scans
footers only (``spark.read`` schema probe per snapshot), never data.

Reference: the etl_manager-style spec alignment this complements is
cited at metadata/align.py:22; engine surface, SURVEY.md §2
(pytest-verified — side-effecting file-layout capability, no oracle
by design, like rows 42/44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_evolved(spark: SparkSession, paths: list[str]) -> DataFrame:
    """One frame over snapshots with drifted (additive) schemas;
    columns absent in a snapshot read as NULL for its rows.

    Conflicting TYPES for the same column are a real evolution break —
    parquet merge raises, and that error surfacing (rather than a
    silent cast) is the contract the test pins.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def schema_evolution_report(
    spark: SparkSession, paths: list[str]
) -> list[dict]:
    """[{path, n_columns, missing}]: per snapshot, the columns it
    lacks relative to the merged schema — footer probes only, no data
    scan."""
    merged = set(read_evolved(spark, paths).columns)
    out = []
    for p in sorted(paths):
        cols = set(spark.read.parquet(p).columns)
        out.append(
            {
                "path": p,
                "n_columns": len(cols),
                "missing": sorted(merged - cols),
            }
        )
    return out
