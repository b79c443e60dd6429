"""Versioned tables with time travel: snapshot-isolation at the file
layout level.

``upsert_snapshot`` (maintain.py:91) merges IN PLACE — correct for a
serving table, but it destroys history. This layer keeps every
version: writes land under ``<path>/v=NNNNNN`` and a ``_latest``
pointer file names the current one, so

- readers of "latest" follow the pointer (one tiny file read — never a
  directory-mtime race);
- readers of ``version=N`` TIME-TRAVEL to any retained snapshot — the
  reproducibility primitive every training-data pipeline needs ("which
  exact corpus trained run 47?");
- ``upsert_versioned`` merges updates against the current version into
  version N+1 WITHOUT touching N — write once, swap the pointer
  atomically (tmp + rename), so a concurrent reader sees either N or
  N+1, never a half-written table;
- ``expire_versions`` is the retention half (keep the newest K, never
  the pointer's target).

This is the Iceberg/Delta snapshot-isolation contract re-expressed on
plain parquet directories — no table-format dependency, same
guarantees at the granularity the engine needs. The pointer update is
the ONLY coordination point, and it is a single atomic rename.

Scale: version dirs are full snapshots (storage trades for O(1)
time travel — the same trade Delta's checkpoint files make); the merge
is the one keyed window + overwrite any MERGE costs; expiry is
metadata-only deletes.

Reference: the 305-LoC Glue ETL re-lands full snapshots with no
version pointer at all; engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.fsutil import hadoop_fs

_PTR = "_latest"


def _jpath(spark: SparkSession, p: str):
    return spark.sparkContext._jvm.org.apache.hadoop.fs.Path(p)


def _versions(spark: SparkSession, path: str) -> list[int]:
    fs, hpath = hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return []
    return sorted(
        int(st.getPath().getName().split("=")[1])
        for st in fs.listStatus(hpath)
        if st.isDirectory() and st.getPath().getName().startswith("v=")
    )


def _read_pointer(spark: SparkSession, path: str) -> int:
    fs, _ = hadoop_fs(spark, path)
    ptr = _jpath(spark, f"{path}/{_PTR}")
    if not fs.exists(ptr):
        raise FileNotFoundError(f"no {_PTR} pointer under {path}")
    stream = fs.open(ptr)
    try:
        raw = bytes(stream.readAllBytes()).decode().strip()
    finally:
        stream.close()
    return int(raw)


def _write_pointer(spark: SparkSession, path: str, version: int) -> None:
    """Atomic: write a tmp pointer, rename over the live one."""
    fs, _ = hadoop_fs(spark, path)
    tmp = _jpath(spark, f"{path}/.{_PTR}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(f"{version}\n".encode())
    finally:
        out.close()
    live = _jpath(spark, f"{path}/{_PTR}")
    if fs.exists(live):
        fs.delete(live, False)
    fs.rename(tmp, live)


def write_versioned(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    data_format: str = "parquet",
) -> int:
    """Write ``df`` as the next version of ``path`` and swing the
    pointer to it; returns the new version number."""
    existing = _versions(spark, path)
    version = (existing[-1] + 1) if existing else 1
    df.write.mode("overwrite").format(data_format).save(
        f"{path}/v={version:06d}"
    )
    _write_pointer(spark, path, version)
    return version


def read_versioned(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    data_format: str = "parquet",
) -> DataFrame:
    """Read the pointed-to version, or TIME-TRAVEL to ``version``."""
    v = _read_pointer(spark, path) if version is None else version
    if v not in _versions(spark, path):
        raise FileNotFoundError(f"version {v} not retained under {path}")
    return spark.read.format(data_format).load(f"{path}/v={v:06d}")


def upsert_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    version_col: str,
    data_format: str = "parquet",
) -> int:
    """Latest-wins merge against the CURRENT version, written as a NEW
    version (history untouched); returns the new version number. Ties
    on ``version_col`` prefer the update side."""
    current = read_versioned(spark, path, data_format=data_format)
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    merged = (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    return write_versioned(spark, merged, path, data_format)


def expire_versions(
    spark: SparkSession, path: str, keep: int
) -> list[int]:
    """Retention: delete all but the newest ``keep`` versions — but
    never the pointer's current target. Returns deleted versions."""
    fs, _ = hadoop_fs(spark, path)
    live = _read_pointer(spark, path)
    versions = _versions(spark, path)
    doomed = [v for v in versions[:-keep] if v != live] if keep > 0 else []
    for v in doomed:
        fs.delete(_jpath(spark, f"{path}/v={v:06d}"), True)
    return doomed


def diff_versions(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key: str,
    data_format: str = "parquet",
) -> DataFrame:
    """(key, change): the audit diff between two retained versions —
    ``added`` / ``removed`` / ``changed`` (any non-key column differs;
    unchanged rows are omitted). One co-partitioned full-outer
    sort-merge join on the key; rows compare by a whole-row struct
    equality, so adding columns never changes this code."""
    a = read_versioned(spark, path, version=v_from, data_format=data_format)
    b = read_versioned(spark, path, version=v_to, data_format=data_format)
    cols = [c for c in a.columns if c != key]
    left = a.select(
        F.col(key).alias("__k"), F.struct(*cols).alias("__va")
    )
    right = b.select(
        F.col(key).alias("__k2"), F.struct(*cols).alias("__vb")
    )
    joined = left.join(right, left["__k"] == right["__k2"], "full_outer")
    return (
        joined.select(
            F.coalesce("__k", "__k2").alias(key),
            F.expr(
                "CASE WHEN __k IS NULL THEN 'added'"
                " WHEN __k2 IS NULL THEN 'removed'"
                " WHEN __va != __vb THEN 'changed'"
                " ELSE NULL END"
            ).alias("change"),
        )
        .filter("change IS NOT NULL")
        .orderBy(key)
    )
