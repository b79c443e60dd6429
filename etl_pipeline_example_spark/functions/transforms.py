"""Core column-level transforms from the reference job, Spark-first.

- ``flatten_structs``: the reference flattens the API's nested ``codes``
  object into ``codes_<field>`` columns with a per-row Python loop
  (reference: python_scripts/custom_functions.py:8-15 ``unpack_data``).
  Spark-first that is a pure projection over struct fields — recursive,
  JVM-side, no Python per row.
- ``version_stamp``: the ``dea_version`` literal column the job adds both in
  SQL and via ``withColumn`` (reference: glue_jobs/example_job/job.py:42-56).
- ``calculated_counts``: the reference's flagship "calculated" table —
  ``SELECT LOWER(col), COUNT(*) ... GROUP BY LOWER(col)``
  (reference: glue_jobs/example_job/job.py:51-54). Map-side partial
  aggregation makes this a single bounded shuffle of (group, count) pairs
  regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 8) -> DataFrame:
    """Flatten all struct columns into ``parent<sep>child`` leaf columns.

    Column order: non-struct columns keep their position; a struct expands
    in place into its fields (depth-first), matching how the reference's
    ``unpack_data`` lays out ``codes_*`` after the scalar fields.
    """

    def expand(prefix: str, col: Column, dtype: T.DataType, depth: int) -> list[Column]:
        if isinstance(dtype, T.StructType) and depth < max_depth:
            out: list[Column] = []
            for f in dtype.fields:
                out.extend(expand(f"{prefix}{sep}{f.name}", col[f.name], f.dataType, depth + 1))
            return out
        return [col.alias(prefix)]

    cols: list[Column] = []
    for field in df.schema.fields:
        cols.extend(expand(field.name, F.col(field.name), field.dataType, 0))
    return df.select(*cols)


def version_stamp(df: DataFrame, version: str, col_name: str = "dea_version") -> DataFrame:
    """Stamp every row with the pipeline code version."""
    return df.withColumn(col_name, F.lit(version))


def calculated_counts(df: DataFrame, group_col: str, out_group: str | None = None) -> DataFrame:
    """Lower-cased group → count aggregate (the reference's curated query)."""
    out_group = out_group or group_col
    return (
        df.groupBy(F.lower(F.col(group_col)).alias(out_group))
        .agg(F.count(F.lit(1)).alias("n"))
    )
