"""Conform a DataFrame to a metadata spec.

Behavioral parity with gluejobutils' ``align_df_to_meta`` as used by the
reference job (reference: glue_jobs/example_job/job.py:60,66): the written
frame has exactly the spec's columns, in spec order, cast to spec types;
missing columns materialize as typed nulls; extra columns are dropped;
``drop_columns`` (typically the partition list) are omitted.

Spark-first: this is a single ``select`` of column expressions — one
projection node Catalyst folds into the scan, zero extra passes. Casts are
JVM-side, inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_example_spark.metadata.spec import TableSpec


def align_df_to_meta(
    df: DataFrame,
    spec: TableSpec,
    drop_columns: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Select/reorder/cast ``df`` to match ``spec``.

    Parameters
    ----------
    drop_columns : columns of the spec to omit from the output (the reference
        passes the partition list so partition values live in the path, not
        the files).
    strict : if True, raise when the frame is missing spec columns instead of
        null-filling them.
    """
    drop = set(drop_columns or [])
    have = {c.lower(): c for c in df.columns}
    missing = [c.name for c in spec.columns if c.name not in drop and c.name.lower() not in have]
    if strict and missing:
        raise ValueError(f"dataframe missing columns required by meta: {missing}")

    exprs = []
    for col in spec.columns:
        if col.name in drop:
            continue
        if col.name.lower() in have:
            exprs.append(F.col(have[col.name.lower()]).cast(col.spark_type).alias(col.name))
        else:
            exprs.append(F.lit(None).cast(col.spark_type).alias(col.name))
    return df.select(*exprs)
