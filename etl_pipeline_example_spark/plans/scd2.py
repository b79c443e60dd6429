"""SCD Type-2 dimension merge: history-keeping attribute changes.

The canonical warehouse-ETL capability (Kimball's slowly-changing
dimension, type 2): when a dimension attribute changes, CLOSE the
current row (stamp valid_to) and open a new current row, so facts can
always join the version that was true at their event time. The
reference's pipeline overwrites its curated dimension snapshot
(SCD1-style, like pipeline/maintain.py's latest-wins upsert); this is
the history-preserving upgrade.

The update batch is synthesized deterministically from the dimension
itself — customers whose hash gate fires get a '_v2' market segment
effective ``SCD2_CHANGE_DATE`` — so the operator runs on standard
testdata and the oracle recomputes the identical merge.

Reference counterpart: the curated-zone dimension snapshot
(glue_jobs/example_job/job.py writes the customer-derived table);
general query-engine surface, SURVEY.md §2 row 10a.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_hexint, spark_hexint
from etl_pipeline_example_spark.sources.readers import read_table

SCD2_BASE_DATE = "2024-01-01"
SCD2_CHANGE_DATE = "2024-06-01"
SCD2_MOD = 5  # 1-in-5 customers receive an update


def scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_custkey, segment, valid_from, valid_to, is_current): the
    merged SCD2 dimension — unchanged keys keep one open row; changed
    keys carry a closed original plus an open '_v2' row.

    Scale shape: one key-partitioned join of the update batch to the
    dimension (updates are a fraction of keys — AQE decides the build
    side) and a union of three narrow projections; at the lake this
    lands via the same dynamic-partition overwrite ``curated_write``
    uses. No window functions, no global ordering — SCD2 needs only
    per-key alignment.
    """
    gate = spark_hexint("concat('upd:', cast(c_custkey as string))")
    cust = read_table(spark, sf_dir, "customer", parallel=True).select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    updates = cust.filter(F.expr(f"pmod({gate}, {SCD2_MOD}) = 0")).select(
        "c_custkey", F.concat(F.col("segment"), F.lit("_v2")).alias("new_segment")
    )
    unchanged = (
        cust.join(updates.select("c_custkey"), "c_custkey", "left_anti")
        .select(
            "c_custkey",
            "segment",
            F.expr(f"DATE '{SCD2_BASE_DATE}'").alias("valid_from"),
            F.expr("cast(null as date)").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    closed = (
        cust.join(updates.select("c_custkey"), "c_custkey", "left_semi")
        .select(
            "c_custkey",
            "segment",
            F.expr(f"DATE '{SCD2_BASE_DATE}'").alias("valid_from"),
            F.expr(f"DATE '{SCD2_CHANGE_DATE}'").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    opened = updates.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.expr(f"DATE '{SCD2_CHANGE_DATE}'").alias("valid_from"),
        F.expr("cast(null as date)").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionByName(closed).unionByName(opened)


SCD2_MERGE_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_mktsegment AS segment FROM customer
),
updates AS (
  SELECT c_custkey, segment || '_v2' AS new_segment
  FROM cust
  WHERE {duck_hexint("concat('upd:', cast(c_custkey as varchar))")} % {SCD2_MOD} = 0
)
SELECT c.c_custkey, c.segment,
       DATE '{SCD2_BASE_DATE}' AS valid_from,
       cast(NULL AS date) AS valid_to,
       true AS is_current
FROM cust c
WHERE c.c_custkey NOT IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT c.c_custkey, c.segment,
       DATE '{SCD2_BASE_DATE}', DATE '{SCD2_CHANGE_DATE}', false
FROM cust c
WHERE c.c_custkey IN (SELECT c_custkey FROM updates)
UNION ALL
SELECT u.c_custkey, u.new_segment,
       DATE '{SCD2_CHANGE_DATE}', cast(NULL AS date), true
FROM updates u
"""


SCD2_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "scd2_merge": scd2_merge,
}

SCD2_ORACLES: dict[str, str] = {
    "scd2_merge": SCD2_MERGE_SQL,
}
