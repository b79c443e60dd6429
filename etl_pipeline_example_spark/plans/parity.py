"""Query-shaped parity checks for the core ETL primitives.

The side-effecting parts of the reference pipeline (zone promotion,
validation gate, curated writes, catalog deploy) are exercised in pytest;
these entries expose the pure-transform primitives — metadata alignment,
nested-struct flattening, version stamping — as (spark, sf_dir) → DataFrame
queries with DuckDB oracles, so the driver's correctness gate covers them
directly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.functions import flatten_structs, version_stamp
from etl_pipeline_example_spark.metadata import TableSpec, align_df_to_meta
from etl_pipeline_example_spark.sources.readers import read_table

_ALIGN_SPEC = TableSpec.from_dict(
    {
        "name": "customer_slim",
        "columns": [
            {"name": "c_name", "type": "character"},
            {"name": "c_custkey", "type": "long"},
            {"name": "c_acctbal", "type": "decimal(12,2)"},
            {"name": "loyalty_tier", "type": "character"},  # absent → typed null
        ],
    }
)


def meta_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """align_df_to_meta on customer: reorder, cast, null-fill a missing column
    (reference: glue_jobs/example_job/job.py:60 align_df_to_meta).

    The aligned ``c_acctbal`` is decimal(12,2) per the spec; for the
    cross-engine hash it is canonicalized to double (the repo-wide
    decimal-to-double convention) so both engines serialize identically.
    """
    aligned = align_df_to_meta(read_table(spark, sf_dir, "customer"), _ALIGN_SPEC)
    return aligned.withColumn("c_acctbal", F.col("c_acctbal").cast("double"))


META_ALIGN_SQL = """
SELECT c_name,
       c_custkey,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS c_acctbal,
       CAST(NULL AS VARCHAR) AS loyalty_tier
FROM customer
"""


def unpack_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten_structs over a synthesized nested struct
    (reference: python_scripts/custom_functions.py:8-15 unpack_data)."""
    events = read_table(spark, sf_dir, "events")
    nested = events.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"),
            F.struct(F.col("event_type").alias("etype")).alias("inner"),
        ).alias("codes"),
    )
    return flatten_structs(nested)


UNPACK_NESTED_SQL = """
SELECT event_id, user_id AS codes_uid, event_type AS codes_inner_etype
FROM events
"""


def version_stamp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """version_stamp parity (reference: glue_jobs/example_job/job.py:42-56)."""
    nation = read_table(spark, sf_dir, "nation")
    return version_stamp(nation.select("n_nationkey", "n_name"), "v1.0.0")


VERSION_STAMP_SQL = """
SELECT n_nationkey, n_name, 'v1.0.0' AS dea_version FROM nation
"""


PARITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "meta_align": meta_align,
    "unpack_nested": unpack_nested,
    "version_stamp": version_stamp_q,
}

PARITY_ORACLES: dict[str, str] = {
    "meta_align": META_ALIGN_SQL,
    "unpack_nested": UNPACK_NESTED_SQL,
    "version_stamp": VERSION_STAMP_SQL,
}
