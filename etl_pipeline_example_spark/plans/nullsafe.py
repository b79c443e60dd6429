"""Null-safe join equality: reconciling feeds on a NULLABLE key.

The engine-semantics row plain equi-joins can't cover: SQL ``=`` drops
NULL = NULL, so reconciling two feeds on a nullable dimension silently
loses the NULL group — usually the most interesting one ("events with
no attributed campaign"). The null-safe operator (Spark ``<=>`` /
``eqNullSafe``, ANSI ``IS NOT DISTINCT FROM``) keeps it.

Here the nullable dimension is derived deterministically from the
props payload (``k % 7 = 0`` rows get NULL — a stand-in for an
optional attribute), the two feeds are the event stream split by
event_id parity, and the reconciliation compares per-bucket volumes
across feeds INCLUDING the NULL bucket. Drop the ``<=>`` for ``=`` and
the NULL row vanishes — the regression this oracle row would catch.

Exactness: integer counts, integer delta; the bucket is integer-or-
NULL arithmetic identical in both engines.

Scale: each feed is one map-side-combined groupBy over a pruned scan;
the join is |buckets|-bounded. At 100 TB the two scans dominate (a
production deployment would feed both sides from one pass — kept
separate here because the SEMANTICS of the join is the row's point).

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-10 grading window — first
driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

_BUCKET = (
    "CASE WHEN cast(get_json_object(props, '$.k') as bigint) % 7 = 0"
    " THEN NULL"
    " ELSE cast(get_json_object(props, '$.k') as bigint) % 5 END"
)
_DUCK_BUCKET = (
    "CASE WHEN cast(json_extract_string(props, '$.k') AS bigint) % 7 = 0"
    " THEN NULL"
    " ELSE cast(json_extract_string(props, '$.k') AS bigint) % 5 END"
)


def q_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_feed_a, n_feed_b, delta): per-bucket volumes of the
    two parity feeds, reconciled with null-safe equality so the NULL
    bucket survives the join."""
    ev = read_table(spark, sf_dir, "events")
    tagged = ev.select(
        F.expr(_BUCKET).alias("bucket"),
        F.expr("event_id % 2").alias("feed"),
    )
    a = (
        tagged.filter("feed = 0")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_feed_a"))
    )
    b = (
        tagged.filter("feed = 1")
        .groupBy(F.col("bucket").alias("bucket_b"))
        .agg(F.count(F.lit(1)).alias("n_feed_b"))
    )
    return (
        a.join(b, a["bucket"].eqNullSafe(b["bucket_b"]))
        .select(
            "bucket",
            "n_feed_a",
            "n_feed_b",
            F.expr("n_feed_a - n_feed_b").alias("delta"),
        )
        .orderBy(F.col("bucket").asc_nulls_first())
    )


Q_NULL_SAFE_JOIN_SQL = f"""
WITH tagged AS (
  SELECT {_DUCK_BUCKET} AS bucket, event_id % 2 AS feed FROM events
),
a AS (
  SELECT bucket, count(*) AS n_feed_a FROM tagged
  WHERE feed = 0 GROUP BY 1
),
b AS (
  SELECT bucket AS bucket_b, count(*) AS n_feed_b FROM tagged
  WHERE feed = 1 GROUP BY 1
)
SELECT a.bucket, a.n_feed_a, b.n_feed_b,
       a.n_feed_a - b.n_feed_b AS delta
FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket_b
ORDER BY a.bucket NULLS FIRST
"""


NULLSAFE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_null_safe_join": q_null_safe_join,
}

NULLSAFE_ORACLES: dict[str, str] = {
    "q_null_safe_join": Q_NULL_SAFE_JOIN_SQL,
}
