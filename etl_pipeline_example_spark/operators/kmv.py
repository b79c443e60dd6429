"""K-Minimum-Values (theta) distinct sketch over the event stream.

The KMV/bottom-k sketch (Bar-Yossef et al. '02; the theta sketch's
core) completes the bounded-memory sketch family next to the CMS
frequency sketch (cmsketch.py) and the HLL register table (hll.py):
keep the K smallest hash values of the key set; the K-th smallest
pins the density, so distinct ≈ (K-1)·M/h_(K) over hash space M. Two
properties make it THE mergeable distinct sketch at 100 TB:

- the state is K hashes per group regardless of key cardinality;
- sketches MERGE by "union the hash sets, keep the K smallest" —
  set-union semantics, which is exactly what the union row below
  exercises across the per-event-type sketches (the theta-sketch
  union; HLL merges by max, CMS by addition, KMV by bottom-k).

Per event_type: the K=32 smallest 60-bit hashes of its distinct
users, reported as ``(grp, n_kept, kth_hash, est_distinct,
exact_distinct)`` — plus one ``__union__`` row whose sketch is merged
from the per-group sketches ONLY (never from raw data), certifying
the merge path against the exact global distinct count.

Exactness: hashes via the shared md5 construct (hashing.py), kept
rows chosen by ``row_number() over (partition by grp order by h,
user_id)`` — identical in DuckDB; the estimator is one double
multiply of exactly-representable constants ((K-1)·2^60) and one
double division, the same expression text both engines, so the
value-hash matches bit-for-bit. Groups smaller than K report their
exact count (the estimator is undefined there by construction).

Scale shape: one distinct shuffle on (grp, user), then the top-K is
a WindowGroupLimit rank filter (never a global sort); everything
downstream of ``kept`` is G·K rows. The union sketch reads the G·K
kept rows, not the events.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.sources.readers import read_table

KMV_K = 32
_M = 1152921504606846976  # 2^60: the hash space of the md5-slice

# (K-1)*M/kth, all three operands exactly representable as doubles
# (31*2^60 has a 5-bit mantissa), written with the SAME text both
# engines so IEEE rounding is bit-identical
_EST = (
    f"CAST({KMV_K - 1} AS DOUBLE) * CAST({_M} AS DOUBLE)"
    " / CAST(kth_hash AS DOUBLE)"
)
_EST_CASE = (
    f"CASE WHEN n_kept < {KMV_K} THEN CAST(exact_distinct AS DOUBLE)"
    f" ELSE {_EST} END"
)


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, n_kept, kth_hash, est_distinct, exact_distinct): the
    bottom-K distinct sketch per event_type plus the merged
    ``__union__`` sketch, each against its exact distinct count."""
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
    )
    hashed = ev.select(
        F.col("event_type").alias("grp"),
        "user_id",
        F.expr(
            spark_hexint("concat('kmv:', cast(user_id as string))")
        ).alias("h"),
    )
    w = Window.partitionBy("grp").orderBy(F.asc("h"), F.asc("user_id"))
    kept = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("grp", "h")
    )
    pergrp = (
        kept.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
        .join(
            hashed.groupBy("grp").agg(
                F.count(F.lit(1)).alias("exact_distinct")
            ),
            "grp",
        )
    )
    # union sketch: merged from the per-group KEPT hashes only (same
    # user under two types shares one hash — distinct dedups it, the
    # theta set-union), never from the raw key stream
    uni = (
        kept.select("h")
        .distinct()
        .orderBy(F.asc("h"))
        .limit(KMV_K)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_hash"),
        )
        .crossJoin(
            F.broadcast(
                hashed.select("user_id")
                .distinct()
                .agg(F.count(F.lit(1)).alias("exact_distinct"))
            )
        )
        .select(F.lit("__union__").alias("grp"), "n_kept", "kth_hash", "exact_distinct")
    )
    return (
        pergrp.unionByName(uni)
        .select(
            "grp",
            F.col("n_kept").cast("int").alias("n_kept"),
            "kth_hash",
            F.expr(_EST_CASE).alias("est_distinct"),
            "exact_distinct",
        )
        .orderBy("grp")
    )


_DH = duck_hexint("concat('kmv:', user_id)")

SKETCH_KMV_DISTINCT_SQL = f"""
WITH hashed AS (
  SELECT DISTINCT event_type AS grp, user_id, {_DH} AS h
  FROM events
),
kept AS (
  SELECT grp, h FROM (
    SELECT grp, h,
           row_number() OVER (PARTITION BY grp ORDER BY h, user_id)
             AS rn
    FROM hashed
  ) WHERE rn <= {KMV_K}
),
pergrp AS (
  SELECT k.grp, count(*) AS n_kept, max(k.h) AS kth_hash,
         any_value(e.exact_distinct) AS exact_distinct
  FROM kept k
  JOIN (SELECT grp, count(*) AS exact_distinct FROM hashed GROUP BY 1) e
    ON e.grp = k.grp
  GROUP BY 1
),
uni AS (
  SELECT '__union__' AS grp, count(*) AS n_kept, max(h) AS kth_hash,
         (SELECT count(DISTINCT user_id) FROM hashed) AS exact_distinct
  FROM (SELECT DISTINCT h FROM kept ORDER BY h LIMIT {KMV_K})
),
allrows AS (
  SELECT * FROM pergrp UNION ALL SELECT * FROM uni
)
SELECT grp, CAST(n_kept AS int) AS n_kept, kth_hash,
       {_EST_CASE} AS est_distinct,
       exact_distinct
FROM allrows
ORDER BY grp
"""


KMV_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sketch_kmv_distinct": sketch_kmv_distinct,
}

KMV_ORACLES: dict[str, str] = {
    "sketch_kmv_distinct": SKETCH_KMV_DISTINCT_SQL,
}
