"""Distribution drift as total-variation distance, log-free and exact.

The drift panel so far reads location shift (length_drift_ks),
category mix (domain_chi2) and volume (dq_volume_zscore); TVD
½·Σ|p_i − q_i| is the bucket-histogram companion — the PSI slot on a
monitoring dashboard, but with no ln(), so it survives the suite's
bit-exact cross-engine gate (library log ulps differ; |a·d − b·c|
doesn't). Here: the order-value histogram of the corpus's OLDER half
vs its NEWER half (midpoint of the date span), 20 equal-width
buckets.

Everything that feeds the metric is integer: prices become exact
cents, bucket edges are integer cent arithmetic (no float floor at
bucket boundaries — the cross-engine trap), and each bucket's
contribution |n_old·N_new − n_new·N_old| rides decimal(38,0) so the
cross product can't wrap at petabyte row counts (the graphiter
headroom rule). One double division at the very end.

Scale: two scalar aggregates (date span, cent range) broadcast into
the scan predicate; the histogram is ONE map-side-combined 40-cell
aggregate (20 buckets × 2 eras folded as conditional sums); the TVD
total is a window over the bounded 20-row bucket spine.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

TVD_BUCKETS = 20


def dq_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_old, n_new, contrib, tvd): order-value histogram of
    the older vs newer half of the corpus and the total-variation
    distance between the two mixes."""
    o = read_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("pc"),
    )
    bounds = o.agg(
        F.min("d").alias("d_lo"),
        F.max("d").alias("d_hi"),
        F.min("pc").alias("p_lo"),
        F.max("pc").alias("p_hi"),
    )
    cells = (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.expr(
                f"least({TVD_BUCKETS - 1},"
                f" ((pc - p_lo) * {TVD_BUCKETS}) div (p_hi - p_lo + 1))"
            ).alias("bucket"),
            F.expr(
                "d < date_add(d_lo, cast(datediff(d_hi, d_lo) div 2 as int))"
            ).alias("is_old"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_old"), 1).otherwise(0)).alias("n_old"),
            F.sum(F.when(F.col("is_old"), 0).otherwise(1)).alias("n_new"),
        )
    )
    return (
        cells.withColumn(
            "contrib",
            F.expr(
                "cast(abs(cast(n_old as decimal(38,0))"
                " * sum(n_new) over ()"
                " - cast(n_new as decimal(38,0))"
                " * sum(n_old) over ()) as decimal(38,0))"
            ),
        )
        .withColumn(
            "tvd",
            F.expr(
                "cast(sum(contrib) over () as double)"
                " / (2.0D * cast(sum(n_old) over () as double)"
                " * cast(sum(n_new) over () as double))"
            ),
        )
        .select(
            "bucket",
            "n_old",
            "n_new",
            # rendering only: both engines cast the IDENTICAL exact
            # decimal to double, so the comparison stays bit-exact
            # (the registry-wide no-decimal-output policy)
            F.expr("cast(contrib as double)").alias("contrib"),
            "tvd",
        )
        .orderBy("bucket")
    )


DQ_DRIFT_TVD_SQL = f"""
WITH o AS (
  SELECT cast(o_orderdate AS date) AS d,
         cast(round(o_totalprice * 100) AS bigint) AS pc
  FROM orders
),
bounds AS (
  SELECT min(d) AS d_lo, max(d) AS d_hi,
         min(pc) AS p_lo, max(pc) AS p_hi
  FROM o
),
cells AS (
  SELECT least({TVD_BUCKETS - 1},
               ((pc - p_lo) * {TVD_BUCKETS}) // (p_hi - p_lo + 1)) AS bucket,
         d < d_lo + cast(date_diff('day', d_lo, d_hi) // 2 AS int) AS is_old
  FROM o, bounds
),
hist AS (
  SELECT bucket,
         cast(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS bigint) AS n_old,
         cast(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS bigint) AS n_new
  FROM cells GROUP BY bucket
),
contribs AS (
  SELECT bucket, n_old, n_new,
         cast(abs(cast(n_old AS decimal(38,0)) * sum(n_new) OVER ()
                  - cast(n_new AS decimal(38,0)) * sum(n_old) OVER ())
              AS decimal(38,0)) AS contrib,
         sum(n_old) OVER () AS tot_old,
         sum(n_new) OVER () AS tot_new
  FROM hist
)
SELECT cast(bucket AS bigint) AS bucket, n_old, n_new,
       cast(contrib AS double) AS contrib,
       cast(sum(contrib) OVER () AS double)
         / (2.0 * cast(tot_old AS double) * cast(tot_new AS double)) AS tvd
FROM contribs
ORDER BY bucket
"""


TVD_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_drift_tvd": dq_drift_tvd,
}

TVD_ORACLES: dict[str, str] = {
    "dq_drift_tvd": DQ_DRIFT_TVD_SQL,
}
