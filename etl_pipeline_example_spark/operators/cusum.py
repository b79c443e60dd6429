"""CUSUM changepoint detection over daily event volumes.

The anomaly family covers LEVEL outliers (anomaly_mad), volume-day
fences (Tukey), digit drift (Benford), distribution drift (KS) and
rate bursts (events_burst_topk) — but not the classic CHANGEPOINT
question: "on which day did this series' mean shift?". Page's CUSUM
('54) is the standard answer, and its sequential recurrence

    S_t = max(0, S_{t-1} + (x_t - k))

unrolls exactly to
``S_t = cumsum(y)_t - min(0, min_{tau<=t} cumsum(y)_tau)`` with
y = x - k — a running sum minus a running minimum CLAMPED THROUGH THE
S_0 = 0 baseline (omit the clamp and an all-negative prefix
under-reports the excursion — caught by the hand test), both plain
window aggregates, so the "inherently sequential" detector is two
partitioned window passes (the max-drawdown identity applied to
changepoints).

Exactness: x_t = events per (event_type, day); the reference k is the
series' own mean rate, kept as the exact fraction total/n_days — all
arithmetic is scaled by n_days so nothing ever divides:
``y_scaled = x_t*n_days - total``, and the reported statistic is the
exact integer ``S_scaled = max_t (cum_t - runmin_t)`` with its
``n_days`` denominator alongside (the house numerator/denominator
reporting rule; S = S_scaled / n_days in real units). Both engines
run the identical integer windows. The upward and downward detectors
are symmetric; both are reported with their argmax day (earliest on
ties — deterministic).

Scale shape: one day-grain aggregate, then windows PARTITIONED BY
event_type over the day domain (bounded: days, not rows); one G-row
output.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(grp, n_days, total, up_scaled, up_day, down_scaled, down_day):
    per event_type the maximum upward and downward CUSUM excursions of
    the daily count series around its own mean rate (scaled by n_days
    — divide by n_days for real units), with the day each peaks."""
    daily = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"),
            F.to_date("ts").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    stats = daily.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("bigint").alias("total"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        daily.join(stats, "grp")
        .withColumn("y", F.col("x") * F.col("n_days") - F.col("total"))
        .withColumn("cum", F.sum("y").over(w).cast("bigint"))
        .withColumn("runmin", F.min("cum").over(w))
        .withColumn("runmax", F.max("cum").over(w))
        .withColumn(
            "s_up", F.col("cum") - F.least(F.col("runmin"), F.lit(0))
        )
        .withColumn(
            "s_dn", F.greatest(F.col("runmax"), F.lit(0)) - F.col("cum")
        )
    )
    wg = Window.partitionBy("grp")
    peaked = cum.withColumn("mx_up", F.max("s_up").over(wg)).withColumn(
        "mx_dn", F.max("s_dn").over(wg)
    )
    return (
        peaked.groupBy("grp")
        .agg(
            F.max("n_days").cast("bigint").alias("n_days"),
            F.max("total").alias("total"),
            F.max("s_up").alias("up_scaled"),
            F.min(
                F.when(F.col("s_up") == F.col("mx_up"), F.col("day"))
            ).alias("up_day"),
            F.max("s_dn").alias("down_scaled"),
            F.min(
                F.when(F.col("s_dn") == F.col("mx_dn"), F.col("day"))
            ).alias("down_day"),
        )
        .orderBy("grp")
    )


EVENTS_CUSUM_SHIFT_SQL = """
WITH daily AS (
  SELECT event_type AS grp, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT grp, count(*) AS n_days, CAST(sum(x) AS BIGINT) AS total
  FROM daily GROUP BY 1
),
cum AS (
  SELECT d.grp, d.day, s.n_days, s.total,
         CAST(sum(d.x * s.n_days - s.total) OVER (
           PARTITION BY d.grp ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM daily d JOIN stats s USING (grp)
),
excur AS (
  SELECT grp, day, n_days, total,
         cum - least(min(cum) OVER (
           PARTITION BY grp ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ), 0) AS s_up,
         greatest(max(cum) OVER (
           PARTITION BY grp ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ), 0) - cum AS s_dn
  FROM cum
),
peaked AS (
  SELECT grp, day, n_days, total, s_up, s_dn,
         max(s_up) OVER (PARTITION BY grp) AS mx_up,
         max(s_dn) OVER (PARTITION BY grp) AS mx_dn
  FROM excur
)
SELECT grp,
       CAST(max(n_days) AS BIGINT) AS n_days,
       max(total) AS total,
       max(s_up) AS up_scaled,
       min(CASE WHEN s_up = mx_up THEN day END) AS up_day,
       max(s_dn) AS down_scaled,
       min(CASE WHEN s_dn = mx_dn THEN day END) AS down_day
FROM peaked
GROUP BY 1
ORDER BY 1
"""


CUSUM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_cusum_shift": events_cusum_shift,
}

CUSUM_ORACLES: dict[str, str] = {
    "events_cusum_shift": EVENTS_CUSUM_SHIFT_SQL,
}
