"""IQR (Tukey-fence) volume anomaly detection over daily event counts.

The robust cousin of ``dq_volume_zscore`` (plans/volumez.py): z-scores
assume the volume distribution is roughly normal and one crazy day
drags the mean/stddev it's judged against; Tukey fences
(Q1 − 1.5·IQR, Q3 + 1.5·IQR) are quartile-based, so a single outlier
day can't move its own goalposts. This is the default anomaly gate a
monitoring stack ships because it needs no distribution assumption.

Spark-first shape: ONE map-side-combined groupBy to day grain
(calendar-bounded regardless of event volume), exact quartiles over
that bounded frame via ``percentile`` (partial+merge, no global sort),
broadcast back, per-day classification by comparison.

Exactness: counts are integers; percentile interpolation is
bit-identical across engines (the q_percentiles/q_decile_lift pin);
1.5 is exactly representable (3/2), so the fence arithmetic is two
correctly-rounded double ops — identical everywhere. The ``1.5``
literal is CAST to double in-text (Spark parses bare decimals as
DECIMAL — the repo-wide rule).

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

_STATUS = (
    "CASE WHEN cast(n_events as double) < lo THEN 'low'"
    " WHEN cast(n_events as double) > hi THEN 'high'"
    " ELSE 'normal' END"
)


def events_anomaly_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, n_events, status): every day classified against the Tukey
    fences of the daily-count distribution (low / high / normal)."""
    daily = (
        read_table(spark, sf_dir, "events", parallel=True)
        .groupBy(F.expr("cast(ts as date)").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    fences = daily.agg(
        F.expr("percentile(n_events, 0.25)").alias("q1"),
        F.expr("percentile(n_events, 0.75)").alias("q3"),
    ).select(
        F.expr("q1 - (q3 - q1) * cast(1.5 as double)").alias("lo"),
        F.expr("q3 + (q3 - q1) * cast(1.5 as double)").alias("hi"),
    )
    return (
        daily.crossJoin(F.broadcast(fences))
        .select("day", "n_events", F.expr(_STATUS).alias("status"))
        .orderBy("day")
    )


EVENTS_ANOMALY_IQR_SQL = f"""
WITH daily AS (
  SELECT cast(ts AS date) AS day, count(*) AS n_events
  FROM events GROUP BY 1
),
fences AS (
  SELECT q1 - (q3 - q1) * cast(1.5 AS double) AS lo,
         q3 + (q3 - q1) * cast(1.5 AS double) AS hi
  FROM (
    SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY n_events) AS q1,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY n_events) AS q3
    FROM daily
  )
)
SELECT day, n_events, {_STATUS} AS status
FROM daily CROSS JOIN fences
ORDER BY day
"""


IQR_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_anomaly_iqr": events_anomaly_iqr,
}

IQR_ORACLES: dict[str, str] = {
    "events_anomaly_iqr": EVENTS_ANOMALY_IQR_SQL,
}
