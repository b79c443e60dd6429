"""Traffic burstiness per event type: the Fano factor of daily counts.

``dq_volume_zscore`` flags single anomalous days; ``events_lag_spearman``
reads weekly rhythm; the remaining monitor question is DISPERSION —
is this event type's daily volume Poisson-like (Fano ≈ 1), smoothed
(< 1, e.g. rate-limited or batched upstream), or bursty (> 1, flash
crowds / retry storms)? The Fano factor (variance-to-mean ratio) is
the standard point-process dispersion readout.

House exactness: with integer daily counts x over n days, report

    fano = n·(nΣx² − (Σx)²) / ((n−1) · n · Σx)
         = (nΣx² − (Σx)²) / ((n−1) · Σx)

— every term an exact BIGINT (the sample-variance radicand over the
mean, cross-multiplied), ONE double division at the boundary, no
float ever summed. Degenerate series (n < 2 or zero total) report
NULL instead of dividing by zero.

Scale: one (type, day) map-side-combined aggregate over events is the
corpus-scale pass; the dispersion rollup runs on the calendar-bounded
daily spine. No windows at all.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-14 grading window — first driver slot
round 15.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def events_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, total, fano): variance-to-mean ratio of
    the daily event-count series per type."""
    daily = (
        read_table(spark, sf_dir, "events")
        .select("event_type", F.expr("cast(ts as date)").alias("d"))
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("total"),
            F.expr("sum(n * n)").alias("sxx"),
        )
        .selectExpr(
            "event_type",
            "n_days",
            "total",
            "CASE WHEN n_days < 2 OR total = 0 THEN cast(NULL as double)"
            " ELSE cast(n_days * sxx - total * total as double)"
            "      / cast((n_days - 1) * total as double)"
            " END AS fano",
        )
        .orderBy("event_type")
    )


EVENTS_FANO_SQL = """
WITH daily AS (
  SELECT event_type, cast(ts AS date) AS d, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, count(*)::BIGINT AS n_days,
         sum(n)::BIGINT AS total, sum(n * n)::BIGINT AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, n_days, total,
       CASE WHEN n_days < 2 OR total = 0 THEN cast(NULL AS double)
       ELSE cast(n_days * sxx - total * total AS double)
            / cast((n_days - 1) * total AS double)
       END AS fano
FROM s
ORDER BY event_type
"""


FANO_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_fano": events_fano,
}

FANO_ORACLES: dict[str, str] = {
    "events_fano": EVENTS_FANO_SQL,
}
