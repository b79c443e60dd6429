"""Weekly autocorrelation of event volume, as Spearman rank correlation.

``q_seasonality`` reads the day-of-week profile; this is the
complementary question a traffic monitor asks — "does this week's
volume curve TRACK last week's?" — i.e. the lag-7 autocorrelation of
the daily count series per event type. High = stable weekly rhythm;
a sudden drop is the incident/regime-change signal.

House exactness: Pearson's r on raw counts needs float products of
float means; SPEARMAN on min-ranks needs only INTEGER sums —
rank stats are one of the sanctioned log-free constructs
(vocab_rank_shift precedent). With tied counts sharing their min rank
(``rank()``, identical both engines):

    r = (nΣxy − ΣxΣy) / (sqrt(nΣx²−(Σx)²) · sqrt(nΣy²−(Σy)²))

— every radicand an exact BIGINT, then two IEEE sqrts and one
division with identical expression text on both engines.
Zero-variance series (a constant week) report NULL, not a division
blow-up.

Scale: one (type, day) map-side-combined aggregate over events is the
corpus-scale pass; the lag join and the two rank windows run on the
daily spine (types × days — calendar-bounded, the domain-bounded
window rule).

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-14 grading window — first driver slot
round 15.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

LAG_DAYS = 7


def events_lag_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_days, lag_days, spearman): lag-7 Spearman rank
    autocorrelation of the daily event-count series per type."""
    daily = (
        read_table(spark, sf_dir, "events")
        .select(
            "event_type", F.expr("cast(ts as date)").alias("d")
        )
        .groupBy("event_type", "d")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cur = daily.select(
        "event_type", "d", F.col("n").alias("x")
    )
    prev = daily.select(
        "event_type",
        F.expr(f"date_add(d, {LAG_DAYS})").alias("d"),
        F.col("n").alias("y"),
    )
    pairs = cur.join(prev, ["event_type", "d"])
    wx = Window.partitionBy("event_type").orderBy("x")
    wy = Window.partitionBy("event_type").orderBy("y")
    ranked = pairs.select(
        "event_type",
        F.rank().over(wx).cast("bigint").alias("rx"),
        F.rank().over(wy).cast("bigint").alias("ry"),
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("rx").alias("sx"),
            F.sum("ry").alias("sy"),
            F.expr("sum(rx * rx)").alias("sxx"),
            F.expr("sum(ry * ry)").alias("syy"),
            F.expr("sum(rx * ry)").alias("sxy"),
        )
        .selectExpr(
            "event_type",
            "n_days",
            f"cast({LAG_DAYS} as int) AS lag_days",
            "CASE WHEN n_days * sxx - sx * sx = 0"
            "       OR n_days * syy - sy * sy = 0 THEN cast(NULL as double)"
            " ELSE cast(n_days * sxy - sx * sy as double)"
            "      / (sqrt(cast(n_days * sxx - sx * sx as double))"
            "         * sqrt(cast(n_days * syy - sy * sy as double)))"
            " END AS spearman",
        )
        .orderBy("event_type")
    )


EVENTS_LAG_SPEARMAN_SQL = f"""
WITH daily AS (
  SELECT event_type, cast(ts AS date) AS d, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, a.n AS x, b.n AS y
  FROM daily a
  JOIN daily b ON b.event_type = a.event_type
              AND a.d = b.d + {LAG_DAYS}
),
ranked AS (
  SELECT event_type,
         cast(rank() OVER (PARTITION BY event_type ORDER BY x) AS bigint)
           AS rx,
         cast(rank() OVER (PARTITION BY event_type ORDER BY y) AS bigint)
           AS ry
  FROM pairs
),
s AS (
  SELECT event_type, count(*)::BIGINT AS n_days,
         sum(rx)::BIGINT AS sx, sum(ry)::BIGINT AS sy,
         sum(rx * rx)::BIGINT AS sxx, sum(ry * ry)::BIGINT AS syy,
         sum(rx * ry)::BIGINT AS sxy
  FROM ranked GROUP BY 1
)
SELECT event_type, n_days, cast({LAG_DAYS} AS int) AS lag_days,
       CASE WHEN n_days * sxx - sx * sx = 0
              OR n_days * syy - sy * sy = 0 THEN cast(NULL AS double)
       ELSE cast(n_days * sxy - sx * sy AS double)
            / (sqrt(cast(n_days * sxx - sx * sx AS double))
               * sqrt(cast(n_days * syy - sy * sy AS double)))
       END AS spearman
FROM s
ORDER BY event_type
"""


LAGSPEARMAN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_lag_spearman": events_lag_spearman,
}

LAGSPEARMAN_ORACLES: dict[str, str] = {
    "events_lag_spearman": EVENTS_LAG_SPEARMAN_SQL,
}
