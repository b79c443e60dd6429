"""Sliding-window burst detection over the event stream.

Rate-limit forensics / abuse detection / hot-key discovery all reduce
to the same primitive: "the most events any key produced inside any
sliding T-second window". This is the windowed complement of the
point anomaly ops (``anomaly_mad`` flags level outliers; a burst is a
RATE outlier invisible to per-day aggregates).

Per user: a RANGE-frame count over event epochs (window partitioned
by user_id, ordered by epoch-second, frame ``[now-3599, now]`` — the
standard sessionization partitioning, never a global order), then the
per-user maximum and the EARLIEST second achieving it; the exact
top-20 bursts overall. All arithmetic is integer (epoch seconds,
counts); ordering ties break by (burst_n desc, user asc, at_epoch
asc), fully deterministic both engines.

Scale shape: one shuffle on user_id; the RANGE frame is monotone so
Spark evaluates it with a sliding two-pointer pass per partition, no
per-row rescans; the top-20 is TakeOrderedAndProject, never a global
sort.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

BURST_WINDOW_S = 3600
BURST_K = 20


def events_burst_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, burst_n, at_epoch): the top-20 sliding-hour bursts —
    burst_n = max events of the user inside any [t-3599, t] second
    window, at_epoch = the earliest window end achieving it."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("epoch")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-(BURST_WINDOW_S - 1), 0)
    )
    per_row = ev.withColumn("win_n", F.count(F.lit(1)).over(w)).withColumn(
        "mx", F.max("win_n").over(Window.partitionBy("user_id"))
    )
    return (
        per_row.groupBy("user_id")
        .agg(
            F.max("win_n").alias("burst_n"),
            F.min(
                F.when(F.col("win_n") == F.col("mx"), F.col("epoch"))
            ).alias("at_epoch"),
        )
        .orderBy(
            F.col("burst_n").desc(),
            F.col("user_id").asc(),
        )
        .limit(BURST_K)
        .select("user_id", "burst_n", "at_epoch")
    )


EVENTS_BURST_TOPK_SQL = f"""
WITH per_row AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS epoch,
         count(*) OVER (
           PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           RANGE BETWEEN {BURST_WINDOW_S - 1} PRECEDING AND CURRENT ROW
         ) AS win_n
  FROM events
),
with_mx AS (
  SELECT user_id, epoch, win_n,
         max(win_n) OVER (PARTITION BY user_id) AS mx
  FROM per_row
),
per_user AS (
  SELECT user_id, max(win_n) AS burst_n,
         min(CASE WHEN win_n = mx THEN epoch END) AS at_epoch
  FROM with_mx
  GROUP BY user_id
)
SELECT user_id, burst_n, at_epoch
FROM per_user
ORDER BY burst_n DESC, user_id ASC
LIMIT {BURST_K}
"""


BURST_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_burst_topk": events_burst_topk,
}

BURST_ORACLES: dict[str, str] = {
    "events_burst_topk": EVENTS_BURST_TOPK_SQL,
}
