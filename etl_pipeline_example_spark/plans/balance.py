"""Semi-additive period-end balance: last value per account per
period, summed across accounts.

The warehouse measure class plain SUM gets WRONG: a balance (account
level, inventory on hand) is additive across ACCOUNTS but not across
TIME — the week's figure is each account's LAST reading, not the sum
of its readings. The canonical plan is therefore latest-per-(account,
period) (the ``q_latest_event`` QUALIFY shape) feeding a per-period
fold, and that composition is exactly what this operator pins.

Exactness: the latest row is selected by a total order (ts desc,
event_id desc — deterministic under ties); the cross-account fold uses
the repo-wide money idiom (``cast(value as decimal(18,6))`` summed
order-free, one cast to double at the end — queries.py's SUM_VALUE,
strict-green since round 6); counts and min/max are exact.

Scale: one window partitioned by (user, week) — millions of small
partitions, never a global sort — then a map-side-combined ≤|weeks|-key
aggregate. Events text/props never move.

No reference counterpart (the reference is a 305-LoC Glue ETL example);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.sources.readers import read_table

_EPOCH = "1992-01-01"
_WEEK = f"datediff(cast(ts as date), DATE '{_EPOCH}') div 7"
_BALANCE_SUM = "cast(sum(cast(balance as decimal(18,6))) as double)"


def q_period_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(week, n_accounts, total_balance, min_balance, max_balance):
    each user's LAST event value in the week, folded across users."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    w = Window.partitionBy("user_id", "week").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.select(
            "user_id",
            F.expr(_WEEK).alias("week"),
            "ts",
            "event_id",
            F.col("value").alias("balance"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        latest.groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_accounts"),
            F.expr(_BALANCE_SUM).alias("total_balance"),
            F.min("balance").alias("min_balance"),
            F.max("balance").alias("max_balance"),
        )
        .orderBy("week")
    )


Q_PERIOD_BALANCE_SQL = f"""
WITH latest AS (
  SELECT user_id,
         date_diff('day', DATE '{_EPOCH}', cast(ts AS date)) // 7 AS week,
         value AS balance,
         row_number() OVER (
           PARTITION BY user_id,
             date_diff('day', DATE '{_EPOCH}', cast(ts AS date)) // 7
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT week,
       count(*) AS n_accounts,
       {_BALANCE_SUM} AS total_balance,
       min(balance) AS min_balance,
       max(balance) AS max_balance
FROM latest
WHERE rn = 1
GROUP BY week
ORDER BY week
"""


BALANCE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_period_balance": q_period_balance,
}

BALANCE_ORACLES: dict[str, str] = {
    "q_period_balance": Q_PERIOD_BALANCE_SQL,
}
