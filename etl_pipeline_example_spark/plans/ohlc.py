"""OHLC candles: open/high/low/close aggregation over event streams.

The time-series workhorse every metrics/finance stack materializes:
per (series, period), the first, max, min, and last observation. The
subtlety is determinism — "first" needs a TOTAL order, so the rank key
is (ts, event_id), never ts alone; and the whole aggregate is
arithmetic-free (picks and comparisons only — no float summation to
order), so cross-engine equality is structural rather than engineered.

Plan: ONE map-side-combined aggregate on (event_type, day) — open and
close fold in as min/max of the orderable struct (ts, event_id, value)
(struct comparison is lexicographic, so the min IS the first
observation under the total order), high/low/count are plain
aggregates in the same pass. One scan, one exchange, no window, no
join — the same single-aggregate shape its streaming twin
(streaming/ohlc.py) runs with a watermark. The oracle keeps the
independent rank-window construction, so the struct-fold and the
row_number pick certify each other.

No reference counterpart (305-LoC Glue ETL); engine surface, SURVEY.md
§2. Registered beyond the round-12 grading window — first driver slot
round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, n_events, open, high, low, close): daily
    value candles per event type."""
    ev = read_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ts AS DATE)").alias("day"),
        "ts",
        "event_id",
        "value",
    )
    return (
        ev.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.struct("ts", "event_id", "value")).alias("__first"),
            F.max(F.struct("ts", "event_id", "value")).alias("__last"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .select(
            "event_type",
            "day",
            "n_events",
            F.col("__first.value").alias("open"),
            "high",
            "low",
            F.col("__last.value").alias("close"),
        )
        .orderBy("event_type", "day")
    )


Q_EVENTS_OHLC_SQL = """
WITH ev AS (
  SELECT event_type, CAST(ts AS DATE) AS day, ts, event_id, value
  FROM events
),
ranked AS (
  SELECT event_type, day, value,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM ev
),
stats AS (
  SELECT event_type, day, count(*) AS n_events,
         max(value) AS high, min(value) AS low
  FROM ev GROUP BY 1, 2
)
SELECT s.event_type, s.day, s.n_events, o.value AS open,
       s.high, s.low, c.value AS close
FROM stats s
JOIN (SELECT event_type, day, value FROM ranked WHERE rn_a = 1) o
  ON o.event_type = s.event_type AND o.day = s.day
JOIN (SELECT event_type, day, value FROM ranked WHERE rn_d = 1) c
  ON c.event_type = s.event_type AND c.day = s.day
ORDER BY s.event_type, s.day
"""


OHLC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_events_ohlc": q_events_ohlc,
}

OHLC_ORACLES: dict[str, str] = {
    "q_events_ohlc": Q_EVENTS_OHLC_SQL,
}
