"""Activity bitmaps: a user's active-day SET compressed to one integer.

The roaring-bitmap idea at engagement-store grain: each user's activity
over the trailing 30 days becomes one bigint (bit k = active k days
before the corpus's last day), so segment questions ("active ≥ 20 of
the last 30", "lapsed 10+ days") become bit tests and popcounts over
ONE column — the representation large-scale engagement stores actually
keep, instead of a join against a calendar table per question.

The anchor (max event date) comes from one scalar aggregate broadcast
back; day offsets are wall-clock ``datediff`` (the dq_freshness
lesson — never epoch math), and the mask is a sum of DISTINCT powers
of two, which IS the OR of the bit set. Everything integer, so
cross-engine equality is structural.

Plan: scalar max → distinct (user, offset) map-side combined (≤ 30
rows per user) → one shifted-sum groupBy per user → popcount. No
window, no explode, nothing collected.

No reference counterpart (305-LoC Glue ETL); engine surface, SURVEY.md
§2. Registered beyond the round-12 grading window — first driver slot
round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

WINDOW_DAYS = 30


def q_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, day_mask, n_active_days): trailing-30-day activity
    bitmap per user; bit k = active k days before the last event day."""
    events = read_table(spark, sf_dir, "events")
    anchor = events.agg(
        F.max(F.expr("CAST(ts AS DATE)")).alias("anchor")
    )
    # one distinct suffices: off is a 1:1 function of d per user
    user_day = (
        events.select("user_id", F.expr("CAST(ts AS DATE)").alias("d"))
        .distinct()
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id", F.expr("datediff(anchor, d)").alias("off")
        )
        .filter(F.col("off") < WINDOW_DAYS)
    )
    return (
        user_day.groupBy("user_id")
        .agg(
            F.sum(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(off AS INT))")
            ).alias("day_mask")
        )
        .select(
            "user_id",
            "day_mask",
            F.expr("CAST(bit_count(day_mask) AS INT)").alias(
                "n_active_days"
            ),
        )
        .orderBy("user_id")
    )


Q_ACTIVITY_BITMAP_SQL = f"""
WITH anchor AS (
  SELECT max(CAST(ts AS DATE)) AS anchor FROM events
),
user_day AS (
  SELECT DISTINCT user_id, (a.anchor - CAST(ts AS DATE)) AS off
  FROM events CROSS JOIN anchor a
  WHERE (a.anchor - CAST(ts AS DATE)) < {WINDOW_DAYS}
),
masks AS (
  SELECT user_id,
         cast(sum(CAST(1 AS BIGINT) << CAST(off AS INT)) AS bigint)
           AS day_mask
  FROM user_day GROUP BY user_id
)
SELECT user_id, day_mask,
       cast(bit_count(day_mask) AS int) AS n_active_days
FROM masks
ORDER BY user_id
"""


BITMAPDOW_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_activity_bitmap": q_activity_bitmap,
}

BITMAPDOW_ORACLES: dict[str, str] = {
    "q_activity_bitmap": Q_ACTIVITY_BITMAP_SQL,
}
