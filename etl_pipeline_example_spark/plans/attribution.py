"""Session-based purchase attribution: first-touch vs last-touch.

The marketing-analytics readout built on the engine's sessionization
idiom (``q_sessionize``'s lag + running-sum session ids): every
purchase attributes to (a) the event type that OPENED its session —
first-touch, "what brought them in" — and (b) the event type
immediately preceding the purchase inside the same session —
last-touch, "what closed the deal". A purchase that opens its own
session attributes to ``(direct)`` on both models. The two models
disagree systematically (first-touch over-credits acquisition
channels, last-touch over-credits closers), which is why the panel
reports them side by side per attributed type.

Exactness: all windows run under the total order (ts, event_id); the
outputs are plain integer counts.

Scale: the session id and the two attribution picks ride THREE window
passes over ONE (user_id)-keyed partitioning — a single shuffle that
every window reuses; the final aggregate is map-side combined over the
≤|event types|+1 keyspace. Per-user state only; props/value never
move.

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

SESSION_GAP_S = 1800
DIRECT = "(direct)"


def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(touch_type, n_first_touch, n_last_touch): purchases credited to
    the session-opening type and the immediately-preceding type."""
    ev = read_table(spark, sf_dir, "events", parallel=True).select(
        "user_id", "ts", "event_id", "event_type"
    )
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        ev.withColumn(
            "new_session",
            F.when(
                F.col("ts").cast("long")
                - F.lag(F.col("ts").cast("long")).over(order_w)
                > SESSION_GAP_S,
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_seq", F.sum("new_session").over(cum_w))
        .withColumn("prev_type", F.lag("event_type").over(order_w))
        .withColumn("prev_sess", F.lag("session_seq").over(order_w))
    )
    sess_w = Window.partitionBy("user_id", "session_seq").orderBy(
        "ts", "event_id"
    )
    attributed = (
        sess.withColumn("first_id", F.first("event_id").over(sess_w))
        .withColumn("first_type", F.first("event_type").over(sess_w))
        .filter(F.col("event_type") == "purchase")
        .selectExpr(
            f"CASE WHEN first_id = event_id THEN '{DIRECT}'"
            " ELSE first_type END AS ft",
            "CASE WHEN prev_sess IS NOT NULL AND prev_sess = session_seq"
            f" THEN prev_type ELSE '{DIRECT}' END AS lt",
        )
    )
    first = attributed.groupBy(F.col("ft").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_first_touch")
    )
    last = attributed.groupBy(F.col("lt").alias("touch_type")).agg(
        F.count(F.lit(1)).alias("n_last_touch")
    )
    return (
        first.join(last, "touch_type", "full_outer")
        .selectExpr(
            "touch_type",
            "coalesce(n_first_touch, 0) AS n_first_touch",
            "coalesce(n_last_touch, 0) AS n_last_touch",
        )
        .orderBy("touch_type")
    )


Q_ATTRIBUTION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id, event_type,
         sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_seq
  FROM flagged
), sess AS (
  SELECT user_id, ts, event_id, event_type, session_seq,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type,
         lag(session_seq) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_sess
  FROM numbered
), attributed AS (
  SELECT
    CASE WHEN first_value(event_id) OVER sw = event_id THEN '{DIRECT}'
         ELSE first_value(event_type) OVER sw END AS ft,
    CASE WHEN prev_sess IS NOT NULL AND prev_sess = session_seq
         THEN prev_type ELSE '{DIRECT}' END AS lt,
    event_type
  FROM sess
  WINDOW sw AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
), purchases AS (
  SELECT ft, lt FROM attributed WHERE event_type = 'purchase'
),
first AS (SELECT ft AS touch_type, count(*) AS n_first_touch
          FROM purchases GROUP BY 1),
last AS (SELECT lt AS touch_type, count(*) AS n_last_touch
         FROM purchases GROUP BY 1)
SELECT coalesce(f.touch_type, l.touch_type) AS touch_type,
       coalesce(f.n_first_touch, 0) AS n_first_touch,
       coalesce(l.n_last_touch, 0) AS n_last_touch
FROM first f FULL OUTER JOIN last l ON f.touch_type = l.touch_type
ORDER BY 1
"""


ATTRIBUTION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_attribution": q_attribution,
}

ATTRIBUTION_ORACLES: dict[str, str] = {
    "q_attribution": Q_ATTRIBUTION_SQL,
}
