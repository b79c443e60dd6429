"""As-of (nearest-prior-event) join — the union-window plan, no join.

The classic time-series join Spark has no native operator for: "for
each purchase, the most recent PRIOR view by the same user, within a
tolerance". The naive formulation is an inequality self-join
(purchase ⋈ view ON same user AND v.ts <= p.ts) plus a per-purchase
argmax — a fan-out join whose cost is the product of per-user event
counts. The scale-correct plan is the UNION-WINDOW form every
production as-of implementation reduces to: tag both sides, union
them into ONE stream, sort per user by (ts, side, id), and let a
running ``last(..., ignorenulls)`` over the strictly-prior frame
carry the latest left-side row forward — one shuffle on user_id, one
ordered window pass, zero fan-out, cost linear in events per user.

Semantics pinned deterministically:

- a view at the SAME timestamp as the purchase counts as prior (the
  (ts, side) sort puts views first on ties; event_id breaks the rest);
- matches farther back than TOLERANCE (24 h) return NULL — the gap is
  reported in exact MICROSECONDS (``unix_micros`` / ``epoch_us`` —
  both engines' exact integer epoch; never ``unix_timestamp``, whose
  second-truncation and DuckDB's fractional ``epoch()`` diverge).

Scale shape: one hash exchange on user_id + one partitioned window —
the same cost as reading the events once per user; no inequality
join, no fan-out, no global sort.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

TOL_US = 24 * 3600 * 1_000_000  # 24 h in microseconds


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_event_id, user_id, v_event_id, gap_us): each purchase joined
    as-of to the user's most recent prior view within 24 h (NULL
    match and gap otherwise)."""
    ev = (
        read_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            "event_id",
            "user_id",
            F.unix_micros("ts").alias("us"),
            F.when(F.col("event_type") == "view", 0)
            .otherwise(1)
            .alias("side"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.withColumn(
        "v_id",
        F.last(
            F.when(F.col("side") == 0, F.col("event_id")),
            ignorenulls=True,
        ).over(w),
    ).withColumn(
        "v_us",
        F.last(
            F.when(F.col("side") == 0, F.col("us")), ignorenulls=True
        ).over(w),
    )
    in_tol = F.col("v_us").isNotNull() & (
        (F.col("us") - F.col("v_us")) <= F.lit(TOL_US)
    )
    return (
        carried.where(F.col("side") == 1)
        .select(
            F.col("event_id").alias("p_event_id"),
            "user_id",
            F.when(in_tol, F.col("v_id")).alias("v_event_id"),
            F.when(in_tol, F.col("us") - F.col("v_us")).alias("gap_us"),
        )
        .orderBy("p_event_id")
    )


Q_ASOF_NEAREST_SQL = f"""
WITH tagged AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('view', 'purchase')
),
carried AS (
  SELECT *,
    last_value(CASE WHEN side = 0 THEN event_id END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY us, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_id,
    last_value(CASE WHEN side = 0 THEN us END IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY us, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_us
  FROM tagged
)
SELECT event_id AS p_event_id,
       user_id,
       CASE WHEN v_us IS NOT NULL AND us - v_us <= {TOL_US}
            THEN v_id END AS v_event_id,
       CASE WHEN v_us IS NOT NULL AND us - v_us <= {TOL_US}
            THEN us - v_us END AS gap_us
FROM carried
WHERE side = 1
ORDER BY 1
"""


ASOF_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_asof_nearest": q_asof_nearest,
}

ASOF_ORACLES: dict[str, str] = {
    "q_asof_nearest": Q_ASOF_NEAREST_SQL,
}
