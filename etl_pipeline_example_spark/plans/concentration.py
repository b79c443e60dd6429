"""Revenue concentration and activity heatmap.

  q_revenue_concentration  how concentrated is revenue: the p99
                           per-customer revenue threshold (exact
                           percentile, 6-dp pinned) and the share of
                           total revenue held by customers at or above
                           it — the whale-dependency number. Computed
                           without any global rank: one grouped pass,
                           one percentile over the (customer-bounded)
                           aggregate, conditional sums against the
                           broadcast one-row threshold.
  q_events_heatmap         the hour-of-day × day-of-week activity
                           matrix (the ops-dashboard heatmap): 7×24
                           bounded output from one map-side-combined
                           aggregate; dayofweek/hour extraction is
                           identical integer arithmetic in both
                           engines (ISO day numbering pinned by the
                           oracle match).

No reference counterpart (the reference is a 305-LoC ETL example);
general query-engine surface, SURVEY.md §2 rows 20z12–20z13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

CONC_PCTL = 0.99


def q_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_customers, p99_revenue, n_top, top_share)."""
    orders = read_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
        ).alias("rev")
    )
    cut = per.agg(
        F.expr(f"round(percentile(rev, {CONC_PCTL}), 6)").alias("p99_revenue")
    )
    return (
        per.crossJoin(F.broadcast(cut))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.first("p99_revenue").alias("p99_revenue"),
            F.sum(F.expr("CASE WHEN rev >= p99_revenue THEN 1 ELSE 0 END")).alias(
                "n_top"
            ),
            F.expr(
                "round(sum(CASE WHEN rev >= p99_revenue THEN rev ELSE 0 END)"
                " / sum(rev), 6)"
            ).alias("top_share"),
        )
        .select("n_customers", "p99_revenue", "n_top", "top_share")
    )


Q_REVENUE_CONCENTRATION_SQL = f"""
WITH per AS (
  SELECT o_custkey,
         cast(sum(cast(o_totalprice AS decimal(18,2))) AS double) AS rev
  FROM orders GROUP BY 1
),
cut AS (
  SELECT round(percentile_cont({CONC_PCTL}) WITHIN GROUP (ORDER BY rev), 6)
           AS p99_revenue
  FROM per
)
SELECT count(*) AS n_customers,
       any_value(c.p99_revenue) AS p99_revenue,
       cast(sum(CASE WHEN p.rev >= c.p99_revenue THEN 1 ELSE 0 END) AS bigint)
         AS n_top,
       round(sum(CASE WHEN p.rev >= c.p99_revenue THEN p.rev ELSE 0 END)
             / sum(p.rev), 6) AS top_share
FROM per p, cut c
"""


def q_events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dow, hour, n_events): ISO day-of-week (1 = Monday) × hour
    activity counts."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    return (
        ev.groupBy(
            F.expr("weekday(ts) + 1").alias("dow"),
            F.expr("hour(ts)").alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("dow", "hour")
    )


Q_EVENTS_HEATMAP_SQL = """
SELECT isodow(ts) AS dow, cast(hour(ts) AS int) AS hour,
       count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


CONCENTRATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_revenue_concentration": q_revenue_concentration,
    "q_events_heatmap": q_events_heatmap,
}

CONCENTRATION_ORACLES: dict[str, str] = {
    "q_revenue_concentration": Q_REVENUE_CONCENTRATION_SQL,
    "q_events_heatmap": Q_EVENTS_HEATMAP_SQL,
}
