"""Grouped exact percentiles: the per-segment latency-style panel.

``q_percentiles`` (plans/relational.py) pins the GLOBAL exact
percentile lattice; this is the grouped form every SLO/segment
dashboard actually uses — p50/p90/p99 of per-customer revenue within
each market segment, one row per segment. Exact (interpolated)
percentiles, not sketches: the aggregation state is the segment's
value list, bounded because the input is the per-customer rollup, not
the fact table.

Exactness: revenue reaches the percentile as an exact decimal-to-
double rendering; both engines interpolate percentile_cont identically
(pinned by the q_percentiles row since round 6); count is an integer.

Scale: groupBy(custkey) over orders is the only corpus-scale shuffle;
the percentile groupBy runs over |customers| rows in |segments| groups
— per-group state is customer-bounded, the documented cost of EXACT
grouped percentiles (the sketch path is dq_profile_approx). The customer
join stays AQE-decided (customer scales with SF — never a forced
broadcast).

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-10 grading window — first
driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

PCTS = (0.5, 0.9, 0.99)


def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_mktsegment, n_customers, p50_rev, p90_rev, p99_rev): exact
    per-segment percentiles of per-customer revenue."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    per = (
        # customer scales with SF: no forced broadcast — AQE decides
        orders.join(
            cust.select("c_custkey", "c_mktsegment"),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_custkey")
        .agg(
            F.expr(
                "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
            ).alias("rev")
        )
    )
    aggs = [F.count(F.lit(1)).alias("n_customers")] + [
        F.expr(f"percentile(rev, {p})").alias(f"p{int(p * 100)}_rev")
        for p in PCTS
    ]
    return per.groupBy("c_mktsegment").agg(*aggs).orderBy("c_mktsegment")


def _group_pct_sql() -> str:
    cols = ",\n       ".join(
        f"percentile_cont({p}) WITHIN GROUP (ORDER BY rev)"
        f" AS p{int(p * 100)}_rev"
        for p in PCTS
    )
    return f"""
WITH per AS (
  SELECT c.c_mktsegment, o.o_custkey,
         cast(sum(cast(o.o_totalprice AS decimal(18,2))) AS double) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT c_mktsegment, count(*) AS n_customers,
       {cols}
FROM per
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


GROUPPCT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_group_percentiles": q_group_percentiles,
}

GROUPPCT_ORACLES: dict[str, str] = {
    "q_group_percentiles": _group_pct_sql(),
}
