"""Herfindahl–Hirschman concentration index per market segment.

``q_revenue_concentration`` reads concentration as a top-N share;
HHI = Σ share_i² is the standard single-number concentration metric
(antitrust thresholds, marketplace health dashboards). Here the
"market" is a part brand and the "firms" are the suppliers shipping
it: a brand served by one supplier scores 1.0, by many equal
suppliers 1/n — the supply-chain-fragility readout per brand.

Log-free and order-free by the Gini–Simpson trick (text_char_simpson
/ multimodal_pixel_diversity): with integer volumes n_i and total N,
HHI = Σn_i²/N² — exact BIGINT sums until one double division, so no
float share is ever summed.

Scale: one (brand, supplier) map-side-combined aggregate over
lineitem (the only corpus-scale pass), then a brands-bounded rollup;
the dimension join to brand broadcasts.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_market_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, n_suppliers, n_lines, hhi): supplier-concentration
    HHI per part brand, by lineitem volume."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        cells.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum("n").alias("n_lines"),
            F.expr("sum(n * n)").alias("ssq"),
        )
        .selectExpr(
            "p_brand",
            "n_suppliers",
            "n_lines",
            "cast(ssq as double) / cast(n_lines * n_lines as double)"
            " AS hhi",
        )
        .orderBy("p_brand")
    )


Q_MARKET_HHI_SQL = """
WITH cells AS (
  SELECT p.p_brand, l.l_suppkey, count(*) AS n
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
)
SELECT p_brand,
       count(*) AS n_suppliers,
       cast(sum(n) AS bigint) AS n_lines,
       cast(sum(n * n) AS double)
         / cast(sum(n) * sum(n) AS double) AS hhi
FROM cells
GROUP BY p_brand
ORDER BY p_brand
"""


HHI_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_market_hhi": q_market_hhi,
}

HHI_ORACLES: dict[str, str] = {
    "q_market_hhi": Q_MARKET_HHI_SQL,
}
