"""Bollinger-band breaches, decimal-exact: no sqrt, no division.

The classic volatility-band alert — price outside mean ± 2σ of its
trailing window — looks hopelessly float-y (mean, variance, square
root), but the BREACH PREDICATE is algebraic: with S = Σp, Q = Σp²
over the n-row frame,

    p > mean + 2σ  ⟺  n·p − S > 0  ∧  (n·p − S)² > 4·(n·Q − S²)
    p < mean − 2σ  ⟺  n·p − S < 0  ∧  (n·p − S)² > 4·(n·Q − S²)

(both sides multiplied by n²; n·Q − S² ≥ 0 by Cauchy–Schwarz).
Everything is decimal addition/multiplication of 2-dp prices — exact
and ASSOCIATIVE, so DuckDB's segment-tree window sums and Spark's
running frames agree bit-for-bit, where a float formulation would
diverge (the q_weighted_median lesson). Widths are chosen so every
multiply stays inside DuckDB's 38-digit product limit, dev_n's scaled
integer stays under 2^53 (decimal→double is then exact in both
engines), and the discriminant reports FLOORED to a bigint (floor, not
cast: engines disagree on decimal→int rounding).

Per customer over (o_orderdate, o_orderkey)-ordered orders, trailing
7-row frame. Frames with n < 2 carry no variance information and
report no breach.

Scale shape: one o_custkey exchange, two decimal window sums over a
bounded frame, pure expression arithmetic after that.

No reference counterpart (305-LoC Glue ETL); engine surface, SURVEY.md
§2. Registered beyond the round-12 grading window — first driver slot
round 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

FRAME = 6  # preceding rows; frame size n <= 7
K = 2  # band half-width in sigmas

# shared expression text: identical in both engines (ANSI intersection)
_DEV = "(CAST(n_window AS DECIMAL(3,0)) * p - s)"  # (15,2)-ish, exact
_DISC = (
    "(CAST(n_window AS DECIMAL(3,0)) * q"
    " - CAST(s AS DECIMAL(14,2)) * CAST(s AS DECIMAL(14,2)))"
)  # n·Q − S²: widths 3+20 and 14+14, both inside 38
_BREACH = (
    "CAST(n_window >= 2 AND {sign}"
    f" AND CAST({_DEV} AS DECIMAL(16,2)) * CAST({_DEV} AS DECIMAL(16,2))"
    f" > {K * K} * {_DISC}"
    " AS BOOLEAN)"
)
_PROJ = [
    "o_custkey",
    "o_orderkey",
    "n_window",
    f"CAST({_DEV} AS DOUBLE) AS dev_n",
    f"CAST(floor({_DISC}) AS BIGINT) AS disc_floor",
    _BREACH.format(sign=f"{_DEV} > 0") + " AS breach_hi",
    _BREACH.format(sign=f"{_DEV} < 0") + " AS breach_lo",
]


def q_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, o_orderkey, n_window, dev_n, disc_floor, breach_hi,
    breach_lo): exact ±2σ Bollinger breach flags over each customer's
    trailing 7 orders."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("CAST(o_totalprice AS DECIMAL(12,2))").alias("p"),
    )
    win = (
        f"(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
        f"ROWS BETWEEN {FRAME} PRECEDING AND CURRENT ROW)"
    )
    framed = orders.selectExpr(
        "o_custkey",
        "o_orderkey",
        "p",
        f"CAST(count(*) OVER {win} AS INT) AS n_window",
        f"CAST(sum(p) OVER {win} AS DECIMAL(14,2)) AS s",
        f"CAST(sum(CAST(p AS DECIMAL(24,4)) * p) OVER {win}"
        " AS DECIMAL(20,4)) AS q",
    )
    return framed.selectExpr(*_PROJ)


Q_BOLLINGER_SQL = f"""
WITH framed AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_totalprice AS DECIMAL(12,2)) AS p,
         CAST(count(*) OVER w AS INT) AS n_window,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w
              AS DECIMAL(14,2)) AS s,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                       AS DECIMAL(24,4))
                  * CAST(o_totalprice AS DECIMAL(12,2))) OVER w
              AS DECIMAL(20,4)) AS q
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN {FRAME} PRECEDING AND CURRENT ROW)
)
SELECT {", ".join(_PROJ)}
FROM framed
"""


BOLLINGER_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_bollinger_breach": q_bollinger_breach,
}

BOLLINGER_ORACLES: dict[str, str] = {
    "q_bollinger_breach": Q_BOLLINGER_SQL,
}
