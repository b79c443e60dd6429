"""Grouped OLS regression from exact decimal moments: price elasticity.

The per-segment "does discount move volume" readout: for each brand,
the least-squares line quantity = intercept + slope · discount over
that brand's lineitems. Engine regr_slope()/regr_intercept() have the
same flaw as corr(): float moment accumulation in partition order. The
``q_numeric_corr`` discipline extends to GROUPED moments unchanged —
per-brand Σx, Σy, Σxy, Σx² accumulate as exact decimals (associative),
and the closed forms

    slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n

evaluate in fixed-order correctly-rounded doubles — bit-identical
across engines and partitionings.

Scale: one dim join (part → brand, AQE-decided build side — part
scales with SF so it carries no forced hint) onto the fact scan, then
ONE map-side-combined groupBy(brand) carrying 5 moment cells — output
bounded by |brands|. The regression math runs on 25 rows. At 100 TB
this is a scan with a broadcast hash join, nothing else.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-10 grading window — first
driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

_X = "cast(l_discount as decimal(19,4))"  # regressor: discount
_Y = "cast(l_quantity as decimal(19,4))"  # response: quantity

_MOMENTS = [
    (f"sum({_X})", "sx"),
    (f"sum({_Y})", "sy"),
    (f"sum(cast({_X} * {_Y} as decimal(38,8)))", "sxy"),
    (f"sum(cast({_X} * {_X} as decimal(38,8)))", "sxx"),
    ("count(*)", "n"),
]

_SLOPE = (
    "(cast(n as double) * cast(sxy as double)"
    " - cast(sx as double) * cast(sy as double))"
    " / (cast(n as double) * cast(sxx as double)"
    " - cast(sx as double) * cast(sx as double))"
)
_INTERCEPT = (
    "(cast(sy as double) - ({slope}) * cast(sx as double))"
    " / cast(n as double)"
)


def q_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(p_brand, n_rows, slope, intercept): per-brand OLS of quantity
    on discount, bit-exact from decimal moments."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_quantity"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # part scales with SF: no forced broadcast hint — AQE broadcasts
    # from runtime stats when the dim is actually small
    moments = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(*[F.expr(e).alias(al) for e, al in _MOMENTS])
    )
    return (
        moments.selectExpr(
            "p_brand",
            "n AS n_rows",
            f"{_SLOPE} AS slope",
            f"{_INTERCEPT.format(slope=_SLOPE)} AS intercept",
        )
        .orderBy("p_brand")
    )


def _reg_sql() -> str:
    moment_cols = ",\n         ".join(f"{e} AS {al}" for e, al in _MOMENTS)
    return f"""
WITH m AS (
  SELECT p.p_brand, {moment_cols}
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1
)
SELECT p_brand, n AS n_rows,
       {_SLOPE} AS slope,
       {_INTERCEPT.format(slope=_SLOPE)} AS intercept
FROM m
ORDER BY p_brand
"""


GROUPREG_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_group_regression": q_group_regression,
}

GROUPREG_ORACLES: dict[str, str] = {
    "q_group_regression": _reg_sql(),
}
