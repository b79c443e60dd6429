"""Wilson confidence intervals per experiment variant.

The decision-side companion to ``q_ab_chi2`` (plans/abtest.py — same
hash-assigned variants, same heavy-purchaser outcome): per variant,
the conversion rate with its 95% Wilson score interval. Wilson beats
the naive ±1.96·√(p(1−p)/n) normal interval at small n and extreme p
(never leaves [0,1]), which is why every experimentation platform
reports it:

  center = (p + z²/2n) / (1 + z²/n)
  half   = z·√(p(1−p)/n + z²/4n²) / (1 + z²/n)

Exactness: counts are integers; the interval arithmetic is per-row
doubles written as the IDENTICAL expression text in both engines —
same literals, same op order, and IEEE sqrt is correctly rounded, so
the bounds match bit-for-bit (the repo's allowed-function rule: sqrt
yes, log/pow no).

Scale: one map-side-combined per-user rollup (the corpus-scale pass),
then a |variants|-bounded aggregate; everything after runs on 2 rows.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.plans.abtest import (
    _CONV,
    _SPARK_KEY,
    CONV_MIN_PURCHASES,
    N_VARIANTS,
)
from etl_pipeline_example_spark.sources.readers import read_table

_Z = "CAST(1.96 AS DOUBLE)"

# identical interval text in both engines: p/n/z only
_WILSON_LO = (
    f"(p + {_Z} * {_Z} / (2 * n)) / (1 + {_Z} * {_Z} / n)"
    f" - {_Z} * sqrt(p * (1 - p) / n + {_Z} * {_Z} / (4 * n * n))"
    f" / (1 + {_Z} * {_Z} / n)"
)
_WILSON_HI = (
    f"(p + {_Z} * {_Z} / (2 * n)) / (1 + {_Z} * {_Z} / n)"
    f" + {_Z} * sqrt(p * (1 - p) / n + {_Z} * {_Z} / (4 * n * n))"
    f" / (1 + {_Z} * {_Z} / n)"
)

_DUCK_KEY = "'ab:' || cast(user_id as varchar)"


def q_ab_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(variant, n_users, n_converted, rate, wilson_lo, wilson_hi):
    per-variant conversion with the 95% Wilson score interval."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    users = (
        ev.select("user_id", F.expr(_CONV).alias("conv"))
        .groupBy("user_id")
        .agg(
            F.expr(
                f"CASE WHEN sum(conv) >= {CONV_MIN_PURCHASES} THEN 1"
                " ELSE 0 END"
            ).alias("converted")
        )
        .withColumn(
            "variant",
            F.expr(f"pmod({spark_hexint(_SPARK_KEY)}, {N_VARIANTS})"),
        )
    )
    agg = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    return (
        agg.selectExpr(
            "variant",
            "n_users",
            "n_converted",
            "cast(n_users as double) AS n",
            "cast(n_converted as double) / cast(n_users as double) AS p",
        )
        .selectExpr(
            "variant",
            "n_users",
            "n_converted",
            "p AS rate",
            f"{_WILSON_LO} AS wilson_lo",
            f"{_WILSON_HI} AS wilson_hi",
        )
        .orderBy("variant")
    )


Q_AB_WILSON_SQL = f"""
WITH users AS (
  SELECT user_id,
         CASE WHEN sum({_CONV}) >= {CONV_MIN_PURCHASES} THEN 1 ELSE 0 END
           AS converted
  FROM events GROUP BY user_id
),
assigned AS (
  SELECT converted,
         {duck_hexint(_DUCK_KEY)} % {N_VARIANTS} AS variant
  FROM users
),
agg AS (
  SELECT variant, count(*) AS n_users,
         cast(sum(converted) AS bigint) AS n_converted
  FROM assigned GROUP BY 1
),
rates AS (
  SELECT variant, n_users, n_converted,
         cast(n_users AS double) AS n,
         cast(n_converted AS double) / cast(n_users AS double) AS p
  FROM agg
)
SELECT variant, n_users, n_converted, p AS rate,
       {_WILSON_LO} AS wilson_lo,
       {_WILSON_HI} AS wilson_hi
FROM rates
ORDER BY variant
"""


WILSON_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_ab_wilson": q_ab_wilson,
}

WILSON_ORACLES: dict[str, str] = {
    "q_ab_wilson": Q_AB_WILSON_SQL,
}
