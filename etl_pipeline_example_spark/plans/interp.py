"""Gap filling by linear interpolation: the resample step zero-fill
can't do.

``q_gapfill`` (plans/relational.py:518) densifies a series with ZERO
rows — right for counts, wrong for level series (a silent day doesn't
mean revenue was zero, it means it wasn't observed). The standard
answer is linear interpolation between the nearest observed neighbors:

  filled(d) = prev + (next − prev) · (d − prev_day)/(next_day − prev_day)

over a complete day spine. The series here is daily urgent-order
revenue (the priority filter thins the series so real gaps exist at
small SF; the construction is identical for any keyed series).

Spark-first shape: ONE map-side-combined day aggregate, a
calendar-bounded spine (sequence explode), and four window functions
— ``last(..., ignorenulls)`` looking back, ``first(..., ignorenulls)``
looking forward — over the spine. The windows are unpartitioned but
run on the CALENDAR-bounded spine (thousands of rows at any data
scale), the same boundedness argument the gapfill/allocation plans
pin; the corpus-scale work is all in the day aggregate.

Exactness: observed values are exact decimal sums cast to double
once; the interpolation is per-row double arithmetic written as the
IDENTICAL expression in both engines (same op order → same IEEE
result); day distances are integer datediffs. Spine edges are
non-null by construction (the spine spans the observed series' own
min..max).

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

SERIES_FILTER = "o_orderpriority = '1-URGENT'"

_FILL = (
    "CASE WHEN observed IS NOT NULL THEN observed"
    " ELSE prev_v + (next_v - prev_v)"
    "  * (cast(datediff(day, prev_d) as double)"
    "     / cast(datediff(next_d, prev_d) as double)) END"
)


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, observed, filled): daily urgent-order revenue with gaps
    linearly interpolated between observed neighbors."""
    orders = read_table(spark, sf_dir, "orders").filter(SERIES_FILTER)
    daily = orders.groupBy(
        F.expr("cast(o_orderdate as date)").alias("day")
    ).agg(
        F.expr(
            "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
        ).alias("observed")
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = span.select(
        F.explode(F.expr("sequence(d0, d1)")).alias("day")
    )
    grid = spine.join(daily, "day", "left")
    back = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    anchored = grid.select(
        "day",
        "observed",
        F.last("observed", ignorenulls=True).over(back).alias("prev_v"),
        F.last(
            F.when(F.col("observed").isNotNull(), F.col("day")),
            ignorenulls=True,
        ).over(back).alias("prev_d"),
        F.first("observed", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(
            F.when(F.col("observed").isNotNull(), F.col("day")),
            ignorenulls=True,
        ).over(fwd).alias("next_d"),
    )
    return anchored.select(
        "day", "observed", F.expr(_FILL).alias("filled")
    ).orderBy("day")


_DUCK_FILL = (
    "CASE WHEN observed IS NOT NULL THEN observed"
    " ELSE prev_v + (next_v - prev_v)"
    "  * (cast(date_diff('day', prev_d, day) as double)"
    "     / cast(date_diff('day', prev_d, next_d) as double)) END"
)

Q_GAPFILL_INTERP_SQL = f"""
WITH daily AS (
  SELECT cast(o_orderdate AS date) AS day,
         cast(sum(cast(o_totalprice AS decimal(18,2))) AS double)
           AS observed
  FROM orders WHERE {SERIES_FILTER} GROUP BY 1
),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
spine AS (
  SELECT cast(d0 + cast(o AS integer) AS date) AS day
  FROM span CROSS JOIN (
    SELECT unnest(range(0, 100000)) AS o
  ) WHERE d0 + cast(o AS integer) <= d1
),
grid AS (
  SELECT s.day, d.observed FROM spine s LEFT JOIN daily d ON s.day = d.day
),
anchored AS (
  SELECT day, observed,
         last_value(observed IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS prev_v,
         last_value(CASE WHEN observed IS NOT NULL THEN day END
                    IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS prev_d,
         first_value(observed IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS next_v,
         first_value(CASE WHEN observed IS NOT NULL THEN day END
                     IGNORE NULLS) OVER (
           ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         ) AS next_d
  FROM grid
)
SELECT day, observed, {_DUCK_FILL} AS filled
FROM anchored
ORDER BY day
"""


INTERP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_gapfill_interp": q_gapfill_interp,
}

INTERP_ORACLES: dict[str, str] = {
    "q_gapfill_interp": Q_GAPFILL_INTERP_SQL,
}
