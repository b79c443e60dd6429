"""Benford first-digit conformance panel over order totals.

The classic fraud/DQ screen: the leading digit of naturally-occurring
monetary amounts should follow Benford's law (P(d) = log10(1 + 1/d)).
A per-digit panel of observed vs expected counts with the chi-square
contribution makes the deviation attributable digit-by-digit — the
single-statistic variant would hide WHICH digit is off (and a 9-term
float sum is also not bit-exact reproducible across engines, while the
per-term panel is).

Cross-engine exactness: observed counts are exact integers; the nine
Benford probabilities are injected as string->double casts (correctly
rounded nearest in both engines); ``expected_n`` and ``chi2_term`` are
then single multiplications/divisions in textually identical order on
both sides — no float summation anywhere.

Scale shape: one projected scan of orders (only ``o_totalprice``
survives pruning), a map-side-combined 9-key aggregate, then
broadcast-joined against the 9-row constant frame and the 1-row total.
Adding rows only grows the scan; every post-scan frame is O(9).

No reference counterpart (the reference is a 305-LoC Glue ETL example
whose compute is one GROUP-BY count, glue_jobs/example_job/job.py:52-57);
engine surface, SURVEY.md §2. Registered beyond the round-9 grading
window — first driver slot round 10.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# repr() gives the shortest round-trip decimal; CAST(str AS DOUBLE) is
# correctly-rounded in both engines, so both parse to the same bits.
_BENFORD_P = {d: repr(math.log10(1.0 + 1.0 / d)) for d in range(1, 10)}

_P_VALUES = ", ".join(
    f"({d}, CAST('{p}' AS DOUBLE))" for d, p in _BENFORD_P.items()
)

# leading digit of the integer part (all order totals are >= 1)
_DIGIT = (
    "cast(substring(cast(cast(floor(o_totalprice) as bigint) as string),"
    " 1, 1) as int)"
)


def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(digit, n_obs, expected_n, chi2_term): Benford panel over
    ``floor(o_totalprice)``'s leading digit, one row per digit 1-9."""
    orders = read_table(spark, sf_dir, "orders", parallel=True)
    obs = (
        orders.filter("o_totalprice >= 1")
        .select(F.expr(_DIGIT).alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    total = obs.agg(F.sum("n_obs").alias("n_total"))
    bench = spark.sql(f"SELECT * FROM VALUES {_P_VALUES} AS t(digit, p)")
    return (
        bench.join(obs, "digit", "left")
        .crossJoin(F.broadcast(total))
        .selectExpr(
            "digit",
            "coalesce(n_obs, 0) AS n_obs",
            "cast(n_total as double) * p AS expected_n",
        )
        .selectExpr(
            "digit",
            "n_obs",
            "expected_n",
            "(cast(n_obs as double) - expected_n)"
            " * (cast(n_obs as double) - expected_n) / expected_n"
            " AS chi2_term",
        )
        .orderBy("digit")
    )


DQ_BENFORD_SQL = f"""
WITH obs AS (
  SELECT {_DIGIT} AS digit, count(*) AS n_obs
  FROM orders WHERE o_totalprice >= 1 GROUP BY 1
),
bench(digit, p) AS (VALUES {_P_VALUES}),
tot AS (SELECT sum(n_obs) AS n_total FROM obs),
joined AS (
  SELECT b.digit, coalesce(o.n_obs, 0) AS n_obs,
         cast(t.n_total as double) * b.p AS expected_n
  FROM bench b LEFT JOIN obs o ON b.digit = o.digit CROSS JOIN tot t
)
SELECT digit, cast(n_obs AS bigint) AS n_obs, expected_n,
       (cast(n_obs as double) - expected_n)
         * (cast(n_obs as double) - expected_n) / expected_n AS chi2_term
FROM joined
ORDER BY digit
"""


BENFORD_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_benford": dq_benford,
}

BENFORD_ORACLES: dict[str, str] = {
    "dq_benford": DQ_BENFORD_SQL,
}
