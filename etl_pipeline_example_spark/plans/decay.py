"""Exponential time-decay scoring with EXACT arithmetic.

Recency-weighted volume — "recent activity counts more, with a
half-life" — is the standard engagement/trending score, and the
standard implementation (``pow(0.5, age/halflife)``) is banned by the
repo's oracle rule: libm ``pow`` rounding differs across engines. The
exact re-expression: quantize age to whole half-life buckets
(``k = min(floor(age_days/7), 10)``), where every weight 0.5^k for
integer k ≤ 10 is a dyadic rational exactly representable as
DECIMAL(14,10) — the weights become a CASE lookup of exact literals,
the score a decimal sum (associative → partition-order-free), and the
two engines agree bit-for-bit. The cap (k=10, weight ≈ 0.001) is the
"older than 10 half-lives contributes its floor" cutoff every decayed
dashboard applies anyway.

Spark-first shape: one map-side-combined (event_type, k) aggregate —
the bucket space is |types| × 11 regardless of event volume — then an
11-term weighted rollup.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

HALF_LIFE_DAYS = 7
DECAY_CAP = 10  # k and weight floor: 0.5^10

# exact dyadic literals: 0.5^k has k significant decimals, all within
# DECIMAL(14,10) for k <= 10
_W = {k: f"{0.5 ** k:.10f}" for k in range(DECAY_CAP + 1)}

_WEIGHT_CASE = (
    "CASE "
    + " ".join(
        f"WHEN k = {k} THEN CAST({w} AS DECIMAL(14,10))"
        for k, w in _W.items()
    )
    + " END"
)


def q_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, decayed_score): half-life-weighted event
    volume per type (7-day half-life, 10-bucket cap), exact decimal."""
    ev = read_table(spark, sf_dir, "events", parallel=True)
    anchor = ev.agg(F.expr("max(cast(ts as date))").alias("d1"))
    buckets = (
        ev.crossJoin(F.broadcast(anchor))
        .select(
            "event_type",
            F.expr(
                "least(cast(datediff(d1, cast(ts as date)) div"
                f" {HALF_LIFE_DAYS} as int), {DECAY_CAP})"
            ).alias("k"),
        )
        .groupBy("event_type", "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        buckets.select(
            "event_type",
            "n",
            F.expr(f"n * ({_WEIGHT_CASE})").alias("w_n"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.expr("cast(sum(w_n) as double)").alias("decayed_score"),
        )
        .orderBy("event_type")
    )


Q_DECAYED_ENGAGEMENT_SQL = f"""
WITH anchor AS (SELECT max(cast(ts AS date)) AS d1 FROM events),
buckets AS (
  SELECT event_type,
         least(cast(date_diff('day', cast(ts AS date), d1)
                    // {HALF_LIFE_DAYS} AS int), {DECAY_CAP}) AS k,
         count(*) AS n
  FROM events CROSS JOIN anchor
  GROUP BY 1, 2
)
SELECT event_type, cast(sum(n) AS bigint) AS n_events,
       cast(sum(n * ({_WEIGHT_CASE})) AS double) AS decayed_score
FROM buckets
GROUP BY event_type
ORDER BY event_type
"""


DECAY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_decayed_engagement": q_decayed_engagement,
}

DECAY_ORACLES: dict[str, str] = {
    "q_decayed_engagement": Q_DECAYED_ENGAGEMENT_SQL,
}
