"""Behavioral diversity: the Gini–Simpson index per user, log-free.

"How varied is each user's behavior" is usually scored with Shannon
entropy — which needs log(), and library log ulps differ across
engines, so it can never pass a bit-exact oracle. The Gini–Simpson
index 1 − Σpᵢ² carries the same signal (0 = monomaniac, → 1 = evenly
spread) in PURE RATIONAL arithmetic: with integer type-counts cᵢ and
total n, the index is 1 − Σcᵢ²/n² — two exact integer sums and one
correctly-rounded double division. The suite-wide log-free discipline
(χ² panels, lift matrices) applied to diversity.

Output: one row per user (bounded by |users|) with event volume, type
breadth and the index; plus deterministic diversity deciles would
compose downstream via q_decile_lift's cut pattern.

Scale: ONE shuffle hashing on user_id serves both aggregations — the
(user, type) count and the per-user fold (key-subset clustering rule,
enforced by an explicit repartition) — map-side combined at each
level. No windows, no joins.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-10 grading window — first
driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_events, n_types, simpson): per-user Gini–Simpson
    behavioral-diversity index."""
    ev = read_table(spark, sf_dir, "events")
    dp = spark.sparkContext.defaultParallelism
    per_type = (
        ev.select("user_id", "event_type")
        .repartition(dp, "user_id")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.expr("sum(c * c)").alias("ssq"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.expr(
                "1.0D - cast(ssq as double)"
                " / (cast(n_events as double) * cast(n_events as double))"
            ).alias("simpson"),
        )
        .orderBy("user_id")
    )


Q_USER_DIVERSITY_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
),
folded AS (
  SELECT user_id,
         cast(sum(c) AS bigint) AS n_events,
         count(*) AS n_types,
         cast(sum(c * c) AS bigint) AS ssq
  FROM per_type GROUP BY 1
)
SELECT user_id, n_events, n_types,
       1.0 - cast(ssq AS double)
         / (cast(n_events AS double) * cast(n_events AS double))
         AS simpson
FROM folded
ORDER BY user_id
"""


DIVERSITY_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_user_diversity": q_user_diversity,
}

DIVERSITY_ORACLES: dict[str, str] = {
    "q_user_diversity": Q_USER_DIVERSITY_SQL,
}
