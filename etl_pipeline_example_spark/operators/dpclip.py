"""Differential-privacy contribution bounding audit (DP-prep).

The privacy family covers re-identification structure (k-anonymity /
l-diversity / t-closeness, operators/kanon.py) and direct identifiers
(pii_scrub). The remaining standard release-prep primitive is
CONTRIBUTION BOUNDING: before any DP mechanism adds noise, each
user's contribution to every aggregate cell must be clipped to a cap
C — the clipped sum IS the quantity the mechanism perturbs, and the
l∞ sensitivity it certifies is exactly C. The noise itself is random
(deliberately NOT an operator here — it cannot have an exact
cross-engine oracle and belongs at the release boundary); everything
BEFORE the noise is exact integer arithmetic and is what this
operator audits, per event_type and cap:

- ``raw_sum``       — unclipped event count;
- ``clipped_sum``   — Σ min(user_count, C): the DP-ready statistic;
- ``clip_loss``     — raw − clipped (utility cost of the cap);
- ``n_users``, ``n_users_clipped`` — population and how many hit the
  cap (the cap-tuning curve: C is chosen where this elbow flattens);
- ``max_contrib``   — the true l∞ sensitivity BEFORE clipping.

Caps C ∈ {1, 4, 16, 64} give the tuning curve in one pass.

Scale shape: one map-side-combined aggregate to (type, user) counts
(bounded by the active-user frame, not events), a broadcast join
against the 4-row cap table, and a G×4 re-aggregate; no window, no
global sort — the kanon.py plan shape.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline/privacy surface,
SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

DPCLIP_CAPS = (1, 4, 16, 64)


def privacy_contribution_bound(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(grp, cap, raw_sum, clipped_sum, clip_loss, n_users,
    n_users_clipped, max_contrib): the contribution-bounding audit
    panel per event_type and clip cap."""
    per_user = (
        read_table(spark, sf_dir, "events")
        .groupBy(
            F.col("event_type").alias("grp"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    caps = spark.createDataFrame(
        [(c,) for c in DPCLIP_CAPS], "cap int"
    )
    return (
        per_user.crossJoin(F.broadcast(caps))
        .groupBy("grp", "cap")
        .agg(
            F.sum("cnt").cast("bigint").alias("raw_sum"),
            F.sum(F.least(F.col("cnt"), F.col("cap").cast("bigint")))
            .cast("bigint")
            .alias("clipped_sum"),
            (
                F.sum("cnt")
                - F.sum(
                    F.least(F.col("cnt"), F.col("cap").cast("bigint"))
                )
            )
            .cast("bigint")
            .alias("clip_loss"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(
                F.when(F.col("cnt") > F.col("cap"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_users_clipped"),
            F.max("cnt").cast("bigint").alias("max_contrib"),
        )
        .orderBy("grp", "cap")
    )


PRIVACY_CONTRIBUTION_BOUND_SQL = """
WITH per_user AS (
  SELECT event_type AS grp, user_id, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
caps AS (SELECT unnest([1, 4, 16, 64]) AS cap)
SELECT grp,
       CAST(cap AS INT) AS cap,
       CAST(sum(cnt) AS BIGINT) AS raw_sum,
       CAST(sum(least(cnt, cap)) AS BIGINT) AS clipped_sum,
       CAST(sum(cnt) - sum(least(cnt, cap)) AS BIGINT) AS clip_loss,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(CASE WHEN cnt > cap THEN 1 ELSE 0 END) AS BIGINT)
         AS n_users_clipped,
       CAST(max(cnt) AS BIGINT) AS max_contrib
FROM per_user, caps
GROUP BY 1, 2
ORDER BY 1, 2
"""


DPCLIP_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "privacy_contribution_bound": privacy_contribution_bound,
}

DPCLIP_ORACLES: dict[str, str] = {
    "privacy_contribution_bound": PRIVACY_CONTRIBUTION_BOUND_SQL,
}
