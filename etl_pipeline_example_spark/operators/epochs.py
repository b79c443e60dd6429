"""Epoch planning: waterfill a token budget across sources with a
repeat cap.

The mixing decision every pretraining run makes concrete: the corpus
has ``n_tokens_i`` per source, the run wants ``BUDGET_MULT × total``
training tokens, and no source may repeat more than ``EPOCH_CAP``
epochs (the repeated-data-diminishing-returns rule of thumb). The
uniform target overshoots small sources — they can't absorb an equal
share under the cap — so their surplus WATERFALLS to the sources that
still have headroom. Two fixed rounds:

1. uniform split of the budget (exact integer division + Hamilton
   remainder seats ranked by source);
2. each source takes min(share, cap·tokens); the undistributed
   leftover re-apportions across UNCAPPED sources proportional to
   their token counts (Hamilton again, exact BIGINT div/mod), then a
   final clamp.

All arithmetic is exact BIGINT until the final epochs division (one
int/int double per row), so the plan is bit-reproducible — the same
property ``sample_allocation`` (operators/allocation.py) pins, here
composed into the capped-redistribution shape. A fixed 2-round
waterfill is exact whenever one redistribution round doesn't push a
new source over its cap (the final clamp keeps the plan feasible
regardless; any residual slack is reported by the epochs column).

Scale shape: ONE map-side-combined corpus aggregate collapses 100 TB
to a sources-bounded frame; every window below runs on that tiny
frame.

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-11
grading window — first driver slot round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_tokens,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table

BUDGET_MULT = 2  # train on 2x the corpus
EPOCH_CAP = 3  # no source repeats more than 3 epochs


def mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, planned_tokens, epochs): capped waterfill of
    a ``BUDGET_MULT``·total token budget across sources."""
    toks = spark_tokens("text")
    counts = (
        read_table(spark, sf_dir, "documents", parallel=True)
        .groupBy("source")
        .agg(F.expr(f"sum(size({toks}))").alias("n_tokens"))
    )
    everything = Window.partitionBy()
    by_source = everything.orderBy(F.col("source").asc())
    # round 1: uniform split, Hamilton seats by source order
    r1 = counts.select(
        "source",
        "n_tokens",
        F.sum("n_tokens").over(everything).alias("total"),
        F.count(F.lit(1)).over(everything).alias("n_src"),
        F.row_number().over(by_source).alias("src_rk"),
    ).selectExpr(
        "source",
        "n_tokens",
        f"{BUDGET_MULT} * total AS budget",
        f"({BUDGET_MULT} * total) div n_src"
        f" + CASE WHEN src_rk <= ({BUDGET_MULT} * total) % n_src"
        "   THEN 1 ELSE 0 END AS desired",
        f"{EPOCH_CAP} * n_tokens AS cap",
    )
    # round 2: leftover re-apportions over uncapped, proportional to
    # n_tokens, Hamilton over exact BIGINT div/mod
    r2 = r1.selectExpr(
        "*",
        "least(desired, cap) AS take1",
        "CASE WHEN desired < cap THEN n_tokens ELSE 0 END AS headroom_w",
    ).select(
        "*",
        F.expr("budget - sum(take1) OVER ()").alias("leftover"),
        F.expr("sum(headroom_w) OVER ()").alias("u_total"),
    )
    r3 = r2.selectExpr(
        "*",
        "CASE WHEN u_total > 0 THEN (leftover * headroom_w) div u_total"
        " ELSE 0 END AS extra_base",
        "CASE WHEN u_total > 0 THEN (leftover * headroom_w) % u_total"
        " ELSE 0 END AS extra_rem",
    ).select(
        "*",
        F.row_number()
        .over(
            everything.orderBy(
                F.col("extra_rem").desc(), F.col("source").asc()
            )
        )
        .alias("rem_rk"),
        F.expr("sum(extra_base) OVER ()").alias("extra_total"),
    )
    return r3.selectExpr(
        "source",
        "n_tokens",
        "least(cap, take1 + extra_base"
        " + CASE WHEN headroom_w > 0"
        "   AND rem_rk <= leftover - extra_total THEN 1 ELSE 0 END)"
        " AS planned_tokens",
    ).selectExpr(
        "source",
        "n_tokens",
        "planned_tokens",
        "cast(planned_tokens as double) / cast(n_tokens as double)"
        " AS epochs",
    ).orderBy("source")


MIX_EPOCHS_SQL = f"""
WITH counts AS (
  SELECT source, cast(sum(len({duck_tokens("text")})) AS bigint) AS n_tokens
  FROM documents GROUP BY 1
),
r1 AS (
  SELECT source, n_tokens,
         {BUDGET_MULT} * sum(n_tokens) OVER () AS budget,
         ({BUDGET_MULT} * sum(n_tokens) OVER ()) // count(*) OVER ()
           + CASE WHEN row_number() OVER (ORDER BY source)
                    <= ({BUDGET_MULT} * sum(n_tokens) OVER ())
                       % count(*) OVER ()
                  THEN 1 ELSE 0 END AS desired,
         {EPOCH_CAP} * n_tokens AS cap
  FROM counts
),
r2 AS (
  SELECT *, least(desired, cap) AS take1,
         CASE WHEN desired < cap THEN n_tokens ELSE 0 END AS headroom_w
  FROM r1
),
r2b AS (
  SELECT *, budget - sum(take1) OVER () AS leftover,
         sum(headroom_w) OVER () AS u_total
  FROM r2
),
r3 AS (
  SELECT *,
         CASE WHEN u_total > 0 THEN (leftover * headroom_w) // u_total
              ELSE 0 END AS extra_base,
         CASE WHEN u_total > 0 THEN (leftover * headroom_w) % u_total
              ELSE 0 END AS extra_rem
  FROM r2b
),
r3b AS (
  SELECT *,
         row_number() OVER (ORDER BY extra_rem DESC, source) AS rem_rk,
         sum(extra_base) OVER () AS extra_total
  FROM r3
),
planned AS (
  SELECT source, n_tokens,
         least(cap, take1 + extra_base
           + CASE WHEN headroom_w > 0 AND rem_rk <= leftover - extra_total
                  THEN 1 ELSE 0 END) AS planned_tokens
  FROM r3b
)
SELECT source, n_tokens, cast(planned_tokens AS bigint) AS planned_tokens,
       cast(planned_tokens AS double) / cast(n_tokens AS double) AS epochs
FROM planned
ORDER BY source
"""


EPOCHS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mix_epochs": mix_epochs,
}

EPOCHS_ORACLES: dict[str, str] = {
    "mix_epochs": MIX_EPOCHS_SQL,
}
