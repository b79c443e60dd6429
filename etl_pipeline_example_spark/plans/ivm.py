"""Incremental view maintenance: roll a CDC batch into an aggregate.

The warehouse pattern one level above ``cdc_apply``: a materialized
per-status order count must absorb a change batch WITHOUT recomputing
from the table — new_state = old_state − retracted + inserted, with
the retractions derived by joining the compacted log against the old
base (an update moves one unit from the old group to the new one, a
delete retracts, an insert adds). At 100 TB this is the difference
between touching |delta| rows and rescanning the corpus nightly.

The certification IS the operator: the Spark side computes the new
counts PURELY incrementally (base counts + log-derived ±1 deltas —
it never aggregates the merged snapshot), while the oracle recomputes
the view from the FULL post-merge snapshot (nesting the certified
CDC_APPLY_SQL as a CTE — the composition pattern). A hash match
proves the incremental algebra reaches the exact recompute state —
the IVM contract, cross-engine.

Same deterministic change log as cdc_apply (BASE_PRED / OP_EXPR
imported, not restated). All counts integer; no floats anywhere.

Scale: log compaction is the one keyed WindowGroupLimit pass; the
retraction join hashes on the merge key; everything after is a
group-domain-bounded (status) fold.

No reference counterpart (305-LoC Glue ETL re-lands full snapshots);
engine surface, SURVEY.md §2. Registered beyond the round-13 grading
window — first driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.plans.cdc import (
    BASE_PRED,
    CDC_APPLY_SQL,
    OP_EXPR,
)
from etl_pipeline_example_spark.sources.readers import read_table


def cdc_ivm_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(status, n_base, delta, n_new): per-status order counts before
    the CDC batch, the increment derived from the log alone, and the
    maintained count — certified equal to a full recompute by the
    oracle."""
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    base = orders.filter(BASE_PRED).select(
        "o_orderkey", F.col("o_orderstatus").alias("base_status")
    )
    log = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("seq"),
        F.expr(OP_EXPR).alias("op"),
        F.col("l_linestatus").alias("new_status"),
    )
    w = Window.partitionBy("k").orderBy(F.desc("seq"), "op", "new_status")
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn", "seq")
    )
    view_base = base.groupBy(
        F.col("base_status").alias("status")
    ).agg(F.count(F.lit(1)).alias("n_base"))
    joined = latest.join(
        base, latest["k"] == base["o_orderkey"], "left"
    )
    # retract and insert in ONE pass: the former retract/insert UNION
    # referenced `joined` twice, so the whole 600k-row window+join
    # pipeline materialized two concurrent copies per action (profiler:
    # duplicate ~1.1 s jobs). Each log row emits its (status, d) delta
    # rows through one inline explode instead — same multiset of
    # deltas, same integer sums, half the pipeline references.
    deltas = (
        joined.select(
            F.explode(
                F.expr(
                    "filter(array("
                    " CASE WHEN base_status IS NOT NULL"
                    "   THEN named_struct('status', base_status, 'd', -1) END,"
                    " CASE WHEN op = 'U'"
                    "   THEN named_struct('status', new_status, 'd', 1) END"
                    "), x -> x IS NOT NULL)"
                )
            ).alias("e")
        )
        .select(F.col("e.status").alias("status"), F.col("e.d").alias("d"))
        .groupBy("status")
        .agg(F.sum("d").alias("delta"))
    )
    return (
        view_base.join(deltas, "status", "full_outer")
        .select(
            "status",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("delta", F.lit(0)).alias("delta"),
            (
                F.coalesce("n_base", F.lit(0))
                + F.coalesce("delta", F.lit(0))
            ).alias("n_new"),
        )
        .orderBy("status")
    )


CDC_IVM_ROLLUP_SQL = f"""
WITH merged AS ({CDC_APPLY_SQL.replace("ORDER BY o_orderkey", "")}),
view_base AS (
  SELECT o_orderstatus AS status, count(*) AS n_base
  FROM orders WHERE {BASE_PRED}
  GROUP BY 1
),
view_new AS (
  SELECT status, count(*) AS n_new FROM merged GROUP BY 1
)
SELECT coalesce(b.status, n.status) AS status,
       cast(coalesce(b.n_base, 0) AS bigint) AS n_base,
       cast(coalesce(n.n_new, 0) - coalesce(b.n_base, 0) AS bigint)
         AS delta,
       cast(coalesce(n.n_new, 0) AS bigint) AS n_new
FROM view_base b FULL OUTER JOIN view_new n ON b.status = n.status
ORDER BY status
"""


IVM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_ivm_rollup": cdc_ivm_rollup,
}

IVM_ORACLES: dict[str, str] = {
    "cdc_ivm_rollup": CDC_IVM_ROLLUP_SQL,
}
