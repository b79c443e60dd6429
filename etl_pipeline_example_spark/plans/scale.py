"""Scale-technique queries: plan shapes whose naive form breaks at
100 TB, written here in the form that survives — each with an exact
DuckDB oracle proving the technique changes only the physical plan,
never the result.

- q_skew_join  — salted join (functions/skew.py) over the events
                 table's genuinely hot ``event_type`` keys: a handful of
                 distinct values carry all 10k+ rows, the exact shape
                 where one reducer would take the whole table. Salting
                 scatters each hot key across R tasks; the oracle is the
                 plain (unsalted) join, proving row multiplicity is
                 untouched.
- q_cube       — CUBE over (o_orderstatus, o_orderpriority): all four
                 grouping sets in one pass via Spark's Expand operator —
                 partial-aggregated map-side, never four scans.
- q_range_join — interval self-join (pairs of same-user events within a
                 time window) via bucket-equality join: timestamps bin to
                 window-width buckets, the probe side expands to its two
                 candidate buckets, and the join is a plain equi-join on
                 (user, bucket) with the range test as a residual filter.
                 The naive theta-join is O(n²) rows per user and no
                 equi-key to shuffle on; the bucketed form shuffles once
                 and each task compares only adjacent-bucket rows.

The reference expresses transforms as SQL over temp views inside a Glue
job (reference: glue_jobs/example_job/job.py:43-54); these queries keep
that declarative surface while pinning the physical techniques a 100 TB
deployment needs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.functions.skew import salted_join
from etl_pipeline_example_spark.plans.queries import SUM_VALUE
from etl_pipeline_example_spark.sources.readers import read_table

# --------------------------------------------------------------- skewed join


def q_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type rollup through a salted dimension join.

    ``event_type`` has single-digit cardinality over the whole events
    table — the degenerate-skew case. The dim (distinct types + a derived
    weight) joins via ``salted_join``: the fact side salts uniformly, the
    dim explodes R×, and the hot keys spread over R tasks instead of one.
    """
    ev = read_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    joined = salted_join(ev, dim, "event_type", num_salts=8)
    return joined.groupBy("event_type", "type_weight").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr(SUM_VALUE).alias("sum_value"),
    )


Q_SKEW_JOIN_SQL = f"""
WITH dim AS (
  SELECT DISTINCT event_type, length(event_type) AS type_weight FROM events
)
SELECT event_type, type_weight, count(*) AS n_events, {SUM_VALUE} AS sum_value
FROM events JOIN dim USING (event_type)
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------- cube

TOTAL_DEC = "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (o_orderstatus, o_orderpriority): grand total, both
    one-dimension rollups, and the full cross — one scan, one shuffle.
    Spark's Expand emits the 4 grouping-set rows per input row *after*
    map-side partial aggregation, so the shuffle carries group counts,
    not raw rows."""
    orders = read_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(TOTAL_DEC).alias("sum_total"),
    )


Q_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       {TOTAL_DEC} AS sum_total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

# ---------------------------------------------------------------- range join

RJ_WINDOW_US = 300_000_000  # 5 minutes


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count ordered same-user event pairs within a 5-minute window.

    Bucketed interval join: both sides key on (user_id,
    floor(ts / window)); the left (earlier) event probes its own bucket
    and the next one — the only two a partner ≤ window ahead can occupy —
    so the theta condition becomes an equi-join plus a residual range
    filter. Pair order is (ts, event_id) lexicographic to keep ties
    deterministic. One shuffle, bucket-local comparisons; at 100 TB the
    per-task work is bounded by per-(user, window) event density, not by
    per-user totals.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    left = ev.select(
        "user_id",
        F.col("event_id").alias("l_event"),
        F.col("us").alias("l_us"),
        F.explode(
            F.array(
                (F.col("us") / RJ_WINDOW_US).cast("long"),
                (F.col("us") / RJ_WINDOW_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    right = ev.select(
        "user_id",
        F.col("event_id").alias("r_event"),
        F.col("us").alias("r_us"),
        (F.col("us") / RJ_WINDOW_US).cast("long").alias("bucket"),
    )
    pairs = left.join(right, ["user_id", "bucket"]).filter(
        (
            (F.col("r_us") > F.col("l_us"))
            | ((F.col("r_us") == F.col("l_us")) & (F.col("r_event") > F.col("l_event")))
        )
        & (F.col("r_us") - F.col("l_us") <= RJ_WINDOW_US)
    )
    return pairs.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_pairs"))


Q_RANGE_JOIN_SQL = f"""
SELECT l.user_id, count(*) AS n_pairs
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND (epoch_us(r.ts) > epoch_us(l.ts)
      OR (epoch_us(r.ts) = epoch_us(l.ts) AND r.event_id > l.event_id))
 AND epoch_us(r.ts) - epoch_us(l.ts) <= {RJ_WINDOW_US}
GROUP BY 1
"""


SCALE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_skew_join": q_skew_join,
    "q_cube": q_cube,
    "q_range_join": q_range_join,
}

SCALE_ORACLES: dict[str, str] = {
    "q_skew_join": Q_SKEW_JOIN_SQL,
    "q_cube": Q_CUBE_SQL,
    "q_range_join": Q_RANGE_JOIN_SQL,
}
