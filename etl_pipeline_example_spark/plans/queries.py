"""Analytic query suite — the engine's general query capabilities.

The reference's own query surface is SQL-over-views inside a Glue job
(reference: glue_jobs/example_job/job.py:43-54); this module widens that to
the query shapes any warehouse-style pipeline needs (scan-agg, multi-way
joins, windows, rollups, time buckets, sessionization, as-of joins) over the
benchmark tables.

Scale notes (100 TB / 1000 executors):
- Broadcast hints ONLY on fixed-cardinality dims (region: 5 rows,
  nation: 25) and one-row scalar aggregates. supplier/part/customer/
  orders scale linearly with SF — a pinned broadcast of any of them OOMs
  executors at 100×, so their join strategy is left to AQE's runtime
  stats (which broadcast them while they're genuinely small).
- All aggregates are partial-aggregated map-side by Catalyst; the shuffle
  carries (key, partial) pairs, bounded by group cardinality not row count.
- Windows partition by high-cardinality keys (custkey, user_id) — state per
  partition is small; no global sort anywhere except the final top-k, which
  is a TakeOrdered (driver-side k rows, not a full sort).
- The as-of join is the union+window formulation: O(n log n) per user
  partition, one shuffle, no inequality-join cartesian blowup.

Float determinism vs the DuckDB oracle: aggregate arithmetic goes through
exact DECIMAL sums and is only then cast to double — one deterministic
rounding, identical in both engines regardless of summation order. The
decimal expressions are written with ``F.expr`` using fragments that are
valid ANSI SQL, and the oracle strings reuse the same fragments verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.functions import calculated_counts
from etl_pipeline_example_spark.sources.readers import read_table

# --- shared exact-arithmetic SQL fragments (valid in Spark SQL and DuckDB) ---
SUM_QTY = "cast(sum(cast(l_quantity as decimal(18,2))) as double)"
SUM_BASE = "cast(sum(cast(l_extendedprice as decimal(18,2))) as double)"
DISC_PRICE_DEC = (
    "cast(cast(l_extendedprice as decimal(18,2))"
    " * cast(1 - l_discount as decimal(18,2)) as decimal(18,4))"
)
SUM_DISC_PRICE = f"cast(sum({DISC_PRICE_DEC}) as double)"
CHARGE_DEC = f"cast({DISC_PRICE_DEC} * cast(1 + l_tax as decimal(18,2)) as decimal(18,6))"
SUM_CHARGE = f"cast(sum({CHARGE_DEC}) as double)"
REVENUE = SUM_DISC_PRICE
SUM_PRICE_DEC = "cast(sum(cast(o_totalprice as decimal(18,2))) as double)"
SUM_VALUE = "cast(sum(cast(value as decimal(18,6))) as double)"


def q_calculated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-parity flagship: LOWER+GROUP BY+COUNT on a string dim
    (reference: glue_jobs/example_job/job.py:51-54)."""
    customer = read_table(spark, sf_dir, "customer")
    return calculated_counts(customer, "c_mktsegment", "segment")


Q_CALCULATED_SQL = """
SELECT lower(c_mktsegment) AS segment, count(*) AS n
FROM customer GROUP BY lower(c_mktsegment)
"""


def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: single-scan partial-aggregated pricing summary."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(SUM_QTY).alias("sum_qty"),
            F.expr(SUM_BASE).alias("sum_base_price"),
            F.expr(SUM_DISC_PRICE).alias("sum_disc_price"),
            F.expr(SUM_CHARGE).alias("sum_charge"),
            F.expr(f"{SUM_QTY} / count(*)").alias("avg_qty"),
            F.expr(f"{SUM_BASE} / count(*)").alias("avg_price"),
            F.expr("cast(sum(cast(l_discount as decimal(18,2))) as double) / count(*)").alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {SUM_QTY} AS sum_qty,
       {SUM_BASE} AS sum_base_price,
       {SUM_DISC_PRICE} AS sum_disc_price,
       {SUM_CHARGE} AS sum_charge,
       {SUM_QTY} / count(*) AS avg_qty,
       {SUM_BASE} / count(*) AS avg_price,
       cast(sum(cast(l_discount as decimal(18,2))) as double) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact joins → agg → top-10.

    No forced broadcasts: orders and customer both scale with SF, so a
    pinned broadcast of either would OOM executors at 100×. AQE's runtime
    stats pick broadcast when the filtered sides are genuinely small (they
    are at test scale) and shuffle when they aren't. Top-10 with a total
    order (revenue desc, orderkey) is a TakeOrdered — no global sort.
    """
    customer = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(orders.join(customer, orders.o_custkey == customer.c_custkey),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(REVENUE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, {REVENUE} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join. Only the fixed-cardinality dims
    (region: 5 rows, nation: 25) carry broadcast hints; supplier and
    customer scale with SF, so their join strategy is left to AQE — it
    broadcasts them at small SF and shuffles at large."""
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(REVENUE).alias("revenue"))
    )


Q5_SQL = f"""
SELECT n_name, {REVENUE} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
"""


def q_topn_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — per-key top-k via row_number.

    Catalyst turns the rank-filter into a per-partition top-k
    (WindowGroupLimit) — no full materialization of the window.
    """
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


Q_TOPN_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order date — cumulative window."""
    orders = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("cast(cast(o_totalprice as decimal(18,2)) as double)").alias("price"),
        F.sum(F.expr("cast(o_totalprice as decimal(18,2))")).over(w).cast("double").alias(
            "running_total"
        ),
    )


Q_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       cast(cast(o_totalprice as decimal(18,2)) as double) AS price,
       cast(sum(cast(o_totalprice as decimal(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double)
         AS running_total
FROM orders
"""


def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap analysis per customer: days since the previous
    order and until the next (lag/lead with explicit defaults) — the
    retention/churn primitive. One shuffle on o_custkey; both offsets
    reuse the same window sort."""
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.expr("datediff(o_orderdate, lag(o_orderdate) OVER"
               " (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))")
        .alias("days_since_prev"),
        F.expr("datediff(lead(o_orderdate) OVER"
               " (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate)")
        .alias("days_until_next"),
    )


Q_LEAD_LAG_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS days_since_prev,
       date_diff('day', o_orderdate,
                 lead(o_orderdate) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey)) AS days_until_next
FROM orders
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the (status), (priority), (status,
    priority) marginals in ONE pass over orders, with grouping_id
    disambiguating the all-rows cells from genuine NULLs. Distinct from
    rollup/cube: the set list is arbitrary, not hierarchical."""
    orders = read_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               grouping_id(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS n_orders,
               cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """)


Q_GROUPING_SETS_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       grouping_id(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n_orders,
       cast(sum(cast(o_totalprice as decimal(18,2))) as double) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region→nation: customer count + exact acctbal sum.

    Null grouping cells are coalesced to 'ALL' so the result is
    unambiguous (and hash-stable) without relying on null semantics.
    """
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    joined = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr("cast(sum(cast(c_acctbal as decimal(18,2))) as double)").alias("sum_acctbal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "sum_acctbal",
        )
    )


Q_ROLLUP_SQL = """
SELECT coalesce(r_name, 'ALL') AS region_name,
       coalesce(n_name, 'ALL') AS nation_name,
       count(*) AS n_customers,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event aggregation (batch form of the streaming op)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(SUM_VALUE).alias("sum_value"),
        )
    )


Q_TUMBLING_SQL = f"""
SELECT date_trunc('hour', ts) AS hour_ts, event_type,
       count(*) AS n_events, {SUM_VALUE} AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) via lag + cumulative sum.

    Two windows over the same (user_id, ts) partitioning — one shuffle,
    both windows reuse it. Per-user state only; scales with users.
    """
    events = read_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_gap = events.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(order_w) > 1800,
            F.lit(1),
        )
        .otherwise(F.lit(0)),
    ).withColumn("session_seq", F.sum("new_session").over(cum_w))
    return with_gap.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


Q_SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts,
         cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS bigint)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM numbered
GROUP BY user_id, session_seq
"""


def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native sessionization via ``session_window`` (30-min gap).

    Same session membership as ``q_sessionize``'s lag+cumsum (split only
    when the gap *exceeds* 30 min — verified empirically: an event at
    exactly prev+30min merges), but expressed with the built-in session
    window, which is also the streaming-capable form (state-store backed
    under Structured Streaming). ``window.end`` is last event + gap.
    """
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(SUM_VALUE).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


Q_SESSION_WINDOW_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events, {SUM_VALUE} AS sum_value
FROM numbered
GROUP BY user_id, session_seq
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each event, the latest order of that customer at or
    before the event time.

    Spark-first formulation: union both streams as tagged rows, one window
    per user ordered by time carrying the last-seen orderkey forward
    (``last_value ignorenulls``). One shuffle on user_id, O(n log n) per
    partition — no inequality-join nested loop, which at 100 TB would be a
    cross-product per user. Ties (order at exactly the event time) take the
    order first, then the highest orderkey, matching the oracle's
    max-by-(date, key) semantics.
    """
    events = read_table(spark, sf_dir, "events")
    orders = read_table(spark, sf_dir, "orders")
    tagged_events = events.select(
        F.col("user_id"),
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("o_key"),
    )
    tagged_orders = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("o_key"),
    )
    unioned = tagged_events.unionByName(tagged_orders)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event", "o_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_orderkey", F.last("o_key", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("ts"),
            "last_orderkey",
        )
    )


Q_ASOF_SQL = """
WITH last_dates AS (
  SELECT e.event_id, e.user_id, e.ts, max(o.o_orderdate) AS last_order_date
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  GROUP BY e.event_id, e.user_id, e.ts
)
SELECT p.event_id, p.user_id, p.ts, max(o2.o_orderkey) AS last_orderkey
FROM last_dates p
LEFT JOIN orders o2
  ON o2.o_custkey = p.user_id AND o2.o_orderdate = p.last_order_date
GROUP BY p.event_id, p.user_id, p.ts
"""


ANALYTIC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_calculated": q_calculated,
    "q1_pricing": q1_pricing,
    "q3_shipping": q3_shipping,
    "q5_local_supplier": q5_local_supplier,
    "q_topn_window": q_topn_window,
    "q_running_sum": q_running_sum,
    "q_lead_lag": q_lead_lag,
    "q_grouping_sets": q_grouping_sets,
    "q_rollup": q_rollup,
    "q_events_tumbling": q_events_tumbling,
    "q_sessionize": q_sessionize,
    "q_session_window": q_session_window,
    "q_asof_join": q_asof_join,
}

ANALYTIC_ORACLES: dict[str, str] = {
    "q_calculated": Q_CALCULATED_SQL,
    "q1_pricing": Q1_SQL,
    "q3_shipping": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q_topn_window": Q_TOPN_SQL,
    "q_running_sum": Q_RUNNING_SQL,
    "q_lead_lag": Q_LEAD_LAG_SQL,
    "q_grouping_sets": Q_GROUPING_SETS_SQL,
    "q_rollup": Q_ROLLUP_SQL,
    "q_events_tumbling": Q_TUMBLING_SQL,
    "q_sessionize": Q_SESSIONIZE_SQL,
    "q_session_window": Q_SESSION_WINDOW_SQL,
    "q_asof_join": Q_ASOF_SQL,
}
