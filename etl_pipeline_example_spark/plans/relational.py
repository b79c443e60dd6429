"""Relational query shapes beyond the star-join/window suite in
``plans/queries.py`` — the remaining join and aggregation forms a complete
warehouse engine must support: semi/anti joins (EXISTS / NOT EXISTS),
outer-join distributions, conditional aggregation, correlated-aggregate
subqueries, HAVING-driven semi joins, scalar subqueries, multi-distinct
aggregates, pivot, exact percentiles, set operations, and JSON-column
extraction.

The reference expresses its queries as SQL over temp views inside a Glue
job (reference: glue_jobs/example_job/job.py:43-54); these widen that
surface to the full TPC-H-ish shape catalogue over the benchmark tables.

Scale notes (100 TB / 1000 executors):
- Semi/anti joins use Spark's ``left_semi`` / ``left_anti`` — the build
  side deduplicates into a hash set; no row multiplication, no DISTINCT
  afterwards. Where the probe side is the fact table the dim set
  broadcasts.
- Correlated-aggregate subqueries (Q17/Q18 shapes) become agg-then-join:
  the per-key aggregate is computed once (map-side partials), then joined
  on the key — Catalyst's own decorrelation strategy, written explicitly.
- Scalar subqueries (global avg) are one-row broadcasts, not shuffles.
- Pivot uses an explicit value list so the plan is a single pass
  (groupBy + pivot agg) — without the list Spark runs an extra distinct
  job to discover columns.
- Exact percentiles shuffle (key, value) pairs once; at 100 TB swap for
  ``approx_percentile`` with a bounded error if the exactness isn't
  contractual (kept exact here because the oracle is exact).

Float determinism: every sum over money goes through DECIMAL and is cast
to double once at the end (same construct as plans/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

REVENUE = (
    "cast(sum(cast(cast(l_extendedprice as decimal(18,2))"
    " * cast(1 - l_discount as decimal(18,2)) as decimal(18,4))) as double)"
)
DISC_REVENUE = (
    "cast(sum(cast(cast(l_extendedprice as decimal(18,2))"
    " * cast(l_discount as decimal(18,2)) as decimal(18,4))) as double)"
)


def q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight-filter scan + single aggregate.

    Every predicate reaches the parquet scan (PushedFilters); the agg is a
    one-row partial-combine — the cheapest possible full-table pass.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.expr(DISC_REVENUE).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


Q6_SQL = f"""
SELECT {DISC_REVENUE} AS revenue, count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, count by priority.

    Orders with at least one lineitem shipped after the order date. The
    semi join deduplicates the lineitem side in the hash build — no
    DISTINCT pass, no row multiplication on multi-line orders.
    """
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""


def q_cust_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join: customers with no orders, by segment."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.expr("cast(sum(cast(c_acctbal as decimal(18,2))) as double)").alias("sum_acctbal"),
        )
    )


Q_NO_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS sum_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
"""


def q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left-outer join + two-level aggregate (count of
    counts). The outer join preserves order-less customers as count 0."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (CASE inside SUM) over a
    part join — promo revenue share. part scales with SF so the join
    strategy is AQE's call (broadcast at small SF, shuffle at large)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = read_table(spark, sf_dir, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    promo_dec = (
        "cast(sum(CASE WHEN p_type LIKE 'PROMO%' THEN"
        " cast(cast(l_extendedprice as decimal(18,2))"
        " * cast(1 - l_discount as decimal(18,2)) as decimal(18,4))"
        " ELSE cast(0 as decimal(18,4)) END) as double)"
    )
    return joined.agg(
        F.expr(promo_dec).alias("promo_revenue"),
        F.expr(REVENUE).alias("total_revenue"),
        F.expr(f"round(100.0 * {promo_dec} / {REVENUE}, 6)").alias("promo_pct"),
    )


_PROMO_DEC = (
    "cast(sum(CASE WHEN p_type LIKE 'PROMO%' THEN"
    " cast(cast(l_extendedprice as decimal(18,2))"
    " * cast(1 - l_discount as decimal(18,2)) as decimal(18,4))"
    " ELSE cast(0 as decimal(18,4)) END) as double)"
)
Q14_SQL = f"""
SELECT {_PROMO_DEC} AS promo_revenue,
       {REVENUE} AS total_revenue,
       round(100.0 * {_PROMO_DEC} / {REVENUE}, 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery, decorrelated as
    agg-then-join — lineitems under 50% of their part's average quantity.

    The per-part average is one map-side-combined agg over l_partkey, then
    joined back; Catalyst would produce the same plan from the correlated
    SQL. The agg side is unbounded (one row per part — 200M rows at
    sf1000), so no broadcast hint: AQE's runtime stats broadcast it at
    small SF and sort-merge on l_partkey at large.
    """
    li = read_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        F.expr(
            "cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*)"
        ).alias("avg_qty")
    )
    return (
        li.join(avg_qty.withColumnRenamed("l_partkey", "p_key"),
                li.l_partkey == F.col("p_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.expr("cast(sum(cast(l_extendedprice as decimal(18,2))) as double)").alias(
                "small_qty_revenue"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q17_SQL = """
WITH avg_tbl AS (
  SELECT l_partkey AS p_key,
         cast(sum(cast(l_quantity as decimal(18,2))) as double) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT cast(sum(cast(l_extendedprice as decimal(18,2))) as double) AS small_qty_revenue,
       count(*) AS n_rows
FROM lineitem JOIN avg_tbl ON l_partkey = p_key
WHERE l_quantity < 0.5 * avg_qty
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-driven semi join — orders whose total
    quantity exceeds a threshold, joined back to customer detail.

    The HAVING filter is highly selective (top ~0.01% of orders), so the
    filtered agg broadcasts at any SF — the selectivity, not the input
    size, is what makes that hint scale-safe. customer has no hint (it
    scales with SF); AQE picks its strategy from runtime stats."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr("cast(cast(o_totalprice as decimal(18,2)) as double)").alias("total_price"),
            "total_qty",
        )
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       cast(cast(o_totalprice as decimal(18,2)) as double) AS total_price, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, cast(sum(cast(l_quantity as decimal(18,2))) as double) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING cast(sum(cast(l_quantity as decimal(18,2))) as double) > 150
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q22_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + anti join —
    above-average-balance customers with no orders, by nation.

    The global average is a one-row broadcast; the anti join's build side
    is the distinct custkey set of orders.
    """
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(
            "cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*)"
        ).alias("avg_bal")
    )
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr("cast(sum(cast(c_acctbal as decimal(18,2))) as double)").alias("totacctbal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS numcust,
       cast(sum(cast(c_acctbal as decimal(18,2))) as double) AS totacctbal
FROM customer c
WHERE c_acctbal > (
    SELECT cast(sum(cast(c_acctbal as decimal(18,2))) as double) / count(*)
    FROM customer WHERE c_acctbal > 0.0
)
AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey
"""


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate: distinct parts / suppliers / orders per
    return flag. Spark expands multi-distinct into a single grouped expand
    (one shuffle), not one job per distinct column."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


Q_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type.

    The explicit value list keeps this a single groupBy pass — without it
    Spark runs a separate distinct job to discover the pivot columns.
    """
    events = read_table(spark, sf_dir, "events")
    pivoted = (
        events.groupBy(F.to_date("ts").alias("event_date"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "event_date",
        *[F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"n_{t}") for t in EVENT_TYPES],
    )


Q_PIVOT_SQL = """
SELECT cast(ts AS DATE) AS event_date,
       cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS bigint) AS n_click,
       cast(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS bigint) AS n_error,
       cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bigint) AS n_purchase,
       cast(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS bigint) AS n_signup,
       cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS bigint) AS n_view
FROM events
GROUP BY cast(ts AS DATE)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) of order value per priority.

    ``percentile`` is Spark's exact linear-interpolation quantile — the
    same definition as ANSI ``percentile_cont``. Exact quantiles shuffle
    the value list per group; at 100 TB switch to ``approx_percentile``
    (t-digest, bounded error, mergeable sketches) unless exactness is
    contractual.
    """
    orders = read_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.expr("round(percentile(o_totalprice, 0.5), 4)").alias("median_price"),
        F.expr("round(percentile(o_totalprice, 0.9), 4)").alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


Q_PERCENTILES_SQL = """
SELECT o_orderpriority,
       round(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS median_price,
       round(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90_price,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT and EXCEPT over event-user sets, tagged
    and unioned into one result. Both compile to aggregate-based set ops
    (one shuffle each on user_id), not joins."""
    events = read_table(spark, sf_dir, "events")
    purchasers = events.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = events.filter(F.col("event_type") == "error").select("user_id")
    both = purchasers.intersect(erroring).withColumn("cohort", F.lit("purchase_and_error"))
    only = purchasers.subtract(erroring).withColumn("cohort", F.lit("purchase_only"))
    return both.unionByName(only)


Q_SET_OPS_SQL = """
SELECT user_id, 'purchase_and_error' AS cohort FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  INTERSECT
  SELECT user_id FROM events WHERE event_type = 'error'
)
UNION ALL
SELECT user_id, 'purchase_only' AS cohort FROM (
  SELECT user_id FROM events WHERE event_type = 'purchase'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'error'
)
"""


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column extraction: pull a typed field out of the ``props``
    JSON string per event, aggregate by type. ``get_json_object`` runs
    JVM-side per row — no Python, no full JSON parse into a struct."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


Q_JSON_SQL = """
SELECT event_type,
       cast(sum(cast(json_extract_string(props, '$.k') as bigint)) AS bigint) AS sum_k,
       max(cast(json_extract_string(props, '$.k') as bigint)) AS max_k,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies (explode + group): terms appearing ≥ 20
    times. The canonical lateral-view shape; partial aggregation combines
    map-side so the shuffle carries (term, count) not (term, 1)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(spark_tokens("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
    )


Q_WORDCOUNT_SQL = f"""
SELECT term, count(*) AS n
FROM (SELECT unnest({duck_tokens("text")}) AS term FROM documents)
GROUP BY term HAVING count(*) >= 20
"""


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day interval-RANGE moving average of order value per customer —
    the time-based window frame (RANGE BETWEEN INTERVAL ... PRECEDING)
    that row-count frames can't express when orders are irregularly
    spaced. The frame sum is an exact decimal (order-independent), cast
    to double once, so both engines agree bit-for-bit.

    Scale: one shuffle on o_custkey; frame state is bounded by 30 days
    of one customer's orders.
    """
    orders = read_table(spark, sf_dir, "orders")
    frame = (
        "OVER (PARTITION BY o_custkey ORDER BY o_orderdate "
        "RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)"
    )
    return orders.select(
        "o_custkey",
        "o_orderdate",
        F.expr(
            f"round(cast(sum(cast(o_totalprice as decimal(18,2))) {frame} as double)"
            f" / (count(*) {frame}), 6)"
        ).alias("avg_30d"),
        F.expr(f"count(*) {frame}").alias("n_in_window"),
    )


Q_MOVING_AVG_SQL = """
SELECT o_custkey, o_orderdate,
       round(cast(sum(cast(o_totalprice as decimal(18,2))) OVER w as double)
             / (count(*) OVER w), 6) AS avg_30d,
       count(*) OVER w AS n_in_window
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
"""


def q_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap filling: hourly event counts per
    event_type with ZERO rows for silent hours — the densification step
    before any rolling/seasonal computation.

    The hour spine is generated (sequence over the observed span), cross
    joined with the type dimension, and the observed counts left-join
    onto it. Scale: the spine is (hours × types) — time-bounded, not
    data-bounded; the only data shuffle is the hourly pre-aggregation.
    """
    events = read_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    span = events.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = span.select(
        F.explode(F.expr("sequence(t0, t1, interval 1 hour)")).alias("hour_ts")
    )
    types = events.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(hourly, ["hour_ts", "event_type"], "left")
        .select(
            "hour_ts",
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


Q_GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour_ts, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_ts FROM span
),
types AS (SELECT DISTINCT event_type FROM events)
SELECT s.hour_ts, ty.event_type, coalesce(h.n, 0) AS n_events
FROM spine s CROSS JOIN types ty
LEFT JOIN hourly h ON h.hour_ts = s.hour_ts AND h.event_type = ty.event_type
"""


def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling: one row per profiled column with row/null/distinct
    counts and numeric min/max — the data-quality report that generalizes
    the reference's validation gate (reference: python_scripts/
    test_data.py's row-count + column-set checks) from pass/fail to
    measurement.

    One aggregation pass computes every metric (no per-column scans);
    the per-column rows are unpivoted from that single result with
    ``stack``. Scale: one scan, partial-aggregated; count_distinct is
    exact here — at 100 TB swap in approx_count_distinct per column.
    """
    orders = read_table(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.expr("CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END")).alias("null_status"),
        F.countDistinct("o_orderstatus").alias("dist_status"),
        F.sum(F.expr("CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END")).alias("null_cust"),
        F.countDistinct("o_custkey").alias("dist_cust"),
        F.expr("cast(min(o_custkey) as double)").alias("min_cust"),
        F.expr("cast(max(o_custkey) as double)").alias("max_cust"),
        F.sum(F.expr("CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END")).alias("null_price"),
        F.countDistinct("o_totalprice").alias("dist_price"),
        F.expr("cast(min(cast(o_totalprice as decimal(18,2))) as double)").alias("min_price"),
        F.expr("cast(max(cast(o_totalprice as decimal(18,2))) as double)").alias("max_price"),
    )
    return agg.select(
        F.expr(
            "stack(3,"
            " 'o_orderstatus', n_rows, null_status, dist_status, cast(null as double), cast(null as double),"
            " 'o_custkey', n_rows, null_cust, dist_cust, min_cust, max_cust,"
            " 'o_totalprice', n_rows, null_price, dist_price, min_price, max_price)"
            " AS (col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
        )
    )


DQ_PROFILE_SQL = """
WITH m AS (
  SELECT count(*) AS n_rows,
         cast(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_status,
         count(DISTINCT o_orderstatus) AS dist_status,
         cast(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_cust,
         count(DISTINCT o_custkey) AS dist_cust,
         cast(min(o_custkey) as double) AS min_cust,
         cast(max(o_custkey) as double) AS max_cust,
         cast(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS bigint) AS null_price,
         count(DISTINCT o_totalprice) AS dist_price,
         cast(min(cast(o_totalprice as decimal(18,2))) as double) AS min_price,
         cast(max(cast(o_totalprice as decimal(18,2))) as double) AS max_price
  FROM orders
)
SELECT 'o_orderstatus' AS col_name, n_rows, null_status AS n_nulls,
       dist_status AS n_distinct, cast(NULL as double) AS min_num,
       cast(NULL as double) AS max_num FROM m
UNION ALL
SELECT 'o_custkey', n_rows, null_cust, dist_cust, min_cust, max_cust FROM m
UNION ALL
SELECT 'o_totalprice', n_rows, null_price, dist_price, min_price, max_price FROM m
"""


_HIST_BUCKET = (
    "CASE WHEN cast(o_totalprice as double) < 0.0 THEN 0"
    " WHEN cast(o_totalprice as double) >= 600000.0 THEN 21"
    " ELSE cast(floor(cast(o_totalprice as double) / 30000.0) as int) + 1 END"
)


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value (20 buckets + under/overflow)
    — the profiling/monitoring primitive, written as the same portable
    bucket expression in both engines (width_bucket semantics). One
    grouped pass; bucketing is a pure scan expression so the shuffle
    carries at most 22 rows."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(F.expr(_HIST_BUCKET).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


Q_HISTOGRAM_SQL = f"""
SELECT {_HIST_BUCKET} AS bucket, count(*) AS n_orders
FROM orders GROUP BY 1
"""


def q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag variance and quantity↔price correlation, computed
    from EXACT decimal power sums instead of the engines' native one-pass
    float aggregates.

    Native ``corr``/``stddev`` accumulate floats in partition order —
    nondeterministic across engines AND across runs at scale. Decimal
    Σx, Σy, Σx², Σy², Σxy are order-independent; the closed forms then
    take one float step each, bit-identical everywhere. Same single
    grouped pass, same shuffle shape as the native aggregates.
    """
    li = read_table(spark, sf_dir, "lineitem")
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(cast(l_quantity as decimal(28,6)))").alias("sx"),
        F.expr("sum(cast(l_extendedprice as decimal(28,6)))").alias("sy"),
        F.expr("sum(cast(l_quantity as decimal(28,6)) * cast(l_quantity as decimal(28,6)))").alias("sxx"),
        F.expr("sum(cast(l_extendedprice as decimal(28,6)) * cast(l_extendedprice as decimal(28,6)))").alias("syy"),
        F.expr("sum(cast(l_quantity as decimal(28,6)) * cast(l_extendedprice as decimal(28,6)))").alias("sxy"),
    )
    return sums.select(
        "l_returnflag",
        "n",
        F.expr(
            "round(cast((sxx - sx * sx / n) as double) / (n - 1), 6)"
        ).alias("var_qty"),
        F.expr(
            "round(cast((n * sxy - sx * sy) as double)"
            " / (sqrt(cast(n * sxx - sx * sx as double))"
            "    * sqrt(cast(n * syy - sy * sy as double))), 6)"
        ).alias("corr_qty_price"),
    )


Q_STATS_SQL = """
WITH sums AS (
  SELECT l_returnflag, count(*) AS n,
         sum(cast(l_quantity as decimal(28,6))) AS sx,
         sum(cast(l_extendedprice as decimal(28,6))) AS sy,
         sum(cast(l_quantity as decimal(28,6)) * cast(l_quantity as decimal(28,6))) AS sxx,
         sum(cast(l_extendedprice as decimal(28,6)) * cast(l_extendedprice as decimal(28,6))) AS syy,
         sum(cast(l_quantity as decimal(28,6)) * cast(l_extendedprice as decimal(28,6))) AS sxy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, n,
       round(cast((sxx - sx * sx / n) as double) / (n - 1), 6) AS var_qty,
       round(cast((n * sxy - sx * sy) as double)
             / (sqrt(cast(n * sxx - sx * sx as double))
                * sqrt(cast(n * syy - sy * sy as double))), 6) AS corr_qty_price
FROM sums
"""


RELATIONAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q6_forecast": q6_forecast,
    "q4_late_orders": q4_late_orders,
    "q_cust_no_orders": q_cust_no_orders,
    "q13_custdist": q13_custdist,
    "q14_promo": q14_promo,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q22_idle_rich": q22_idle_rich,
    "q_distinct_agg": q_distinct_agg,
    "q_pivot_events": q_pivot_events,
    "q_percentiles": q_percentiles,
    "q_set_ops": q_set_ops,
    "q_json_extract": q_json_extract,
    "q_wordcount": q_wordcount,
    "q_moving_avg": q_moving_avg,
    "q_gapfill": q_gapfill,
    "dq_profile": dq_profile,
    "q_histogram": q_histogram,
    "q_stats": q_stats,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "q6_forecast": Q6_SQL,
    "q4_late_orders": Q4_SQL,
    "q_cust_no_orders": Q_NO_ORDERS_SQL,
    "q13_custdist": Q13_SQL,
    "q14_promo": Q14_SQL,
    "q17_small_quantity": Q17_SQL,
    "q18_large_orders": Q18_SQL,
    "q22_idle_rich": Q22_SQL,
    "q_distinct_agg": Q_DISTINCT_SQL,
    "q_pivot_events": Q_PIVOT_SQL,
    "q_percentiles": Q_PERCENTILES_SQL,
    "q_set_ops": Q_SET_OPS_SQL,
    "q_json_extract": Q_JSON_SQL,
    "q_wordcount": Q_WORDCOUNT_SQL,
    "q_moving_avg": Q_MOVING_AVG_SQL,
    "q_gapfill": Q_GAPFILL_SQL,
    "dq_profile": DQ_PROFILE_SQL,
    "q_histogram": Q_HISTOGRAM_SQL,
    "q_stats": Q_STATS_SQL,
}
