"""Extended TPC-H-shape query suite — the remaining canonical warehouse
query patterns, adapted to the benchmark schema (no partsupp table, no
commit/receipt dates; substitutes noted per query).

Each query exercises a distinct plan shape the engine must handle well at
100 TB:

- q7_volume        — two-dimension join with a disjunctive cross-nation
                     predicate (Q7): dims broadcast, one fact shuffle.
- q8_mktshare      — conditional-share aggregation (Q8): CASE inside an
                     exact decimal SUM, one pass, no self-join.
- q9_profit        — multi-table profit rollup (Q9; supplycost ≈
                     p_retailprice·quantity as partsupp is absent).
- q10_returns      — selective fact filter + top-k by aggregate (Q10):
                     TakeOrdered, not a global sort.
- q11_part_value   — group share vs global scalar (Q11): the global total
                     is a one-row broadcast cross join, not a correlated
                     re-scan.
- q15_top_supplier — argmax-vs-scalar (Q15): the max is a one-row
                     broadcast; equality on exact-decimal-derived doubles.
- q16_supplier_cnt — distinct-count rollup over a skewed link table (Q16).
- q19_disjunctive  — OR-of-ANDs pushdown showcase (Q19): the whole
                     predicate evaluates in the scan stage.
- q2_argmin        — per-group argmin/argmax join (Q2's inner correlated
                     min, decorrelated as a window rank).
- q21_sole_fault   — multi-way existence composition (Q21): orders with
                     ≥2 suppliers where exactly one shipped a returned
                     line; that supplier takes the blame.

Float determinism follows the suite convention: exact DECIMAL sums cast
to double once (see plans/queries.py docstring).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.plans.queries import DISC_PRICE_DEC, REVENUE
from etl_pipeline_example_spark.sources.readers import read_table

# ------------------------------------------------------------------ Q7 shape

Q7_N1, Q7_N2 = "NATION_1", "NATION_2"


def q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume by year (TPC-H Q7 shape).

    Only the fixed-size nation views carry broadcast hints;
    supplier/customer scale with SF so AQE picks their join strategy.
    """
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == Q7_N1) & (F.col("cust_nation") == Q7_N2))
            | ((F.col("supp_nation") == Q7_N2) & (F.col("cust_nation") == Q7_N1))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.expr("cast(year(l_shipdate) as int)").alias("l_year"),
        )
        .agg(F.expr(REVENUE).alias("revenue"))
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       cast(year(l_shipdate) as int) AS l_year, {REVENUE} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{Q7_N1}' AND n2.n_name = '{Q7_N2}')
    OR (n1.n_name = '{Q7_N2}' AND n2.n_name = '{Q7_N1}'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""

# ------------------------------------------------------------------ Q8 shape

Q8_NATION = "NATION_3"
Q8_REGION = "ASIA"
Q8_TYPE = "PROMO"

_SHARE_NUM = (
    f"cast(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN {DISC_PRICE_DEC}"
    " ELSE cast(0 as decimal(18,4)) END) as double)"
)
_SHARE_DEN = f"cast(sum({DISC_PRICE_DEC}) as double)"


def q8_mktshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of one supplier nation within a region+part-type market
    by year (TPC-H Q8 shape) — conditional decimal SUM, single agg pass.
    Hints only on region/nation (fixed-size); part/supplier/customer scale
    with SF, so AQE decides those joins from runtime stats."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(F.col("r_name") == Q8_REGION)
    part = read_table(spark, sf_dir, "part").filter(F.col("p_type") == Q8_TYPE)
    supp_n = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cust_n = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("c_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.expr("cast(year(o_orderdate) as int)").alias("o_year"))
        .agg(F.expr(f"round(({_SHARE_NUM}) / ({_SHARE_DEN}), 6)").alias("mkt_share"))
    )


Q8_SQL = f"""
SELECT cast(year(o_orderdate) as int) AS o_year,
       round(({_SHARE_NUM.replace("supp_nation", "n1.n_name")})
             / ({_SHARE_DEN}), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
GROUP BY 1
"""

# ------------------------------------------------------------------ Q9 shape

Q9_LIKE = "%widget%"

# supplycost stand-in: p_retailprice · quantity (partsupp absent); exact
# decimal subtraction, one cast to double after the SUM
_PROFIT_DEC = (
    f"(cast({DISC_PRICE_DEC} as decimal(19,4))"
    " - cast(cast(p_retailprice as decimal(18,2))"
    " * cast(l_quantity as decimal(18,2)) as decimal(19,4)))"
)
_SUM_PROFIT = f"cast(sum({_PROFIT_DEC}) as double)"


def q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation × year for a part-name family (TPC-H Q9
    shape; supplycost ≈ p_retailprice·quantity as partsupp is absent).
    part/supplier joins are unhinted — they scale with SF; AQE decides."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like(Q9_LIKE))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.expr("cast(year(o_orderdate) as int)").alias("o_year"),
        )
        .agg(F.expr(_SUM_PROFIT).alias("sum_profit"))
    )


Q9_SQL = f"""
SELECT n_name AS nation, cast(year(o_orderdate) as int) AS o_year,
       {_SUM_PROFIT} AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '{Q9_LIKE}'
GROUP BY 1, 2
"""

# ----------------------------------------------------------------- Q10 shape


def q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in one quarter (TPC-H
    Q10 shape). The top-k is revenue desc with c_custkey tiebreak — a
    TakeOrdered of 20 rows, never a full sort."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(REVENUE).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {REVENUE} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

# ----------------------------------------------------------------- Q11 shape

Q11_FACTOR = 1.5  # parts worth > 1.5× the mean part value ("important stock")


def q11_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds a multiple of the mean part revenue
    (TPC-H Q11 shape, made scale-free: the original's fixed fraction of
    the global total selects nothing once part cardinality grows). The
    global scalar is a one-row broadcast cross join — computed once,
    shipped everywhere, no correlated re-scan."""
    li = read_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.expr(REVENUE).alias("part_value"))
    # mean = exact-decimal global total / exact distinct part count — every
    # term is order-independent, so the double threshold is bit-identical
    # in both engines (a plain avg() over doubles is summation-order-
    # dependent and can flip boundary parts)
    thresh = li.agg(
        F.expr(REVENUE).alias("total_value"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(thresh))
        .filter(F.expr(f"part_value > {Q11_FACTOR} * (total_value / n_parts)"))
        .select("l_partkey", "part_value")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {REVENUE} AS part_value FROM lineitem GROUP BY 1
),
thresh AS (
  SELECT {REVENUE} AS total_value, count(DISTINCT l_partkey) AS n_parts
  FROM lineitem
)
SELECT l_partkey, part_value
FROM per_part, thresh
WHERE part_value > {Q11_FACTOR} * (total_value / n_parts)
"""

# ----------------------------------------------------------------- Q15 shape


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue (TPC-H Q15 shape).
    The scalar max is a one-row broadcast; the equality compare is exact
    because both sides derive from the same decimal sum. The max-filtered
    rev side is ~1 row at any SF — AQE broadcasts it at runtime, so the
    SF-scaling supplier table needs no hint."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supplier = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.expr(REVENUE).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, {REVENUE} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
"""

# ----------------------------------------------------------------- Q16 shape

Q16_EXCLUDE_BRAND = "Brand#1"


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers per (brand, type, size) via the lineitem link
    (TPC-H Q16 shape; partsupp absent). distinct-agg expands to a two-level
    aggregate — partial per key map-side, exact distinct at the reducer."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != Q16_EXCLUDE_BRAND
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCLUDE_BRAND}'
GROUP BY 1, 2, 3
"""

# ----------------------------------------------------------------- Q19 shape

_Q19_PRED = """
  (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs predicate revenue (TPC-H Q19 shape). The disjunction
    references both sides of the join, so it evaluates as the join
    post-condition; per-side conjuncts (brand/size on part) are pushed
    into the scans by Catalyst."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(F.expr(_Q19_PRED))
        .agg(
            F.expr(REVENUE).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q19_SQL = f"""
SELECT {REVENUE} AS revenue, count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_PRED}
"""

# ------------------------------------------------------------------ Q2 shape


def q2_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part dominant supplier (TPC-H Q2's correlated-min, decorrelated
    as a window rank): for each part, the supplier that shipped the most
    quantity, ties broken by suppkey. One shuffle on (part, supp) for the
    agg; the rank reuses the same partitioning."""
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr("cast(sum(cast(l_quantity as decimal(18,2))) as double)").alias(
            "supplied_qty"
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("supplied_qty").desc(), F.col("l_suppkey")
    )
    return (
        qty.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_key"),
            F.col("s_name").alias("top_supplier"),
            "supplied_qty",
        )
    )


Q2_SQL = """
WITH qty AS (
  SELECT l_partkey, l_suppkey,
         cast(sum(cast(l_quantity as decimal(18,2))) as double) AS supplied_qty
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_partkey, l_suppkey, supplied_qty,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY supplied_qty DESC, l_suppkey) AS rn
  FROM qty
)
SELECT l_partkey AS p_key, s_name AS top_supplier, supplied_qty
FROM ranked JOIN supplier ON l_suppkey = s_suppkey
WHERE rn = 1
"""

# ----------------------------------------------------------------- Q12 shape

Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-class line counts per line status (TPC-H Q12 shape;
    l_linestatus stands in for the missing l_shipmode). The only shuffle
    is the lineitem↔orders fact-fact join — both sides filter/prune in
    their scans, AQE coalesces the post-join partitions; the conditional
    counts fold into one grouped pass."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


Q12_SQL = f"""
SELECT l_linestatus,
       count(CASE WHEN o_orderpriority IN {Q12_HIGH} THEN 1 END) AS high_line_count,
       count(CASE WHEN o_orderpriority NOT IN {Q12_HIGH} THEN 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
"""

# ----------------------------------------------------------------- Q20 shape

Q20_LIKE = "cold%"
Q20_FACTOR = 1.5


def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping an outsized share of a part family (TPC-H Q20
    shape; the availqty-vs-half-of-shipped test becomes shipped-qty vs a
    multiple of the part's mean per-supplier qty, as partsupp is absent).

    The nested-IN chain decorrelates to agg → agg → join: per-(part,supp)
    quantities in one grouped pass, part-level stats from that, joined
    back, then a supplier join with DISTINCT collapsing multi-part
    culprits. part, the per-part stats, and supplier all scale with SF so
    none carries a broadcast hint — AQE broadcasts what its runtime stats
    say is small. Quantity sums stay DECIMAL end-to-end; one cast to
    double at the threshold compare, same expression text in both engines.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_name").like(Q20_LIKE))
    supplier = read_table(spark, sf_dir, "supplier")
    ps = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.expr("sum(cast(l_quantity as decimal(18,2)))").alias("qty_dec"))
    )
    pstat = ps.groupBy("l_partkey").agg(
        F.expr("cast(sum(qty_dec) as double)").alias("total_qty"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    return (
        ps.join(pstat, "l_partkey")
        .filter(
            (F.col("n_supp") >= 2)
            & F.expr(
                f"cast(qty_dec as double) > {Q20_FACTOR} * (total_qty / n_supp)"
            )
        )
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name")
        .distinct()
    )


Q20_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(cast(l_quantity as decimal(18,2))) AS qty_dec
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '{Q20_LIKE}'
  GROUP BY 1, 2
),
pstat AS (
  SELECT l_partkey, cast(sum(qty_dec) as double) AS total_qty,
         count(*) AS n_supp
  FROM ps GROUP BY 1
)
SELECT DISTINCT s_suppkey, s_name
FROM ps
JOIN pstat USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE n_supp >= 2
  AND cast(qty_dec as double) > {Q20_FACTOR} * (total_qty / n_supp)
"""

# ----------------------------------------------------------------- Q21 shape


def q21_sole_fault(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely at fault for a returned order (TPC-H Q21 shape,
    returnflag standing in for the missing receipt-vs-commit lateness):
    orders shipped by ≥2 suppliers where exactly one supplier has a
    returned line — count such orders per culprit supplier.

    One grouped pass collapses lineitem to (order, supplier, has_return);
    window counts over the order partition find qualifying orders and the
    culprit row in the same shuffle — no second lineitem scan, no join
    back, no distinct.
    """
    li = read_table(spark, sf_dir, "lineitem")
    supplier = read_table(spark, sf_dir, "supplier")
    os_level = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r")
    )
    w = Window.partitionBy("l_orderkey")
    culprits = (
        os_level.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_r_supp", F.sum("has_r").over(w))
        .filter(
            (F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1) & (F.col("has_r") == 1)
        )
    )
    return (
        culprits.join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_r_supp
  FROM lineitem GROUP BY 1
),
qualifying AS (
  SELECT l_orderkey FROM per_order WHERE n_supp >= 2 AND n_r_supp = 1
),
culprits AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN qualifying q ON l.l_orderkey = q.l_orderkey
  WHERE l.l_returnflag = 'R'
)
SELECT s_name, count(*) AS numwait
FROM culprits JOIN supplier ON l_suppkey = s_suppkey
GROUP BY 1
"""


TPCH_EXTRA_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_argmin": q2_argmin,
    "q7_volume": q7_volume,
    "q8_mktshare": q8_mktshare,
    "q9_profit": q9_profit,
    "q10_returns": q10_returns,
    "q11_part_value": q11_part_value,
    "q12_priority": q12_priority,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q19_disjunctive": q19_disjunctive,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_sole_fault": q21_sole_fault,
}

TPCH_EXTRA_ORACLES: dict[str, str] = {
    "q2_argmin": Q2_SQL,
    "q7_volume": Q7_SQL,
    "q8_mktshare": Q8_SQL,
    "q9_profit": Q9_SQL,
    "q10_returns": Q10_SQL,
    "q11_part_value": Q11_SQL,
    "q12_priority": Q12_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_supplier_cnt": Q16_SQL,
    "q19_disjunctive": Q19_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_sole_fault": Q21_SQL,
}
