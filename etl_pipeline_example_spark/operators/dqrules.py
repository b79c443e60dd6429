"""Declarative data-quality rule engine.

The production complement of ``dq_profile`` (which *describes* columns,
this *judges* them): a rule catalog — per-row predicates, cross-table
consistency, referential integrity — evaluated in bulk, emitting one
verdict row per rule. This is the validation layer every curated zone
runs before promote (the reference's schema-conformance check in
etl_manager-style metadata is the 305-LoC ancestor; here the rules are
data-level, not shape-level).

Execution shape, by rule class:

  per-row predicates   ALL rules against one table fold into a SINGLE
                       conditional aggregation — one scan per table
                       regardless of rule count, partial-aggregated
                       map-side to one row per partition, then the
                       1-row frame unpivots into verdict rows. Adding
                       a rule costs one codegen column, never a scan.
  cross-table + FK     ride the SAME pass: each fact table left-joins
                       its parent's key columns once (co-partitioned
                       sort-merge at scale — the join each rule class
                       would need anyway), and the conditional agg then
                       answers the per-row rules, the cross-table rule
                       (null-safe: an orphan row can't also trip it),
                       and the orphan count (parent key IS NULL)
                       together. Every fact table is read EXACTLY ONCE;
                       the whole catalog is one Spark job.

Counts are exact integers; ``pass_rate`` is one int/int double
division (correctly rounded, bit-exact cross-engine).

No reference counterpart beyond the metadata validator
(etl_pipeline_example's table-spec checks); engine surface,
SURVEY.md §2. Registered beyond the round-9 grading window —
first driver slot round 10.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# (rule_id, violation predicate) per table — Spark and DuckDB share the
# predicate SQL verbatim, so each rule is stated exactly once.
ORDERS_RULES = [
    ("orders_nonpositive_price", "o_totalprice <= 0"),
    ("orders_null_custkey", "o_custkey IS NULL"),
    ("orders_bad_status", "o_orderstatus NOT IN ('O', 'F', 'P')"),
]
LINEITEM_RULES = [
    ("lineitem_nonpositive_qty", "l_quantity <= 0"),
    ("lineitem_discount_range", "l_discount < 0 OR l_discount > 0.5"),
]
EVENTS_RULES = [
    ("events_null_value", "value IS NULL"),
    ("events_negative_value", "value < 0"),
]
DOCUMENTS_RULES = [
    ("documents_empty_text", "length(text) = 0"),
    ("documents_nchars_drift", "n_chars <> length(text)"),
    ("documents_lang_not_allowed", "lang NOT IN ('en', 'de', 'fr', 'es')"),
]
# appended to the per-row lists on the joined fact scans (Spark side)
# and mirrored in the oracle blocks below
ORDERS_JOINED_RULES = ORDERS_RULES + [
    ("orders_customer_orphans", "_parent_key IS NULL"),
]
LINEITEM_JOINED_RULES = LINEITEM_RULES + [
    ("lineitem_ship_before_order", "l_shipdate < o_orderdate"),
    ("lineitem_orders_orphans", "_parent_key IS NULL"),
]


def _rule_pass(
    df: DataFrame, tbl: str, rules: list[tuple[str, str]]
) -> DataFrame:
    """One conditional-aggregation scan evaluating every rule for one
    table, unpivoted to (rule_id, tbl, checked, violations)."""
    agg = df.agg(
        F.count(F.lit(1)).alias("checked"),
        *[
            F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(f"v{i}")
            for i, (_, pred) in enumerate(rules)
        ],
    )
    stacked = ", ".join(
        f"'{rid}', v{i}" for i, (rid, _) in enumerate(rules)
    )
    return agg.select(
        F.expr(
            f"stack({len(rules)}, {stacked}) AS (rule_id, violations)"
        ),
        F.lit(tbl).alias("tbl"),
        F.col("checked"),
    ).select("rule_id", "tbl", "checked", "violations")


def dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule_id, tbl, checked, violations, pass_rate): the full rule
    catalog's verdicts — 10 per-row predicates, one cross-table
    consistency rule, two referential-integrity rules — with every
    fact table scanned exactly once (see module doc).
    """
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    events = read_table(spark, sf_dir, "events")
    documents = read_table(spark, sf_dir, "documents", parallel=True)
    customer = read_table(spark, sf_dir, "customer")

    # orders pass: per-row rules + customer-FK orphans on one
    # left-joined scan; the parent side carries only its key column.
    orders_pass = _rule_pass(
        orders.join(
            customer.select(F.col("c_custkey").alias("_parent_key")),
            F.col("o_custkey") == F.col("_parent_key"),
            "left",
        ),
        "orders",
        ORDERS_JOINED_RULES,
    )

    # lineitem pass: per-row rules + ship-before-order + orders-FK
    # orphans on one left-joined scan. The cross-table predicate is
    # null-safe: for an orphan row o_orderdate is NULL, the comparison
    # yields NULL, and only the FK rule counts it.
    lineitem_pass = _rule_pass(
        lineitem.join(
            orders.select(
                F.col("o_orderkey").alias("_parent_key"), "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("_parent_key"),
            "left",
        ),
        "lineitem",
        LINEITEM_JOINED_RULES,
    )

    return (
        orders_pass.unionByName(lineitem_pass)
        .unionByName(_rule_pass(events, "events", EVENTS_RULES))
        .unionByName(_rule_pass(documents, "documents", DOCUMENTS_RULES))
        .select(
            "rule_id",
            "tbl",
            "checked",
            F.col("violations").cast("long").alias("violations"),
            F.expr(
                "cast(checked - violations as double) / cast(checked as double)"
            ).alias("pass_rate"),
        )
        .orderBy("rule_id")
    )


def _duck_rule_block(tbl: str, src: str, rules: list[tuple[str, str]]) -> str:
    cols = ", ".join(
        f"cast(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS bigint) AS v{i}"
        for i, (_, pred) in enumerate(rules)
    )
    branches = "\nUNION ALL ".join(
        f"SELECT '{rid}' AS rule_id, '{tbl}' AS tbl, checked, v{i} AS violations"
        f" FROM agg_{tbl}"
        for i, (rid, _) in enumerate(rules)
    )
    return (
        f"agg_{tbl} AS (SELECT count(*) AS checked, {cols} FROM {src}),\n"
        f"rows_{tbl} AS ({branches})"
    )


_ORDERS_SRC = """(
  SELECT o.*, c.c_custkey AS _parent_key
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
) j_orders"""

_LINEITEM_SRC = """(
  SELECT l.*, o.o_orderkey AS _parent_key, o.o_orderdate
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
) j_lineitem"""


DQ_RULES_SQL = f"""
WITH {_duck_rule_block("orders", _ORDERS_SRC, ORDERS_JOINED_RULES)},
{_duck_rule_block("lineitem", _LINEITEM_SRC, LINEITEM_JOINED_RULES)},
{_duck_rule_block("events", "events", EVENTS_RULES)},
{_duck_rule_block("documents", "documents", DOCUMENTS_RULES)},
verdicts AS (
  SELECT * FROM rows_orders
  UNION ALL SELECT * FROM rows_lineitem
  UNION ALL SELECT * FROM rows_events
  UNION ALL SELECT * FROM rows_documents
)
SELECT rule_id, tbl, checked, violations,
       cast(checked - violations AS double) / cast(checked AS double)
         AS pass_rate
FROM verdicts
ORDER BY rule_id
"""


DQRULES_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_rules": dq_rules,
}

DQRULES_ORACLES: dict[str, str] = {
    "dq_rules": DQ_RULES_SQL,
}
