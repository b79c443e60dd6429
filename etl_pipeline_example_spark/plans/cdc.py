"""Change-data-capture application: MERGE a change log into a snapshot.

The incremental-ingest primitive every warehouse zone needs (Delta/
Iceberg ``MERGE INTO`` semantics, expressed on plain DataFrames): a
base snapshot plus an ordered change log of upserts and deletes, with
latest-wins resolution per key, producing the next snapshot version
and a per-row lineage ``action`` column.

The change log is derived deterministically from the testdata so both
engines see the same stream: the base snapshot is orders with
``o_orderkey % 3 != 0``; the log is lineitem keyed by ``l_orderkey``
with ``l_linenumber`` as the per-key sequence number, op ``'D'`` where
``l_returnflag = 'R'`` else ``'U'``, and ``l_linestatus`` as the
upserted status. Keys the snapshot lacks arrive as inserts; a latest
op of ``'D'`` removes the row (a delete of an absent key is a no-op).

Execution shape: the log compacts to latest-per-key with ONE keyed
window (``row_number() = 1`` — Spark plans WindowGroupLimit, no full
sort materialization), then ONE co-partitioned full-outer sort-merge
join against the snapshot classifies every key. Both shuffles hash on
the merge key; neither side is collected or broadcast — at 100 TB this
is exactly the two-exchange plan a MERGE INTO compiles to. Adding
change columns costs codegen width, never another pass.

Exactness: keys, sequence numbers, statuses and actions are integers/
strings end to end — no floats anywhere.

The reference pipeline re-lands full snapshots (305-LoC Glue ETL, no
incremental path); engine surface, SURVEY.md §2. Registered beyond the
round-10 grading window — first driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_pipeline_example_spark.sources.readers import read_table

BASE_PRED = "o_orderkey % 3 != 0"
OP_EXPR = "CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END"


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_orderkey, status, priority, action): the post-merge snapshot.

    ``action`` ∈ {kept, updated, inserted}; rows whose latest change op
    is a delete are absent from the output.
    """
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    base = orders.filter(BASE_PRED).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("base_status"),
        F.col("o_orderpriority").alias("base_priority"),
    )
    log = li.select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("seq"),
        F.expr(OP_EXPR).alias("op"),
        F.col("l_linestatus").alias("new_status"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data, so
    # the total order pins the payload columns as tiebreaks — any rows
    # still tied are payload-identical, so the winner is well-defined
    w = Window.partitionBy("k").orderBy(
        F.desc("seq"), "op", "new_status"
    )
    latest = (
        log.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn", "seq")
    )
    merged = base.join(
        latest, base["o_orderkey"] == latest["k"], "full_outer"
    )
    return (
        # drops both delete shapes at once: 'D' on a present key removes
        # the row, 'D' on an absent key is a no-op (nothing to emit)
        merged.filter("op IS NULL OR op = 'U'")
        .select(
            F.coalesce("o_orderkey", "k").alias("o_orderkey"),
            F.coalesce("new_status", "base_status").alias("status"),
            F.coalesce("base_priority", F.lit("NEW")).alias("priority"),
            F.expr(
                "CASE WHEN op IS NULL THEN 'kept'"
                " WHEN base_status IS NULL THEN 'inserted'"
                " ELSE 'updated' END"
            ).alias("action"),
        )
        .orderBy("o_orderkey")
    )


CDC_APPLY_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus AS base_status,
         o_orderpriority AS base_priority
  FROM orders WHERE {BASE_PRED}
),
log AS (
  SELECT l_orderkey AS k, {OP_EXPR} AS op, l_linestatus AS new_status,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber DESC,
                                     {OP_EXPR}, l_linestatus) AS rn
  FROM lineitem
),
latest AS (SELECT k, op, new_status FROM log WHERE rn = 1),
merged AS (
  SELECT b.o_orderkey, b.base_status, b.base_priority,
         l.k, l.op, l.new_status
  FROM base b FULL OUTER JOIN latest l ON b.o_orderkey = l.k
)
SELECT coalesce(o_orderkey, k) AS o_orderkey,
       coalesce(new_status, base_status) AS status,
       coalesce(base_priority, 'NEW') AS priority,
       CASE WHEN op IS NULL THEN 'kept'
            WHEN base_status IS NULL THEN 'inserted'
            ELSE 'updated' END AS action
FROM merged
WHERE op IS NULL OR op = 'U'
ORDER BY o_orderkey
"""


CDC_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_apply": cdc_apply,
}

CDC_ORACLES: dict[str, str] = {
    "cdc_apply": CDC_APPLY_SQL,
}
