"""Referential-integrity audit: FK orphan census across the warehouse.

The DQ readout every warehouse deployment runs nightly: for each
foreign-key edge, how many child rows reference a parent that doesn't
exist. One row per edge — (edge, n_child, n_orphans, orphan_rate) —
so the grid is the join-health dashboard (an ingestion bug that lands
lineitems before their orders shows up as a nonzero rate on exactly
one edge).

Spark-first shape, per edge:

- the child side pre-aggregates to (key, cnt) FIRST (map-side
  combined), so the orphan join carries distinct child keys with
  counts, never raw fact rows;
- the parent side reduces to DISTINCT keys (dimension-bounded for
  dim edges — Catalyst/AQE broadcasts those; key-bounded for the two
  fact→fact edges, where the shuffle is inherent to the audit);
- orphans = left join + conditional sum — ONE pass, no anti-join
  re-scan (an anti-join would need a second join to also count
  matched rows).

All six edges union into one 6-row frame; counts are integer sums,
the rate is one double division per row.

Exactness: bigint counts both engines (DuckDB sum(int) → HUGEINT is
cast back); rate = cast/cast double.

Reference: N/A (the 305-LoC Glue ETL validates single-table presence
only — meta_data/*.json); engine surface, SURVEY.md §2. Registered
beyond the round-11 grading window — first driver slot round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

# (child table, child key, parent table, parent key)
FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(edge, n_child, n_orphans, orphan_rate): FK orphan census over
    the six warehouse edges."""
    parts = []
    for child, ck, parent, pk in FK_EDGES:
        ckeys = (
            read_table(spark, sf_dir, child)
            .groupBy(F.col(ck).alias("k"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pkeys = (
            read_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
        parts.append(
            ckeys.join(pkeys, "k", "left").agg(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("edge"),
                F.sum("cnt").alias("n_child"),
                F.sum(
                    F.when(F.col("__hit").isNull(), F.col("cnt")).otherwise(
                        F.lit(0)
                    )
                ).alias("n_orphans"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "edge",
        "n_child",
        "n_orphans",
        F.expr(
            "cast(n_orphans as double) / cast(n_child as double)"
        ).alias("orphan_rate"),
    ).orderBy("edge")


def _edge_sql(child: str, ck: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{child}.{ck}->{parent}.{pk}' AS edge,
       cast(sum(cnt) AS bigint) AS n_child,
       cast(sum(CASE WHEN p.k IS NULL THEN cnt ELSE 0 END) AS bigint)
         AS n_orphans
FROM (SELECT {ck} AS k, count(*) AS cnt FROM {child} GROUP BY 1) c
LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {parent}) p ON c.k = p.k
"""


DQ_REFERENTIAL_SQL = (
    "WITH edges AS (\n"
    + "\nUNION ALL\n".join(_edge_sql(*e) for e in FK_EDGES)
    + """
)
SELECT edge, n_child, n_orphans,
       cast(n_orphans AS double) / cast(n_child AS double) AS orphan_rate
FROM edges
ORDER BY edge
"""
)


REFERENTIAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_referential": dq_referential,
}

REFERENTIAL_ORACLES: dict[str, str] = {
    "dq_referential": DQ_REFERENTIAL_SQL,
}
