"""Data-freshness panel: per-table staleness against the corpus clock.

The on-call dashboard every warehouse runs: for each time-bearing
table, when did data last arrive, how far behind the freshest table is
it, and how much of it landed in the trailing window. One verdict row
per table; a scheduler alerts on ``lag_hours``.

Semantics: the "corpus clock" is the max event time across ALL graded
tables (no wall-clock dependence — deterministic and replayable, the
property the oracle needs); ``lag_hours`` is each table's max-time
deficit against it on the wall-clock hour grid (day difference × 24 +
hour-of-day difference — engine-zone-independent by construction;
epoch conversions would re-interpret through the session zone and
shift across DST boundaries); ``n_last_30d`` counts rows within
the trailing 30 days of the table's OWN max (self-relative, so a
table that stopped cold shows a full window followed by silence).

Exactness: timestamps, integer calendar arithmetic and counts only —
no epoch conversions anywhere (wall-clock fields render identically in
both engines; epochs do not).

Scale: per table, a column-pruned max probe (a stand-in for the
footer-stat read a production deployment would use — the pattern
shard_manifest demonstrates) broadcast into one map-side-combined
conditional aggregate; the panel union and the one-row corpus clock
are driver-free and broadcast-sized. No shuffle anywhere — every
aggregate reduces to one row per scan partition.

No reference counterpart (the 305-LoC Glue ETL has no monitoring);
engine surface, SURVEY.md §2. Registered beyond the round-10 grading
window — first driver slot round 11.
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

FRESH_TABLES = (("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate"))
WINDOW_DAYS = 30


def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, max_ts, n_rows, n_last_30d, lag_hours): per-table
    freshness against the cross-table corpus clock."""
    per_table = []
    for name, col in FRESH_TABLES:
        t = read_table(spark, sf_dir, name).select(F.col(col).alias("t"))
        # phase 1: the table's own max — a column-pruned scan standing in
        # for the footer-stat probe a production deployment would use
        mx = t.agg(F.max("t").alias("mx"))
        per_table.append(
            t.crossJoin(F.broadcast(mx)).agg(
                F.lit(name).alias("table_name"),
                F.max("t").alias("max_ts"),
                F.count(F.lit(1)).alias("n_rows"),
                # wall-clock interval comparison: zone-independent,
                # unlike any epoch conversion
                F.expr(
                    "sum(CASE WHEN t >="
                    f" mx - INTERVAL {WINDOW_DAYS} DAY"
                    " THEN 1 ELSE 0 END)"
                ).alias("n_last_30d"),
            )
        )
    panel = reduce(DataFrame.unionByName, per_table)
    clock = panel.agg(F.max("max_ts").alias("corpus_max"))
    return (
        panel.crossJoin(F.broadcast(clock))
        .select(
            "table_name",
            "max_ts",
            "n_rows",
            "n_last_30d",
            F.expr(
                "cast(datediff(cast(corpus_max as date),"
                " cast(max_ts as date)) * 24"
                " + (hour(corpus_max) - hour(max_ts)) as bigint)"
            ).alias("lag_hours"),
        )
        .orderBy("table_name")
    )


def _fresh_sql() -> str:
    parts = []
    for name, col in FRESH_TABLES:
        parts.append(
            f"""
  SELECT '{name}' AS table_name, max({col}) AS max_ts,
         count(*) AS n_rows,
         cast(sum(CASE WHEN {col} >=
                  (SELECT max({col}) FROM {name})
                  - INTERVAL {WINDOW_DAYS} DAY
             THEN 1 ELSE 0 END) AS bigint) AS n_last_30d
  FROM {name}"""
        )
    union = "\n  UNION ALL\n".join(parts)
    return f"""
WITH panel AS ({union}),
clock AS (SELECT max(max_ts) AS corpus_max FROM panel)
SELECT p.table_name, p.max_ts, p.n_rows, p.n_last_30d,
       cast(datediff('day', cast(p.max_ts AS date),
                     cast(c.corpus_max AS date)) * 24
            + (hour(c.corpus_max) - hour(p.max_ts)) AS bigint)
         AS lag_hours
FROM panel p CROSS JOIN clock c
ORDER BY p.table_name
"""


FRESHNESS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dq_freshness": dq_freshness,
}

FRESHNESS_ORACLES: dict[str, str] = {
    "dq_freshness": _fresh_sql(),
}
