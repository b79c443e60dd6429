"""Run-length encoding of per-user event streams (gaps-and-islands).

"How long does a user keep doing the same thing before switching" —
the behavioral-persistence census. Consecutive same-type events in a
user's timeline collapse into runs via the classic two-rank identity:
``row_number() − row_number(per type)`` is constant within a run of
equal types, so runs materialize from two windows over the SAME
(user_id, ts, event_id) sort — one sort, both functions ride it.

Output is the run-length histogram (event_type, run_len, n_runs):
type-domain × max-run bounded, invariant under SF, which keeps the
driver/oracle comparison payload small while pinning every run
boundary (a single off-by-one in the island id shifts some histogram
cell).

Scale: windows partition on user_id — per-user state only, no global
sort; the histogram is one map-side-combined aggregate. Ties broken
by event_id so the sort order (and therefore every run) is total and
deterministic in both engines.

No reference counterpart (305-LoC Glue ETL); engine surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, run_len, n_runs): histogram of consecutive
    same-type run lengths across all user timelines."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_typ = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    runs = (
        ev.withColumn(
            "island", F.row_number().over(w_all) - F.row_number().over(w_typ)
        )
        .groupBy("user_id", "event_type", "island")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return (
        runs.groupBy("event_type", "run_len")
        .agg(F.count(F.lit(1)).alias("n_runs"))
        .orderBy("event_type", "run_len")
    )


Q_EVENT_RUNS_SQL = """
WITH ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id)
         - row_number() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts, event_id) AS island
  FROM events
),
runs AS (
  SELECT user_id, event_type, island, count(*) AS run_len
  FROM ranked GROUP BY 1, 2, 3
)
SELECT event_type, run_len, count(*) AS n_runs
FROM runs
GROUP BY event_type, run_len
ORDER BY event_type, run_len
"""


RUNS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_event_runs": q_event_runs,
}

RUNS_ORACLES: dict[str, str] = {
    "q_event_runs": Q_EVENT_RUNS_SQL,
}
