"""Latest-event-per-key (the QUALIFY row_number() = 1 dedup shape).

The single most common warehouse pattern not yet pinned as a query:
reduce an event stream to each key's most recent row ("current state
per user"). ``upsert_keyed`` (pipeline/maintain.py) implements the
WRITE side of latest-wins; this is the QUERY side — the
``QUALIFY row_number() OVER (PARTITION BY key ORDER BY ts DESC) = 1``
idiom, spelled with a window + filter since Spark SQL has no QUALIFY
clause.

Determinism: (ts DESC, event_id DESC) is a total order per user —
duplicate timestamps cannot make the survivor ambiguous. All output
columns are passthrough (no arithmetic), so cross-engine equality is
structural.

Scale shape: one hash exchange on user_id, per-partition sort, and
Spark plans the rn = 1 filter as WindowGroupLimit — the per-partition
top-1 prunes BEFORE the full sort materializes, the same
100 TB-critical optimization q_topn_window's audit pins. No global
window anywhere.

No reference counterpart (the reference is a 305-LoC ETL example);
general-engine surface, SURVEY.md §2. Registered beyond the round-8
grading window — first driver slot round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table


def q_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, event_id, ts, event_type, value): each user's most
    recent event (ties on ts broken by highest event_id)."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


Q_LATEST_EVENT_SQL = """
SELECT user_id, event_id, ts, event_type, value
FROM (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
) WHERE rn = 1
"""


LATEST_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_latest_event": q_latest_event,
}

LATEST_ORACLES: dict[str, str] = {
    "q_latest_event": Q_LATEST_EVENT_SQL,
}
