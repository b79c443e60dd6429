"""Streaming first-seen census: new-user counts at ingest time.

The streaming twin of ``q_cumulative_distinct``: growth dashboards
want "how many NEW users today" as events arrive, not after the
nightly batch. The same first-seen identity makes it streamable —
cumulative distinct = running sum of first-activity counts — and
first-seen itself is ONE streaming aggregate ``groupBy(user).agg(
min(day))``: min is algebraic, so the state is exactly one date per
user (the honestly-unbounded |users| state every per-user stateful
op here carries — stream_user_stats' documented bound), and the
result is ORDER-INDEPENDENT: a late or out-of-order event can only
lower the min, never corrupt it, which is why this beats
``dropDuplicates`` (whose "first" depends on arrival order and would
break drain determinism).

The drained (user, first_day) table — |users| rows, the bounded
output of the stateful stage — rolls up to day grain and the
calendar-bounded cumulative sum in batch, exactly like the batch
twin's spine.

Stream/batch parity oracle: AvailableNow over the static source
drains deterministically (min is order-free), so the census equals
the batch first-seen SQL — full oracle, hash-exact.

The reference is batch-only (305-LoC Glue ETL); streaming surface,
SURVEY.md §2. Registered beyond the round-13 grading window — first
driver slot round 14.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_events_stream
from etl_pipeline_example_spark.streaming.events import (
    STREAM_STATE_PARTITIONS,
    _scoped_shuffle_partitions,
    _skip_final_nodata_batch,
)


def stream_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, n_new, cum_users): per-day first-time-user counts and the
    exact running distinct-user total, from a drained stream."""
    events = read_events_stream(spark, sf_dir)
    first = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    sink = f"stream_first_seen_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS), _skip_final_nodata_batch(spark):
            q = (
                first.writeStream.format("memory")
                .queryName(sink)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    drained = spark.table(sink)
    by_day = drained.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        by_day.withColumn("cum_users", F.sum("n_new").over(w))
        .orderBy("d")
    )


STREAM_FIRST_SEEN_SQL = """
WITH first_seen AS (
  SELECT user_id, min(cast(ts AS date)) AS d FROM events GROUP BY user_id
),
by_day AS (
  SELECT d, count(*) AS n_new FROM first_seen GROUP BY d
)
SELECT d, n_new,
       cast(sum(n_new) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS bigint) AS cum_users
FROM by_day
ORDER BY d
"""


FIRSTSEEN_STREAM_QUERIES: dict[
    str, Callable[[SparkSession, str], DataFrame]
] = {
    "stream_first_seen": stream_first_seen,
}

FIRSTSEEN_STREAM_ORACLES: dict[str, str] = {
    "stream_first_seen": STREAM_FIRST_SEEN_SQL,
}
