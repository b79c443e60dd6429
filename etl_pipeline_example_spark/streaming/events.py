"""Structured Streaming over the events table.

The reference pipeline is batch-only; its streaming analogue — continuous
arrival into the land zone — maps to Structured Streaming: a file source
watching the directory, event-time tumbling windows with a watermark
bounding state, and an idempotent sink. Here the op is expressed once and
run with ``Trigger.AvailableNow`` so it drains the existing files and
stops — the same code is a 24/7 stream on a cluster with checkpointing.

``stream_events_tumbling`` produces exactly the batch ``q_events_tumbling``
result (hour window + event_type counts/sums), so it carries a full SQL
oracle: stream/batch parity is the correctness contract Structured
Streaming is built around.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.plans.queries import (
    Q_SESSION_WINDOW_SQL,
    Q_TUMBLING_SQL,
    SUM_VALUE,
)
from etl_pipeline_example_spark.sources.readers import read_events_stream


from contextlib import contextmanager

# State-store partition count for the stateful streaming ops. This
# is an explicit knob (not inherited shuffle parallelism) because it is
# FROZEN into the checkpoint at first start and each partition carries a
# state store on both join sides — 200 default partitions means 400
# state stores spinning up for a test-scale drain. A production 24/7
# job sizes this to its key cardinality and keeps it for life.
STREAM_STATE_PARTITIONS = 16


@contextmanager
def _scoped_shuffle_partitions(spark: SparkSession, n: int):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@contextmanager
def _skip_final_nodata_batch(spark: SparkSession):
    """Scoped ``noDataMicroBatches.enabled=false`` for AvailableNow drains
    whose trailing no-data micro-batch provably cannot add sink rows.

    After the file source is exhausted the engine schedules one extra
    empty batch to advance the watermark; that batch costs a full
    incremental re-plan plus a commit of every state store (~1 s per
    drain here) and can only affect the sink when (a) an append-mode
    WATERMARKED AGGREGATION still holds unflushed windows, or (b) a
    stateful op has event/processing-time TIMEOUTS to fire. No drained
    query in this package is either: aggregations drain in complete or
    update mode (complete re-emits identical full state, update emits
    only deltas — an empty batch has none), stream-stream joins are
    inner+append (rows emit at match time; the final batch only evicts
    state that the throwaway checkpoint discards anyway), and both
    ``applyInPandasWithState`` ops run ``GroupStateTimeout.NoTimeout``.
    A 24/7 deployment must NOT use this: there the no-data batch is what
    bounds state between bursts and flushes append-mode windows.
    """
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _start_drained(writer, spark: SparkSession):
    """Start an AvailableNow ``DataStreamWriter`` under
    ``_skip_final_nodata_batch`` and block until the drain finishes.

    The conf must be live at ``start()`` (the query captures its session
    conf then), which is why the writer is passed unstarted.
    """
    with _skip_final_nodata_batch(spark):
        q = writer.start()
        q.awaitTermination()
    return q


def stream_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the tumbling-window aggregation as a stream over the events
    parquet, drain with AvailableNow, and return the final result.

    Watermark: 1 hour — bounds in-flight window state on a real stream;
    with AvailableNow + complete mode every window is emitted, giving
    batch parity.
    """
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.expr(SUM_VALUE).alias("sum_value"))
        .select(
            F.col("win.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink = f"stream_events_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS), _skip_final_nodata_batch(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


STREAM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_events": stream_events_tumbling,
}

# Stream/batch parity: the oracle is the batch tumbling SQL.
STREAM_ORACLES: dict[str, str] = {
    "stream_events": Q_TUMBLING_SQL,
}


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: drop duplicate content hashes as documents
    arrive; output the distinct content-hash set.

    On a 24/7 stream ``dropDuplicates`` keeps per-key state forever unless
    watermark-bounded; here the key is the content hash itself and the
    drain is AvailableNow, so the emitted set equals the batch DISTINCT —
    the stream/batch parity contract. (With late-data bounds you'd add
    ``withWatermark`` and ``dropDuplicatesWithinWatermark``.)
    """
    docs = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    from etl_pipeline_example_spark.operators.hashing import spark_norm_text

    hashed = docs.select(F.expr(f"md5({spark_norm_text('text')})").alias("content_hash"))
    deduped = hashed.dropDuplicates(["content_hash"])
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS), _skip_final_nodata_batch(spark):
        q = (
            deduped.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization: native ``session_window`` (30-min gap) per
    user over the event stream — the state-store-backed streaming form of
    ``q_session_window``, drained with AvailableNow for batch parity.

    On a 24/7 stream the watermark closes a session once event time passes
    its end + gap, emitting it exactly once and freeing its state — the
    mechanism that keeps session state bounded at any scale; with the
    drain-and-stop trigger plus complete mode, every session is emitted,
    so the result equals the batch session_window query and carries its
    full SQL oracle.
    """
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.expr(SUM_VALUE).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    sink = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS), _skip_final_nodata_batch(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


def stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer
    dimension, then aggregate per market segment per hour.

    The static side is re-read per micro-batch by Structured Streaming
    (so a slowly-changing dim stays fresh) and joins without any stream
    state — the standard enrichment topology. Aggregation carries the
    watermark; AvailableNow + complete mode gives batch parity, so the
    op has a full SQL oracle.
    """
    events = read_events_stream(spark, sf_dir)
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    joined = events.join(customer, events.user_id == customer.c_custkey)
    agg = (
        joined.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.expr(SUM_VALUE).alias("sum_value"))
        .select(
            F.col("win.start").alias("hour_ts"),
            F.col("c_mktsegment").alias("segment"),
            "n_events",
            "sum_value",
        )
    )
    sink = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS), _skip_final_nodata_batch(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


STREAM_ENRICH_SQL = """
SELECT date_trunc('hour', ts) AS hour_ts, c_mktsegment AS segment,
       count(*) AS n_events,
       cast(sum(cast(value as decimal(18,6))) as double) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""


STREAM_QUERIES["stream_sessions"] = stream_sessions
STREAM_ORACLES["stream_sessions"] = Q_SESSION_WINDOW_SQL

STREAM_QUERIES["stream_enrich"] = stream_enrich
STREAM_ORACLES["stream_enrich"] = STREAM_ENRICH_SQL


def _event_stream(spark: SparkSession, sf_dir: str, types: list[str]):
    return read_events_stream(spark, sf_dir).filter(F.col("event_type").isin(types))


def stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join: attribute each purchase to the clicks the same
    user made in the preceding hour.

    Both sides are unbounded streams, so the join buffers state on BOTH
    and needs watermarks plus a time-range join condition for Spark to
    know when a buffered click can never match again and evict it — the
    canonical funnel/attribution topology. With the AvailableNow drain
    the emitted set equals the batch interval self-join, giving a full
    SQL oracle.
    """
    clicks = _event_stream(spark, sf_dir, ["click"]).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", "2 hours")
    purchases = _event_stream(spark, sf_dir, ["purchase"]).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", "2 hours")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "click_id",
        F.expr("unix_micros(purchase_ts) - unix_micros(click_ts)").alias("lag_us"),
    )
    sink = f"stream_join_{uuid.uuid4().hex[:8]}"
    with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS), _skip_final_nodata_batch(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(sink)


STREAM_JOIN_SQL = """
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events p JOIN events c
  ON p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.user_id = p.user_id
 AND c.ts <= p.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""

STREAM_QUERIES["stream_join"] = stream_join
STREAM_ORACLES["stream_join"] = STREAM_JOIN_SQL

STREAM_QUERIES["stream_dedup"] = stream_dedup
STREAM_ORACLES["stream_dedup"] = """
SELECT DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_hash
FROM documents
"""
