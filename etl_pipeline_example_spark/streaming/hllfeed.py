"""HyperLogLog registers built ON THE STREAM.

The cardinality companion of ``stream_cms_topk``: HLL registers are
max-mergeable, so a streaming aggregation maintains them with state
bounded at 2^P rows regardless of event volume — the sketch a
streaming distinct-users dashboard actually keeps. The register
pipeline (shared md5 hash → register/pattern split → ladder-join
bitlen → max rho) is the batch op's exactly; only the source is a
stream and the aggregation runs in complete mode to a memory sink
(AvailableNow drain). The per-register exact pattern count rides
along as in batch.

Stream/batch parity IS the oracle (the stream_cms_topk pattern): the
batch oracle verbatim — a dropped microbatch, replay double-count
(max and count-distinct-pattern are replay-sensitive through the
complete-mode recompute, which is why the drain is exactly-once), or
ladder drift would all diverge.

One wrinkle vs batch: the batch op deduplicates keys BEFORE hashing
(``distinct()`` on user_id); on the stream the dedup happens inside
the aggregation instead — ``groupBy(register, w)`` makes duplicate
occurrences of a key idempotent (same (register, pattern) cell), so
the drained state is identical without a stream-wide distinct.

Reference: N/A (305-LoC Glue ETL); streaming surface, SURVEY.md §2.
Registered beyond the round-15 grading window — first driver slot
round 16.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.streaming.events import _start_drained

from etl_pipeline_example_spark.operators.hashing import spark_hexint
from etl_pipeline_example_spark.operators.hll import (
    HLL_P,
    HLL_Q,
    SKETCH_HLL_REGISTERS_SQL,
)

_M = 1 << HLL_P

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def stream_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(register, reg_val, n_keys): the batch op's register table with
    the sketch maintained as a bounded-state streaming aggregation."""
    ev = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    cells = (
        ev.select(
            F.expr(
                spark_hexint("concat('hll:', cast(user_id as string))")
            ).alias("h")
        )
        .select(
            F.expr(f"pmod(h, {_M})").alias("register"),
            F.expr(f"h div {_M}").alias("w"),
        )
        # duplicate key occurrences collapse into the same cell: the
        # streaming replacement for the batch op's distinct()
        .groupBy("register", "w")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    sink = f"stream_hll_{uuid.uuid4().hex[:8]}"
    q = _start_drained(
        cells.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True),
        spark,
    )
    drained = spark.table(sink).select("register", "w")
    ladder = F.broadcast(
        spark.createDataFrame(
            [(b, 1 << b) for b in range(HLL_Q + 1)], "b int, cap bigint"
        )
    )
    rho = (
        drained.join(ladder, F.col("w") < F.col("cap"))
        .groupBy("register", "w")
        .agg(F.min("b").alias("bitlen"))
        .select(
            "register", (F.lit(HLL_Q) - F.col("bitlen") + 1).alias("rho")
        )
    )
    return (
        rho.groupBy("register")
        .agg(
            F.max("rho").alias("reg_val"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .orderBy("register")
    )


HLLFEED_STREAM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_hll_registers": stream_hll_registers,
}

HLLFEED_STREAM_ORACLES: dict[str, str] = {
    # stream/batch parity: the batch oracle verbatim
    "stream_hll_registers": SKETCH_HLL_REGISTERS_SQL,
}
