"""foreachBatch upsert sink: stream micro-batches merged into a keyed table.

Every other sink in the streaming family appends (memory/parquet);
production pipelines mostly MERGE — late updates must replace earlier
rows by key, not duplicate them. Structured Streaming's contract for
that is ``foreachBatch``: each micro-batch arrives as a plain
DataFrame and a batch id, and the batch function applies any batch
writer — here the maintenance layer's latest-wins
``upsert_snapshot`` (pipeline/maintain.py:91), so stream merge and
batch merge are ONE code path, not a fork.

Idempotence comes from the merge itself being latest-wins on
(version, update-side): replaying a micro-batch converges to the same
table, which is exactly the replay-safety foreachBatch requires
(Spark guarantees at-least-once batch delivery; the sink function
must be idempotent — this one is, and the test replays to prove it).

Scale notes: each micro-batch merge shuffles on the key like any
keyed upsert; the target table is rewritten per batch (parquet has no
row-level update), so batch cadence × table size bounds the write
amplification — the same trade the maintenance layer documents, kept
honest here by reusing its implementation.

No reference counterpart (the reference is a 305-LoC ETL example);
streaming-sink surface, SURVEY.md §2 (pytest-verified — stateful
file-layout side effects, no oracle by design, like rows 42/44).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from etl_pipeline_example_spark.pipeline.maintain import upsert_snapshot


def stream_upsert(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    key: str,
    version_col: str,
) -> None:
    """Drain ``source`` (a streaming DataFrame) into the keyed table
    at ``target_path`` with one latest-wins merge per micro-batch."""

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_snapshot(spark, target_path, batch, key, version_col)

    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        q = (
            source.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
