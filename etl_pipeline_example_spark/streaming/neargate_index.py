"""Persisted history index for the streaming near-duplicate gate.

``stream_neardup_gate`` (streaming/neargate.py) is oracle-shaped: it
rebuilds the history band index inside the op on every run (~4 s at
sf0.1 — the round-7 perf-weak flag). A production gate never does that:
the history index is built ONCE when history changes (exactly what
``neardup_incremental``'s history frame is) and every gate run probes
the persisted artifact. This module is that production shape, mirroring
the ``build_ivfpq_index`` / ``ann_ivfpq_indexed`` split (operators/
pq.py:611): a side-effecting builder plus a probe whose output is
row-identical to the in-op-build gate.

  build_neardup_index  one history pass: tokenize → shingle → 16
                       minhash components; writes
                         signatures/  (other, hm0..hm15) parquet
                         bands/       (band, bucket, other) parquet
                       Narrow columns only — the band index is ~50 B a
                       row regardless of document size, so at 100 TB of
                       history the index is GBs and the nightly rebuild
                       is one linear scan. Text never rides a shuffle.
  stream_neardup_gate_indexed
                       the same stream topology as the oracle gate
                       (per-row scalar signing, stream-static band
                       probe, signature-agreement verify, stateful
                       flag-dedup) but the static side is two parquet
                       READS — no history recompute, no cache to
                       manage, micro-batch cost independent of how
                       expensive history signing was.

The stream-side topology is kept textually in sync with
``stream_neardup_gate``; neargate.py is evidence-frozen until its
round-9 driver slot, at which point the shared stream plan folds into
one helper both entry points call (noted in the round-9 plan).

Side-effecting builder + probe pair → pytest evidence (probe output ==
in-op-build gate output), like ``ann_ivfpq_indexed``; the registered
``stream_neardup_gate`` keeps the full SQL oracle.

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    MH_BANDS,
    MH_NUM_HASHES,
    MH_PRIME,
    MH_ROWS,
    SHINGLE_K,
)
from etl_pipeline_example_spark.operators.hashing import spark_h32, spark_tokens
from etl_pipeline_example_spark.operators.incremental import INCR_SPLIT
from etl_pipeline_example_spark.operators.nearincremental import (
    NEAR_EST_MIN,
    _bands,
    _signatures,
)
from etl_pipeline_example_spark.operators.simcore import release_similarity_caches
from etl_pipeline_example_spark.sources.readers import read_table


def build_neardup_index(spark: SparkSession, sf_dir: str, path: str) -> None:
    """Materialize the history near-dup index under ``path``:

    - ``signatures/`` — (other, hm0..hm15): one 16-component minhash
      signature per history doc (the verify side).
    - ``bands/``      — (band, bucket, other): the 8 LSH band cells per
      history doc (the probe side).

    One tokenize+sign pass over history total: signatures are written
    first and the band table derives from the WRITTEN parquet, so the
    expensive signing chain runs once with no cache to hold."""
    release_similarity_caches()
    sig = (
        _signatures(spark, sf_dir)
        .filter(F.col("doc_id") < INCR_SPLIT)
        .select(
            F.col("doc_id").alias("other"),
            *[F.col(f"m{i}").alias(f"hm{i}") for i in range(MH_NUM_HASHES)],
        )
    )
    sig.write.mode("overwrite").parquet(f"{path}/signatures")
    persisted = spark.read.parquet(f"{path}/signatures").select(
        F.col("other").alias("doc_id"),
        *[F.col(f"hm{i}").alias(f"m{i}") for i in range(MH_NUM_HASHES)],
    )
    (
        _bands(persisted)
        .withColumnRenamed("doc_id", "other")
        .write.mode("overwrite")
        .parquet(f"{path}/bands")
    )


def stream_neardup_gate_indexed(
    spark: SparkSession, sf_dir: str, path: str
) -> DataFrame:
    """(doc_id, near_hist): row-identical to ``stream_neardup_gate``,
    probing the ``build_neardup_index`` artifact instead of rebuilding
    history in-op. AvailableNow drain."""
    release_similarity_caches()
    h1 = spark_h32("s", 1)
    h2 = spark_h32("s", 17)
    docs = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .filter(F.col("doc_id") >= INCR_SPLIT)
        .select("doc_id", F.expr(spark_tokens("text")).alias("tk"))
        .filter(F.expr(f"size(tk) >= {SHINGLE_K}"))
        .select(
            "doc_id",
            F.expr(
                f"array_distinct(transform(sequence(1, size(tk) - {SHINGLE_K} + 1),"
                f" j -> concat_ws(' ', slice(tk, j, {SHINGLE_K}))))"
            ).alias("sh"),
        )
        .select(
            "doc_id",
            F.expr(f"transform(sh, s -> {h1})").alias("h1s"),
            F.expr(f"transform(sh, s -> {h2})").alias("h2s"),
        )
        .select(
            "doc_id",
            *[
                F.expr(
                    f"array_min(zip_with(h1s, h2s,"
                    f" (a, b) -> (a + {i + 1} * b) % {MH_PRIME}))"
                ).alias(f"m{i}")
                for i in range(MH_NUM_HASHES)
            ],
        )
    )
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            F.expr(
                "md5(concat_ws('_', "
                + ", ".join(f"m{j * MH_ROWS + r}" for r in range(MH_ROWS))
                + "))"
            ).alias("bucket"),
        )
        for j in range(MH_BANDS)
    ]
    stream_bands = docs.select(
        "doc_id",
        *[F.col(f"m{i}") for i in range(MH_NUM_HASHES)],
        F.explode(F.array(*band_cols)).alias("bb"),
    ).select(
        "doc_id",
        *[F.col(f"m{i}") for i in range(MH_NUM_HASHES)],
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )

    # the persisted index: two plain parquet reads per micro-batch —
    # the stream-static sides cost a scan of narrow columns, never the
    # history signing chain
    hist_bands = spark.read.parquet(f"{path}/bands")
    hist_sig_b = spark.read.parquet(f"{path}/signatures")
    match = " + ".join(
        f"CASE WHEN m{i} = hm{i} THEN 1 ELSE 0 END" for i in range(MH_NUM_HASHES)
    )
    flagged = (
        stream_bands.join(hist_bands, ["band", "bucket"])
        .join(hist_sig_b, "other")
        .filter(F.expr(f"{match} >= {NEAR_EST_MIN}"))
        .groupBy("doc_id")
        .agg(F.lit(True).alias("near_hist"))
    )
    sink = f"stream_neargate_idx_{uuid.uuid4().hex[:8]}"
    from etl_pipeline_example_spark.streaming.events import (
        STREAM_STATE_PARTITIONS,
        _scoped_shuffle_partitions,
    )

    with _scoped_shuffle_partitions(spark, STREAM_STATE_PARTITIONS):
        q = (
            flagged.writeStream.format("memory")
            .queryName(sink)
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    hits = spark.table(sink).groupBy("doc_id").agg(
        F.max("near_hist").alias("near_hist")
    )
    batch_docs = (
        read_table(spark, sf_dir, "documents", parallel=True)
        .select("doc_id")
        .filter(F.col("doc_id") >= INCR_SPLIT)
    )
    return batch_docs.join(hits, "doc_id", "left").select(
        "doc_id", F.expr("coalesce(near_hist, false)").alias("near_hist")
    )
