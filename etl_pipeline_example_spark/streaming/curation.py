"""Curation on the ingest stream: the C4 rule gate as a streaming filter.

A 100 TB corpus isn't cleaned in one batch — it ARRIVES continuously,
and the cheap rule gates should run at ingest so garbage never lands
in the lake. This runs ``quality_c4``'s keep conjunction (the same
shared constants — the gate is the composition, not a fork) as a
STATELESS streaming filter over the documents source: stateless means
no state store, no watermark, per-microbatch cost O(batch), and exact
stream/batch parity by construction — which the DuckDB oracle checks
(it computes the batch keep-set).

Drained with AvailableNow into a memory sink like the other streaming
ops; output is the kept (doc_id, word_cnt) — the audit trail an ingest
gate emits.

No reference counterpart (the reference is a 305-LoC ETL example);
streaming surface, SURVEY.md §2 row 41d.
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.c4 import duck_c4_keep, spark_c4_keep
from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens


def stream_c4_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream the documents source through the C4 keep conjunction;
    return the kept (doc_id, word_cnt) after an AvailableNow drain."""
    docs = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    kept = (
        docs.select("doc_id", "text", F.expr(spark_tokens("text")).alias("tk"))
        .filter(F.expr(spark_c4_keep()))
        .select("doc_id", F.expr("size(tk)").alias("word_cnt"))
    )
    sink = f"stream_c4_{uuid.uuid4().hex[:8]}"
    q = (
        kept.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


STREAM_C4_GATE_SQL = f"""
SELECT doc_id, len(tk) AS word_cnt FROM (
  SELECT doc_id, text, {duck_tokens("text")} AS tk FROM documents
)
WHERE {duck_c4_keep()}
"""


CURATION_STREAM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_c4_gate": stream_c4_gate,
}

CURATION_STREAM_ORACLES: dict[str, str] = {
    "stream_c4_gate": STREAM_C4_GATE_SQL,
}
