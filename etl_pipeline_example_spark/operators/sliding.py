"""Sliding-window (overlapping) chunking — the RAG retrieval unit.

``doc_chunk`` (operators/corpus.py:45) windows at stride = size, the
pre-tokenization packing unit. Retrieval pipelines chunk DIFFERENTLY:
overlapping windows (stride < size) so no passage is ever split across
a boundary without also appearing whole in some window — the standard
RAG indexing unit (typically 50% overlap). Emitted per window:
(doc_id, chunk_id, start_tok, n_tokens, chunk_hash) — the hash, not
the text, keeps the frame narrow (the chunk store would join text back
by (doc_id, start_tok) at serve time).

Window starts are every ``SLIDE_STRIDE`` tokens while inside the doc;
trailing windows may be short. Exact integer/hash output.

Scale shape: pure scan — tokenize, one ``transform`` over the start
sequence, posexplode; no shuffle at all. The explode fan-out is
n_tokens/stride rows per doc, each a fixed-width tuple.

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-7/8
grading windows — first driver slot round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import duck_tokens, spark_tokens
from etl_pipeline_example_spark.sources.readers import read_table

SLIDE_WINDOW = 32  # tokens per window (the doc_chunk unit)
SLIDE_STRIDE = 16  # 50% overlap


def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_tokens, chunk_hash): overlapping
    token windows at stride ``SLIDE_STRIDE``; empty docs drop out."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    return (
        docs.select("doc_id", F.expr(spark_tokens("text")).alias("tk"))
        .filter(F.expr("size(tk) > 0"))
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (size(tk) - 1) div {SLIDE_STRIDE}),"
                    f" i -> named_struct("
                    f"   'start_tok', i * {SLIDE_STRIDE},"
                    f"   'n_tokens', size(slice(tk, i * {SLIDE_STRIDE} + 1, {SLIDE_WINDOW})),"
                    f"   'chunk_hash', md5(concat_ws(' ',"
                    f"       slice(tk, i * {SLIDE_STRIDE} + 1, {SLIDE_WINDOW})))))"
                )
            ).alias("chunk_id", "w"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.col("w.start_tok").alias("start_tok"),
            F.col("w.n_tokens").cast("bigint").alias("n_tokens"),
            F.col("w.chunk_hash").alias("chunk_hash"),
        )
    )


DOC_CHUNK_SLIDING_SQL = f"""
WITH tk_tbl AS (
  SELECT doc_id, {duck_tokens("text")} AS tk FROM documents
),
starts AS (
  SELECT doc_id, tk, unnest(range(0, (len(tk) - 1) // {SLIDE_STRIDE} + 1)) AS i
  FROM tk_tbl WHERE len(tk) > 0
)
SELECT doc_id,
       cast(i AS int) AS chunk_id,
       cast(i * {SLIDE_STRIDE} AS int) AS start_tok,
       cast(len(tk[i * {SLIDE_STRIDE} + 1 : i * {SLIDE_STRIDE} + {SLIDE_WINDOW}])
            AS bigint) AS n_tokens,
       md5(array_to_string(
           tk[i * {SLIDE_STRIDE} + 1 : i * {SLIDE_STRIDE} + {SLIDE_WINDOW}], ' '))
         AS chunk_hash
FROM starts
"""


SLIDING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_chunk_sliding": doc_chunk_sliding,
}

SLIDING_ORACLES: dict[str, str] = {
    "doc_chunk_sliding": DOC_CHUNK_SLIDING_SQL,
}
