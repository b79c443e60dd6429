"""Incremental exact dedup: a new batch against the historical index.

Production dedup is never one big batch — it is TODAY'S crawl against
the accumulated hash index of everything already kept, plus dedup
WITHIN today's batch. The split semantics matter (a doc can be clean
against history yet a dup inside its own batch), and the scale shape
matters more: the historical side at 100 TB is a narrow (hash) index
table — the batch joins THAT, never history's text.

Batch boundary here: ``doc_id < INCR_SPLIT`` is history, the rest is
the incoming batch (a deterministic stand-in for the date partition a
real pipeline splits on). Status per incoming doc:

  dup_of_history   content hash exists in the historical index
  dup_in_batch     clean vs history, but an earlier (lower doc_id)
                   incoming doc has the same hash
  new              neither — the doc the index grows by

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 21a.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_norm_text,
    spark_norm_text,
)
from etl_pipeline_example_spark.sources.readers import read_table

INCR_SPLIT = 250  # doc_id < this = historical; rest = incoming batch


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, status) for every incoming-batch document.

    Scale shape: history collapses to its DISTINCT hash index (narrow,
    one column — at 100 TB this is the persisted index table, not a
    rescan); the batch left-semi-joins it for the history flag, the
    within-batch pass is a min-doc_id-per-hash aggregate + semi join
    (both hash-keyed, map-side combined). The batch's text is read
    once; history's text is never read at all.
    """
    hashed = read_table(spark, sf_dir, "documents", parallel=True).select(
        "doc_id", F.expr(f"md5({spark_norm_text('text')})").alias("h")
    )
    history_index = (
        hashed.filter(F.col("doc_id") < INCR_SPLIT).select("h").distinct()
    )
    batch = hashed.filter(F.col("doc_id") >= INCR_SPLIT)
    vs_history = batch.join(history_index, "h", "left_semi").select("doc_id")
    first_in_batch = batch.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    dup_in_batch = (
        batch.join(first_in_batch, "h")
        .filter(F.col("doc_id") != F.col("first_id"))
        .select("doc_id")
    )
    return batch.select("doc_id").join(
        vs_history.withColumn("vh", F.lit(1)), "doc_id", "left"
    ).join(
        dup_in_batch.withColumn("db", F.lit(1)), "doc_id", "left"
    ).select(
        "doc_id",
        F.expr(
            "CASE WHEN vh = 1 THEN 'dup_of_history'"
            " WHEN db = 1 THEN 'dup_in_batch'"
            " ELSE 'new' END"
        ).alias("status"),
    )


DEDUP_INCREMENTAL_SQL = f"""
WITH hashed AS (
  SELECT doc_id, md5({duck_norm_text("text")}) AS h FROM documents
),
history_index AS (
  SELECT DISTINCT h FROM hashed WHERE doc_id < {INCR_SPLIT}
),
batch AS (
  SELECT doc_id, h FROM hashed WHERE doc_id >= {INCR_SPLIT}
),
first_in_batch AS (
  SELECT h, min(doc_id) AS first_id FROM batch GROUP BY 1
)
SELECT b.doc_id,
       CASE WHEN b.h IN (SELECT h FROM history_index) THEN 'dup_of_history'
            WHEN b.doc_id != f.first_id THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM batch b JOIN first_in_batch f USING (h)
"""


INCREMENTAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_incremental": dedup_incremental,
}

INCREMENTAL_ORACLES: dict[str, str] = {
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
}
