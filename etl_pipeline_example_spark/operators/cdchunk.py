"""Content-defined chunking census (Rabin/FastCDC-style boundaries).

Fixed-size chunking (doc_chunk, operators/corpus.py) breaks dedup the
moment one byte shifts an alignment; CONTENT-DEFINED chunking cuts at
positions the content itself selects — a boundary wherever the hash
of the trailing W-char window hits a modulus target — so identical
passages chunk identically no matter where they sit in a document.
This is the storage-dedup standard (Rabin fingerprints, FastCDC) and
the chunker long-document dedup pipelines reach for.

This entry is the planning CENSUS: per source, how many chunks the
boundary rule produces and the mean chunk size (the numbers that
pick W and the modulus before materializing chunks). Boundary rule:
position i (1-based, i ≥ W) is a cut iff
``shared_md5(substr(text, i−W+1, W)) % M == 0`` — the shared 60-bit
construct, a pure content function (no doc_id: the SAME window text
cuts everywhere, which IS the content-defined property).

Spark-first shape: all work happens INSIDE each row (transform over
the position range + one aggregate) — no explode, no token-grain
relation; the shuffle carries 3 integers per source. A production
chunker would swap the per-window md5 for a rolling (Rabin) hash —
same boundaries cheaper; md5 is the oracle-parity choice, and the
per-window cost is the honest price of cross-engine bit-exactness.

Exactness: integer counts; mean = one int/int double division.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    spark_hexint,
)
from etl_pipeline_example_spark.sources.readers import read_table

CDC_WINDOW = 8
CDC_MOD = 64  # expected chunk size ~ CDC_MOD chars

_SPARK_CUTS = (
    f"CASE WHEN length(text) < {CDC_WINDOW} THEN 0 ELSE"
    f" aggregate(sequence({CDC_WINDOW}, length(text)), 0, (acc, i) ->"
    " acc + CASE WHEN "
    + spark_hexint(f"substring(text, i - {CDC_WINDOW} + 1, {CDC_WINDOW})")
    + f" % {CDC_MOD} = 0 THEN 1 ELSE 0 END) END"
)


def doc_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_chars, n_chunks, mean_chunk_chars):
    content-defined chunk census per source (W=8, M=64)."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    per_doc = docs.select(
        "source",
        F.expr("length(text)").alias("len"),
        # chunks = cuts + 1 for any non-empty doc
        F.expr(
            f"CASE WHEN length(text) = 0 THEN 0 ELSE ({_SPARK_CUTS}) + 1 END"
        ).alias("chunks"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("len").alias("n_chars"),
            F.sum("chunks").alias("n_chunks"),
        )
        .withColumn(
            "mean_chunk_chars",
            F.expr("cast(n_chars as double) / cast(n_chunks as double)"),
        )
        .orderBy("source")
    )


_DUCK_CUTS = (
    f"CASE WHEN length(text) < {CDC_WINDOW} THEN 0 ELSE"
    " cast(list_sum([CASE WHEN "
    + duck_hexint(f"substring(text, i - {CDC_WINDOW} + 1, {CDC_WINDOW})")
    + f" % {CDC_MOD} = 0 THEN 1 ELSE 0 END"
    f" for i in range({CDC_WINDOW}, length(text) + 1)]) AS bigint) END"
)

DOC_CDC_CHUNKS_SQL = f"""
WITH per_doc AS (
  SELECT source, length(text) AS len,
         CASE WHEN length(text) = 0 THEN 0
              ELSE ({_DUCK_CUTS}) + 1 END AS chunks
  FROM documents
)
SELECT source, count(*) AS n_docs,
       cast(sum(len) AS bigint) AS n_chars,
       cast(sum(chunks) AS bigint) AS n_chunks,
       cast(sum(len) AS double) / cast(sum(chunks) AS double)
         AS mean_chunk_chars
FROM per_doc
GROUP BY source
ORDER BY source
"""


CDCHUNK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "doc_cdc_chunks": doc_cdc_chunks,
}

CDCHUNK_ORACLES: dict[str, str] = {
    "doc_cdc_chunks": DOC_CDC_CHUNKS_SQL,
}
