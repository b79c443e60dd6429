"""Span-corruption planning census (T5-style masking, deterministic).

T5/UL2 pretraining corrupts ~15% of tokens in contiguous spans; the
pipeline-side question is the CENSUS: given the corpus and a
deterministic mask rule, how many tokens and spans does each source
contribute — the numbers that size the denoising batch mix before any
example is materialized. Masking must be a pure function of
(doc_id, position) so re-runs, retries, and the train/data teams all
see the same mask — the same determinism argument ``sample_hash``
makes for row sampling, applied inside the token dimension.

Mask rule: position i of doc d is masked iff
``hash(d || ':' || i) % 100 < MASK_PCT`` (the shared 60-bit md5
construct — operators/hashing.py). A span is a maximal masked run;
spans are counted as mask-starts (masked position whose predecessor
is unmasked or absent) — one pass, no self-join.

Spark-first shape: everything happens INSIDE the token array of each
row — ``transform`` with the index argument computes the per-position
mask, ``aggregate``/``filter`` reduce it to (n_masked, n_spans)
scalars per doc, then one map-side-combined groupBy(source). No
explode: the corpus never materializes a token-grain relation, so the
shuffle carries 4 integers per source. The DuckDB oracle states the
same mask with a list comprehension over ``range(len)`` (column-array
indexing inside a comprehension — the allowed form).

Exactness: integer counts; ``mask_rate`` is one int/int double
division (observed rate ≈ MASK_PCT/100, exact per the hash).

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
    duck_tokens,
    spark_hexint,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table

MASK_PCT = 15

_SPARK_POS_HASH = spark_hexint("concat(cast(doc_id as string), ':', cast(i as string))")

# per-position mask flags: transform exposes the 0-based index
_SPARK_MASK = (
    "transform(toks, (t, i) -> CASE WHEN"
    f" {_SPARK_POS_HASH} % 100 < {MASK_PCT} THEN 1 ELSE 0 END)"
)


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens, n_masked, n_spans, mask_rate):
    deterministic T5-style mask census by source."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    per_doc = docs.select(
        "doc_id",
        "source",
        F.expr(spark_tokens("text")).alias("toks"),
    ).select(
        "source",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr(_SPARK_MASK).alias("mask"),
    ).select(
        "source",
        "n_tokens",
        F.expr(
            "aggregate(mask, 0, (acc, m) -> acc + m)"
        ).alias("n_masked"),
        # span = mask-start: masked position with unmasked predecessor.
        # size guard: sequence(0, -1) DESCENDS (repo-wide pitfall), so
        # an empty token array short-circuits to 0 spans
        F.expr(
            "CASE WHEN size(mask) = 0 THEN 0 ELSE"
            " aggregate(sequence(0, size(mask) - 1), 0, (acc, i) ->"
            " acc + CASE WHEN element_at(mask, i + 1) = 1"
            " AND (i = 0 OR element_at(mask, i) = 0)"
            " THEN 1 ELSE 0 END) END"
        ).alias("n_spans"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_masked").alias("n_masked"),
            F.sum("n_spans").alias("n_spans"),
        )
        .withColumn(
            "mask_rate",
            F.expr("cast(n_masked as double) / cast(n_tokens as double)"),
        )
        .orderBy("source")
    )


_DUCK_POS_HASH = duck_hexint("cast(doc_id as varchar) || ':' || cast(i - 1 as varchar)")

SPAN_CORRUPTION_PLAN_SQL = f"""
WITH per_doc AS (
  SELECT source, len(toks) AS n_tokens,
         [CASE WHEN {_DUCK_POS_HASH} % 100 < {MASK_PCT}
               THEN 1 ELSE 0 END
          for i in range(1, len(toks) + 1)] AS mask
  FROM (
    SELECT doc_id, source, {duck_tokens("text")} AS toks FROM documents
  )
),
counted AS (
  SELECT source, n_tokens,
         cast(list_sum(mask) AS bigint) AS n_masked,
         cast(list_sum(
           [CASE WHEN mask[i] = 1 AND (i = 1 OR mask[i - 1] = 0)
                 THEN 1 ELSE 0 END
            for i in range(1, len(mask) + 1)]
         ) AS bigint) AS n_spans
  FROM per_doc
)
SELECT source, count(*) AS n_docs,
       cast(sum(n_tokens) AS bigint) AS n_tokens,
       cast(coalesce(sum(n_masked), 0) AS bigint) AS n_masked,
       cast(coalesce(sum(n_spans), 0) AS bigint) AS n_spans,
       cast(sum(n_masked) AS double) / cast(sum(n_tokens) AS double)
         AS mask_rate
FROM counted
GROUP BY source
ORDER BY source
"""


SPANCORRUPT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "span_corruption_plan": span_corruption_plan,
}

SPANCORRUPT_ORACLES: dict[str, str] = {
    "span_corruption_plan": SPAN_CORRUPTION_PLAN_SQL,
}
