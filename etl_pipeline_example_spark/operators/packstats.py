"""Packing-efficiency report (the sequence-packing KPI panel).

``doc_pack`` (operators/corpus.py:224) assigns every document a
(bin, offset) in concat-then-chunk ``PACK_BUDGET``-token training
sequences. The number a pretraining-data owner actually watches is the
EFFICIENCY of that packing, per independent packing stream:

  tail_waste   tokens of dead space at each stream's final partial
               bin (concat packing wastes ONLY at the tail — that is
               its selling point over first-fit padding);
  n_straddle   documents crossing a bin boundary (each straddle is a
               training sequence whose prefix is mid-document — the
               cost concat packing pays for its zero padding).

Pure composition over doc_pack's assignment — its oracle SQL is
wrapped as a CTE, so the report re-verifies the packing end-to-end.
All columns exact integers.

Scale shape: one aggregate over the assignment frame keyed by the
(lang, shard) stream id — map-side combined, stream-count-bounded
output.

No reference counterpart (reference: glue_jobs/example_job/job.py);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-7/8
grading windows — first driver slot round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.corpus import (
    CORPUS_ORACLES,
    PACK_BUDGET,
    doc_pack,
)

_STRADDLE = f"CASE WHEN bin_offset + n_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END"


def pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, shard, n_docs, n_tokens, n_bins, tail_waste, n_straddle)
    per packing stream, ordered by (lang, shard)."""
    assign = doc_pack(spark, sf_dir)
    return (
        assign.groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum(F.expr(_STRADDLE)).alias("n_straddle"),
        )
        .select(
            "lang",
            "shard",
            "n_docs",
            "n_tokens",
            F.expr(
                f"(n_tokens + {PACK_BUDGET} - 1) div {PACK_BUDGET}"
            ).alias("n_bins"),
            F.expr(
                f"((n_tokens + {PACK_BUDGET} - 1) div {PACK_BUDGET})"
                f" * {PACK_BUDGET} - n_tokens"
            ).alias("tail_waste"),
            "n_straddle",
        )
        .orderBy("lang", "shard")
    )


PACK_EFFICIENCY_SQL = f"""
WITH assignment AS ({CORPUS_ORACLES["doc_pack"]}),
agg AS (
  SELECT lang, shard,
         count(*) AS n_docs,
         cast(sum(n_tokens) AS bigint) AS n_tokens,
         cast(sum({_STRADDLE}) AS bigint) AS n_straddle
  FROM assignment GROUP BY 1, 2
)
SELECT lang, shard, n_docs, n_tokens,
       cast((n_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET} AS bigint) AS n_bins,
       cast(((n_tokens + {PACK_BUDGET} - 1) // {PACK_BUDGET})
            * {PACK_BUDGET} - n_tokens AS bigint) AS tail_waste,
       n_straddle
FROM agg
ORDER BY lang, shard
"""


PACKSTATS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pack_efficiency": pack_efficiency,
}

PACKSTATS_ORACLES: dict[str, str] = {
    "pack_efficiency": PACK_EFFICIENCY_SQL,
}
