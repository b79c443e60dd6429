"""Deterministic curriculum ordering: quality deciles, interleaved.

Training-order assignment for a curated corpus: bucket documents into
quality deciles, then deal them round-robin (highest decile first
within each round) so every training window sees the full quality
mix while better documents still lead each cycle — the "stratified
interleave" curriculum, assigned as a REPRODUCIBLE pure function of
the corpus (no RNG, no collect): re-runs, retries, and a re-shard all
yield the identical training order.

Scale shape: deciles come from broadcast percentile cut points (the
q_decile_lift cut pattern — never ntile over a global sort); the
within-decile order is a window PARTITIONED BY decile, ordered by a
Knuth multiplicative hash of doc_id (2654435761 = ⌊2³²/φ⌋, exact
bigint arithmetic in both engines — seeded rand() is neither stable
across partitionings nor engines). global_pos = (row−1)·10 +
(11−decile) interleaves the ten partitions without ever sorting the
corpus globally: the ORDER is total by construction, so a consumer
that needs physical order sorts shards, not rows.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-13 grading window — first driver
slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import (
    release_similarity_caches,
    tracked_persist,
)
from etl_pipeline_example_spark.sources.readers import read_table

_CUTS = [i / 10.0 for i in range(1, 10)]
_KNUTH = 2654435761
_MOD = 4294967296


def mix_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_chars, decile, global_pos): decile-interleaved
    deterministic training order (decile 10 = longest docs, leading
    each round-robin cycle)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    release_similarity_caches()
    per = tracked_persist(docs)
    cuts = per.agg(
        *[
            F.expr(f"percentile(n_chars, {c})").alias(f"c{i}")
            for i, c in enumerate(_CUTS, start=1)
        ]
    )
    bucket = "CASE " + " ".join(
        f"WHEN cast(n_chars as double) <= c{i} THEN {i}"
        for i in range(1, 10)
    ) + " ELSE 10 END"
    bucketed = per.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_chars",
        F.expr(bucket).alias("decile"),
        F.expr(f"(doc_id * {_KNUTH}L) % {_MOD}L").alias("shuf"),
    )
    w = Window.partitionBy("decile").orderBy("shuf", "doc_id")
    return (
        bucketed.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "n_chars",
            "decile",
            F.expr("(rn - 1) * 10 + (11 - decile)").alias("global_pos"),
        )
        .orderBy("global_pos", "doc_id")
    )


def _curriculum_sql() -> str:
    cut_cols = ",\n         ".join(
        f"percentile_cont({c}) WITHIN GROUP (ORDER BY n_chars) AS c{i}"
        for i, c in enumerate(_CUTS, start=1)
    )
    bucket = "CASE " + " ".join(
        f"WHEN cast(n_chars AS double) <= c{i} THEN {i}"
        for i in range(1, 10)
    ) + " ELSE 10 END"
    return f"""
WITH cuts AS (
  SELECT {cut_cols} FROM documents
),
bucketed AS (
  SELECT doc_id, n_chars, {bucket} AS decile,
         (doc_id * {_KNUTH}) % {_MOD} AS shuf
  FROM documents CROSS JOIN cuts
)
SELECT doc_id, n_chars, cast(decile AS int) AS decile,
       cast((row_number() OVER (PARTITION BY decile ORDER BY shuf, doc_id)
             - 1) * 10 + (11 - decile) AS bigint) AS global_pos
FROM bucketed
ORDER BY global_pos, doc_id
"""


MIX_CURRICULUM_SQL = _curriculum_sql()


CURRICULUM_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "mix_curriculum": mix_curriculum,
}

CURRICULUM_ORACLES: dict[str, str] = {
    "mix_curriculum": MIX_CURRICULUM_SQL,
}
