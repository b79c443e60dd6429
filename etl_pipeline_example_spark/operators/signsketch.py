"""Sign-bit sketch census: identity-hyperplane SRP occupancy.

The degenerate-but-useful corner of the random-hyperplane family:
take the SIGNS of the first ``SIGN_BITS`` raw dimensions as the
hash (sign-random-projection with identity planes — zero multiplies,
just comparisons), and census the bucket occupancy per class label.
Production use: a free first-cut blocking key for near-dup detection
on already-whitened embeddings, and a quick diagnostic — a label
whose members pile into few sign buckets is axis-aligned/collapsed
(the embed_dim_stats signal read through a hashing lens).

Exactness: the sketch is Σ 1<<i over non-negative dims — integer
built from float SIGN COMPARISONS only (both engines agree on >= 0
bit-for-bit; no arithmetic on the floats at all, stricter even than
the shared-fold dot products the LSH entries use).

Scale: sketch is a shuffle-free projection inside the vector array;
the census is two map-side-combined aggregates — (label, sketch)
then label — the Gini-style two-level fold. Output: one row per
label.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-13 grading window — first driver
slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

SIGN_BITS = 12


def embed_sign_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, n_vecs, n_buckets, max_bucket, n_collided): sign-bit
    sketch bucket occupancy per class label."""
    emb = read_table(spark, sf_dir, "embeddings", parallel=True)
    sketch = (
        f"aggregate(sequence(0, {SIGN_BITS - 1}), cast(0 as bigint),"
        " (acc, b) -> acc + CASE WHEN element_at(embedding, b + 1) >= 0"
        " THEN shiftleft(cast(1 as bigint), b) ELSE cast(0 as bigint) END)"
    )
    buckets = (
        emb.select("label", F.expr(sketch).alias("sketch"))
        .groupBy("label", "sketch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        buckets.groupBy("label")
        .agg(
            F.sum("n").alias("n_vecs"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0)).alias(
                "n_collided"
            ),
        )
        .orderBy("label")
    )


EMBED_SIGN_SKETCH_SQL = f"""
WITH sketches AS (
  SELECT label,
         list_sum([ CASE WHEN embedding[i] >= 0
                         THEN (1::BIGINT << (i - 1)) ELSE 0::BIGINT END
                    for i in range(1, {SIGN_BITS} + 1) ]) AS sketch
  FROM embeddings
),
buckets AS (
  SELECT label, sketch, count(*) AS n FROM sketches GROUP BY 1, 2
)
SELECT label,
       cast(sum(n) AS bigint) AS n_vecs,
       count(*) AS n_buckets,
       cast(max(n) AS bigint) AS max_bucket,
       cast(sum(CASE WHEN n >= 2 THEN n ELSE 0 END) AS bigint)
         AS n_collided
FROM buckets
GROUP BY label
ORDER BY label
"""


SIGNSKETCH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embed_sign_sketch": embed_sign_sketch,
}

SIGNSKETCH_ORACLES: dict[str, str] = {
    "embed_sign_sketch": EMBED_SIGN_SKETCH_SQL,
}
