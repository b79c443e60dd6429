"""Cross-split near-duplicate leakage: the train/test firewall audit.

``sample_split`` carves the corpus 98/1/1 by content hash;
``dedup_minhash`` finds verified near-duplicate pairs. The question
that actually decides whether an eval number is trustworthy is their
JOIN: does any held-out document have a near-duplicate sitting in
train? A test doc with a 0.9-Jaccard twin in the training split is
memorization leakage, not generalization — the Lee et al. dedup paper's
core motivation, and the audit every serious pretraining pipeline runs
before trusting its validation loss.

BY COMPOSITION of the two certified ops (the quality_agreement /
dataset_card_diff precedent): pairs come from the registered MinHash
machinery (banded LSH candidates, exact-Jaccard verify ≥ τ), splits
from the registered content-hash assignment; the grid is the pair
count per unordered split pair (≤ 6 rows) plus each cell's maximum
jaccard — cross-split rows with n_pairs > 0 are the alarm. Oracle
nests both ops' green oracle SQL as CTEs.

Scale: the pair spine is band-bucket-bounded (the certified minhash
economics — never all-pairs); the split join is two keyed probes of a
(doc_id, split) projection; the final grid aggregation is ≤ 6 rows.

No reference counterpart (305-LoC Glue ETL); LLM-pipeline surface,
SURVEY.md §2. Registered beyond the round-14 grading window — first
driver slot round 15.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    DEDUP_MINHASH_SQL,
    dedup_minhash,
)
from etl_pipeline_example_spark.operators.evaluation import (
    SAMPLE_SPLIT_SQL,
    sample_split,
)


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split_lo, split_hi, n_pairs, max_jaccard): verified near-dup
    pairs per unordered split pair — cross-split cells are leakage."""
    pairs = dedup_minhash(spark, sf_dir)
    splits = sample_split(spark, sf_dir).select("doc_id", "split")
    sa = splits.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("s_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("s_b")
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            F.expr("least(s_a, s_b)").alias("split_lo"),
            F.expr("greatest(s_a, s_b)").alias("split_hi"),
            "jaccard",
        )
        .groupBy("split_lo", "split_hi")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
        .orderBy("split_lo", "split_hi")
    )


SPLIT_LEAKAGE_SQL = f"""
WITH pairs AS ({DEDUP_MINHASH_SQL}),
splits AS ({SAMPLE_SPLIT_SQL})
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       count(*) AS n_pairs,
       max(p.jaccard) AS max_jaccard
FROM pairs p
JOIN splits sa ON sa.doc_id = p.doc_a
JOIN splits sb ON sb.doc_id = p.doc_b
GROUP BY 1, 2
ORDER BY split_lo, split_hi
"""


SPLITLEAK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "split_leakage": split_leakage,
}

SPLITLEAK_ORACLES: dict[str, str] = {
    "split_leakage": SPLIT_LEAKAGE_SQL,
}
