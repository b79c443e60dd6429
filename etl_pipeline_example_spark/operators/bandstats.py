"""MinHash LSH band-bucket occupancy histogram (skew diagnostic).

``dedup_minhash``'s only wide shuffle keys on (band, bucket); its cost
model — and the honesty of the "bucket sizes bound the skew, not corpus
size" claim — rests on the bucket-occupancy DISTRIBUTION. This op
materializes that distribution: for each band, how many buckets hold
exactly k documents. A healthy corpus shows mass at k = 1-2 with a thin
tail; a hot bucket (shared boilerplate signature, a degenerate shingle
set) shows up as a far-tail row and predicts candidate-pair blowup
BEFORE the quadratic within-bucket expansion runs — the operational
pre-check for ``dedup_minhash`` / ``neardup_incremental`` /
``stream_neardup_gate``, sharing their exact signature construction
(nearincremental's ``_signatures``/``_bands``, which import dedup.py's
constants — one construction site).

All-integer (counts of counts): bit-exact oracle.

Scale shape: signature pass as in dedup_minhash (map-side-combined
groupBy(doc_id)); ONE (band, bucket) shuffle with partial counts; the
histogram then reduces to ≤ bands × max-occupancy rows map-side. Pair
expansion never happens — this is strictly cheaper than the dedup op
it diagnoses.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    _DUCK_BANDS,
    _DUCK_MINS,
    _DUCK_SHINGLES_CTE,
)
from etl_pipeline_example_spark.operators.hashing import duck_h32
from etl_pipeline_example_spark.operators.nearincremental import (
    _bands,
    _signatures,
)


def minhash_band_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(band, bucket_size, n_buckets): per band, the number of LSH
    buckets holding exactly ``bucket_size`` documents."""
    bands = _bands(_signatures(spark, sf_dir))
    occ = bands.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("bucket_size")
    )
    return (
        occ.groupBy("band", "bucket_size")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .orderBy("band", "bucket_size")
    )


MINHASH_BAND_OCCUPANCY_SQL = f"""
WITH {_DUCK_SHINGLES_CTE.strip()},
hashed AS (
  SELECT doc_id, {duck_h32("shingle", 1)} AS h1, {duck_h32("shingle", 17)} AS h2
  FROM shingle_tbl
),
sig AS (
  SELECT doc_id,
         {_DUCK_MINS}
  FROM hashed GROUP BY doc_id
),
bands AS (
  {_DUCK_BANDS}
),
occ AS (
  SELECT band, bucket, count(*) AS bucket_size
  FROM bands GROUP BY 1, 2
)
SELECT band, bucket_size, count(*) AS n_buckets
FROM occ GROUP BY 1, 2 ORDER BY band, bucket_size
"""


BANDSTATS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "minhash_band_occupancy": minhash_band_occupancy,
}

BANDSTATS_ORACLES: dict[str, str] = {
    "minhash_band_occupancy": MINHASH_BAND_OCCUPANCY_SQL,
}
