"""SimHash hamming-distance histogram (near-dup threshold calibration).

``dedup_simhash`` (operators/dedup.py) flags pairs at hamming ≤ 3 — but
WHERE to put that cutoff is an empirical question per corpus. This op
keeps the same 60-bit fingerprints and the same pigeonhole chunk
blocking, drops the cutoff, and histograms the hamming distance over
ALL blocked candidate pairs: a well-separated corpus shows a bimodal
table (near-dups piled at 0-3, background mass far out), and the valley
is the defensible threshold — the simhash analogue of
``minhash_calibration``'s band-probability table.

Both plan and oracle are thin consumers of the ONE shared construction
site (``dedup.simhash_blocked_pairs`` / ``dedup.SIMHASH_PAIRS_CTES``) —
the round-8 textual-sync debt, folded per the round-8 verdict when
dedup.py's window slot cleared.

All-integer arithmetic (votes, popcounts, pair counts): bit-exact.

Scale shape: identical to ``dedup_simhash`` — the candidate space is
bounded by the 15-bit chunk blocking (4 narrow rows per doc, pairs
only within equal-chunk buckets), never all-pairs; the histogram then
reduces pairs to ≤ 61 rows with map-side partials. The distinct-pair
dedup before counting shuffles (doc_a, doc_b, hamming) triples only.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    SIMHASH_PAIRS_CTES,
    simhash_blocked_pairs,
)


def simhash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hamming, n_pairs): distance distribution over the chunk-blocked
    simhash candidate pairs (no cutoff)."""
    return (
        simhash_blocked_pairs(spark, sf_dir)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


SIMHASH_HAMMING_HIST_SQL = f"""
WITH {SIMHASH_PAIRS_CTES}
SELECT hamming, count(*) AS n_pairs
FROM sim_pairs GROUP BY 1 ORDER BY hamming
"""


HAMMINGHIST_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "simhash_hamming_hist": simhash_hamming_hist,
}

HAMMINGHIST_ORACLES: dict[str, str] = {
    "simhash_hamming_hist": SIMHASH_HAMMING_HIST_SQL,
}
