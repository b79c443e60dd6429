"""SimHash hamming-distance histogram (near-dup threshold calibration).

``dedup_simhash`` (operators/dedup.py:264) flags pairs at hamming ≤ 3
— but WHERE to put that cutoff is an empirical question per corpus.
This op keeps the same 60-bit fingerprints and the same pigeonhole
chunk blocking, drops the cutoff, and histograms the hamming distance
over ALL blocked candidate pairs: a well-separated corpus shows a
bimodal table (near-dups piled at 0-3, background mass far out), and
the valley is the defensible threshold — the simhash analogue of
``minhash_calibration``'s band-probability table.

All-integer arithmetic (votes, popcounts, pair counts): bit-exact.
The fingerprint construction is kept textually in sync with
``dedup_simhash``; its module is evidence-frozen (r6-green), so the
construction is restated here rather than refactored out (noted for
the next unfreeze).

Scale shape: identical to ``dedup_simhash`` — the candidate space is
bounded by the 15-bit chunk blocking (4 narrow rows per doc, pairs
only within equal-chunk buckets), never all-pairs; the histogram then
reduces pairs to ≤ 61 rows with map-side partials. The distinct-pair
dedup before counting shuffles (doc_a, doc_b, hamming) triples only.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2. Registered beyond the round-8
grading window — first driver slot round 9.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    SH_BITS,
    SH_CHUNK_BITS,
    SH_CHUNKS,
)
from etl_pipeline_example_spark.operators.hashing import (
    duck_hexint,
    duck_tokens,
    spark_hexint,
    spark_tokens,
)
from etl_pipeline_example_spark.sources.readers import read_table


def simhash_hamming_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(hamming, n_pairs): distance distribution over the chunk-blocked
    simhash candidate pairs (no cutoff)."""
    docs = read_table(spark, sf_dir, "documents", parallel=True)
    toks = spark_tokens("text")
    th = spark_hexint("t")
    bit_sums = (
        docs.select("doc_id", F.explode(F.expr(f"array_distinct({toks})")).alias("t"))
        .select("doc_id", F.expr(th).alias("h"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            *[
                F.sum(F.expr(f"(h >> {p}) & 1")).alias(f"b{p}")
                for p in range(SH_BITS)
            ],
        )
    )
    fp_expr = " + ".join(
        f"CASE WHEN 2 * b{p} >= n_tok THEN shiftleft(cast(1 as bigint), {p})"
        " ELSE cast(0 as bigint) END"
        for p in range(SH_BITS)
    )
    fp = bit_sums.select("doc_id", F.expr(fp_expr).alias("fp"))
    chunks = fp.select(
        "doc_id",
        "fp",
        F.explode(
            F.expr(
                f"transform(sequence(0, {SH_CHUNKS - 1}),"
                f" c -> named_struct('chunk', c, 'val',"
                f" (fp >> (c * {SH_CHUNK_BITS})) & {2**SH_CHUNK_BITS - 1}))"
            )
        ).alias("cc"),
    ).select(
        "doc_id", "fp", F.col("cc.chunk").alias("chunk"), F.col("cc.val").alias("val")
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val")),
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.fp ^ b.fp)").alias("hamming"),
        )
        .distinct()
    )
    return (
        pairs.groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("hamming")
    )


SIMHASH_HAMMING_HIST_SQL = f"""
WITH tok_tbl AS (
  SELECT doc_id, {duck_tokens("text")} AS tk FROM documents
),
tokens AS (
  SELECT DISTINCT doc_id, unnest(tk) AS t FROM tok_tbl
),
hashes AS (
  SELECT doc_id, {duck_hexint("t")} AS h FROM tokens
),
bitvotes AS (
  SELECT doc_id, p, sum(CASE WHEN (h >> p) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM hashes, (SELECT unnest(range(0, {SH_BITS})) AS p)
  GROUP BY doc_id, p
),
fp_tbl AS (
  SELECT doc_id,
         sum(CASE WHEN vote >= 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS fp
  FROM bitvotes GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, fp, c AS chunk,
         (fp >> (c * {SH_CHUNK_BITS})) & {2**SH_CHUNK_BITS - 1} AS val
  FROM fp_tbl, (SELECT unnest(range(0, {SH_CHUNKS})) AS c)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.fp, b.fp)) AS hamming
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT hamming, count(*) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY hamming
"""


HAMMINGHIST_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "simhash_hamming_hist": simhash_hamming_hist,
}

HAMMINGHIST_ORACLES: dict[str, str] = {
    "simhash_hamming_hist": SIMHASH_HAMMING_HIST_SQL,
}
