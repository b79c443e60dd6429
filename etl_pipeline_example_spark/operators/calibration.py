"""MinHash sketch calibration: estimated vs exact Jaccard.

The trust audit for the dedup sketch: on every VERIFIED near-dup pair
(where the exact Jaccard is already computed), also evaluate what the
16-hash MinHash signature alone would have ESTIMATED — the fraction of
matching signature components — and report the error statistics. This
is the number that justifies the sketch's band/row configuration:
E[est] = J with σ = √(J(1−J)/16) ≈ 0.12, so the mean absolute error
on τ ≥ 0.4 pairs should sit well inside one σ.

Exactness: est = k/16 is exact at 4 decimal places, the exact jaccard
is 6-dp pinned, and both accumulate as exact decimals (order-
independent) with single double divisions at the end — the stats match
the oracle bit-for-bit. The oracle reuses dedup_minhash's full CTE
chain (`sig` + `mh_pairs`), so the whole signature pipeline is
re-verified through its own calibration.

No reference counterpart (the reference is a 305-LoC ETL example);
LLM-pipeline surface, SURVEY.md §2 row 22a.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import (
    MH_NUM_HASHES,
    MINHASH_PAIR_CTES,
    _minhash_signature_tables,
    dedup_minhash,
)


def minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (n_pairs, mean_jaccard, mean_estimate, mean_abs_err,
    max_abs_err) over the verified pair set.

    Scale shape: the pair set is the (already candidate-bounded)
    dedup_minhash output; signatures are the dedup's own persisted
    signature table (cache-shared, not re-aggregated) and join the
    pairs on doc id twice — pairs-bounded work throughout.
    """
    pairs = dedup_minhash(spark, sf_dir)
    # the signature table is the SAME aggregation dedup_minhash just
    # built (and left persisted, module caching contract): reuse the
    # cache instead of re-running shingle+hash+17-aggregate groupBy
    _, sig = _minhash_signature_tables(spark, sf_dir)
    sig = sig.select(
        "doc_id", *[F.col(f"m{i}") for i in range(MH_NUM_HASHES)]
    )
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(MH_NUM_HASHES)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(MH_NUM_HASHES)],
    )
    matches = " + ".join(
        f"(CASE WHEN a{i} = b{i} THEN 1 ELSE 0 END)" for i in range(MH_NUM_HASHES)
    )
    scored = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            F.expr(
                f"cast(cast(({matches}) as double) / {MH_NUM_HASHES}"
                " as decimal(10,6))"
            ).alias("est"),
            F.expr("cast(jaccard as decimal(10,6))").alias("jac"),
        )
    )
    return scored.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("round(cast(sum(jac) as double) / count(*), 6)").alias("mean_jaccard"),
        F.expr("round(cast(sum(est) as double) / count(*), 6)").alias("mean_estimate"),
        F.expr(
            "round(cast(sum(abs(est - jac)) as double) / count(*), 6)"
        ).alias("mean_abs_err"),
        F.expr("cast(max(abs(est - jac)) as double)").alias("max_abs_err"),
    )


_MATCHES = " + ".join(
    f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(MH_NUM_HASHES)
)

MINHASH_CALIBRATION_SQL = f"""
WITH {MINHASH_PAIR_CTES},
scored AS (
  SELECT cast(cast(({_MATCHES}) AS double) / {MH_NUM_HASHES}
              AS decimal(10,6)) AS est,
         cast(p.jaccard AS decimal(10,6)) AS jac
  FROM mh_pairs p
  JOIN sig a ON a.doc_id = p.doc_a
  JOIN sig b ON b.doc_id = p.doc_b
)
SELECT count(*) AS n_pairs,
       round(cast(sum(jac) AS double) / count(*), 6) AS mean_jaccard,
       round(cast(sum(est) AS double) / count(*), 6) AS mean_estimate,
       round(cast(sum(abs(est - jac)) AS double) / count(*), 6) AS mean_abs_err,
       cast(max(abs(est - jac)) AS double) AS max_abs_err
FROM scored
"""


CALIBRATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "minhash_calibration": minhash_calibration,
}

CALIBRATION_ORACLES: dict[str, str] = {
    "minhash_calibration": MINHASH_CALIBRATION_SQL,
}
