"""Band join (|a.x − b.x| ≤ ε) by bucket decomposition.

The numeric sibling of the interval join (plans/rangejoin.py): match
customers and suppliers whose account balances are within ε — the
"approximately equal measure" join reconciliation and entity-matching
pipelines run. A naive band join is a cartesian filter; the
distributed form BUCKETS the number line at width ε: a pair within ε
must land in the same or adjacent buckets, so one side explodes to
its 3 candidate buckets (a constant fan-out), the join becomes an
EQUI-join on the bucket id, and the exact |diff| ≤ ε check runs only
inside candidate buckets. Pair space shrinks from |C|·|S| to the sum
of per-bucket products — the O(output) shape that survives scale.

Exactness: bucket = floor(x/ε) is one correctly-rounded division plus
an exact floor (identical in both engines); the verify is a per-row
subtraction compare; the census is integer counts. The DuckDB oracle
states the band join DIRECTLY (ON abs(...) <= ε), so the hash match
certifies the decomposition preserved semantics — the same
direct-vs-decomposed oracle pattern q_interval_event_overlap pins.

Scale: both inputs prune to (key, balance, nation); the equi-join
shuffles on the ε-bucket id; skew only if many values share one
bucket, the standard salting case.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slot
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.sources.readers import read_table

BAND_EPS = "CAST(1.0 AS DOUBLE)"


def q_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(c_nationkey, s_nationkey, n_pairs): customer-supplier pairs
    with account balances within ε = 1.0, counted by nation pair."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").alias("cb"),
        F.expr(f"cast(floor(c_acctbal / {BAND_EPS}) as bigint)").alias(
            "bucket"
        ),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_nationkey",
        F.col("s_acctbal").alias("sb"),
        F.expr(f"cast(floor(s_acctbal / {BAND_EPS}) as bigint)").alias("b0"),
    )
    # constant 3-bucket fan-out on the (smaller) supplier side
    supp3 = supp.select(
        "s_suppkey",
        "s_nationkey",
        "sb",
        F.explode(F.expr("array(b0 - 1, b0, b0 + 1)")).alias("bucket"),
    )
    return (
        cust.join(supp3, "bucket")
        .filter(F.expr(f"abs(cb - sb) <= {BAND_EPS}"))
        .groupBy("c_nationkey", "s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("c_nationkey", "s_nationkey")
    )


Q_BAND_JOIN_SQL = f"""
SELECT c.c_nationkey, s.s_nationkey, count(*) AS n_pairs
FROM customer c
JOIN supplier s ON abs(c.c_acctbal - s.s_acctbal) <= {BAND_EPS}
GROUP BY 1, 2
ORDER BY 1, 2
"""


BANDJOIN_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q_band_join": q_band_join,
}

BANDJOIN_ORACLES: dict[str, str] = {
    "q_band_join": Q_BAND_JOIN_SQL,
}
