"""IVF cell-balance census: is the coarse quantizer's load even?

An IVF index is only as fast as its HOTTEST cell — probing a cell
costs its occupancy, so a skewed quantizer quietly turns "probe 1 of
K lists" into "rescan a third of the corpus" (the ANN twin of
q_skew_join's hot-key story). This entry censuses the certified
k-means coarse quantizer (kmeans_assign — the same labels ann_ivf
builds its index from): per-cell occupancy, its share against the
uniform ideal, and the mean member distance (a spread diagnostic:
a fat AND wide cell wants splitting).

Exactness: occupancy is integer; imbalance = K·n_c/N is one double
division per cell (HHI discipline); mean distance re-renders the
6-dp-pinned assignment distances through an exact decimal sum.

Scale: everything downstream of the assignment is a K-bounded
aggregate; the assignment itself is the already-audited broadcast
pass. Output: K rows.

Reference: N/A (305-LoC Glue ETL); LLM-pipeline surface, SURVEY.md
§2. Registered beyond the round-13 grading window — first driver
slot round 14.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.kmeans import (
    KMEANS_ASSIGN_SQL,
    KMEANS_K,
    kmeans_assign,
)


def ann_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_id, n_vecs, imbalance, mean_dist): occupancy census of
    the k-means coarse quantizer; imbalance = K·n_c/N (1.0 = uniform
    ideal)."""
    assign = kmeans_assign(spark, sf_dir)
    cells = assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.expr(
            "round(cast(sum(cast(dist as decimal(28,6))) as double)"
            " / count(dist), 6)"
        ).alias("mean_dist"),
    )
    return (
        cells.withColumn(
            "imbalance",
            F.expr(
                f"cast({KMEANS_K} as double) * cast(n_vecs as double)"
                " / cast(sum(n_vecs) over () as double)"
            ),
        )
        .select("cluster_id", "n_vecs", "imbalance", "mean_dist")
        .orderBy("cluster_id")
    )


ANN_IVF_BALANCE_SQL = f"""
WITH assign AS ({KMEANS_ASSIGN_SQL}),
cells AS (
  SELECT cluster_id, count(*) AS n_vecs,
         round(cast(sum(cast(dist AS decimal(28,6))) AS double)
               / count(dist), 6) AS mean_dist
  FROM assign GROUP BY 1
)
SELECT cluster_id, n_vecs,
       cast({KMEANS_K} AS double) * cast(n_vecs AS double)
         / cast(sum(n_vecs) OVER () AS double) AS imbalance,
       mean_dist
FROM cells
ORDER BY cluster_id
"""


IVFBALANCE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ann_ivf_balance": ann_ivf_balance,
}

IVFBALANCE_ORACLES: dict[str, str] = {
    "ann_ivf_balance": ANN_IVF_BALANCE_SQL,
}
