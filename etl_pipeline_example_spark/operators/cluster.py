"""Duplicate-cluster assignment: connected components over the MinHash
near-duplicate pair graph.

Pairwise dedup (operators/dedup.py) stops at edges; a real corpus prune
needs *clusters* — if A≈B and B≈C, all three are one duplicate group
even when A/C never collide in LSH. Components give each document a
canonical representative (the minimum doc_id in its component), which is
the standard keep-one policy in large-scale corpus dedup (e.g. the
near-dedup stage described in Lee et al., "Deduplicating Training Data
Makes Language Models Better", and the MapReduce connected-components
literature: Kiveris et al., SoCC'14).

Algorithm: iterated min-label propagation to a fixed point —
``comp(v) ← min(comp(v), min over neighbours comp(u))`` each round, all
as DataFrame joins/aggregations (no driver-side graph, no collect). Each
round is one shuffle on doc_id; rounds needed = component diameter.
Near-dup graphs are dense clique-ish blobs (diameter 2-4), so this
converges in a handful of rounds; ITER_CAP bounds pathological chains,
and convergence is detected by counting label changes (one tiny action
per round on an aggregated frame — never a row collect). Intermediates
``persist()`` per round and unpersist two rounds back, keeping lineage
flat — at cluster scale swap persist for ``localCheckpoint`` to truncate
lineage entirely.

The oracle is a DuckDB ``WITH RECURSIVE`` reachability closure over the
same (cross-engine-deterministic) MinHash pair set: min reachable node =
component id. Exponential-frontier oracles are fine at test scale;
label propagation is the form that runs at 100 TB.

Reference parity note: the reference has no graph stage — this extends
its dedup story the way its validation extends row counts (reference:
python_scripts/test_data.py) — data-driven, declaratively expressed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.dedup import MINHASH_PAIR_CTES, dedup_minhash

ITER_CAP = 20


def connected_components(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Components of an undirected graph given one-direction edge rows.

    Returns (node, component) with component = min node id reachable.
    Pure DataFrame iteration: per round, every node takes the min of its
    own label and its neighbours' labels.
    """
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    both = both.distinct().persist()
    labels = (
        both.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    prev: DataFrame | None = None
    for _ in range(ITER_CAP):
        # neighbour minimum, then fold in the node's own current label
        neigh = (
            both.join(labels, both.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("neigh_min"))
        )
        updated = (
            labels.join(neigh, "node")
            .select("node", F.least("component", "neigh_min").alias("component"))
            .persist()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
            .count()
        )
        if prev is not None:
            prev.unpersist()
        prev, labels = labels, updated
        if changed == 0:
            break
    both.unpersist()
    return labels


def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component, is_kept) for every doc in a near-dup cluster.

    Edges are the verified MinHash pairs; component is the min doc_id
    reachable; the representative (is_kept) is the component id itself.
    """
    pairs = dedup_minhash(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).alias("is_kept"),
    )


DEDUP_CLUSTER_SQL = f"""
WITH RECURSIVE {MINHASH_PAIR_CTES},
edges AS (
  SELECT doc_a AS s, doc_b AS d FROM mh_pairs
  UNION ALL
  SELECT doc_b AS s, doc_a AS d FROM mh_pairs
),
reach AS (
  SELECT DISTINCT s AS node, s AS root FROM edges
  UNION
  SELECT e.d AS node, r.root
  FROM reach r JOIN edges e ON e.s = r.node
)
SELECT node AS doc_id, min(root) AS component,
       node = min(root) AS is_kept
FROM reach GROUP BY node
"""


CLUSTER_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_cluster": dedup_cluster,
}

CLUSTER_ORACLES: dict[str, str] = {
    "dedup_cluster": DEDUP_CLUSTER_SQL,
}
