"""Graph analytics over the part co-order graph: degrees + triangles.

The engine's graph-shaped surface, built on a graph the warehouse
already implies: vertices are parts, an edge joins two parts that were
ever ordered together (the q_basket_pairs construction — plans/
basket.py:40 — without the top-N cut). Two readouts:

  graph_degree_hist  degree distribution (how many parts have k
                     co-order partners) — the shape diagnostic that
                     says whether downstream mining needs skew
                     handling.
  graph_triangles    global triangle count via the DEGREE-ORDERED
                     ORIENTATION algorithm — the distributed-triangle
                     standard (Suri & Vassilvitskii's MapReduce
                     formulation): orient every edge from the
                     lower-(degree, id) endpoint to the higher, so
                     each wedge is generated exactly once at its
                     lowest vertex and high-degree hubs never fan out
                     — the join space is Σ d_out², with d_out bounded
                     by √|E| instead of the raw degree. One wedge
                     self-join + one edge semi-join, all on int pairs.

Exactness: degrees, wedge counts, and the triangle total are exact
integers end-to-end.

Scale: baskets are schema-bounded (≤7 lines/order), so the edge list
is linear in lineitem; the orientation bound keeps the wedge join
quadratic only in √|E| — the reason this exact shape (not the naive
3-way self-join on raw edges) is the one that survives 100 TB.

Reference: N/A (305-LoC Glue ETL); engine surface, SURVEY.md §2.
Registered beyond the round-11 grading window — first driver slots
round 12.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.simcore import (
    release_similarity_caches,
    tracked_persist,
)
from etl_pipeline_example_spark.sources.readers import read_table


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected distinct part-co-order edges as (u, v), u < v.
    PERSISTED (tracked): the edge list is a self-join and every
    consumer below reads it at least twice (degrees union, orientation,
    wedge closure) — without the persist Spark re-runs the join per
    consumer."""
    dp = spark.sparkContext.defaultParallelism
    # ONE dp-wide exchange on the order key serves the whole chain:
    # partitioning by a subset of (l_orderkey, l_partkey) satisfies the
    # distinct's clustering AND co-locates the self-join, so neither
    # re-shuffles (and nothing runs at the session's default width)
    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .repartition(dp, "l_orderkey")
        .distinct()
    )
    release_similarity_caches()
    return tracked_persist(
        li.alias("a")
        .join(li.alias("b"), "l_orderkey")
        .filter(F.expr("a.l_partkey < b.l_partkey"))
        .select(
            F.expr("a.l_partkey").alias("u"),
            F.expr("b.l_partkey").alias("v"),
        )
        .repartition(dp, "u")
        .distinct()
    )


_EDGES_SQL = """
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
)
"""


def _degrees(spark: SparkSession, edges: DataFrame) -> DataFrame:
    dp = spark.sparkContext.defaultParallelism
    # one inline explode, not a two-branch unionAll: the union's two
    # references raced duplicate copies of the persisted edge self-join
    # before its cache filled (r17; same row multiset)
    return (
        edges.select(F.explode(F.array("u", "v")).alias("p"))
        .repartition(dp, "p")
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(degree, n_parts): how many parts have each co-order degree."""
    degrees = _degrees(spark, _edges(spark, sf_dir)).withColumnRenamed(
        "deg", "degree"
    )
    return (
        degrees.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .orderBy("degree")
    )


GRAPH_DEGREE_HIST_SQL = f"""
WITH {_EDGES_SQL},
degrees AS (
  SELECT p, count(*) AS degree FROM (
    SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges
  ) GROUP BY 1
)
SELECT degree, count(*) AS n_parts FROM degrees GROUP BY 1 ORDER BY degree
"""


# Broadcast the (u, v) edge list into the wedge-closure join when it is
# provably small.  The gate is the RAW INPUT SIZE of the lineitem scan
# (a driver-side file stat — no job, no barrier): baskets are
# schema-bounded (≤ 7 lines/order → ≤ 21 pairs/order), so |E| is linear
# in lineitem and a ≤ 256 MB lineitem bounds the two-long edge list to
# a few tens of MB built — comfortable against the session's 8 g driver
# and Spark's 8 GB broadcast cap.  The wedge side is Σ d_out² (>> |E|),
# so broadcasting |E| removes the TWO big exchanges the plan otherwise
# pays: the explicit wedge repartition AND the sort-merge shuffle of
# the wedge fan-out (guide §3.1).  Size-adaptive, not a local[32]
# constant: at 100 TB the gate fails and the plan falls back to the
# shuffled shape unchanged.
_BCAST_INPUT_BYTES = 256 * 1024 * 1024


def _edges_broadcastable(sf_dir: str) -> bool:
    import os

    path = os.path.join(sf_dir, "lineitem.parquet")
    try:
        # a dataset may be a directory of part files; sum the parts
        # rather than trust the directory inode's size (round-17 ADVICE)
        if os.path.isdir(path):
            size = sum(
                e.stat().st_size for e in os.scandir(path) if e.is_file()
            )
        else:
            size = os.path.getsize(path)
        return size <= _BCAST_INPUT_BYTES
    except OSError:  # non-local path (object store): never broadcast
        return False


def _triangles_from(
    spark: SparkSession, edges: DataFrame, degrees: DataFrame, bcast: bool
) -> DataFrame:
    """Triangle census over a PERSISTED+materialized edge list and its
    persisted degree table (shared with graph_clustering_coeff so the
    expensive edge build runs once per query, not once per consumer)."""
    dp = spark.sparkContext.defaultParallelism
    # orient each edge from the lower-(degree, id) endpoint to the higher
    du = degrees.select(
        F.col("p").alias("u"), F.col("deg").alias("du")
    )
    dv = degrees.select(
        F.col("p").alias("v"), F.col("deg").alias("dv")
    )
    # persisted (|E| rows, two ints): the wedge self-join reads it
    # twice; pre-partitioned on src so the self-join shares one exchange
    oriented = tracked_persist(
        edges.join(du, "u")
        .join(dv, "v")
        .selectExpr(
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END"
            " AS src",
            "CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END"
            " AS dst",
        )
        .repartition(dp, "src")
    )
    if bcast:
        # EDGE-ITERATOR under the broadcast gate (guide §1.2 — change
        # the algorithm before the constants): a triangle {x,y,z} has
        # exactly one edge whose BOTH endpoints point at the third
        # vertex (the two in-edges of the triangle's sink), so
        # n_triangles = Σ over oriented edges |N⁺(src) ∩ N⁺(dst)|.
        # The wedge self-join + closure probe materialized Σ d_out²
        # wedge rows (the profiled 5.4 s single stage at sf0.1) only to
        # count the survivors; the adjacency-array intersect does the
        # identical Σ d_out² element-compares INSIDE one map-side
        # operator — no wedge rows, no probe per wedge. adj is |E|
        # longs grouped into ≤ √|E|-long arrays, bounded by the same
        # input gate that already bounds broadcasting the edge list.
        # ONE broadcast adjacency, joined twice under aliases (r17
        # ADVICE): the per-side renamed projections made the two
        # broadcast subtrees non-identical, so the collect_list
        # aggregation ran and broadcast TWICE; with identical subtrees
        # the second side is a ReusedExchange — one build, one copy in
        # executor memory
        adj = F.broadcast(
            oriented.groupBy("src").agg(F.collect_list("dst").alias("nb"))
        )
        closed = (
            oriented.alias("e")
            .join(adj.alias("au"), F.col("e.src") == F.col("au.src"))
            .join(adj.alias("av"), F.col("e.dst") == F.col("av.src"), "left")
            .select(
                F.when(F.col("av.nb").isNull(), F.lit(0))
                .otherwise(
                    F.size(F.array_intersect(F.col("au.nb"), F.col("av.nb")))
                )
                .alias("n_common")
            )
        )
        tri = closed.agg(
            F.coalesce(F.sum(F.expr("cast(n_common as bigint)")), F.lit(0).cast("bigint")).alias(
                "n_triangles"
            )
        )
    else:
        # at scale the gate fails: keep the shuffled wedge-closure shape
        # (Suri & Vassilvitskii) — wedge rows are 2 longs and the
        # closure is a keyed join, the proven 100 TB plan
        wedges = (
            oriented.alias("e1")
            .join(oriented.alias("e2"), "src")
            .filter(F.expr("e1.dst < e2.dst"))
            .selectExpr("e1.dst AS u", "e2.dst AS v")
        )
        closed = wedges.repartition(dp, "u").join(edges, ["u", "v"])
        tri = closed.agg(F.count(F.lit(1)).alias("n_triangles"))
    vstats = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    verts = degrees.agg(F.count(F.lit(1)).alias("n_vertices"))
    return (
        verts.crossJoin(F.broadcast(vstats))
        .crossJoin(F.broadcast(tri))
        .select("n_vertices", "n_edges", "n_triangles")
    )


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_vertices, n_edges, n_triangles): global triangle census via
    degree-ordered orientation."""
    edges = _edges(spark, sf_dir)
    # persisted (|V| rows): consumed by both endpoint joins below
    degrees = tracked_persist(_degrees(spark, edges))
    return _triangles_from(spark, edges, degrees, _edges_broadcastable(sf_dir))


GRAPH_TRIANGLES_SQL = f"""
WITH {_EDGES_SQL},
degrees AS (
  SELECT p, count(*) AS deg FROM (
    SELECT u AS p FROM edges UNION ALL SELECT v AS p FROM edges
  ) GROUP BY 1
),
oriented AS (
  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst
  FROM edges e
  JOIN degrees du ON du.p = e.u
  JOIN degrees dv ON dv.p = e.v
),
wedges AS (
  SELECT e1.dst AS u, e2.dst AS v
  FROM oriented e1 JOIN oriented e2 ON e1.src = e2.src
  WHERE e1.dst < e2.dst
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM wedges w JOIN edges e ON w.u = e.u AND w.v = e.v
),
verts AS (SELECT count(*) AS n_vertices FROM degrees),
ecnt AS (SELECT count(*) AS n_edges FROM edges)
SELECT v.n_vertices, e.n_edges, t.n_triangles
FROM verts v CROSS JOIN ecnt e CROSS JOIN tri t
"""


GRAPH_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "graph_degree_hist": graph_degree_hist,
    "graph_triangles": graph_triangles,
}

GRAPH_ORACLES: dict[str, str] = {
    "graph_degree_hist": GRAPH_DEGREE_HIST_SQL,
    "graph_triangles": GRAPH_TRIANGLES_SQL,
}
