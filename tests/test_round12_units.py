"""Hand-verifiable unit tests for the round-12 additions.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones, against planted inputs computed by
hand (or by a trivially-auditable Python replica of the exact integer
recurrence)."""

from __future__ import annotations


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def _li(spark, tmp_path, orders):
    """orders: list of part lists; order keys are the list index."""
    rows = [
        (ok, pk) for ok, parts in enumerate(orders, start=1) for pk in parts
    ]
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint")


def test_graph_cc_finds_planted_components(spark, tmp_path):
    """Triangle {1,2,3} (every pair co-ordered twice), pair {10,11}
    (twice), and a once-only pair {20,21} that falls below the
    min-support gate — so 20/21 never enter the graph."""
    from etl_pipeline_example_spark.plans.graphiter import graph_cc

    _li(spark, tmp_path, [
        [1, 2], [1, 2],
        [2, 3], [2, 3],
        [1, 3], [1, 3],
        [10, 11], [10, 11],
        [20, 21],
    ])
    got = [
        (r["component"], r["n_parts"])
        for r in graph_cc(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 3), (10, 2)], got


def test_graph_pagerank_matches_integer_recurrence_on_a_path(
    spark, tmp_path
):
    """Path graph 1—2—3: ranks after 3 iterations must equal a plain
    Python replay of the exact integer recurrence, and the middle node
    outranks the endpoints."""
    from etl_pipeline_example_spark.plans.graphiter import (
        PR_ITERS,
        RANK_UNIT,
        graph_pagerank,
    )

    _li(spark, tmp_path, [
        [1, 2], [1, 2],
        [2, 3], [2, 3],
    ])
    neigh = {1: [2], 2: [1, 3], 3: [2]}
    deg = {p: len(ns) for p, ns in neigh.items()}
    base = (RANK_UNIT * 3) // 20
    r = {p: RANK_UNIT for p in neigh}
    for _ in range(PR_ITERS):
        contrib = {p: r[p] // deg[p] for p in neigh}
        r = {
            p: base + (17 * sum(contrib[u] for u in neigh[p])) // 20
            for p in neigh
        }
    got = {
        row["part"]: (row["degree"], row["rank_units"])
        for row in graph_pagerank(spark, str(tmp_path)).collect()
    }
    assert got == {p: (deg[p], r[p]) for p in neigh}, (got, r)
    assert got[2][1] > got[1][1] == got[3][1]
