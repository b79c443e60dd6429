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


def test_rolling_median_picks_lower_median_per_trailing_frame(
    spark, tmp_path
):
    """One customer, totals [10, 100, 20] in date order → frames
    [10], [10,100], [10,20,100] → lower medians 10, 10, 20."""
    from etl_pipeline_example_spark.plans.rollmed import q_rolling_median

    _write(spark, tmp_path, "orders",
           [(1, 1, "2024-01-01", 10.0),
            (2, 1, "2024-01-02", 100.0),
            (3, 1, "2024-01-03", 20.0)],
           "o_orderkey bigint, o_custkey bigint, o_orderdate string,"
           " o_totalprice double")
    got = {
        r["o_orderkey"]: (r["n_window"], r["roll_median"])
        for r in q_rolling_median(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 10.0), 2: (2, 10.0), 3: (3, 20.0)}, got


def test_fifo_cover_consumes_lots_in_ship_order(spark, tmp_path):
    """Part 1: lots [5, 5, 5] by ship date, demand 7 → takes [5, 2, 0]
    (2 lots used, fully covered). Part 2: demand 20 vs supply 10 →
    unfilled 10, every lot used."""
    from etl_pipeline_example_spark.plans.fifo import q_fifo_cover

    rows = [
        # (orderkey, partkey, lineno, shipdate, returnflag, qty)
        (1, 1, 1, "2024-01-01", "N", 5.0),
        (2, 1, 1, "2024-01-02", "N", 5.0),
        (3, 1, 1, "2024-01-03", "N", 5.0),
        (4, 1, 1, "2024-01-04", "R", 7.0),
        (5, 2, 1, "2024-01-01", "N", 10.0),
        (6, 2, 1, "2024-01-02", "R", 20.0),
    ]
    _write(spark, tmp_path, "lineitem",
           [(ok, pk, ln, d, rf, q) for ok, pk, ln, d, rf, q in rows],
           "l_orderkey bigint, l_partkey bigint, l_linenumber int,"
           " l_shipdate string, l_returnflag string, l_quantity double")
    got = {
        r["l_partkey"]: (
            r["demand_qty"], r["supply_qty"], r["n_lots_used"],
            r["qty_covered"], r["qty_unfilled"],
        )
        for r in q_fifo_cover(spark, str(tmp_path)).collect()
    }
    assert got == {1: (7, 15, 2, 7, 0), 2: (20, 10, 1, 10, 10)}, got


def test_activity_bitmap_sets_bits_by_days_before_anchor(spark, tmp_path):
    """Anchor = 2024-01-10 (max). User 1 active on the anchor day and 2
    days before → mask 0b101 = 5; user 2 only 9 days before → 512.
    Duplicate same-day events set the bit once."""
    from etl_pipeline_example_spark.plans.bitmapdow import q_activity_bitmap

    _write(spark, tmp_path, "events",
           [(1, "2024-01-10 05:00:00", 1),
            (2, "2024-01-10 09:00:00", 1),
            (3, "2024-01-08 12:00:00", 1),
            (4, "2024-01-01 01:00:00", 2)],
           "event_id bigint, ts string, user_id bigint")
    got = {
        r["user_id"]: (r["day_mask"], r["n_active_days"])
        for r in q_activity_bitmap(spark, str(tmp_path)).collect()
    }
    assert got == {1: (5, 2), 2: (512, 1)}, got


def test_functional_dep_counts_minimum_change_violations(spark, tmp_path):
    """custkey 1 → priorities [A, A, B]: plurality A, 1 violation;
    custkey 2 → [C]: clean. The other audited tables are planted
    dependency-clean, so their rows read 0."""
    from etl_pipeline_example_spark.plans.funcdep import dq_functional_dep

    _write(spark, tmp_path, "orders",
           [(1, 1, "A"), (2, 1, "A"), (3, 1, "B"), (4, 2, "C")],
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string")
    _write(spark, tmp_path, "lineitem",
           [(1, 1, 1, 7), (1, 2, 1, 7)],
           "l_orderkey bigint, l_linenumber int, l_partkey bigint,"
           " l_suppkey bigint")
    _write(spark, tmp_path, "events", [(1, 1, "click")],
           "event_id bigint, user_id bigint, event_type string")
    got = {
        r["dependency"]: (r["n_keys"], r["n_rows"], r["n_violations"])
        for r in dq_functional_dep(spark, str(tmp_path)).collect()
    }
    assert got["orders: custkey->priority"] == (2, 4, 1), got
    assert got["lineitem: partkey->suppkey"] == (1, 2, 0), got
    # (1,1)->partkey and (1,2)->partkey both single rows: clean
    assert got["lineitem: (orderkey,lineno)->partkey"] == (2, 2, 0), got
    assert got["events: user->event_type"] == (1, 1, 0), got


def test_hash_features_count_tokens_per_bucket(spark, tmp_path):
    """'a a b' → bucket(h(a)) carries 2, bucket(h(b)) carries 1; totals
    conserve the token count; same token always lands in one bucket."""
    from etl_pipeline_example_spark.operators.hashfeat import (
        tok_hash_features,
    )

    _write(spark, tmp_path, "documents",
           [(1, "a a b"), (2, "b-b, c!")],
           "doc_id bigint, text string")
    rows = tok_hash_features(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["bucket"], r["n"]))
    assert sorted(n for _, n in by_doc[1]) == [1, 2]
    # doc 2 tokenizes to [b, b, c]: b's bucket (2) + c's bucket (1)
    assert sorted(n for _, n in by_doc[2]) == [1, 2]
    # 'b' hashes identically in both docs
    b1 = {b for b, n in by_doc[1] if n == 1}
    b2 = {b for b, n in by_doc[2] if n == 2}
    assert b1 == b2
