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


def test_knn_join_ranks_planted_neighbors_first(spark, tmp_path):
    """Two tight pairs in orthogonal directions: each vector's rank-1
    neighbor is its planted twin (near-identical vectors share every
    LSH bucket, so the pair is always a candidate); the anti-parallel
    vector of v1 shares no bucket and never appears in v1's list."""
    from etl_pipeline_example_spark.operators.knnjoin import ann_knn_join

    def vec(axis, eps_axis=None):
        v = [0.0] * 64
        v[axis] = 1.0
        if eps_axis is not None:
            v[eps_axis] = 0.05
        return v

    rows = [
        (1, vec(0)),
        (2, vec(0, eps_axis=1)),   # twin of 1
        (3, vec(7)),
        (4, vec(7, eps_axis=8)),   # twin of 3
        (5, [-x for x in vec(0)]),  # anti-parallel to 1
    ]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>")
    got = ann_knn_join(spark, str(tmp_path)).collect()
    top1 = {r["vec_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1[1] == 2 and top1[2] == 1, top1
    assert top1[3] == 4 and top1[4] == 3, top1
    assert all(
        r["neighbor_id"] != 5 for r in got if r["vec_id"] == 1
    ), [r for r in got if r["vec_id"] == 1]


def test_events_ohlc_picks_deterministic_open_close(spark, tmp_path):
    """Same-day events with a same-timestamp tie: open/close resolve by
    (ts, event_id), high/low are comparisons, count integer."""
    from etl_pipeline_example_spark.plans.ohlc import q_events_ohlc

    _write(spark, tmp_path, "events",
           [(1, "2024-01-01 00:00:00", "click", 5.0),
            (2, "2024-01-01 00:00:00", "click", 7.0),   # ts tie: id wins
            (3, "2024-01-01 12:00:00", "click", 1.0),
            (4, "2024-01-01 23:00:00", "click", 3.0),
            (5, "2024-01-02 01:00:00", "click", 9.0)],
           "event_id bigint, ts string, event_type string, value double")
    got = {
        str(r["day"]): (r["n_events"], r["open"], r["high"], r["low"],
                        r["close"])
        for r in q_events_ohlc(spark, str(tmp_path)).collect()
    }
    assert got["2024-01-01"] == (4, 5.0, 7.0, 1.0, 3.0), got
    assert got["2024-01-02"] == (1, 9.0, 9.0, 9.0, 9.0), got


def test_audio_zcr_matches_planted_formula(spark, tmp_path):
    """ZCR recomputed in plain numpy from the planted-sample formula —
    per segment, per document — must equal the decode-path output."""
    import numpy as np

    from etl_pipeline_example_spark.operators.audiofeat import SEGS
    from etl_pipeline_example_spark.operators.audiozcr import (
        multimodal_audio_zcr,
    )
    from etl_pipeline_example_spark.operators.mediapixels import (
        planted_samples,
    )

    doc_ids = [1, 3, 7, 12]  # 12 is an image doc: must not appear
    _write(spark, tmp_path, "documents", [(d,) for d in doc_ids],
           "doc_id bigint")
    got = {
        (r["doc_id"], r["seg"]): (r["n_pairs"], r["n_crossings"])
        for r in multimodal_audio_zcr(spark, str(tmp_path)).collect()
    }
    assert not any(d == 12 for d, _ in got)
    for d in (1, 3, 7):
        smp = planted_samples(d)
        n = smp.shape[0]
        cuts = [(k * n) // SEGS for k in range(SEGS + 1)]
        neg = smp < 0
        cross = neg[:-1, :] != neg[1:, :]
        for seg in range(SEGS):
            lo, hi = cuts[seg], min(cuts[seg + 1], n - 1)
            block = cross[lo:hi, :]
            assert got[(d, seg)] == (int(block.size), int(block.sum()))


def test_bollinger_breach_brackets_a_planted_spike(spark, tmp_path):
    """Customer with 6 steady 100.00 orders then a 500.00 spike: the
    spike breaches the upper band; the steady rows breach nothing; a
    1-order customer (no variance information) reports no breach."""
    from etl_pipeline_example_spark.plans.bollinger import (
        q_bollinger_breach,
    )

    rows = [(k, 1, f"2024-01-{k:02d}", 100.0) for k in range(1, 7)]
    rows.append((7, 1, "2024-01-07", 500.0))
    rows.append((8, 2, "2024-01-01", 42.0))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderdate string,"
           " o_totalprice double")
    got = {
        r["o_orderkey"]: (r["n_window"], r["breach_hi"], r["breach_lo"],
                          r["dev_n"], r["disc_floor"])
        for r in q_bollinger_breach(spark, str(tmp_path)).collect()
    }
    assert got[7][1] is True and got[7][2] is False, got[7]
    for k in range(1, 7):
        assert got[k][1] is False and got[k][2] is False, (k, got[k])
    assert got[8] == (1, False, False, 0.0, 0), got[8]
    # hand arithmetic for the spike row: n=7, S=1100, Q=6*10000+250000
    # dev_n = 7*500-1100 = 2400; disc = 7*310000 - 1100^2 = 960000
    assert got[7][3] == 2400.0 and got[7][4] == 960000
    # and the predicate: 2400^2 = 5,760,000 > 4*960,000 = 3,840,000 ✓


def test_fifo_cover_equals_imperative_replay_on_random_data(
    spark, tmp_path
):
    """Fixed-seed random lots/returns across 40 parts: the declarative
    cumsum-clamp allocation must equal a plain Python FIFO walk."""
    import random

    rng = random.Random(12012)
    rows, expect = [], {}
    ok = 0
    for pk in range(1, 41):
        lots = [(rng.randint(1, 20)) for _ in range(rng.randint(0, 6))]
        demand = rng.randint(0, 40)
        for i, qty in enumerate(lots):
            ok += 1
            rows.append((ok, pk, 1, f"2024-01-{i + 1:02d}", "N", float(qty)))
        if demand:
            ok += 1
            rows.append((ok, pk, 1, "2024-02-01", "R", float(demand)))
        # imperative FIFO walk
        left, used, covered = demand, 0, 0
        for qty in lots:
            take = min(qty, max(left, 0))
            if take > 0:
                used += 1
                covered += take
                left -= take
        if demand and lots:
            expect[pk] = (
                demand, sum(lots), used, covered,
                max(demand - sum(lots), 0),
            )
    from etl_pipeline_example_spark.plans.fifo import q_fifo_cover

    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint, l_linenumber int,"
           " l_shipdate string, l_returnflag string, l_quantity double")
    got = {
        r["l_partkey"]: (r["demand_qty"], r["supply_qty"],
                         r["n_lots_used"], r["qty_covered"],
                         r["qty_unfilled"])
        for r in q_fifo_cover(spark, str(tmp_path)).collect()
    }
    assert got == expect, (got, expect)


def test_common_neighbors_predicts_absent_links_only(spark, tmp_path):
    """Path 1—2—3 predicts exactly the missing chord (1,3); a 3-leaf
    star predicts all leaf pairs with deterministic tie-ranking; the
    existing edges themselves never appear."""
    from etl_pipeline_example_spark.plans.linkpred import (
        graph_common_neighbors,
    )

    _li(spark, tmp_path, [
        [1, 2], [1, 2], [2, 3], [2, 3],
        [10, 11], [10, 11], [10, 12], [10, 12], [10, 13], [10, 13],
    ])
    got = sorted(
        (r["u"], r["v"], r["n_common"], r["n_union"], r["rnk"])
        for r in graph_common_neighbors(spark, str(tmp_path)).collect()
    )
    assert got == [
        (1, 3, 1, 1, 1),
        (11, 12, 1, 1, 1),
        (11, 13, 1, 1, 2),
        (12, 13, 1, 1, 1),
    ], got


def test_concurrency_peak_counts_overlapping_sessions(spark, tmp_path):
    """Day 1: user A's events at 10:00 and 10:40 split into TWO point
    sessions (the 40-min gap exceeds the 30-min inactivity bound);
    B spans 10:20-10:50 (a 30-min gap does NOT split); C is a point
    session at 11:30 → 4 sessions, and the peak is 2 (A's 10:40 point
    falls inside B's span; sessions are CLOSED intervals, so a point
    session is live at its instant — a lone-session day must read
    peak 1, never 0). Day 2: one single-event session → peak 1."""
    from etl_pipeline_example_spark.plans.concurrency import (
        q_concurrency_peak,
    )

    spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1),
         (2, "2024-01-01 10:40:00", 1),
         (3, "2024-01-01 10:20:00", 2),
         (4, "2024-01-01 10:50:00", 2),
         (5, "2024-01-01 11:30:00", 3),
         (6, "2024-01-02 09:00:00", 1)],
        "event_id bigint, ts string, user_id bigint",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        str(r["day"]): (r["n_sessions"], r["peak_concurrent"])
        for r in q_concurrency_peak(spark, str(tmp_path)).collect()
    }
    assert got == {"2024-01-01": (4, 2), "2024-01-02": (1, 1)}, got


def test_sequence_gaps_audit_hand_computed(spark, tmp_path):
    """ids [1,2,3, 7, 9,10, 10] → lo 1, hi 10, 7 rows / 6 distinct
    (1 dup), 4 missing (4,5,6,8), 2 gap runs, longest 3. Values placed
    across DIV-4096 chunks would exercise the boundary path; within one
    chunk the inner path must find both runs."""
    from etl_pipeline_example_spark.plans.seqgaps import dq_sequence_gaps

    _write(spark, tmp_path, "orders",
           [(k,) for k in [1, 2, 3, 7, 9, 10, 10]],
           "o_orderkey bigint")
    r = dq_sequence_gaps(spark, str(tmp_path)).collect()[0]
    assert (
        r["lo"], r["hi"], r["n_rows"], r["n_distinct"], r["n_dup_rows"],
        r["n_missing"], r["n_gaps"], r["max_gap_len"],
    ) == (1, 10, 7, 6, 1, 4, 2, 3), r


def test_sequence_gaps_chunk_boundary_and_empty_chunks(spark, tmp_path):
    """ids 4090 and 12300 sit in chunks 0 and 3 (chunks 1-2 empty): the
    boundary path must report ONE gap of length 8209 — empty chunks
    fold into the chunk-level lag arithmetic."""
    from etl_pipeline_example_spark.plans.seqgaps import dq_sequence_gaps

    _write(spark, tmp_path, "orders", [(4090,), (12300,)],
           "o_orderkey bigint")
    r = dq_sequence_gaps(spark, str(tmp_path)).collect()[0]
    assert (r["n_gaps"], r["max_gap_len"], r["n_missing"]) == (
        1, 12300 - 4090 - 1, 12300 - 4090 - 1,
    ), r
