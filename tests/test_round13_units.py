"""Hand-verifiable unit tests for the round-13 additions.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones, against planted inputs computed by
hand."""

from __future__ import annotations

import os


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def _docs(spark, tmp_path, docs):
    _write(
        spark,
        tmp_path,
        "documents",
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )


def test_dataset_card_diff_hand_computed(spark, tmp_path):
    """v1 = doc_ids {1..7, 10..17} minus ids with id%10>=8; the ingest
    batch adds ids 8, 9, 18 — growing docs 15→18, adding the zh lang
    and a duplicate, so every delta is checkable by hand."""
    from etl_pipeline_example_spark.operators.carddiff import (
        dataset_card_diff,
    )

    # ids 1..7 and 10..17 have id % 10 < 8 (version 1, 15 docs);
    # ids 8, 9, 18 are the ingest batch (version 2 adds them)
    docs = [(i, f"w{i} x", "en", "A") for i in [1, 2, 3, 4, 5, 6, 7]]
    docs += [(i, f"w{i} x y", "en", "B") for i in range(10, 18)]
    docs += [
        (8, "w1 x", "en", "A"),   # exact dup of doc 1's text
        (9, "", "zh", "A"),       # empty + non-en
        (18, "w18 x y z", "en", "B"),
    ]
    _docs(spark, tmp_path, docs)
    got = {
        r["metric"]: (r["v_old"], r["v_new"], r["delta"])
        for r in dataset_card_diff(spark, str(tmp_path)).collect()
    }
    assert got["n_docs"] == (15.0, 18.0, 3.0), got["n_docs"]
    assert got["n_langs"] == (1.0, 2.0, 1.0), got["n_langs"]
    # v1 tokens: 7 docs x 2 + 8 docs x 3 = 38; batch adds 2 + 0 + 4
    assert got["n_tokens"] == (38.0, 44.0, 6.0), got["n_tokens"]
    assert got["exact_dup_rate"][0] == 0.0
    assert got["exact_dup_rate"][1] == 1.0 / 18.0
    # top source: B has 8/15 then 9/18
    assert got["top_source_share"] == (
        8.0 / 15.0,
        0.5,
        0.5 - 8.0 / 15.0,
    ), got["top_source_share"]
    assert got["non_en_share"] == (0.0, 1.0 / 18.0, 1.0 / 18.0)
    assert got["empty_doc_share"] == (0.0, 1.0 / 18.0, 1.0 / 18.0)


def test_dataset_card_diff_versions_are_real_commits(spark, tmp_path):
    """The fixture table is a genuine 2-version versioned table: v1
    must hold exactly the old corpus, v2 the full corpus, and the
    upsert commit must NOT rewrite v1's history."""
    from etl_pipeline_example_spark.operators.carddiff import (
        ensure_versioned_corpus,
    )
    from etl_pipeline_example_spark.pipeline.versioned import (
        read_versioned,
    )

    docs = [(i, f"t{i}", "en", "S") for i in range(1, 21)]
    _docs(spark, tmp_path, docs)
    path = ensure_versioned_corpus(spark, str(tmp_path))
    v1_ids = sorted(
        r["doc_id"] for r in read_versioned(spark, path, version=1).collect()
    )
    v2_ids = sorted(
        r["doc_id"] for r in read_versioned(spark, path, version=2).collect()
    )
    assert v1_ids == [i for i in range(1, 21) if i % 10 < 8]
    assert v2_ids == list(range(1, 21))
    # build is cached: a second call must not write a third version
    assert ensure_versioned_corpus(spark, str(tmp_path)) == path
    assert sorted(
        d
        for d in os.listdir(os.path.join(path, "_manifests"))
        if not d.startswith(".")  # Hadoop .crc sidecars
    ) == ["v=000001.json", "v=000002.json"]


def _events(spark, tmp_path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value)."""
    from datetime import datetime

    _write(
        spark,
        tmp_path,
        "events",
        [
            (i, datetime.fromisoformat(ts), u, et, v, "{}")
            for i, ts, u, et, v in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )


def test_cumulative_distinct_hand_computed(spark, tmp_path):
    """u1 active d1+d2, u2 active d2, u3 active d3 → cumulative
    distinct 1, 2, 3 with new-user counts 1, 1, 1."""
    from etl_pipeline_example_spark.plans.cumdistinct import (
        q_cumulative_distinct,
    )

    _events(spark, tmp_path, [
        (1, "2024-01-01T08:00:00", 1, "view", 1.0),
        (2, "2024-01-01T09:00:00", 1, "view", 1.0),  # same day, no-op
        (3, "2024-01-02T08:00:00", 1, "view", 1.0),
        (4, "2024-01-02T08:30:00", 2, "view", 1.0),
        (5, "2024-01-03T08:00:00", 3, "view", 1.0),
    ])
    got = [
        (str(r["d"]), r["n_active"], r["n_new"], r["cum_users"])
        for r in q_cumulative_distinct(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2024-01-01", 1, 1, 1),
        ("2024-01-02", 2, 1, 2),
        ("2024-01-03", 1, 1, 3),
    ], got


def test_stickiness_hand_computed(spark, tmp_path):
    """One ISO week (2024-01-01 is a Monday): u1 active Mon+Tue, u2
    Tue only → dau_sum 3 over 2 observed days, wau 2 → 3/(2·2)."""
    from etl_pipeline_example_spark.plans.stickiness import q_stickiness

    _events(spark, tmp_path, [
        (1, "2024-01-01T08:00:00", 1, "view", 1.0),
        (2, "2024-01-02T08:00:00", 1, "view", 1.0),
        (3, "2024-01-02T09:00:00", 2, "view", 1.0),
    ])
    got = [
        (str(r["week"]), r["n_days"], r["dau_sum"], r["wau"], r["stickiness"])
        for r in q_stickiness(spark, str(tmp_path)).collect()
    ]
    assert got == [("2024-01-01", 2, 3, 2, 0.75)], got


def test_event_runs_hand_computed(spark, tmp_path):
    """u1's timeline A A B A → runs A×2, B×1, A×1; u2's B B → one
    run of 2. Histogram pins every boundary."""
    from etl_pipeline_example_spark.plans.runs import q_event_runs

    _events(spark, tmp_path, [
        (1, "2024-01-01T08:00:00", 1, "A", 1.0),
        (2, "2024-01-01T08:01:00", 1, "A", 1.0),
        (3, "2024-01-01T08:02:00", 1, "B", 1.0),
        (4, "2024-01-01T08:03:00", 1, "A", 1.0),
        (5, "2024-01-01T08:00:00", 2, "B", 1.0),
        (6, "2024-01-01T08:01:00", 2, "B", 1.0),
    ])
    got = [
        (r["event_type"], r["run_len"], r["n_runs"])
        for r in q_event_runs(spark, str(tmp_path)).collect()
    ]
    assert got == [("A", 1, 1), ("A", 2, 1), ("B", 1, 1), ("B", 2, 1)], got


def test_proration_hand_computed(spark, tmp_path):
    """3×$1.00 order: base 3333 each, one remainder point → line 1
    gets 3334 (checksum 19999). 2-item $1/$3 order splits 2500/7500
    exactly (checksum 17500). Every total lands on 10000."""
    from etl_pipeline_example_spark.plans.proration import q_proration

    _write(spark, tmp_path, "lineitem", [
        (1, 1, 1.00), (1, 2, 1.00), (1, 3, 1.00),
        (2, 1, 1.00), (2, 2, 3.00),
    ], "l_orderkey bigint, l_linenumber int, l_extendedprice double")
    got = [
        (r["n_items"], r["n_orders"], r["total_bps"], r["bps_min"],
         r["bps_max"], r["checksum"])
        for r in q_proration(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (2, 1, 10000, 2500, 7500, 17500),
        (3, 1, 10000, 3333, 3334, 19999),
    ], got


def test_drift_tvd_disjoint_halves(spark, tmp_path):
    """Old era prices all in bucket 0, new era all in bucket 19 →
    total variation distance exactly 1.0."""
    from datetime import datetime

    from etl_pipeline_example_spark.plans.tvd import dq_drift_tvd

    _write(spark, tmp_path, "orders", [
        (1, datetime(2020, 1, 1), 1.00), (2, datetime(2020, 1, 2), 1.00),
        (3, datetime(2020, 1, 11), 2.00), (4, datetime(2020, 1, 10), 2.00),
    ], "o_orderkey bigint, o_orderdate timestamp, o_totalprice double")
    rows = dq_drift_tvd(spark, str(tmp_path)).collect()
    got = [(r["bucket"], r["n_old"], r["n_new"], int(r["contrib"])) for r in rows]
    assert got == [(0, 2, 0, 4), (19, 0, 2, 4)], got
    assert all(r["tvd"] == 1.0 for r in rows), rows


def test_assortativity_path_graph(spark, tmp_path):
    """Path 1–2–3 (two co-order baskets): every edge joins a
    degree-1 leaf to the degree-2 center → perfectly disassortative,
    r = −1."""
    from etl_pipeline_example_spark.plans.assort import graph_assortativity

    _write(spark, tmp_path, "lineitem", [
        (1, 1), (1, 2), (2, 2), (2, 3),
    ], "l_orderkey bigint, l_partkey bigint")
    r = graph_assortativity(spark, str(tmp_path)).collect()[0]
    assert r["n_directed"] == 4
    assert (int(r["sum_x"]), int(r["sum_xy"]), int(r["sum_x2"])) == (6, 8, 10)
    assert r["assortativity"] == -1.0, r


def test_basket_lift_hand_computed(spark, tmp_path):
    """Baskets {1,2},{1,2},{1,3}: pair (1,2) appears twice → lift
    2·3/(3·2)=1.0; pair (1,3) is below the support floor."""
    from etl_pipeline_example_spark.plans.basketlift import q_basket_lift

    _write(spark, tmp_path, "lineitem", [
        (1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 3),
    ], "l_orderkey bigint, l_partkey bigint")
    got = [
        (r["part_a"], r["part_b"], r["n_a"], r["n_b"], r["n_ab"], r["lift"])
        for r in q_basket_lift(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 2, 3, 2, 2, 1.0)], got


def test_quality_gopher_hand_computed(spark, tmp_path):
    """docA: 60 words incl. 'the'+'of' (mean len 237/60) → passes all
    four rules; docB: 3 one-letter words → fails word count, mean
    word length, and stop-word presence (alpha still passes)."""
    from etl_pipeline_example_spark.operators.gopher import quality_gopher

    doc_a = "the of " + " ".join(["word"] * 58)
    doc_b = "a b c"
    _docs(spark, tmp_path, [
        (1, doc_a, "en", "X"),
        (2, doc_b, "en", "X"),
    ])
    got = [
        (r["source"], r["n_docs"], r["fail_wordcount"], r["fail_wordlen"],
         r["fail_alpha"], r["fail_stop"], r["n_pass"])
        for r in quality_gopher(spark, str(tmp_path)).collect()
    ]
    assert got == [("X", 2, 1, 1, 0, 1, 1)], got


def test_mix_curriculum_interleaves_deciles(spark, tmp_path):
    """20 docs with n_chars 1..20 → two docs per decile; the
    round-robin positions are exactly 1..20 with decile 10 leading
    each cycle."""
    from etl_pipeline_example_spark.operators.curriculum import (
        mix_curriculum,
    )

    _docs(spark, tmp_path, [
        (i, "x" * i, "en", "A") for i in range(1, 21)
    ])
    rows = mix_curriculum(spark, str(tmp_path)).collect()
    assert sorted(r["global_pos"] for r in rows) == list(range(1, 21))
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r["decile"], []).append(r["n_chars"])
    assert all(len(v) == 2 for v in by_decile.values()), by_decile
    # decile i holds n_chars {2i-1, 2i}; position 1 is a decile-10 doc
    assert sorted(by_decile[10]) == [19, 20]
    first = next(r for r in rows if r["global_pos"] == 1)
    assert first["decile"] == 10


def test_vocab_rank_shift_reversed_preference(spark, tmp_path):
    """Source A's ranking matches the global order (ρ=1); source B
    prefers y over x while the global (tie broken by term) ranks x
    first → perfect reversal over 2 items, ρ=−1."""
    from etl_pipeline_example_spark.operators.rankshift import (
        vocab_rank_shift,
    )

    _docs(spark, tmp_path, [
        (1, "x x y", "en", "A"),
        (2, "y y x", "en", "B"),
    ])
    got = {
        r["source"]: (r["n_common"], r["sum_d2"], r["rho"])
        for r in vocab_rank_shift(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (2, 0, 1.0), got
    assert got["B"] == (2, 2, -1.0), got


def test_embed_sign_sketch_collisions(spark, tmp_path):
    """Two all-positive vectors share sketch 4095; one vector with a
    negative first dim sits alone in 4094 → 2 buckets, 2 collided."""
    from etl_pipeline_example_spark.operators.signsketch import (
        embed_sign_sketch,
    )

    pos = [1.0] * 16
    neg = [-1.0] + [1.0] * 15
    _write(spark, tmp_path, "embeddings", [
        (0, pos, 7), (1, pos, 7), (2, neg, 7),
    ], "vec_id bigint, embedding array<float>, label int")
    got = [
        (r["label"], r["n_vecs"], r["n_buckets"], r["max_bucket"],
         r["n_collided"])
        for r in embed_sign_sketch(spark, str(tmp_path)).collect()
    ]
    assert got == [(7, 3, 2, 2, 2)], got


def test_ann_multiprobe_finds_exact_duplicate(spark, tmp_path):
    """vec 5 duplicates query 0 exactly → identical buckets in every
    table, so multiprobe must return it at rank 1 with cosine 1.0."""
    import random

    from etl_pipeline_example_spark.operators.multiprobe import (
        ann_multiprobe,
    )

    rng = random.Random(13)
    vecs = [
        [rng.uniform(-1, 1) for _ in range(64)] for _ in range(12)
    ]
    vecs[5] = list(vecs[0])
    _write(spark, tmp_path, "embeddings", [
        (i, v, 0) for i, v in enumerate(vecs)
    ], "vec_id bigint, embedding array<float>, label int")
    rows = ann_multiprobe(spark, str(tmp_path)).collect()
    top0 = next(
        r for r in rows if r["query_id"] == 0 and r["rank"] == 1
    )
    assert top0["neighbor_id"] == 5 and top0["cosine"] == 1.0, top0


def test_top_movers_hand_computed(spark, tmp_path):
    """Brand A: Jan 100 → Feb 150 (delta +50); brand B: Jan 10 →
    Feb 5 (delta −5). A's swing ranks first; first observed months
    emit no row."""
    from datetime import datetime

    from etl_pipeline_example_spark.plans.movers import q_top_movers

    _write(spark, tmp_path, "part", [(1, "A"), (2, "B")],
           "p_partkey bigint, p_brand string")
    _write(spark, tmp_path, "orders", [
        (10, datetime(2024, 1, 5)), (11, datetime(2024, 2, 5)),
    ], "o_orderkey bigint, o_orderdate timestamp")
    _write(spark, tmp_path, "lineitem", [
        (10, 1, 100.0, 0.0), (11, 1, 150.0, 0.0),
        (10, 2, 10.0, 0.0), (11, 2, 5.0, 0.0),
    ], "l_orderkey bigint, l_partkey bigint, l_extendedprice double,"
       " l_discount double")
    got = [
        (r["p_brand"], str(r["month"]), r["rev"], r["prev_rev"], r["delta"])
        for r in q_top_movers(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("A", "2024-02-01", 150.0, 100.0, 50.0),
        ("B", "2024-02-01", 5.0, 10.0, -5.0),
    ], got


def test_key_collision_hand_computed(spark, tmp_path):
    """part.p_name: 'Big Ring' and 'big ring' collapse to one
    normalized key (1 colliding group, 2 trapped rows); every other
    audited column is collision-free."""
    from etl_pipeline_example_spark.plans.keycollision import (
        dq_key_collision,
    )

    _write(spark, tmp_path, "part",
           [(1, "Big Ring", "t"), (2, "big ring", "t"), (3, "bolt", "t")],
           "p_partkey bigint, p_name string, p_type string")
    _write(spark, tmp_path, "customer", [(1, "Customer#1"), (2, "Customer#2")],
           "c_custkey bigint, c_name string")
    _write(spark, tmp_path, "supplier", [(1, "S1")],
           "s_suppkey bigint, s_name string")
    got = {
        r["table_col"]: (r["n_rows"], r["n_raw"], r["n_norm"],
                         r["n_collide_groups"], r["n_collide_rows"])
        for r in dq_key_collision(spark, str(tmp_path)).collect()
    }
    assert got["part.p_name"] == (3, 3, 2, 1, 2), got
    assert got["part.p_type"] == (3, 1, 1, 0, 0), got
    assert got["customer.c_name"] == (2, 2, 2, 0, 0), got
    assert got["supplier.s_name"] == (1, 1, 1, 0, 0), got


def test_ivf_balance_invariants(spark, tmp_path):
    """Occupancies sum to N, imbalance shares sum to K (each cell's
    share of the uniform ideal), distances are non-negative."""
    import random

    from etl_pipeline_example_spark.operators.ivfbalance import (
        ann_ivf_balance,
    )
    from etl_pipeline_example_spark.operators.kmeans import KMEANS_K

    rng = random.Random(7)
    _write(spark, tmp_path, "embeddings", [
        (i, [rng.uniform(-1, 1) for _ in range(8)], 0) for i in range(40)
    ], "vec_id bigint, embedding array<float>, label int")
    rows = ann_ivf_balance(spark, str(tmp_path)).collect()
    assert sum(r["n_vecs"] for r in rows) == 40
    assert abs(sum(r["imbalance"] for r in rows) - KMEANS_K) < 1e-9
    assert all(r["mean_dist"] >= 0 for r in rows)
    assert len(rows) <= KMEANS_K


def test_clustering_coeff_triangle_plus_tail(spark, tmp_path):
    """Triangle 1-2-3 plus pendant 4 on vertex 3: T=1, degrees
    (1,2)→2, 3→3, 4→1 → wedges = 1+1+3+0 = 5, C = 3/5."""
    from etl_pipeline_example_spark.plans.clustercoeff import (
        graph_clustering_coeff,
    )

    # baskets: {1,2},{2,3},{1,3} form the triangle; {3,4} the tail
    _write(spark, tmp_path, "lineitem", [
        (1, 1), (1, 2), (2, 2), (2, 3), (3, 1), (3, 3), (4, 3), (4, 4),
    ], "l_orderkey bigint, l_partkey bigint")
    r = graph_clustering_coeff(spark, str(tmp_path)).collect()[0]
    assert (r["n_vertices"], r["n_edges"], r["n_triangles"]) == (4, 4, 1)
    assert r["n_wedges"] == 5.0
    assert r["global_cc"] == 0.6, r


def test_bounce_rate_hand_computed(spark, tmp_path):
    """u1: two events 10 min apart → one 2-event session (no bounce);
    u2: one event → bounce; u3: two events 40 min apart → two
    1-event sessions (2 bounces). Day total: 4 sessions, 3 bounces."""
    from etl_pipeline_example_spark.plans.bounce import q_bounce_rate

    _events(spark, tmp_path, [
        (1, "2024-01-01T08:00:00", 1, "view", 1.0),
        (2, "2024-01-01T08:10:00", 1, "view", 1.0),
        (3, "2024-01-01T09:00:00", 2, "view", 1.0),
        (4, "2024-01-01T10:00:00", 3, "view", 1.0),
        (5, "2024-01-01T10:40:00", 3, "view", 1.0),
    ])
    got = [
        (str(r["day"]), r["n_sessions"], r["n_bounces"], r["bounce_rate"])
        for r in q_bounce_rate(spark, str(tmp_path)).collect()
    ]
    assert got == [("2024-01-01", 4, 3, 0.75)], got


def test_audience_overlap_hand_computed(spark, tmp_path):
    """users(A) = {1,2,3}, users(B) = {2,3}, users(C) = {3}:
    A∩B = 2 → J = 2/3; A∩C = 1 → J = 1/3; B∩C = 1 → J = 1/2."""
    from etl_pipeline_example_spark.plans.audience import (
        q_audience_overlap,
    )

    _events(spark, tmp_path, [
        (1, "2024-01-01T08:00:00", 1, "A", 1.0),
        (2, "2024-01-01T08:01:00", 2, "A", 1.0),
        (3, "2024-01-01T08:02:00", 3, "A", 1.0),
        (4, "2024-01-01T08:03:00", 2, "B", 1.0),
        (5, "2024-01-01T08:04:00", 3, "B", 1.0),
        (6, "2024-01-01T08:05:00", 3, "C", 1.0),
        (7, "2024-01-01T08:06:00", 3, "C", 1.0),  # dup: lattice dedups
    ])
    got = [
        (r["type_a"], r["type_b"], r["n_a"], r["n_b"], r["n_both"],
         r["jaccard"])
        for r in q_audience_overlap(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("A", "B", 3, 2, 2, 2.0 / 3.0),
        ("A", "C", 3, 1, 1, 1.0 / 3.0),
        ("B", "C", 2, 1, 1, 0.5),
    ], got


def test_ivm_rollup_hand_computed(spark, tmp_path):
    """Base statuses (keys ∤3): k1 'O', k2 'O', k4 'F'. Log: k1→'A'
    (update: O−1, A+1), k2 delete (O−1), k5 insert 'A' (A+1), k4
    delete-of-R... plant ops precisely: expect O: 2→0, F: 1→1,
    A: 0→2 — the incremental deltas must land the recompute state."""
    from etl_pipeline_example_spark.plans.ivm import cdc_ivm_rollup

    # BASE_PRED keeps o_orderkey % 3 != 0 → keys 1, 2, 4 stay
    _write(spark, tmp_path, "orders", [
        (1, "O", "p"), (2, "O", "p"), (3, "F", "p"), (4, "F", "p"),
    ], "o_orderkey bigint, o_orderstatus string, o_orderpriority string")
    # OP_EXPR: returnflag 'R' → delete, else update to l_linestatus
    _write(spark, tmp_path, "lineitem", [
        (1, 1, "N", "A"),   # update k1 → A
        (2, 1, "R", "X"),   # delete k2
        (5, 1, "N", "A"),   # insert k5 as A
    ], "l_orderkey bigint, l_linenumber int, l_returnflag string,"
       " l_linestatus string")
    got = [
        (r["status"], r["n_base"], r["delta"], r["n_new"])
        for r in cdc_ivm_rollup(spark, str(tmp_path)).collect()
    ]
    assert got == [("A", 0, 2, 2), ("F", 1, 0, 1), ("O", 2, -2, 0)], got


def test_session_depth_hist_hand_computed(spark, tmp_path):
    """Sessions of depth 2, 1, 1, 1 (same fixture logic as the bounce
    test) → hist: depth 1 ×3 (share 0.75), depth 2 ×1 (share 0.25)."""
    from etl_pipeline_example_spark.plans.sessiondepth import (
        q_session_depth_hist,
    )

    _events(spark, tmp_path, [
        (1, "2024-01-01T08:00:00", 1, "view", 1.0),
        (2, "2024-01-01T08:10:00", 1, "view", 1.0),
        (3, "2024-01-01T09:00:00", 2, "view", 1.0),
        (4, "2024-01-01T10:00:00", 3, "view", 1.0),
        (5, "2024-01-01T10:40:00", 3, "view", 1.0),
    ])
    got = [
        (r["depth"], r["n_sessions"], r["share"])
        for r in q_session_depth_hist(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 3, 0.75), (2, 1, 0.25)], got


def test_cosine_hist_duplicate_lands_in_top_bin(spark, tmp_path):
    """vec 1 duplicates vec 0 → their candidate pair scores cosine
    1.0, which must land in the top bin (19); total pair mass equals
    the histogram mass."""
    import random

    from etl_pipeline_example_spark.operators.cosinehist import (
        embed_cosine_hist,
    )

    rng = random.Random(99)
    vecs = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(10)]
    vecs[1] = list(vecs[0])
    _write(spark, tmp_path, "embeddings", [
        (i, v, 0) for i, v in enumerate(vecs)
    ], "vec_id bigint, embedding array<float>, label int")
    rows = embed_cosine_hist(spark, str(tmp_path)).collect()
    by_bin = {r["bin"]: r["n_pairs"] for r in rows}
    assert by_bin.get(19, 0) >= 1, by_bin
    assert all(r["lo"] == -1.0 + r["bin"] / 10.0 for r in rows)


def test_null_census_counts_planted_nulls(spark, tmp_path):
    """Every testdata table gets a 1-row fixture; documents carries a
    planted NULL lang and events a NULL props — the census must count
    exactly those."""
    from datetime import datetime

    from etl_pipeline_example_spark.plans.nullcensus import dq_null_census

    _write(spark, tmp_path, "region", [(0, "r")],
           "r_regionkey bigint, r_name string")
    _write(spark, tmp_path, "nation", [(0, "n", 0)],
           "n_nationkey bigint, n_name string, n_regionkey bigint")
    _write(spark, tmp_path, "customer", [(1, "c", 0, 1.0, "SEG")],
           "c_custkey bigint, c_name string, c_nationkey bigint,"
           " c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "supplier", [(1, "s", 0, 1.0)],
           "s_suppkey bigint, s_name string, s_nationkey bigint,"
           " s_acctbal double")
    _write(spark, tmp_path, "part", [(1, "p", "b", "t", 1, 1.0)],
           "p_partkey bigint, p_name string, p_brand string,"
           " p_type string, p_size int, p_retailprice double")
    _write(spark, tmp_path, "orders",
           [(1, 1, "O", 1.0, datetime(2024, 1, 1), "1-URGENT")],
           "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
           " o_totalprice double, o_orderdate timestamp,"
           " o_orderpriority string")
    _write(spark, tmp_path, "lineitem",
           [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O",
             datetime(2024, 1, 2))],
           "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
           " l_linenumber int, l_quantity double, l_extendedprice double,"
           " l_discount double, l_tax double, l_returnflag string,"
           " l_linestatus string, l_shipdate timestamp")
    _write(spark, tmp_path, "events",
           [(1, datetime(2024, 1, 1), 1, "view", 1.0, None)],
           "event_id bigint, ts timestamp, user_id bigint,"
           " event_type string, value double, props string")
    _write(spark, tmp_path, "documents", [(1, "t", None, "s", 1)],
           "doc_id bigint, text string, lang string, source string,"
           " n_chars bigint")
    _write(spark, tmp_path, "embeddings", [(0, [1.0], 0)],
           "vec_id bigint, embedding array<float>, label int")
    got = {
        r["table_col"]: (r["n_rows"], r["n_null"])
        for r in dq_null_census(spark, str(tmp_path)).collect()
    }
    assert len(got) == 51  # 2+3+5+4+6+6+11+6+5+3 columns
    assert got["documents.lang"] == (1, 1), got["documents.lang"]
    assert got["events.props"] == (1, 1), got["events.props"]
    assert sum(n for _, n in got.values()) == 2
