"""Hand-verifiable unit tests for the round-11 additions.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones — and, for the persisted BPE artifact,
that the production apply path is row-identical to the oracle-shaped
in-op-training forms.
"""

from __future__ import annotations


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/{name}.parquet")


def test_dq_referential_counts_planted_orphans(spark, tmp_path):
    """Planted warehouse: lineitem rows with an unknown orderkey and an
    unknown partkey, one order with an unknown custkey — each shows up
    on exactly its edge."""
    from etl_pipeline_example_spark.plans.referential import dq_referential

    _write(spark, tmp_path, "region", [(1,)], "r_regionkey bigint")
    _write(spark, tmp_path, "nation", [(1, 1)],
           "n_nationkey bigint, n_regionkey bigint")
    _write(spark, tmp_path, "customer", [(1, 1), (2, 1)],
           "c_custkey bigint, c_nationkey bigint")
    _write(spark, tmp_path, "supplier", [(1, 1)],
           "s_suppkey bigint, s_nationkey bigint")
    _write(spark, tmp_path, "part", [(1,)], "p_partkey bigint")
    _write(spark, tmp_path, "orders", [(10, 1), (11, 3)],
           "o_orderkey bigint, o_custkey bigint")
    _write(spark, tmp_path, "lineitem",
           [(10, 1, 1), (12, 1, 1), (10, 2, 1)],
           "l_orderkey bigint, l_partkey bigint, l_suppkey bigint")
    got = [
        (r["edge"], r["n_child"], r["n_orphans"])
        for r in dq_referential(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("customer.c_nationkey->nation.n_nationkey", 2, 0),
        ("lineitem.l_orderkey->orders.o_orderkey", 3, 1),
        ("lineitem.l_partkey->part.p_partkey", 3, 1),
        ("lineitem.l_suppkey->supplier.s_suppkey", 3, 0),
        ("nation.n_regionkey->region.r_regionkey", 1, 0),
        ("orders.o_custkey->customer.c_custkey", 2, 1),
    ], got


def test_interval_overlap_counts_window_hits(spark, tmp_path):
    """Order windows are 3 days inclusive: an order on Jan 1 catches
    events on Jan 1-3 only; a priority with no events in any window
    reports 0 through the left join."""
    from etl_pipeline_example_spark.plans.rangejoin import (
        q_interval_event_overlap,
    )

    _write(spark, tmp_path, "orders",
           [(1, "1-URGENT", "2020-01-01"), (2, "2-HIGH", "2020-01-10"),
            (3, "3-MEDIUM", "2020-06-01")],
           "o_orderkey bigint, o_orderpriority string, o_orderdate string")
    spark.read.parquet(f"{tmp_path}/orders.parquet").selectExpr(
        "o_orderkey", "o_orderpriority",
        "cast(o_orderdate as timestamp) o_orderdate"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders2.parquet")
    import shutil

    shutil.rmtree(f"{tmp_path}/orders.parquet")
    shutil.move(f"{tmp_path}/orders2.parquet", f"{tmp_path}/orders.parquet")
    ev = [("2020-01-02", 2), ("2020-01-03", 1), ("2020-01-12", 1),
          ("2020-01-20", 5)]
    rows = []
    eid = 0
    for day, n in ev:
        for _ in range(n):
            eid += 1
            rows.append((eid, f"{day} 12:00:00"))
    _write(spark, tmp_path, "events_raw", rows, "event_id bigint, ts string")
    spark.read.parquet(f"{tmp_path}/events_raw.parquet").selectExpr(
        "event_id", "cast(ts as timestamp) ts"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = [
        (r["priority"], r["n_orders"], r["n_event_hits"],
         r["events_per_order"])
        for r in q_interval_event_overlap(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("1-URGENT", 1, 3, 3.0),
        ("2-HIGH", 1, 1, 1.0),
        ("3-MEDIUM", 1, 0, 0.0),
    ], got


def test_iqr_flags_only_the_planted_spike(spark, tmp_path):
    """Four 10-event days and one 100-event day: Q1=Q3=10 so the fences
    collapse to [10,10] and exactly the spike reads 'high'."""
    from etl_pipeline_example_spark.plans.iqr import events_anomaly_iqr

    rows = []
    eid = 0
    for day, n in [("2020-01-01", 10), ("2020-01-02", 10),
                   ("2020-01-03", 10), ("2020-01-04", 10),
                   ("2020-01-05", 100)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, f"{day} 00:30:00"))
    _write(spark, tmp_path, "events_raw", rows, "event_id bigint, ts string")
    spark.read.parquet(f"{tmp_path}/events_raw.parquet").selectExpr(
        "event_id", "cast(ts as timestamp) ts"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        str(r["day"]): r["status"]
        for r in events_anomaly_iqr(spark, str(tmp_path)).collect()
    }
    assert got == {
        "2020-01-01": "normal", "2020-01-02": "normal",
        "2020-01-03": "normal", "2020-01-04": "normal",
        "2020-01-05": "high",
    }, got


def test_weighted_median_respects_quantity_mass(spark, tmp_path):
    """Supplier 1: a qty-10 line at price 3 outweighs two qty-1 lines
    below it → weighted median 3.0 (the PLAIN median of line prices is
    2.0 — the distinction the operator exists for). Supplier 2: the
    qty-3 line at price 5 already holds half the mass."""
    from etl_pipeline_example_spark.plans.wmedian import q_weighted_median

    rows = [
        (1, 100, 1, 1.0, 1.0), (1, 100, 2, 2.0, 1.0), (1, 101, 1, 3.0, 10.0),
        (2, 102, 1, 5.0, 3.0), (2, 102, 2, 7.0, 1.0),
    ]
    _write(spark, tmp_path, "lineitem",
           [(s, o, ln, p, q) for s, o, ln, p, q in rows],
           "l_suppkey bigint, l_orderkey bigint, l_linenumber int,"
           " l_extendedprice double, l_quantity double")
    got = [
        (r["l_suppkey"], r["total_qty"], r["wmedian_price"])
        for r in q_weighted_median(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 12.0, 3.0), (2, 4.0, 5.0)], got


def test_mix_epochs_waterfills_capped_surplus(spark, tmp_path):
    """Two sources, 100 and 10 tokens; budget = 2×110 = 220, cap = 3
    epochs. Uniform split gives each 110; the small source caps at 30
    and its 80-token surplus waterfalls to the big one: A plans
    110+80=190 (1.9 epochs), B plans 30 (3.0). Σ = budget exactly."""
    from etl_pipeline_example_spark.operators.epochs import mix_epochs

    docs = [
        (1, " ".join(["tok"] * 100), "en", "A"),
        (2, " ".join(["tok"] * 10), "en", "B"),
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = [
        (r["source"], r["n_tokens"], r["planned_tokens"], r["epochs"])
        for r in mix_epochs(spark, str(tmp_path)).collect()
    ]
    assert got == [("A", 100, 190, 1.9), ("B", 10, 30, 3.0)], got
    assert sum(p for _, _, p, _ in got) == 220


def test_pk_uniqueness_flags_planted_duplicate_key(spark, tmp_path):
    """lineitem with a repeated (orderkey, linenumber) pair reports one
    dup key at multiplicity 2; every other table is clean."""
    from etl_pipeline_example_spark.plans.pkaudit import dq_pk_uniqueness

    _write(spark, tmp_path, "region", [(1,)], "r_regionkey bigint")
    _write(spark, tmp_path, "nation", [(1,)], "n_nationkey bigint")
    _write(spark, tmp_path, "customer", [(1,)], "c_custkey bigint")
    _write(spark, tmp_path, "supplier", [(1,)], "s_suppkey bigint")
    _write(spark, tmp_path, "part", [(1,)], "p_partkey bigint")
    _write(spark, tmp_path, "orders", [(1,), (2,)], "o_orderkey bigint")
    _write(spark, tmp_path, "lineitem", [(1, 1), (1, 1), (1, 2)],
           "l_orderkey bigint, l_linenumber int")
    _write(spark, tmp_path, "events", [(1,)], "event_id bigint")
    _write(spark, tmp_path, "documents", [(1,)], "doc_id bigint")
    _write(spark, tmp_path, "embeddings", [(1,)], "vec_id bigint")
    got = {
        r["table_key"]: (r["n_rows"], r["n_keys"], r["n_dup_keys"],
                         r["max_multiplicity"])
        for r in dq_pk_uniqueness(spark, str(tmp_path)).collect()
    }
    assert got["lineitem(l_orderkey, l_linenumber)"] == (3, 2, 1, 2), got
    assert got["orders(o_orderkey)"] == (2, 2, 0, 1), got
    assert all(v[2] == 0 for k, v in got.items()
               if not k.startswith("lineitem")), got


def test_month_spine_zero_fills_empty_months(spark, tmp_path):
    """Orders in Jan and Apr 2020 only: the recursive spine emits Feb
    and Mar as explicit zero rows."""
    from etl_pipeline_example_spark.plans.spine import (
        q_month_spine_recursive,
    )

    _write(spark, tmp_path, "orders_raw",
           [(1, "2020-01-15", 100.0), (2, "2020-04-02", 50.0),
            (3, "2020-04-20", 25.0)],
           "o_orderkey bigint, o_orderdate string, o_totalprice double")
    spark.read.parquet(f"{tmp_path}/orders_raw.parquet").selectExpr(
        "o_orderkey", "cast(o_orderdate as timestamp) o_orderdate",
        "o_totalprice"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = [
        (str(r["month"]), r["n_orders"], r["revenue"])
        for r in q_month_spine_recursive(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2020-01-01", 1, 100.0),
        ("2020-02-01", 0, 0.0),
        ("2020-03-01", 0, 0.0),
        ("2020-04-01", 2, 75.0),
    ], got


def test_gapfill_interp_hand_computed(spark, tmp_path):
    """Urgent orders on Jan 1 (100) and Jan 4 (400): Jan 2 fills to
    100 + 300·(1/3) = 200, Jan 3 to 300; observed days pass through."""
    from etl_pipeline_example_spark.plans.interp import q_gapfill_interp

    _write(spark, tmp_path, "orders_raw",
           [(1, "2020-01-01", 100.0, "1-URGENT"),
            (2, "2020-01-04", 400.0, "1-URGENT"),
            (3, "2020-01-02", 999.0, "5-LOW")],
           "o_orderkey bigint, o_orderdate string, o_totalprice double,"
           " o_orderpriority string")
    spark.read.parquet(f"{tmp_path}/orders_raw.parquet").selectExpr(
        "o_orderkey", "cast(o_orderdate as timestamp) o_orderdate",
        "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = [
        (str(r["day"]), r["observed"], r["filled"])
        for r in q_gapfill_interp(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2020-01-01", 100.0, 100.0),
        ("2020-01-02", None, 200.0),
        ("2020-01-03", None, 300.0),
        ("2020-01-04", 400.0, 400.0),
    ], got


def _mini_warehouse(spark, base, orders_rows):
    _write(spark, base, "region", [(1,)], "r_regionkey bigint")
    _write(spark, base, "nation", [(1, "GERMANY", 1)],
           "n_nationkey bigint, n_name string, n_regionkey bigint")
    _write(spark, base, "customer", [(1, "Cust#1", 1, "BUILDING")],
           "c_custkey bigint, c_name string, c_nationkey bigint,"
           " c_mktsegment string")
    _write(spark, base, "supplier", [(1, "Supp#1", 1)],
           "s_suppkey bigint, s_name string, s_nationkey bigint")
    _write(spark, base, "part", [(1, "widget", "B#1", "TIN", 5)],
           "p_partkey bigint, p_name string, p_brand string,"
           " p_type string, p_size int")
    _write(spark, base, "orders", orders_rows,
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string")
    _write(spark, base, "lineitem", [(1, 1, "N", "O")],
           "l_orderkey bigint, l_linenumber int, l_returnflag string,"
           " l_linestatus string")
    _write(spark, base, "events", [(1, 7, "view")],
           "event_id bigint, user_id bigint, event_type string")
    _write(spark, base, "documents", [(1, "web", 42)],
           "doc_id bigint, source string, n_chars bigint")
    _write(spark, base, "embeddings", [(1, 3)],
           "vec_id bigint, label int")


def test_table_checksum_is_order_independent_and_content_sensitive(
    spark, tmp_path
):
    """Same orders rows in reversed physical order → identical
    checksums; one mutated value → that table's checksum (and only
    that table's) changes."""
    from etl_pipeline_example_spark.plans.checksum import table_checksum

    rows = [(1, 1, "1-URGENT"), (2, 1, "5-LOW"), (3, 1, "3-MEDIUM")]
    a, b, c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    _mini_warehouse(spark, a, rows)
    _mini_warehouse(spark, b, list(reversed(rows)))
    _mini_warehouse(spark, c, [(1, 1, "1-URGENT"), (2, 1, "5-LOW"),
                               (3, 1, "2-HIGH")])
    cks_a = {r["table_name"]: (r["n_rows"], r["checksum"])
             for r in table_checksum(spark, str(a)).collect()}
    cks_b = {r["table_name"]: (r["n_rows"], r["checksum"])
             for r in table_checksum(spark, str(b)).collect()}
    cks_c = {r["table_name"]: (r["n_rows"], r["checksum"])
             for r in table_checksum(spark, str(c)).collect()}
    assert cks_a == cks_b
    assert cks_a["orders"] != cks_c["orders"]
    assert {k: v for k, v in cks_a.items() if k != "orders"} == {
        k: v for k, v in cks_c.items() if k != "orders"
    }


def test_graph_triangle_census_hand_computed(spark, tmp_path):
    """Basket {1,2,3} forms the only triangle; {3,4} adds a pendant
    edge; a repeat {1,2} basket must not double-count. Degrees:
    part 4 → 1, parts 1,2 → 2, part 3 → 3."""
    from etl_pipeline_example_spark.plans.graph import (
        graph_degree_hist,
        graph_triangles,
    )

    rows = [(1, 1), (1, 2), (1, 3), (2, 3), (2, 4), (3, 1), (3, 2)]
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint")
    tri = graph_triangles(spark, str(tmp_path)).collect()[0]
    assert (tri["n_vertices"], tri["n_edges"], tri["n_triangles"]) == (
        4, 4, 1,
    ), tri
    hist = {
        r["degree"]: r["n_parts"]
        for r in graph_degree_hist(spark, str(tmp_path)).collect()
    }
    assert hist == {1: 1, 2: 2, 3: 1}, hist


def test_span_corruption_plan_matches_python_reference(spark, tmp_path):
    """The mask is a pure function of (doc_id, position): recompute it
    in Python over the same md5 rule and the census must agree,
    including the span (maximal-run) count."""
    import hashlib

    from etl_pipeline_example_spark.operators.spancorrupt import (
        MASK_PCT,
        span_corruption_plan,
    )

    docs = [(1, " ".join(f"w{j}" for j in range(40)), "en", "A"),
            (2, " ".join(f"w{j}" for j in range(25)), "en", "B")]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )

    def mask(doc_id, n):
        flags = []
        for i in range(n):
            h = int(hashlib.md5(f"{doc_id}:{i}".encode())
                    .hexdigest()[:15], 16)
            flags.append(1 if h % 100 < MASK_PCT else 0)
        return flags

    want = {}
    for doc_id, text, _, src in docs:
        n = len(text.split())
        m = mask(doc_id, n)
        spans = sum(
            1 for i in range(n) if m[i] == 1 and (i == 0 or m[i - 1] == 0)
        )
        want[src] = (1, n, sum(m), spans)
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["n_masked"],
                      r["n_spans"])
        for r in span_corruption_plan(spark, str(tmp_path)).collect()
    }
    assert got == want, (got, want)
    assert any(v[2] > 0 for v in got.values())  # the mask actually fires


def test_ann_filtered_restricts_to_query_label(spark, tmp_path):
    """Vectors 0..1 are queries. Query 0 (label 1) must only retrieve
    label-1 corpus vectors even though a label-2 vector is an exact
    duplicate of it (global rank 1 — the search-then-filter trap)."""
    from etl_pipeline_example_spark.operators.annfiltered import ann_filtered

    rows = [
        (0, [1.0, 0.0], 1),   # query, label 1
        (1, [0.0, 1.0], 2),   # query, label 2
        (2, [1.0, 0.0], 2),   # exact dup of query 0, WRONG label
        (3, [0.9, 0.1], 1),   # same label, near
        (4, [0.1, 0.9], 1),   # same label, far
        (5, [0.0, 1.0], 2),   # exact dup of query 1, right label
    ]
    spark.createDataFrame(
        [(i, v, lb) for i, v, lb in rows],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/embeddings.parquet"
    )
    got = {}
    for r in ann_filtered(spark, str(tmp_path)).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"])
        )
    # query 0: label-1 corpus = {3, 4}; vector 2 (dup, label 2) excluded
    assert [n for _, n, _ in sorted(got[0])] == [3, 4], got
    # query 1: label-2 corpus = {2, 5}; 5 is the exact dup -> rank 1
    assert sorted(got[1])[0][1] == 5 and sorted(got[1])[0][2] == 1.0, got


def test_wilson_interval_matches_python_reference(spark, tmp_path):
    """Planted events: 4 users convert out of the assigned pool; the
    bounds must equal the closed-form Wilson formula computed in
    Python (same doubles, IEEE sqrt), and always bracket the rate."""
    import math

    from etl_pipeline_example_spark.plans.wilson import (
        q_ab_wilson,
    )
    from etl_pipeline_example_spark.plans.abtest import CONV_MIN_PURCHASES

    rows = []
    eid = 0
    for uid in range(1, 21):
        n_purch = CONV_MIN_PURCHASES if uid <= 4 else 1
        for _ in range(n_purch):
            eid += 1
            rows.append((eid, "2024-01-01 00:00:00", uid, "purchase"))
    df = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, ts, u, et in rows],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id",
                 "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = q_ab_wilson(spark, str(tmp_path)).collect()
    assert len(got) == 2 and sum(r["n_users"] for r in got) == 20
    z = 1.96
    for r in got:
        n, p = float(r["n_users"]), r["n_converted"] / r["n_users"]
        center = (p + z * z / (2 * n)) / (1 + z * z / n)
        half = (
            z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
            / (1 + z * z / n)
        )
        assert r["wilson_lo"] == center - half, (r, center - half)
        assert r["wilson_hi"] == center + half, (r, center + half)
        assert r["wilson_lo"] <= r["rate"] <= r["wilson_hi"]
        assert 0.0 <= r["wilson_lo"] and r["wilson_hi"] <= 1.0


def test_decayed_engagement_uses_exact_dyadic_weights(spark, tmp_path):
    """Events 0, 7, and 70+ days before the anchor weigh 1, 0.5, and
    the 0.5^10 cap: score = 2·1 + 3·0.5 + 4·0.0009765625 exactly."""
    from etl_pipeline_example_spark.plans.decay import q_decayed_engagement

    rows = []
    eid = 0
    for day, n in [("2024-03-01", 2), ("2024-02-23", 3), ("2023-01-01", 4)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, f"{day} 10:00:00"))
    df = spark.createDataFrame(
        [(i, ts, 1, "view", 0.0, "{}") for i, ts in rows],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id",
                 "event_type", "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = q_decayed_engagement(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 9
    assert r["decayed_score"] == 2 * 1.0 + 3 * 0.5 + 4 * 0.0009765625, r


def test_order_backlog_counts_open_intervals(spark, tmp_path):
    """Order 1 open Jan 1-3, order 2 open Jan 2-5: the daily open
    count is 1,2,2,1,1 and drops to the spine's end."""
    from etl_pipeline_example_spark.plans.backlog import q_order_backlog

    _write(spark, tmp_path, "orders_raw",
           [(1, "2020-01-01"), (2, "2020-01-02")],
           "o_orderkey bigint, o_orderdate string")
    spark.read.parquet(f"{tmp_path}/orders_raw.parquet").selectExpr(
        "o_orderkey", "cast(o_orderdate as timestamp) o_orderdate"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    _write(spark, tmp_path, "lineitem_raw",
           [(1, "2020-01-02"), (1, "2020-01-03"), (2, "2020-01-05")],
           "l_orderkey bigint, l_shipdate string")
    spark.read.parquet(f"{tmp_path}/lineitem_raw.parquet").selectExpr(
        "l_orderkey", "cast(l_shipdate as timestamp) l_shipdate"
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = [
        (str(r["day"]), r["n_open"])
        for r in q_order_backlog(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("2020-01-01", 1), ("2020-01-02", 2), ("2020-01-03", 2),
        ("2020-01-04", 1), ("2020-01-05", 1),
    ], got


def test_dataset_card_hand_computed(spark, tmp_path):
    """4 docs (one empty, one duplicate text, one zh, sources 3:1):
    every card scalar is checkable by hand."""
    from etl_pipeline_example_spark.operators.datacard import dataset_card

    docs = [
        (1, "alpha beta", "en", "A"),
        (2, "alpha beta", "en", "A"),   # exact dup of doc 1
        (3, "", "zh", "A"),             # empty + non-en
        (4, "gamma", "en", "B"),
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["metric"]: r["value"]
        for r in dataset_card(spark, str(tmp_path)).collect()
    }
    assert got == {
        "n_docs": 4.0,
        "n_sources": 2.0,
        "n_langs": 2.0,
        "n_tokens": 5.0,
        "n_chars": 25.0,
        "mean_doc_tokens": 1.25,
        "empty_doc_share": 0.25,
        "non_en_share": 0.25,
        "exact_dup_rate": 0.25,
        "top_source_share": 0.75,
    }, got


def test_band_join_bucket_decomposition_hand_computed(spark, tmp_path):
    """Balances 10.0/11.5 (cust) vs 10.8/99.0 (supp), ε=1: only the
    10.8 supplier pairs, with BOTH customers — including the 11.5 one
    whose match lives in the ADJACENT bucket (the case a same-bucket-
    only join would drop)."""
    from etl_pipeline_example_spark.plans.bandjoin import q_band_join

    _write(spark, tmp_path, "customer", [(1, 5, 10.0), (2, 5, 11.5)],
           "c_custkey bigint, c_nationkey bigint, c_acctbal double")
    _write(spark, tmp_path, "supplier", [(1, 7, 10.8), (2, 7, 99.0)],
           "s_suppkey bigint, s_nationkey bigint, s_acctbal double")
    got = [
        (r["c_nationkey"], r["s_nationkey"], r["n_pairs"])
        for r in q_band_join(spark, str(tmp_path)).collect()
    ]
    assert got == [(5, 7, 2)], got


def test_cdc_chunks_match_python_reference(spark, tmp_path):
    """Boundaries are a pure content function: the same window text
    cuts identically in a Python re-implementation of the md5 rule —
    and a doc shorter than the window is exactly one chunk."""
    import hashlib

    from etl_pipeline_example_spark.operators.cdchunk import (
        CDC_MOD,
        CDC_WINDOW,
        doc_cdc_chunks,
    )

    texts = {
        "A": "the quick brown fox jumps over the lazy dog " * 8,
        "B": "tiny",
    }
    docs = [(i + 1, t, "en", s) for i, (s, t) in enumerate(texts.items())]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )

    def chunks(text):
        if len(text) == 0:
            return 0
        if len(text) < CDC_WINDOW:
            return 1
        cuts = 0
        for i in range(CDC_WINDOW, len(text) + 1):
            win = text[i - CDC_WINDOW:i]
            h = int(hashlib.md5(win.encode()).hexdigest()[:15], 16)
            if h % CDC_MOD == 0:
                cuts += 1
        return cuts + 1

    got = {
        r["source"]: (r["n_chars"], r["n_chunks"])
        for r in doc_cdc_chunks(spark, str(tmp_path)).collect()
    }
    want = {s: (len(t), chunks(t)) for s, t in texts.items()}
    assert got == want, (got, want)
    assert got["A"][1] > 1  # the rule actually cuts
    assert got["B"][1] == 1


def test_vocab_oov_split_hand_computed(spark, tmp_path):
    """Train half teaches {alpha, beta}; the eval half's 'gamma' is
    OOV both by token mass (2 of 5) and by type (1 of 3)."""
    from etl_pipeline_example_spark.operators.incremental import INCR_SPLIT
    from etl_pipeline_example_spark.operators.oov import vocab_oov_split

    docs = [
        (1, "alpha beta alpha", "en", "A"),            # train
        (INCR_SPLIT + 1, "alpha gamma beta gamma alpha", "en", "A"),
    ]
    spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = [
        (r["source"], r["n_eval_tokens"], r["n_oov_tokens"],
         r["token_oov_rate"], r["n_eval_types"], r["n_oov_types"],
         r["type_oov_rate"])
        for r in vocab_oov_split(spark, str(tmp_path)).collect()
    ]
    assert got == [("A", 5, 2, 0.4, 3, 1, 1 / 3)], got


def test_pixel_diversity_matches_numpy_reference(spark, tmp_path):
    """The Gini–Simpson of each decoded image equals the value computed
    straight from the planted pattern in numpy — and is strictly
    between 0 (constant image) and 1."""
    import numpy as np

    from etl_pipeline_example_spark.operators.mediapixels import (
        planted_pixels,
    )
    from etl_pipeline_example_spark.operators.pixeldiversity import (
        multimodal_pixel_diversity,
    )

    doc_ids = [2, 4, 6]
    spark.createDataFrame(
        [(d, "t", "en", "A", 1) for d in doc_ids],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_px"], r["sum_sq"], r["pixel_gini"])
        for r in multimodal_pixel_diversity(spark, str(tmp_path)).collect()
    }
    for d in doc_ids:
        img = planted_pixels(d)
        counts = np.bincount(img.reshape(-1), minlength=256).astype(
            np.int64
        )
        n = int(img.size)
        ssq = int((counts * counts).sum())
        want = (n, ssq, float(n * n - ssq) / float(n * n))
        assert got[d] == want, (d, got[d], want)
        assert 0.0 < got[d][2] < 1.0


def test_equi_depth_buckets_hold_equal_counts(spark, tmp_path):
    """16 distinct values → every one of the 8 buckets holds exactly 2
    rows, with contiguous non-overlapping ranges."""
    from etl_pipeline_example_spark.plans.equidepth import (
        q_histogram_equi_depth,
    )

    _write(spark, tmp_path, "orders",
           [(i, float(i)) for i in range(1, 17)],
           "o_orderkey bigint, o_totalprice double")
    got = [
        (r["bucket"], r["n_rows"], r["lo"], r["hi"])
        for r in q_histogram_equi_depth(spark, str(tmp_path)).collect()
    ]
    assert [b for b, *_ in got] == list(range(1, 9))
    assert all(n == 2 for _, n, *_ in got), got
    for (_, _, _, hi_prev), (_, _, lo_next, _) in zip(got, got[1:]):
        assert hi_prev < lo_next, got


def test_market_hhi_hand_computed(spark, tmp_path):
    """Brand A: one supplier → HHI 1.0; brand B: suppliers with volumes
    3 and 1 → HHI = (9+1)/16 = 0.625."""
    from etl_pipeline_example_spark.plans.hhi import q_market_hhi

    _write(spark, tmp_path, "part", [(1, "A"), (2, "B")],
           "p_partkey bigint, p_brand string")
    rows = [(1, 10)] * 2 + [(2, 20)] * 3 + [(2, 21)]
    _write(spark, tmp_path, "lineitem", rows,
           "l_partkey bigint, l_suppkey bigint")
    got = [
        (r["p_brand"], r["n_suppliers"], r["n_lines"], r["hhi"])
        for r in q_market_hhi(spark, str(tmp_path)).collect()
    ]
    assert got == [("A", 1, 2, 1.0), ("B", 2, 4, 0.625)], got


def test_max_drawdown_hand_computed(spark, tmp_path):
    """Customer 1's order values 100 → 50 → 200 → 120: the running
    peaks are 100/100/200/200, ratios 1.0/0.5/1.0/0.6 → max drawdown
    0.5. Customer 2 never declines → 1.0."""
    from etl_pipeline_example_spark.plans.drawdown import q_max_drawdown

    rows = [
        (1, 1, "2020-01-01", 100.0), (2, 1, "2020-01-02", 50.0),
        (3, 1, "2020-01-03", 200.0), (4, 1, "2020-01-04", 120.0),
        (5, 2, "2020-01-01", 10.0), (6, 2, "2020-01-02", 20.0),
    ]
    _write(spark, tmp_path, "orders_raw", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderdate string,"
           " o_totalprice double")
    spark.read.parquet(f"{tmp_path}/orders_raw.parquet").selectExpr(
        "o_orderkey", "o_custkey",
        "cast(o_orderdate as timestamp) o_orderdate", "o_totalprice"
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    got = [
        (r["c_custkey"], r["n_orders"], r["max_drawdown"])
        for r in q_max_drawdown(spark, str(tmp_path)).collect()
    ]
    assert got == [(1, 4, 0.5), (2, 2, 1.0)], got


def test_bpe_index_apply_matches_in_op_training(spark, tmp_path):
    """build_bpe_merges + bpe_encode_indexed / bpe_fertility_indexed
    must emit exactly the rows bpe_encode / bpe_fertility compute with
    their in-op training — the round-10 verdict's persisted-artifact
    ask — and the artifact must contain the two vocabulary-bounded
    tables (merges in merge order, per-word symbol counts)."""
    from etl_pipeline_example_spark.operators.bpe import (
        BPE_ROUNDS,
        bpe_encode,
        bpe_train,
    )
    from etl_pipeline_example_spark.operators.bpeindex import (
        bpe_encode_indexed,
        bpe_fertility_indexed,
        build_bpe_merges,
    )
    from etl_pipeline_example_spark.operators.fertility import bpe_fertility

    sf = "/root/testdata/sf0.001"
    path = str(tmp_path / "bpe_index")
    build_bpe_merges(spark, sf, path)

    merges = spark.read.parquet(f"{path}/merges")
    vocab = spark.read.parquet(f"{path}/vocab")
    assert sorted(merges.columns) == [
        "merge_pair", "merged", "pair_cnt", "round",
    ]
    assert merges.count() == BPE_ROUNDS
    assert sorted(vocab.columns) == ["n_sym", "word"]
    # the persisted merges ARE the trained ones
    got_merges = sorted(
        (r["round"], r["merge_pair"], r["merged"], r["pair_cnt"])
        for r in merges.collect()
    )
    want_merges = sorted(
        (r["round"], r["merge_pair"], r["merged"], r["pair_cnt"])
        for r in bpe_train(spark, sf).collect()
    )
    assert got_merges == want_merges

    indexed = sorted(
        tuple(r) for r in bpe_encode_indexed(spark, sf, path).collect()
    )
    inop = sorted(tuple(r) for r in bpe_encode(spark, sf).collect())
    assert indexed == inop and len(indexed) > 0

    f_indexed = [
        tuple(r) for r in bpe_fertility_indexed(spark, sf, path).collect()
    ]
    f_inop = [tuple(r) for r in bpe_fertility(spark, sf).collect()]
    assert f_indexed == f_inop and len(f_indexed) > 0
