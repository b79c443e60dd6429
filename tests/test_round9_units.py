"""Hand-computed unit tests for the round-9 operators: source overlap
matrix, readability panel, band-occupancy histogram, hierarchical time
rollup."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source). Documents table layout."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_source_overlap_matrix_hand_computed(spark, tmp_path):
    """Three sources: sA and sB share one exact document (1 shared
    content hash) and that document's 2 shingles; sC shares nothing.
    The full 3-pair universe must appear, zero rows included."""
    from etl_pipeline_example_spark.operators.sourceoverlap import (
        source_overlap_matrix,
    )

    shared = "w1 w2 w3 w4"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, shared, "en", "sA"),
            (2, "x x y", "en", "sA"),
            (3, shared, "en", "sB"),
            (4, "zz zz zz", "en", "sB"),
            (5, "q r s t", "en", "sC"),
        ],
    )
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared_shingles"], r["n_shared_contents"])
        for r in source_overlap_matrix(spark, sf).collect()
    }
    assert got == {
        ("sA", "sB"): (2, 1),
        ("sA", "sC"): (0, 0),
        ("sB", "sC"): (0, 0),
    }, got


def test_text_readability_hand_computed(spark, tmp_path):
    """'hello world' (2 words, 0 long, 3 vowel groups) + 'beautiful sky'
    (2 words, 1 long, 4 vowel groups incl. the y) in one source."""
    from etl_pipeline_example_spark.operators.readability import text_readability

    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "hello world", "en", "s"), (2, "beautiful sky", "en", "s")],
    )
    [r] = text_readability(spark, sf).collect()
    assert (
        r["source"],
        r["n_docs"],
        r["n_words"],
        r["n_long_words"],
        r["n_syllables"],
    ) == ("s", 2, 4, 1, 7), r
    assert r["words_per_doc"] == 2.0
    assert r["long_word_share"] == 0.25
    assert r["syllables_per_word"] == 1.75


def test_minhash_band_occupancy_counts_every_doc_once_per_band(spark, tmp_path):
    """Per band, bucket sizes sum to the number of shingle-able docs
    (each doc lands in exactly one bucket per band), and the planted
    clone pair forces a ≥2 bucket in EVERY band (identical signatures
    collide in all bands)."""
    from etl_pipeline_example_spark.operators.bandstats import (
        minhash_band_occupancy,
    )
    from etl_pipeline_example_spark.operators.dedup import MH_BANDS

    clone = "alpha beta gamma delta epsilon zeta"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, clone, "en", "s"),
            (2, clone, "en", "s"),
            (3, "one two three four five six seven", "en", "s"),
            (4, "a b", "en", "s"),  # < SHINGLE_K tokens: drops out
        ],
    )
    rows = minhash_band_occupancy(spark, sf).collect()
    per_band_docs = {b: 0 for b in range(MH_BANDS)}
    per_band_has_pair = {b: False for b in range(MH_BANDS)}
    for r in rows:
        per_band_docs[r["band"]] += r["bucket_size"] * r["n_buckets"]
        if r["bucket_size"] >= 2:
            per_band_has_pair[r["band"]] = True
    assert per_band_docs == {b: 3 for b in range(MH_BANDS)}, rows
    assert all(per_band_has_pair.values()), rows


def test_events_rollup_multi_hand_computed(spark, tmp_path):
    """Five events across two days: every row of the minute/hour/day
    cascade checked against hand-computed counts, distinct users, and
    min/max values."""
    from etl_pipeline_example_spark.plans.timerollup import events_rollup_multi

    def t(day, h, m, s):
        return dt.datetime(2024, 1, day, h, m, s)

    df = spark.createDataFrame(
        [
            (0, t(1, 10, 0, 30), 1, "click", 1.0, "{}"),
            (1, t(1, 10, 0, 45), 1, "click", 5.0, "{}"),
            (2, t(1, 10, 1, 10), 2, "view", 2.0, "{}"),
            (3, t(1, 11, 30, 0), 1, "click", -3.0, "{}"),
            (4, t(2, 0, 0, 0), 3, "view", 0.5, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["resolution"], r["bucket_ts"]): (
            r["n_events"],
            r["n_users"],
            r["min_value"],
            r["max_value"],
        )
        for r in events_rollup_multi(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("minute", t(1, 10, 0, 0)): (2, 1, 1.0, 5.0),
        ("minute", t(1, 10, 1, 0)): (1, 1, 2.0, 2.0),
        ("minute", t(1, 11, 30, 0)): (1, 1, -3.0, -3.0),
        ("minute", t(2, 0, 0, 0)): (1, 1, 0.5, 0.5),
        ("hour", t(1, 10, 0, 0)): (3, 2, 1.0, 5.0),
        ("hour", t(1, 11, 0, 0)): (1, 1, -3.0, -3.0),
        ("hour", t(2, 0, 0, 0)): (1, 1, 0.5, 0.5),
        ("day", t(1, 0, 0, 0)): (4, 2, -3.0, 5.0),
        ("day", t(2, 0, 0, 0)): (1, 1, 0.5, 0.5),
    }, got


def test_events_rollup_multi_cascade_is_persisted(spark, sf_dir):
    """The cascade's multi-consumer frames (the minute and hour
    (bucket, user) spines) must be cached: each feeds both its level's
    output fold and the next level, so the executed plan shows their
    InMemoryTableScans (2 frames × 2 consumers) instead of recomputing
    the event scan per level — and the events relation itself appears
    exactly once."""
    from etl_pipeline_example_spark.plans.timerollup import events_rollup_multi

    plan = (
        events_rollup_multi(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("InMemoryTableScan") >= 4, plan


def test_token_budget_curve_hand_computed(spark, tmp_path):
    """Three docs: two at TTR 0.5 (bucket 10, 6 tokens) and one at TTR
    1.0 (bucket 20, 3 tokens); descending cumulative gives the
    surviving budget at each bucket's lower edge."""
    from etl_pipeline_example_spark.operators.budgetcurve import token_budget_curve

    sf = _write_docs(
        spark,
        tmp_path,
        [(1, "a a a b", "en", "s"), (2, "a b c", "en", "s"), (3, "x x", "en", "s")],
    )
    rows = [
        (r["ttr_bucket"], r["n_docs"], r["n_tokens"], r["cum_docs"], r["cum_tokens"])
        for r in token_budget_curve(spark, sf).collect()
    ]
    assert rows == [(10, 2, 6, 3, 9), (20, 1, 3, 1, 3)], rows


def test_dq_rules_hand_computed_catalog(spark, tmp_path):
    """Planted violations, one per rule class: a negative-price order
    with a bad status, an orphan order (custkey 99), a lineitem that
    ships before its order, an orphan lineitem (orderkey 99), a
    zero-quantity lineitem with an out-of-range discount, a negative
    and a NULL event value, and a zh document whose n_chars drifts."""
    import datetime as dt

    from etl_pipeline_example_spark.operators.dqrules import dq_rules

    d0 = dt.datetime(1995, 1, 10)
    spark.createDataFrame(
        [(1, 10, "O", 100.0, d0, "1-URGENT"),
         (2, 10, "X", -5.0, d0, "1-URGENT"),       # bad status + nonpos price
         (3, 99, "F", 50.0, d0, "2-HIGH")],        # orphan custkey
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(10, "c", "BUILDING")],
        "c_custkey bigint, c_name string, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        # (orderkey, qty, discount, shipdate)
        [(1, 5.0, 0.1, d0 + dt.timedelta(days=3)),
         (1, 0.0, 0.9, d0 - dt.timedelta(days=1)),  # qty, disc, ship-before
         (99, 2.0, 0.0, d0)],                       # orphan orderkey
        "l_orderkey bigint, l_quantity double, l_discount double,"
        " l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, d0, 7, "view", 1.0, "{}"),
         (2, d0, 7, "view", -2.0, "{}"),            # negative value
         (3, d0, 7, "view", None, "{}")],           # null value
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    spark.createDataFrame(
        [(1, "ok text", "en", "sA", 7),
         (2, "drift", "zh", "sA", 99)],             # bad lang + n_chars drift
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    got = {
        r["rule_id"]: (r["tbl"], r["checked"], r["violations"])
        for r in dq_rules(spark, str(tmp_path)).collect()
    }
    assert got == {
        "orders_nonpositive_price": ("orders", 3, 1),
        "orders_null_custkey": ("orders", 3, 0),
        "orders_bad_status": ("orders", 3, 1),
        "orders_customer_orphans": ("orders", 3, 1),
        "lineitem_nonpositive_qty": ("lineitem", 3, 1),
        "lineitem_discount_range": ("lineitem", 3, 1),
        "lineitem_ship_before_order": ("lineitem", 3, 1),
        "lineitem_orders_orphans": ("lineitem", 3, 1),
        "events_null_value": ("events", 3, 1),
        "events_negative_value": ("events", 3, 1),
        "documents_empty_text": ("documents", 2, 0),
        "documents_nchars_drift": ("documents", 2, 1),
        "documents_lang_not_allowed": ("documents", 2, 1),
    }, got
    # pass_rate is the exact int/int double division
    rates = {r["rule_id"]: r["pass_rate"] for r in dq_rules(spark, str(tmp_path)).collect()}
    assert rates["orders_nonpositive_price"] == 2.0 / 3.0


def test_q_range_frame_peers_and_gaps(spark, tmp_path):
    """RANGE semantics pinned by hand: two same-day orders are peers
    (each sees both), a 90-days-later order still covers the first two,
    and a 91-day gap excludes them even though they are adjacent ROWS."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.frames import q_range_frame

    base = dt.datetime(1995, 1, 1)
    spark.createDataFrame(
        [(1, 7, "O", 10.0, base, "x"),
         (2, 7, "O", 20.0, base, "x"),                          # peer of 1
         (3, 7, "O", 40.0, base + dt.timedelta(days=90), "x"),  # includes 1,2
         (4, 7, "O", 80.0, base + dt.timedelta(days=181), "x"), # 91-day gap
         (5, 8, "O", 7.0, base, "x")],                          # other cust
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        r["o_orderkey"]: (r["n_trailing"], r["sum_trailing"])
        for r in q_range_frame(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (2, 30.0),   # same-day peers see each other
        2: (2, 30.0),
        3: (3, 70.0),   # day 90 still inside the 90-preceding frame
        4: (1, 80.0),   # gap of 91 days: frame excludes 3 despite adjacency
        5: (1, 7.0),
    }, got


def test_q_unpivot_measures_hand_computed(spark, tmp_path):
    """Two lineitems melt into 3 measure rows each; per (measure, flag)
    sums are the decimal-exact column totals."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.frames import q_unpivot_measures

    d = dt.datetime(1995, 1, 1)
    spark.createDataFrame(
        [(1, 2.0, 100.50, 0.05, "A", d),
         (2, 3.0, 200.25, 0.10, "A", d),
         (3, 4.0, 50.00, 0.00, "R", d)],
        "l_orderkey bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_returnflag string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        (r["measure"], r["l_returnflag"]): (r["n"], r["sum_val"])
        for r in q_unpivot_measures(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("l_quantity", "A"): (2, 5.0),
        ("l_extendedprice", "A"): (2, 300.75),
        ("l_discount", "A"): (2, 0.15),
        ("l_quantity", "R"): (1, 4.0),
        ("l_extendedprice", "R"): (1, 50.0),
        ("l_discount", "R"): (1, 0.0),
    }, got


def test_join_skew_profile_hand_computed(spark, tmp_path):
    """4 keys with loads 5/2/2/1 over 10 rows: ranks break count ties
    by key, share_ppm and load_x1000 are exact integer divisions."""
    import datetime as dt

    from etl_pipeline_example_spark.operators.skewprofile import (
        join_skew_profile,
    )

    d = dt.datetime(2024, 1, 1)
    rows = []
    for uid, cnt in [(7, 5), (3, 2), (9, 2), (1, 1)]:
        for i in range(cnt):
            rows.append((len(rows), d, uid, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = [
        (r["rank"], r["user_id"], r["n_rows"], r["total_rows"], r["n_keys"],
         r["share_ppm"], r["load_x1000"])
        for r in sorted(
            join_skew_profile(spark, str(tmp_path)).collect(),
            key=lambda r: r["rank"],
        )
    ]
    assert got == [
        (1, 7, 5, 10, 4, 500000, 2000),  # 5/10 of rows, 2x the mean load
        (2, 3, 2, 10, 4, 200000, 800),   # tie with 9 broken by key
        (3, 9, 2, 10, 4, 200000, 800),
        (4, 1, 1, 10, 4, 100000, 400),
    ], got


def test_length_drift_ks_hand_computed(spark, tmp_path):
    """Source A: two docs in bucket 0; source B: one doc in bucket 3.
    Corpus ECDF is (2/3, 1); A's is (1, 1) -> ks 1/3; B's is (0, 1)
    -> ks 2/3. Exact rational-in-double arithmetic both sides."""
    from etl_pipeline_example_spark.operators.lengthks import length_drift_ks

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a" * 10, "en", "sA"),
            (2, "b" * 20, "en", "sA"),
            (3, "c" * 200, "en", "sB"),
        ],
    )
    got = {
        r["source"]: (r["n_docs"], r["ks"])
        for r in length_drift_ks(spark, sf).collect()
    }
    assert got == {
        "sA": (2, abs(1.0 - 2.0 / 3.0)),
        "sB": (1, 2.0 / 3.0),
    }, got


def test_ann_recall_matrix_contract(spark, sf_dir):
    """Structural contract on real data: one row per method, the
    ground-truth denominator is ANN_K pairs per query, hits bounded by
    the denominator, recall the exact quotient."""
    from etl_pipeline_example_spark.operators.annrecall import ann_recall_matrix
    from etl_pipeline_example_spark.operators.similarity import ANN_K

    rows = {r["method"]: r for r in ann_recall_matrix(spark, sf_dir).collect()}
    assert set(rows) == {"lsh", "ivf"}
    for r in rows.values():
        assert r["n_possible"] == r["n_queries"] * ANN_K
        assert 0 <= r["n_hits"] <= r["n_possible"]
        assert r["recall"] == r["n_hits"] / r["n_possible"]


def test_q_cohort_ltv_hand_computed(spark, tmp_path):
    """Customer 1 cohorts at 1995-01 (month 36) with orders at offsets
    0 and 2; customer 2 cohorts at 1995-03 sharing the (36,2) calendar
    month but landing in its own (38, 0) cell."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.cohort import q_cohort_ltv

    rows = [
        (1, 1, "O", 10.0, dt.datetime(1995, 1, 5), "x"),
        (2, 1, "O", 30.0, dt.datetime(1995, 3, 20), "x"),
        (3, 2, "O", 7.0, dt.datetime(1995, 3, 1), "x"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        (r["cohort_month"], r["month_offset"]): (
            r["n_customers"], r["n_orders"], r["revenue"])
        for r in q_cohort_ltv(spark, str(tmp_path)).collect()
    }
    assert got == {
        (36, 0): (1, 1, 10.0),
        (36, 2): (1, 1, 30.0),
        (38, 0): (1, 1, 7.0),
    }, got


def test_q_quantile_counting_hand_computed(spark, tmp_path):
    """Flag A: values 1..10 (p50=5, p90=9, p99=10 by lower inverse
    ECDF); flag R: [2,2,2,8] (p50=2: cum(2)=3, 3*100 >= 50*4; p90=8;
    p99=8)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.quantiles import q_quantile_counting

    d = dt.datetime(1995, 1, 1)
    rows = [(i, float(v), 100.0, 0.0, "A", d) for i, v in enumerate(range(1, 11))]
    rows += [(100 + i, float(v), 100.0, 0.0, "R", d)
             for i, v in enumerate([2, 2, 2, 8])]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_quantity double, l_extendedprice double,"
        " l_discount double, l_returnflag string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        r["l_returnflag"]: (r["n_rows"], r["p50"], r["p90"], r["p99"])
        for r in q_quantile_counting(spark, str(tmp_path)).collect()
    }
    assert got == {
        "A": (10, 5, 9, 10),
        "R": (4, 2, 8, 8),
    }, got


def test_run_sql_executes_adhoc_ansi_text(spark, sf_dir, duck):
    """The facade runs caller-supplied SQL over the registered views,
    and the shared-dialect demo constant returns identical results
    when DuckDB executes the very same text."""
    from etl_pipeline_example_spark.plans.sqlfacade import (
        SHARED_NATION_REVENUE_SQL,
        run_sql,
    )

    adhoc = run_sql(
        spark, sf_dir, "SELECT count(*) AS n, min(o_orderkey) AS k FROM orders"
    ).collect()
    assert adhoc[0]["n"] > 0 and adhoc[0]["k"] is not None

    srows = sorted(
        tuple(r) for r in run_sql(spark, sf_dir, SHARED_NATION_REVENUE_SQL).collect()
    )
    drows = sorted(tuple(r) for r in duck.sql(SHARED_NATION_REVENUE_SQL).fetchall())
    assert srows == drows


def test_q_value_window_full_frame_semantics(spark, tmp_path):
    """The UNBOUNDED..UNBOUNDED frame: every row of a customer sees the
    same (first, second, last); a single-order customer's second_price
    is NULL."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.frames import q_value_window

    base = dt.datetime(1995, 1, 1)
    spark.createDataFrame(
        [(1, 7, "O", 10.0, base, "x"),
         (2, 7, "O", 20.0, base + dt.timedelta(days=5), "x"),
         (3, 7, "O", 30.0, base + dt.timedelta(days=9), "x"),
         (4, 8, "O", 99.0, base, "x")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        r["o_orderkey"]: (r["first_price"], r["second_price"], r["last_price"])
        for r in q_value_window(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (10.0, 20.0, 30.0),
        2: (10.0, 20.0, 30.0),   # NOT "current row" — the frame bug pin
        3: (10.0, 20.0, 30.0),
        4: (99.0, None, 99.0),
    }, got


def test_q_interval_merge_swallowed_interval(spark, tmp_path):
    """The case 'previous row's end' gets wrong: order 2 is swallowed
    by order 1's window, order 3 starts inside order 1's span (though
    after order 2's end would have closed), so all three fuse; order 4
    starts past the running max and opens episode 2."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.intervals import q_interval_merge

    base = dt.datetime(1995, 1, 1)  # day 1096; +30 => e = 1126
    spark.createDataFrame(
        [(1, 7, "O", 1.0, base, "x"),                           # [1096,1126]
         (2, 7, "O", 1.0, base + dt.timedelta(days=2), "x"),    # [1098,1128]
         (3, 7, "O", 1.0, base + dt.timedelta(days=31), "x"),   # [1127,1157] <= 1128
         (4, 7, "O", 1.0, base + dt.timedelta(days=70), "x")],  # 1166 > 1157
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        r["episode"]: (r["ep_start"], r["ep_end"], r["n_orders"])
        for r in q_interval_merge(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (1096, 1157, 3),
        1: (1166, 1196, 1),
    }, got


def test_quality_agreement_cube_is_consistent(spark, sf_dir):
    """Cube invariants on real data: cells partition the corpus (sum
    of n_docs = total docs), n_gates equals the flag sum per cell, and
    marginals match each gate's own keep count."""
    from etl_pipeline_example_spark.operators.c4 import C4_QUERIES
    from etl_pipeline_example_spark.operators.qualityensemble import (
        quality_agreement,
    )

    cells = quality_agreement(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in cells)
    from etl_pipeline_example_spark.sources.readers import read_table

    assert total == read_table(spark, sf_dir, "documents").count()
    for r in cells:
        assert r["n_gates"] == int(r["c4_keep"]) + int(r["charlm_keep"]) + int(
            r["linear_keep"]
        )
    c4_keep_marginal = sum(r["n_docs"] for r in cells if r["c4_keep"])
    c4_direct = (
        C4_QUERIES["quality_c4"](spark, sf_dir).filter("keep").count()
    )
    assert c4_keep_marginal == c4_direct


def test_q_growth_accounting_hand_computed(spark, tmp_path):
    """User A active weeks 0,1 (new, retained; churns into 2); user B
    active weeks 0,2 (new; silent week 1 = churn into 1; resurrected
    week 2); user C active week 2 only (new). Week boundaries:
    1992-01-01 + 7d steps."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.growth import q_growth_accounting

    w0 = dt.datetime(1992, 1, 2)
    rows = []
    for i, (uid, week) in enumerate(
        [(1, 0), (1, 1), (2, 0), (2, 2), (3, 2)]
    ):
        rows.append((i, w0 + dt.timedelta(weeks=week), uid, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r["week"]: (r["n_new"], r["n_retained"], r["n_resurrected"],
                    r["n_churned"])
        for r in q_growth_accounting(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (2, 0, 0, 0),
        1: (0, 1, 0, 1),   # A retained; B churned into week 1
        2: (1, 0, 1, 1),   # C new, B resurrected; A churned into week 2
    }, got


def test_dq_benford_hand_computed(spark, tmp_path):
    """Totals 123, 150, 199 (digit 1), 250 (digit 2), 987 (digit 9):
    n=5; expected_n = 5 * log10(1 + 1/d), chi2 term checked for the
    planted digits and the zero-observation digit 3."""
    import datetime as dt
    import math

    from etl_pipeline_example_spark.plans.benford import dq_benford

    rows = [
        (i, 1, "O", tp, dt.datetime(1995, 1, 1), "1-URGENT")
        for i, tp in enumerate([123.0, 150.5, 199.9, 250.0, 987.6])
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        r["digit"]: (r["n_obs"], r["expected_n"], r["chi2_term"])
        for r in dq_benford(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(1, 10))
    for digit, n_obs in [(1, 3), (2, 1), (9, 1), (3, 0)]:
        exp = 5.0 * float(repr(math.log10(1.0 + 1.0 / digit)))
        assert got[digit][0] == n_obs
        assert got[digit][1] == exp
        assert got[digit][2] == (n_obs - exp) * (n_obs - exp) / exp


def test_dedup_prefix_hand_computed(spark, tmp_path):
    """Docs 1 and 3 share a 64+-char opening with different tails (one
    cluster, keep=1); doc 2's opening diverges inside the prefix
    window; docs 4 and 5 are identical short texts (prefix == whole
    text, second cluster, keep=4)."""
    from etl_pipeline_example_spark.operators.prefixdup import dedup_prefix

    opener = (
        "the quick brown fox jumps over the lazy dog again and again and"
        " then some more padding words"
    )
    assert len(opener) >= 64
    rows = [
        (1, opener + " tail one", "en", "web", 1),
        (2, "completely different opening text that shares nothing here",
         "en", "web", 1),
        (3, opener + " a wholly different continuation", "en", "web", 1),
        (4, "short doc", "en", "web", 1),
        (5, "short doc", "en", "web", 1),
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )

    got = {
        r["keep_doc_id"]: r["n_docs"]
        for r in dedup_prefix(spark, str(tmp_path)).collect()
    }
    assert got == {1: 2, 4: 2}, got


def test_agg_salted_hand_computed(spark, tmp_path):
    """Hot key 'click' (4 events, 2 users), cold key 'view' (1 event):
    the salted two-phase decomposition must reproduce the plain
    groupBy numbers exactly, and the phase-1 grouping must carry the
    salt (visible in the optimized plan)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.saltedagg import agg_salted

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 10, "click", 5.0, "{}"),
        (1, t0, 10, "click", 1.0, "{}"),
        (2, t0, 20, "click", 9.0, "{}"),
        (3, t0, 20, "click", 2.0, "{}"),
        (4, t0, 10, "view", 7.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    df = agg_salted(spark, str(tmp_path))
    got = {
        r["event_type"]: (
            r["n_events"], r["n_users"], r["min_value"], r["max_value"]
        )
        for r in df.collect()
    }
    assert got == {"click": (4, 2, 1.0, 9.0), "view": (1, 1, 7.0, 7.0)}, got
    assert "pmod" in df._jdf.queryExecution().optimizedPlan().toString()


def test_lexicon_stats_hand_computed(spark, tmp_path):
    """Source s: docs 'a a b' + 'a c' -> counts a:3 b:1 c:1; n_tokens=5,
    n_types=3, hapax=2, sum_sq=11: hapax_share=2/3, gini=1-11/25,
    top_share=3/5."""
    from etl_pipeline_example_spark.operators.lexicon import lexicon_stats

    sf = _write_docs(
        spark, tmp_path,
        [(1, "a a b", "en", "s"), (2, "a c", "en", "s")],
    )
    [r] = lexicon_stats(spark, sf).collect()
    assert (r["source"], r["n_tokens"], r["n_types"], r["n_hapax"]) == (
        "s", 5, 3, 2
    ), r
    assert r["hapax_share"] == 2.0 / 3.0
    assert r["gini_impurity"] == 1.0 - 11.0 / 25.0
    assert r["top_share"] == 3.0 / 5.0


def test_q_ab_chi2_hand_computed(spark, tmp_path):
    """Six users: 1-3 heavy purchasers (14 purchases), 4-6 light (1).
    Variants mirror the md5-hexint assignment computed independently
    with hashlib; expected counts and chi-square terms recomputed with
    the same float operations."""
    import datetime as dt
    import hashlib

    from etl_pipeline_example_spark.plans.abtest import (
        CONV_MIN_PURCHASES,
        q_ab_chi2,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid in [1, 2, 3]:
        for _ in range(CONV_MIN_PURCHASES):
            rows.append((eid, t0, uid, "purchase", 1.0, "{}")); eid += 1
    for uid in [4, 5, 6]:
        rows.append((eid, t0, uid, "purchase", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    def variant(uid):
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:15], 16) % 2

    cells = {}
    for uid in range(1, 7):
        key = (variant(uid), 1 if uid <= 3 else 0)
        cells[key] = cells.get(key, 0) + 1
    rt = {v: sum(n for (vv, _), n in cells.items() if vv == v) for v in (0, 1)}
    ct = {c: sum(n for (_, cc), n in cells.items() if cc == c) for c in (0, 1)}

    got = {
        (r["variant"], r["converted"]): (
            r["n_users"], r["expected_n"], r["chi2_term"]
        )
        for r in q_ab_chi2(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(cells)
    for (v, c), n in cells.items():
        exp = float(rt[v]) * float(ct[c]) / 6.0
        assert got[(v, c)][0] == n
        assert got[(v, c)][1] == exp
        assert got[(v, c)][2] == (n - exp) * (n - exp) / exp


def test_q_rolling_actives_hand_computed(spark, tmp_path):
    """User 1 active on days 1 and 5, user 2 on day 5: day 5's trailing
    window [day -6, day] covers both of user 1's visits once; output
    days are only the observed ones (no phantom trailing days)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.rolling import q_rolling_actives

    def d(n):
        return dt.datetime(2024, 1, n, 12, 0)

    rows = [
        (0, d(1), 1, "view", 1.0, "{}"),
        (1, d(5), 1, "view", 1.0, "{}"),
        (2, d(5), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        str(r["day"]): (r["dau"], r["wau7"], r["stickiness"])
        for r in q_rolling_actives(spark, str(tmp_path)).collect()
    }
    assert got == {
        "2024-01-01": (1, 1, 1.0),
        "2024-01-05": (2, 2, 1.0),
    }, got


def test_read_jsonl_quarantine_splits_rows(spark, tmp_path):
    """Four landed lines: one clean, one raw garbage (unparseable),
    one with a wrong-typed required int (type casualty), one with a
    legitimately absent optional field (stays good)."""
    import gzip
    import json

    from etl_pipeline_example_spark.metadata import TableSpec
    from etl_pipeline_example_spark.sources.quarantine import (
        QUAR_REASON_BAD_JSON,
        QUAR_REASON_NULL_REQUIRED,
        quarantine_landed,
        read_jsonl_quarantine,
    )

    spec = TableSpec.from_dict(
        {
            "name": "recs",
            "data_format": "json",
            "columns": [
                {"name": "id", "type": "int"},
                {"name": "label", "type": "character"},
            ],
        }
    )
    land = tmp_path / "land"
    land.mkdir()
    lines = [
        json.dumps({"id": 1, "label": "ok"}),
        "this is not json at all {{{",
        json.dumps({"id": "NaNa", "label": "bad_type"}),
        json.dumps({"id": 4}),  # label absent: legitimate null
    ]
    with gzip.open(land / "part-0.jsonl.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")

    good, bad = read_jsonl_quarantine(spark, str(land), spec, required=["id"])
    good_rows = {r["id"]: r["label"] for r in good.collect()}
    assert good_rows == {1: "ok", 4: None}, good_rows
    bad_rows = sorted((r["reason"], r["raw_line"]) for r in bad.collect())
    assert [r[0] for r in bad_rows] == sorted(
        [QUAR_REASON_BAD_JSON, QUAR_REASON_NULL_REQUIRED]
    ), bad_rows
    assert any("NaNa" in r[1] for r in bad_rows)

    counts = quarantine_landed(
        spark, str(land), spec, str(tmp_path / "good"),
        str(tmp_path / "quar"), required=["id"],
    )
    assert counts == {"good": 2, "quarantined": 2}, counts
    requar = spark.read.json(str(tmp_path / "quar"))
    assert sorted(requar.columns) == ["raw_line", "reason"]


def test_q_scd2_asof_hand_computed(spark, tmp_path):
    """One changed customer (hash-gated) with an order on each side of
    the change date, one unchanged customer: pre-change orders keep the
    original segment, post-change orders flip to '_v2'."""
    import datetime as dt
    import hashlib

    from etl_pipeline_example_spark.plans.scd2asof import (
        ASOF_MOD,
        q_scd2_asof,
    )

    def changed(ck):
        return int(
            hashlib.md5(f"upd2:{ck}".encode()).hexdigest()[:15], 16
        ) % ASOF_MOD == 0

    # find one changed and one unchanged custkey deterministically
    ck_changed = next(k for k in range(1, 100) if changed(k))
    ck_stable = next(k for k in range(1, 100) if not changed(k))

    spark.createDataFrame(
        [
            (ck_changed, "BUILDING"),
            (ck_stable, "MACHINERY"),
        ],
        "c_custkey bigint, c_mktsegment string",
    ).withColumn("c_name", F.lit("x")).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/customer.parquet")

    orders = [
        (1, ck_changed, "O", 10.0, dt.datetime(1996, 1, 1), "1-URGENT"),
        (2, ck_changed, "O", 20.0, dt.datetime(1999, 1, 1), "1-URGENT"),
        (3, ck_stable, "O", 40.0, dt.datetime(1999, 6, 1), "1-URGENT"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")

    got = {
        r["segment_at_order"]: (r["n_orders"], r["revenue"])
        for r in q_scd2_asof(spark, str(tmp_path)).collect()
    }
    assert got == {
        "BUILDING": (1, 10.0),
        "BUILDING_v2": (1, 20.0),
        "MACHINERY": (1, 40.0),
    }, got


def test_contamination_bloom_hand_computed(spark, tmp_path):
    """Eval doc (src0) shares its exact 5-gram with train doc 2; train
    doc 3 shares nothing (with 3 bits set of 2^16, an accidental
    all-slices hit has ~1e-13 probability). Bloom must flag the exact
    match (no false negatives) and nothing else."""
    from etl_pipeline_example_spark.operators.bloomgate import (
        contamination_bloom,
    )

    shared = "alpha beta gamma delta epsilon"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, shared + " zeta", "en", "src0"),
            (2, "prefix " + shared, "en", "srcA"),
            (3, "one two three four five six", "en", "srcA"),
            (4, "tiny", "en", "srcB"),  # < 5 tokens: no grams, never flagged
        ],
    )
    got = {
        r["source"]: (r["n_docs"], r["n_bloom"], r["n_exact"], r["n_false_pos"])
        for r in contamination_bloom(spark, sf).collect()
    }
    assert got == {"srcA": (2, 1, 1, 0), "srcB": (1, 0, 0, 0)}, got


def test_q_period_balance_hand_computed(spark, tmp_path):
    """User 1 posts 10.0 then 3.5 in week 0 (balance = 3.5, the LAST
    reading — a plain sum would say 13.5); user 2 posts 2.0 in week 0
    and 7.0 in week 1. Tie on ts broken by event_id desc."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.balance import q_period_balance

    t0 = dt.datetime(1992, 1, 1)

    rows = [
        (0, t0, 1, "bal", 10.0, "{}"),
        (1, t0 + dt.timedelta(days=1), 1, "bal", 3.5, "{}"),
        (2, t0, 2, "bal", 2.0, "{}"),
        (3, t0 + dt.timedelta(days=8), 2, "bal", 7.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r["week"]: (
            r["n_accounts"], r["total_balance"],
            r["min_balance"], r["max_balance"],
        )
        for r in q_period_balance(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (2, 5.5, 2.0, 3.5),
        1: (1, 7.0, 7.0, 7.0),
    }, got


def test_sample_weighted_gate_and_weights(spark, tmp_path):
    """The gate mirrors hashlib exactly: a doc is kept iff
    md5-hexint('wsamp:'||id) % CAP < min(n_chars, CAP); kept docs carry
    CAP/min(n_chars, CAP) as the HT weight (1.0 once saturated)."""
    import hashlib

    from etl_pipeline_example_spark.operators.wsample import (
        WSAMPLE_CAP,
        sample_weighted,
    )

    rows = [(i, "x" * ln, "en", "s") for i, ln in [
        (1, 10), (2, 500), (3, 1000), (4, 2500), (5, 40),
    ]]
    sf = _write_docs(spark, tmp_path, rows)

    def gate(doc_id, n):
        h = int(hashlib.md5(f"wsamp:{doc_id}".encode()).hexdigest()[:15], 16)
        return h % WSAMPLE_CAP < min(n, WSAMPLE_CAP)

    expected = {
        i: WSAMPLE_CAP / min(ln, WSAMPLE_CAP)
        for i, ln in [(1, 10), (2, 500), (3, 1000), (4, 2500), (5, 40)]
        if gate(i, ln)
    }
    got = {
        r["doc_id"]: r["ht_weight"]
        for r in sample_weighted(spark, sf).collect()
    }
    assert got == expected, (got, expected)
    assert all(w == 1.0 for i, w in got.items() if i in (3, 4))


def test_q_dim_lift_hand_computed(spark, tmp_path):
    """2x2 lattice: brand A sells 3 lines into nation X and 1 into Y;
    brand B sells 1 into X. Lifts recomputed by hand: e.g.
    lift(A,X) = 3*5 / (4*4)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.dimlift import q_dim_lift

    spark.createDataFrame(
        [(1, "A"), (2, "B")], "p_partkey bigint, p_brand string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    spark.createDataFrame(
        [(1, 0, "X"), (2, 0, "Y")],
        "n_nationkey bigint, n_regionkey bigint, n_name string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")
    spark.createDataFrame(
        [(1, 1), (2, 2)], "c_custkey bigint, c_nationkey bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    d0 = dt.datetime(1995, 1, 1)
    spark.createDataFrame(
        [(1, 1, "O", 1.0, d0, "p"), (2, 2, "O", 1.0, d0, "p")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    # lineitem: (orderkey, partkey) — order 1 is nation X, order 2 is Y
    li = [(1, 1), (1, 1), (1, 1), (1, 2), (2, 1)]
    spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0) for o, p in li],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    got = {
        (r["p_brand"], r["nation"]): (r["cell_cnt"], r["lift"])
        for r in q_dim_lift(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("A", "X"): (3, 3 * 5 / (4 * 4)),
        ("A", "Y"): (1, 1 * 5 / (4 * 1)),
        ("B", "X"): (1, 1 * 5 / (1 * 4)),
    }, got


def test_q_attribution_hand_computed(spark, tmp_path):
    """User 1: view -> click -> purchase in one session (first=view,
    last=click); then after a 2h gap a lone purchase (both (direct)).
    User 2: click -> purchase (first=click, last=click)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.attribution import q_attribution

    t0 = dt.datetime(2024, 1, 1, 9, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (0, m(0), 1, "view", 1.0, "{}"),
        (1, m(5), 1, "click", 1.0, "{}"),
        (2, m(10), 1, "purchase", 1.0, "{}"),
        (3, m(10 + 120), 1, "purchase", 1.0, "{}"),  # opens its own session
        (4, m(0), 2, "click", 1.0, "{}"),
        (5, m(3), 2, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    got = {
        r["touch_type"]: (r["n_first_touch"], r["n_last_touch"])
        for r in q_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {
        "(direct)": (1, 1),
        "view": (1, 0),
        "click": (1, 2),
    }, got
