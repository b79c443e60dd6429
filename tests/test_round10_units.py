"""Hand-computed unit tests for the round-10 operators: CDC merge,
partial-aggregate state merge, order-gap histogram, YoY growth."""

from __future__ import annotations

import datetime as dt


def _write_orders(spark, tmp_path, rows):
    """rows: (o_orderkey, o_custkey, status, totalprice, date, priority)."""
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )


def _write_lineitem(spark, tmp_path, rows):
    """rows: (l_orderkey, l_linenumber, l_quantity, l_extendedprice,
    l_returnflag, l_linestatus)."""
    full = [
        (k, 1, 1, ln, q, p, 0.0, 0.0, rf, ls, dt.datetime(1995, 1, 1))
        for k, ln, q, p, rf, ls in rows
    ]
    df = spark.createDataFrame(
        full,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )


def test_cdc_apply_hand_computed(spark, tmp_path):
    """Latest-wins over a keyed change log: key 1 deleted (latest op R),
    key 2 updated, key 3 inserted (absent from base), a delete on
    absent key 6 is a no-op, keys 4/5 kept untouched."""
    from etl_pipeline_example_spark.plans.cdc import cdc_apply

    d = dt.datetime(1995, 6, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 10, "O", 100.0, d, "1-URGENT"),
            (2, 10, "O", 100.0, d, "2-HIGH"),
            (3, 10, "O", 100.0, d, "3-MEDIUM"),  # % 3 == 0: not in base
            (4, 10, "F", 100.0, d, "4-LOW"),
            (5, 10, "P", 100.0, d, "5-LOW"),
            (6, 10, "O", 100.0, d, "3-MEDIUM"),  # % 3 == 0: not in base
        ],
    )
    _write_lineitem(
        spark,
        tmp_path,
        [
            (1, 1, 1.0, 10.0, "N", "O"),
            (1, 2, 1.0, 10.0, "R", "F"),  # latest for key 1 → delete
            (2, 1, 1.0, 10.0, "N", "F"),  # update key 2 → status F
            (3, 1, 1.0, 10.0, "A", "O"),  # insert key 3 → status O
            (6, 1, 1.0, 10.0, "R", "F"),  # delete absent key → no-op
        ],
    )
    got = [
        (r["o_orderkey"], r["status"], r["priority"], r["action"])
        for r in cdc_apply(spark, str(tmp_path)).collect()
    ]
    assert got == [
        (2, "F", "2-HIGH", "updated"),
        (3, "O", "NEW", "inserted"),
        (4, "F", "4-LOW", "kept"),
        (5, "P", "5-LOW", "kept"),
    ], got


def test_agg_merge_states_hand_computed(spark, tmp_path):
    """Quantities 1+2+3 across two ingestion batches (keys 1 and 4 →
    batches 1 and 0) merge to the direct aggregate: n=3, sum=6,
    min/max price, avg=2."""
    from etl_pipeline_example_spark.plans.partialagg import agg_merge_states

    _write_lineitem(
        spark,
        tmp_path,
        [
            (1, 1, 1.0, 10.0, "N", "O"),
            (1, 2, 2.0, 30.0, "N", "O"),
            (4, 1, 3.0, 20.0, "N", "O"),
            (4, 2, 5.0, 40.0, "R", "F"),
        ],
    )
    got = [
        (
            r["l_returnflag"],
            r["l_linestatus"],
            r["n_rows"],
            r["sum_qty"],
            r["min_price"],
            r["max_price"],
            r["avg_qty"],
        )
        for r in agg_merge_states(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("N", "O", 3, 6.0, 10.0, 30.0, 2.0),
        ("R", "F", 1, 5.0, 40.0, 40.0, 5.0),
    ], got


def test_q_order_gap_dist_hand_computed(spark, tmp_path):
    """One customer, orders at d, d (same day), d+5, d+40: gaps 0 / 5 /
    35 land in a_same_day / b_week / d_quarter."""
    from etl_pipeline_example_spark.plans.ordergap import q_order_gap_dist

    d = dt.datetime(1995, 6, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 7, "O", 1.0, d, "1-URGENT"),
            (2, 7, "O", 1.0, d, "1-URGENT"),
            (3, 7, "O", 1.0, d + dt.timedelta(days=5), "1-URGENT"),
            (4, 7, "O", 1.0, d + dt.timedelta(days=40), "1-URGENT"),
        ],
    )
    got = {
        r["gap_bucket"]: (r["n_gaps"], r["n_customers"])
        for r in q_order_gap_dist(spark, str(tmp_path)).collect()
    }
    assert got == {
        "a_same_day": (1, 1),
        "b_week": (1, 1),
        "d_quarter": (1, 1),
    }, got


def test_q_yoy_growth_hand_computed(spark, tmp_path):
    """One nation, 10.0 in 1995 and 25.0 in 1996: delta 15, ratio 2.5;
    the first year reports NULL comparisons."""
    from etl_pipeline_example_spark.plans.yoy import q_yoy_growth

    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, "O", 10.0, dt.datetime(1995, 3, 1), "1-URGENT"),
            (2, 1, "O", 25.0, dt.datetime(1996, 7, 1), "1-URGENT"),
        ],
    )
    cust = spark.createDataFrame(
        [(1, "c1", 0, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    cust.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    nat = spark.createDataFrame(
        [(0, "ALGERIA", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    nat.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/nation.parquet"
    )
    got = [
        (
            r["n_name"],
            r["order_year"],
            r["revenue"],
            r["prev_revenue"],
            r["yoy_delta"],
            r["yoy_ratio"],
        )
        for r in q_yoy_growth(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("ALGERIA", 1995, 10.0, None, None, None),
        ("ALGERIA", 1996, 25.0, 10.0, 15.0, 2.5),
    ], got


def test_q_skyline_2d_hand_computed(spark, tmp_path):
    """One brand, sizes/prices: (10, 50), (8, 60), (6, 55), (4, 70).
    Frontier: 10 (largest size), 8 (60 > 50), 4 (70 > 60); 6 is
    dominated by size 8 at price 60."""
    from etl_pipeline_example_spark.plans.skyline import q_skyline_2d

    df = spark.createDataFrame(
        [
            (1, "pa", "Brand#1", "t", 10, 50.0),
            (2, "pb", "Brand#1", "t", 8, 60.0),
            (3, "pc", "Brand#1", "t", 6, 55.0),
            (4, "pd", "Brand#1", "t", 4, 70.0),
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    got = [
        (r["p_brand"], r["p_size"], r["best_price"], r["n_parts"])
        for r in q_skyline_2d(spark, str(tmp_path)).collect()
    ]
    assert got == [
        ("Brand#1", 4, 70.0, 1),
        ("Brand#1", 8, 60.0, 1),
        ("Brand#1", 10, 50.0, 1),
    ], got


def test_q_mode_per_group_hand_computed(spark, tmp_path):
    """One month with a 2-2 tie (1-URGENT vs 2-HIGH): the
    lexicographically smaller priority wins deterministically."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.modeagg import q_mode_per_group

    d = dt.datetime(1995, 6, 10)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, "O", 1.0, d, "2-HIGH"),
            (2, 1, "O", 1.0, d, "2-HIGH"),
            (3, 1, "O", 1.0, d, "1-URGENT"),
            (4, 1, "O", 1.0, d, "1-URGENT"),
            (5, 1, "O", 1.0, d, "3-MEDIUM"),
        ],
    )
    got = [
        (
            str(r["order_month"]),
            r["mode_priority"],
            r["n_mode"],
            r["n_month"],
            r["mode_share"],
        )
        for r in q_mode_per_group(spark, str(tmp_path)).collect()
    ]
    assert got == [("1995-06-01", "1-URGENT", 2, 5, 0.4)], got


def test_q_behavior_segments_hand_computed(spark, tmp_path):
    """User 1 views+purchases in week A and only views in week B; user
    2 clicks in week A: cells V-P, V--, -C- with share 1/3 each."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.segments import q_behavior_segments

    wk_a = dt.datetime(2024, 1, 1, 10)  # Monday
    wk_b = dt.datetime(2024, 1, 8, 10)  # next Monday
    rows = [
        (1, wk_a, 1, "view", 1.0, "{}"),
        (2, wk_a + dt.timedelta(hours=1), 1, "purchase", 1.0, "{}"),
        (3, wk_b, 1, "view", 1.0, "{}"),
        (4, wk_a, 2, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        r["segment"]: (r["n_user_weeks"], r["share"])
        for r in q_behavior_segments(spark, str(tmp_path)).collect()
    }
    third = 1.0 / 3.0
    assert got == {
        "V-P": (1, third),
        "V--": (1, third),
        "-C-": (1, third),
    }, got


def test_dedup_survivor_policy_hand_computed(spark, tmp_path):
    """Duplicate content across src12 (tier 2) and src3 (tier 0): the
    tier-0 copy survives; a singleton stays a singleton; tier ties
    break on doc_id."""
    from etl_pipeline_example_spark.operators.survivor import (
        dedup_survivor_policy,
    )

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [
            (1, "same text", "en", "src12"),
            (2, "same text", "en", "src3"),
            (3, "same text", "en", "src7"),
            (4, "unique", "en", "src0"),
        ],
    )
    got = {
        r["doc_id"]: (
            r["survivor_doc_id"],
            r["action"],
            r["source_tier"],
            r["cluster_size"],
        )
        for r in dedup_survivor_policy(spark, sf).collect()
    }
    assert got == {
        1: (2, "duplicate", 2, 3),
        2: (2, "survivor", 0, 3),
        3: (2, "duplicate", 1, 3),
        4: (4, "singleton", 0, 1),
    }, got


def _write_docs_survivor(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    return str(tmp_path)


def test_lang_confusion_hand_computed(spark, tmp_path):
    """Two docs labeled en: one hits English stopwords (pred en), one is
    gibberish (pred und) — the confusion matrix splits en 50/50."""
    from etl_pipeline_example_spark.operators.langeval import lang_confusion

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [
            (1, "the cat and the dog", "en", "src0"),
            (2, "zzz qqq xxx", "en", "src0"),
        ],
    )
    got = {
        (r["lang_true"], r["pred_lang"]): (r["n_docs"], r["share_of_true"])
        for r in lang_confusion(spark, sf).collect()
    }
    assert got == {
        ("en", "en"): (1, 0.5),
        ("en", "und"): (1, 0.5),
    }, got


def test_ngram_lang_profile_hand_computed(spark, tmp_path):
    """'aaab' + 'aaaa' in en: trigram aaa occurs 3x, aab once; a 2-char
    doc contributes nothing."""
    from etl_pipeline_example_spark.operators.chartrigram import (
        ngram_lang_profile,
    )

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [
            (1, "aaab", "en", "src0"),
            (2, "aaaa", "en", "src0"),
            (3, "ab", "en", "src0"),
        ],
    )
    got = [
        (r["lang"], r["trigram"], r["n_occ"], r["rnk"], r["occ_share"])
        for r in ngram_lang_profile(spark, sf).collect()
    ]
    assert got == [
        ("en", "aaa", 3, 1, 0.75),
        ("en", "aab", 1, 2, 0.25),
    ], got


def test_stream_topk_hand_computed(spark, tmp_path):
    """One hour, counts view=3 / click=2 / error=2 / signup=1: top-3 is
    view, then the tie at 2 breaks alphabetically (click before error);
    signup falls off."""
    import datetime as dt

    from etl_pipeline_example_spark.streaming.topk import stream_topk

    t0 = dt.datetime(2024, 3, 1, 9, 5)
    rows = []
    for i, et in enumerate(
        ["view", "view", "view", "click", "click", "error", "error", "signup"]
    ):
        rows.append((i, t0 + dt.timedelta(minutes=i), 1, et, 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    # the file-source stream globs for a FILE named events.parquet
    import glob as _glob
    import shutil

    staging = tmp_path / "staging"
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{staging}/events.parquet"
    )
    part = _glob.glob(f"{staging}/events.parquet/part-*.parquet")[0]
    shutil.copy(part, corpus / "events.parquet")
    got = [
        (r["event_type"], r["n_events"], r["rnk"])
        for r in stream_topk(spark, str(corpus)).collect()
    ]
    assert got == [("view", 3, 1), ("click", 2, 2), ("error", 2, 3)], got


def test_dq_freshness_hand_computed(spark, tmp_path):
    """events max = corpus clock (lag 0); orders 24h behind; a 40-day-old
    event falls outside its table's own trailing-30d window."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.freshness import dq_freshness

    mx = dt.datetime(2024, 1, 10, 12)
    ev = [
        (1, mx - dt.timedelta(days=40), 1, "view", 1.0, "{}"),
        (2, mx - dt.timedelta(days=1), 1, "view", 1.0, "{}"),
        (3, mx, 1, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        ev,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    _write_orders(
        spark,
        tmp_path,
        [(1, 1, "O", 5.0, mx - dt.timedelta(hours=24), "1-URGENT")],
    )
    _write_lineitem_shipdate(
        spark, tmp_path, [mx - dt.timedelta(hours=1), mx - dt.timedelta(days=2)]
    )
    got = {
        r["table_name"]: (r["n_rows"], r["n_last_30d"], r["lag_hours"])
        for r in dq_freshness(spark, str(tmp_path)).collect()
    }
    assert got == {
        "events": (3, 2, 0),
        "orders": (1, 1, 24),
        "lineitem": (2, 2, 1),
    }, got


def _write_lineitem_shipdate(spark, tmp_path, dates):
    rows = [
        (i, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d)
        for i, d in enumerate(dates)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )


def test_q_decile_lift_hand_computed(spark, tmp_path):
    """Ten customers spending 1..10: interpolated cuts 1.9, 2.8, … put
    exactly one customer per decile; shares are i/55."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.decile import q_decile_lift

    d = dt.datetime(1995, 6, 1)
    _write_orders(
        spark,
        tmp_path,
        [(i, i, "O", float(i), d, "1-URGENT") for i in range(1, 11)],
    )
    got = [
        (r["decile"], r["n_customers"], r["decile_rev"], r["rev_share"])
        for r in q_decile_lift(spark, str(tmp_path)).collect()
    ]
    assert got == [(i, 1, float(i), i / 55.0) for i in range(1, 11)], got


def test_q_active_streak_hand_computed(spark, tmp_path):
    """User 1: days {1,2,3} then {10,11} → longest 3; user 2: one day →
    longest 1. Histogram {3: 1 user, 1: 1 user}, shares 0.5 each."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.streaks import q_active_streak

    d0 = dt.datetime(2024, 1, 1, 8)
    rows = []
    for i, off in enumerate([0, 1, 2, 9, 10]):
        rows.append((i, d0 + dt.timedelta(days=off), 1, "view", 1.0, "{}"))
    # a second event on an already-active day must not break the streak
    rows.append((90, d0 + dt.timedelta(days=1, hours=3), 1, "click", 1.0, "{}"))
    rows.append((91, d0 + dt.timedelta(days=4), 2, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["streak_days"]: (r["n_users"], r["user_share"])
        for r in q_active_streak(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 0.5), 3: (1, 0.5)}, got


def test_q_distinct_cube_hand_computed(spark, tmp_path):
    """User 1 views in Jan and Feb, user 2 clicks in Jan: the month
    rollup must count user 1 ONCE (distinct doesn't fold), the grand
    total is 2 users / 3 events."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.distinctcube import q_distinct_cube

    rows = [
        (1, dt.datetime(2024, 1, 5), 1, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 2, 5), 1, "view", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 6), 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["event_type"], str(r["event_month"]), r["gid"]): (
            r["n_users"],
            r["n_events"],
        )
        for r in q_distinct_cube(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "2024-01-01", 0): (1, 1),
        ("view", "2024-02-01", 0): (1, 1),
        ("click", "2024-01-01", 0): (1, 1),
        ("view", "None", 1): (1, 2),  # distinct across months: user 1 once
        ("click", "None", 1): (1, 1),
        (None, "2024-01-01", 2): (2, 2),
        (None, "2024-02-01", 2): (1, 1),
        (None, "None", 3): (2, 3),
    }, got


def test_bpe_fertility_consistency(spark, tmp_path):
    """The per-source rollup must equal a direct groupBy over
    bpe_encode's own output joined to the documents table — pins the
    composition wiring (join key, sums, ratio definitions)."""
    from etl_pipeline_example_spark.operators.bpe import bpe_encode
    from etl_pipeline_example_spark.operators.fertility import bpe_fertility

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [
            (1, "the cat sat on the mat", "en", "sA"),
            (2, "the cat ran", "en", "sA"),
            (3, "der hund und der ball", "de", "sB"),
        ],
    )
    enc = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"]) for r in bpe_encode(spark, sf).collect()}
    docs = {1: ("sA", 22), 2: ("sA", 11), 3: ("sB", 21)}
    want = {}
    for did, (src, nch) in docs.items():
        w, t = enc[did]
        d = want.setdefault(src, [0, 0, 0, 0])
        d[0] += 1
        d[1] += w
        d[2] += t
        d[3] += nch
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_words"],
            r["n_bpe_tokens"],
            r["tokens_per_word"],
            r["chars_per_token"],
        )
        for r in bpe_fertility(spark, sf).collect()
    }
    for src, (nd, nw, nt, nch) in want.items():
        assert got[src] == (nd, nw, nt, nt / nw, nch / nt), (src, got[src])


def test_q_group_percentiles_hand_computed(spark, tmp_path):
    """One segment with customer revenues 10/20/30: p50 = 20, p90 = 28,
    p99 = 29.8 (interpolated)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.grouppct import q_group_percentiles

    d = dt.datetime(1995, 6, 1)
    _write_orders(
        spark,
        tmp_path,
        [
            (1, 1, "O", 10.0, d, "1-URGENT"),
            (2, 2, "O", 20.0, d, "1-URGENT"),
            (3, 3, "O", 30.0, d, "1-URGENT"),
        ],
    )
    spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "BUILDING") for i in (1, 2, 3)],
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/customer.parquet"
    )
    r = q_group_percentiles(spark, str(tmp_path)).collect()
    assert len(r) == 1
    row = r[0]
    assert (
        row["c_mktsegment"],
        row["n_customers"],
        row["p50_rev"],
        row["p90_rev"],
    ) == ("BUILDING", 3, 20.0, 28.0), r
    assert abs(row["p99_rev"] - 29.8) < 1e-9, r


def test_q_numeric_corr_hand_computed(spark, tmp_path):
    """quantity and extendedprice perfectly correlated (price = 10×qty)
    → r = 1; a constant column yields NULL/NaN denominators, excluded
    here by using varying tax anti-correlated with qty → r = -1."""
    from etl_pipeline_example_spark.plans.numcorr import q_numeric_corr

    _write_lineitem_corr(
        spark,
        tmp_path,
        [
            (1.0, 10.0, 0.01, 0.03),
            (2.0, 20.0, 0.02, 0.02),
            (3.0, 30.0, 0.03, 0.01),
        ],
    )
    got = {
        (r["col_a"], r["col_b"]): r["r"]
        for r in q_numeric_corr(spark, str(tmp_path)).collect()
    }
    assert abs(got[("l_quantity", "l_extendedprice")] - 1.0) < 1e-12, got
    assert abs(got[("l_quantity", "l_discount")] - 1.0) < 1e-12, got
    assert abs(got[("l_quantity", "l_tax")] + 1.0) < 1e-12, got
    assert len(got) == 6, got


def _write_lineitem_corr(spark, tmp_path, rows):
    import datetime as dt

    full = [
        (i, 1, 1, 1, q, p, d, t, "N", "O", dt.datetime(1995, 1, 1))
        for i, (q, p, d, t) in enumerate(rows)
    ]
    spark.createDataFrame(
        full,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )


def test_q_event_transitions_hand_computed(spark, tmp_path):
    """User 1: view→click→view, user 2: click→view. Matrix:
    view→click 1 (p=1.0), click→view 2 (p=1.0)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.transitions import (
        q_event_transitions,
    )

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "view", 1.0, "{}"),
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        (r["ev_from"], r["ev_to"]): (r["n_trans"], r["p_next"])
        for r in q_event_transitions(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("view", "click"): (1, 1.0),
        ("click", "view"): (2, 1.0),
    }, got


def test_multimodal_phash_hand_computed(spark, tmp_path):
    """doc 0 is an 8×8 image with gray = 3(3x+7y)+33 (no mod wrap):
    threshold 64g > 8832 sets exactly the 31 bits with 3x+7y >= 36 —
    lo = bits {29,30,31}, hi = the derived 28-bit pattern. Odd doc ids
    (audio) are skipped."""
    from etl_pipeline_example_spark.operators.phash import multimodal_phash

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [(0, "img doc", "en", "sA"), (1, "wav doc", "en", "sA")],
    )
    got = [
        (r["doc_id"], r["n_ones"], r["hash_lo"], r["hash_hi"])
        for r in multimodal_phash(spark, sf).collect()
    ]
    assert got == [(0, 31, 3758096384, 4294967032)], got


def test_multimodal_phash_dups_hand_computed(spark, tmp_path):
    """Docs 0 and 24 share (8,8) dims and a constant gray shift with no
    mod-256 wrap, so their aHashes are identical → one pair at Hamming
    0. The odd doc (audio) never appears."""
    from etl_pipeline_example_spark.operators.phashdup import (
        multimodal_phash_dups,
    )

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [(0, "a", "en", "sA"), (24, "b", "en", "sA"), (1, "c", "en", "sA")],
    )
    got = [
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal_phash_dups(spark, sf).collect()
    ]
    assert got == [(0, 24, 0)], got


def test_q_group_regression_hand_computed(spark, tmp_path):
    """One brand, (discount, qty) = (0.0,1), (0.1,2), (0.2,3): the OLS
    line is qty = 1 + 10·discount."""
    from etl_pipeline_example_spark.plans.groupreg import q_group_regression

    _write_lineitem_corr(
        spark,
        tmp_path,
        [
            (1.0, 9.0, 0.0, 0.0),
            (2.0, 9.0, 0.1, 0.0),
            (3.0, 9.0, 0.2, 0.0),
        ],
    )
    spark.createDataFrame(
        [(1, "p", "Brand#1", "t", 5, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    r = q_group_regression(spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0]["n_rows"] == 3, r
    assert abs(r[0]["slope"] - 10.0) < 1e-9, r
    assert abs(r[0]["intercept"] - 1.0) < 1e-9, r


def test_vocab_growth_hand_computed(spark, tmp_path):
    """Docs 1..5 ('a', 'a b', 'a', 'c', 'd e'): cutoffs 1/2/3/4/5 give
    distinct-word counts 1/2/2/3/5."""
    from etl_pipeline_example_spark.operators.vocabgrowth import vocab_growth

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [
            (1, "a", "en", "sA"),
            (2, "a b", "en", "sA"),
            (3, "a", "en", "sA"),
            (4, "c", "en", "sA"),
            (5, "d e", "en", "sA"),
        ],
    )
    got = [
        (r["pct"], r["cutoff_doc"], r["n_docs"], r["distinct_words"])
        for r in vocab_growth(spark, sf).collect()
    ]
    assert got == [
        (20, 1, 1, 1),
        (40, 2, 2, 2),
        (60, 3, 3, 2),
        (80, 4, 4, 3),
        (100, 5, 5, 5),
    ], got


def test_multimodal_resize_hand_computed(spark, tmp_path):
    """doc 0 (8×8, gray = 9x + 21y + 33 per pixel): each 2×2 block sums
    to 72·bx + 168·by + 192 with 4 pixels; audio doc skipped."""
    from etl_pipeline_example_spark.operators.mediaresize import (
        multimodal_resize,
    )

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [(0, "img", "en", "sA"), (1, "wav", "en", "sA")],
    )
    got = {
        (r["by"], r["bx"]): (r["n_px"], r["sum_px"])
        for r in multimodal_resize(spark, sf).collect()
    }
    want = {
        (by, bx): (4, 72 * bx + 168 * by + 192)
        for by in range(4)
        for bx in range(4)
    }
    assert got == want, got


def test_multimodal_audio_energy_matches_planted_formula(spark, tmp_path):
    """The operator measures through encode→decode; the expectation is
    computed straight from the planted-sample formula (no bytes) — a
    match certifies the PCM byte loop is lossless and the segment
    lattice is the numpy one. Image doc skipped."""
    import numpy as np

    from etl_pipeline_example_spark.operators.audiofeat import (
        SEGS,
        multimodal_audio_energy,
    )
    from etl_pipeline_example_spark.operators.mediapixels import (
        planted_samples,
    )

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [(1, "wav", "en", "sA"), (2, "img", "en", "sA")],
    )
    smp = planted_samples(1).astype(np.int64)
    n = smp.shape[0]
    cuts = [(k * n) // SEGS for k in range(SEGS + 1)]
    want = {}
    for seg in range(SEGS):
        b = smp[cuts[seg] : cuts[seg + 1]]
        want[seg] = (int(b.size), int((b * b).sum()), int(b.max()))
    got = {
        r["seg"]: (r["n_samples"], r["sum_sq"], r["max_amp"])
        for r in multimodal_audio_energy(spark, sf).collect()
    }
    assert got == want, (got, want)


def test_q_user_diversity_hand_computed(spark, tmp_path):
    """User 1: 2 views + 1 click + 1 purchase (n=4, ssq=6, simpson =
    1 - 6/16 = 0.625); user 2: 3 clicks only (simpson 0)."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.diversity import q_user_diversity

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0, 1, "view", 1.0, "{}"),
        (3, t0, 1, "click", 1.0, "{}"),
        (4, t0, 1, "purchase", 1.0, "{}"),
        (5, t0, 2, "click", 1.0, "{}"),
        (6, t0, 2, "click", 1.0, "{}"),
        (7, t0, 2, "click", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r["user_id"]: (r["n_events"], r["n_types"], r["simpson"])
        for r in q_user_diversity(spark, str(tmp_path)).collect()
    }
    assert got == {1: (4, 3, 0.625), 2: (3, 1, 0.0)}, got


def test_dq_volume_zscore_hand_computed(spark, tmp_path):
    """view volumes 10/10/40 across three days: mean 20, pop-var 200,
    z = (40-20)/sqrt(200) ≈ 1.414 (unflagged), the two 10-days at
    ≈ -0.707."""
    import datetime as dt
    import math

    from etl_pipeline_example_spark.plans.volumez import dq_volume_zscore

    rows = []
    eid = 0
    for day, n in [(1, 10), (2, 10), (3, 40)]:
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 1, day, 9), 1, "view", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        str(r["day"]): (r["n_events"], r["z"], r["flagged"])
        for r in dq_volume_zscore(spark, str(tmp_path)).collect()
    }
    z_hi = 20.0 / math.sqrt(200.0)
    z_lo = -10.0 / math.sqrt(200.0)
    assert got["2024-01-03"][0] == 40 and abs(got["2024-01-03"][1] - z_hi) < 1e-12
    assert got["2024-01-01"][0] == 10 and abs(got["2024-01-01"][1] - z_lo) < 1e-12
    assert all(f == 0 for _, _, f in got.values()), got


def test_q_null_safe_join_keeps_the_null_bucket(spark, tmp_path):
    """props k ∈ {7, 7, 3, 3} split across the parity feeds: k=7 maps
    to the NULL bucket, which must survive the null-safe join with
    counts 1/1 — a plain = join would drop it."""
    import datetime as dt

    from etl_pipeline_example_spark.plans.nullsafe import q_null_safe_join

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        (0, t0, 1, "view", 1.0, '{"k": 7}'),   # feed 0, NULL bucket
        (1, t0, 1, "view", 1.0, '{"k": 7}'),   # feed 1, NULL bucket
        (2, t0, 1, "view", 1.0, '{"k": 3}'),   # feed 0, bucket 3
        (3, t0, 1, "view", 1.0, '{"k": 3}'),   # feed 1, bucket 3
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = [
        (r["bucket"], r["n_feed_a"], r["n_feed_b"], r["delta"])
        for r in q_null_safe_join(spark, str(tmp_path)).collect()
    ]
    assert got == [(None, 1, 1, 0), (3, 1, 1, 0)], got


def test_text_char_simpson_hand_computed(spark, tmp_path):
    """'aaab' → counts a=3, b=1, n=4, ssq=10, simpson = 1 − 10/16 =
    0.375; 'zzzz' is a zero-diversity flood; case folds ('Ab' ≡ 'ab')."""
    from etl_pipeline_example_spark.operators.charsimpson import (
        text_char_simpson,
    )

    sf = _write_docs_survivor(
        spark,
        tmp_path,
        [
            (1, "aaab", "en", "sA"),
            (2, "zzzz", "en", "sA"),
            (3, "Ab", "en", "sA"),
        ],
    )
    got = {
        r["doc_id"]: (
            r["n_chars_counted"],
            r["n_distinct_chars"],
            r["simpson"],
        )
        for r in text_char_simpson(spark, sf).collect()
    }
    assert got == {
        1: (4, 2, 0.375),
        2: (4, 1, 0.0),
        3: (2, 2, 0.5),
    }, got
