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
