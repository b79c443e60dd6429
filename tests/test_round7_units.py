"""Hand-verifiable unit tests for the round-7 operators.

The oracle tests prove Spark and DuckDB agree; these prove the shared
semantics are the INTENDED ones, on corpora small enough to compute the
expected output by hand.
"""

from __future__ import annotations

import hashlib


def _write_docs(spark, tmp_path, rows):
    """rows: list of (doc_id, text, lang, source). Writes the documents
    table layout the operators read."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_dedup_substring_finds_the_one_cross_doc_span(spark, tmp_path):
    """doc0/doc1 share their first 8 tokens and diverge on the 9th;
    doc2 is shorter than K. Exactly ONE shingle ('a1..a8') crosses
    docs: n_docs=2, n_occ=2. The diverging shingles are singletons and
    must not appear."""
    from etl_pipeline_example_spark.operators.spandup import dedup_substring

    base = "a1 a2 a3 a4 a5 a6 a7 a8"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, base + " x1", "en", "s"),
            (1, base + " y1", "en", "s"),
            (2, "z1 z2 z3", "en", "s"),
        ],
    )
    rows = dedup_substring(spark, sf).collect()
    assert len(rows) == 1, rows
    expect = hashlib.md5(f"span:{base}".encode()).hexdigest()
    assert rows[0]["gram_hash"] == expect
    assert rows[0]["n_docs"] == 2 and rows[0]["n_occ"] == 2


def test_substring_dup_rate_per_doc_counts(spark, tmp_path):
    """Same corpus: doc0/doc1 each have 2 shingles of which 1 is
    duplicated → rate 0.5; doc2 has none → (0, 0, 0.0)."""
    from etl_pipeline_example_spark.operators.spandup import substring_dup_rate

    base = "a1 a2 a3 a4 a5 a6 a7 a8"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, base + " x1", "en", "s"),
            (1, base + " y1", "en", "s"),
            (2, "z1 z2 z3", "en", "s"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_rate"])
        for r in substring_dup_rate(spark, sf).collect()
    }
    assert got == {0: (2, 1, 0.5), 1: (2, 1, 0.5), 2: (0, 0, 0.0)}, got


def _ql_weight(term: str) -> int:
    """The operator's hash weight, recomputed independently."""
    h = int(hashlib.md5(f"qw:{term}".encode()).hexdigest()[:15], 16)
    return h % 1001 - 500


def test_quality_linear_scores_match_recomputed_weights(spark, tmp_path):
    """Scores recomputed in pure Python from the same md5-derived
    weight table; the punctuation-only doc has zero tokens and must
    surface as (0, 0, keep=false)."""
    from etl_pipeline_example_spark.operators.qlinear import quality_linear

    texts = {0: "good clean prose here", 1: "spam spam spam", 2: "!!!"}
    sf = _write_docs(
        spark, tmp_path, [(i, t, "en", "s") for i, t in texts.items()]
    )
    got = {
        r["doc_id"]: (r["n_terms"], r["score"], r["keep"])
        for r in quality_linear(spark, sf).collect()
    }
    for i, text in texts.items():
        toks = [t for t in text.lower().split() if t.isalnum()]
        score = sum(_ql_weight(t) for t in toks)
        assert got[i] == (len(toks), score, score > 0), (i, got[i], score)


def test_sample_allocation_largest_remainder_by_hand(spark, tmp_path):
    """Three equal sources, budget 100: base 33 each (99 seats), every
    remainder ties at 1/3 → the alphabetic tie-break hands the single
    leftover seat to source 'a'. Σ alloc must be exactly the budget."""
    from etl_pipeline_example_spark.operators.allocation import (
        SAMPLE_BUDGET,
        sample_allocation,
    )

    assert SAMPLE_BUDGET == 100
    rows = []
    i = 0
    for src in ("a", "b", "c"):
        rows.append((i, f"doc {i}", "en", src))
        i += 1
    sf = _write_docs(spark, tmp_path, rows)
    got = {r["source"]: r["alloc"] for r in sample_allocation(spark, sf).collect()}
    assert got == {"a": 34, "b": 33, "c": 33}, got
    assert sum(got.values()) == SAMPLE_BUDGET


def test_sample_allocation_sums_to_budget_on_real_corpus(spark, sf_dir):
    from etl_pipeline_example_spark.operators.allocation import (
        SAMPLE_BUDGET,
        sample_allocation,
    )

    rows = sample_allocation(spark, sf_dir).collect()
    assert sum(r["alloc"] for r in rows) == SAMPLE_BUDGET
    assert all(r["alloc"] >= 0 for r in rows)


def test_text_charstats_counts_each_class(spark, tmp_path):
    """'Ab 9!' = 1 upper + 1 lower + 1 space + 1 digit + 1 other."""
    from etl_pipeline_example_spark.operators.charstats import text_charstats

    sf = _write_docs(spark, tmp_path, [(0, "Ab 9!", "en", "s")])
    r = text_charstats(spark, sf).collect()[0]
    assert (
        r["n_docs"],
        r["n_chars"],
        r["n_lower"],
        r["n_upper"],
        r["n_digit"],
        r["n_ascii_space"],
        r["n_other"],
    ) == (1, 5, 1, 1, 1, 1, 1), r


def test_retrieve_overlap_ranks_by_shared_shingles(spark, tmp_path):
    """Query 'a b c d e f' (eval source) has shingles {abcde, bcdef}.
    Candidate 20 contains both, candidate 10 only the first → 20 ranks
    1 with n_shared=2, 10 ranks 2 with n_shared=1. The unrelated
    candidate never appears."""
    from etl_pipeline_example_spark.operators.decontam import EVAL_SOURCE
    from etl_pipeline_example_spark.operators.retrieval import retrieve_overlap

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "a b c d e f", "en", EVAL_SOURCE),
            (10, "a b c d e x1", "en", "train"),
            (20, "z a b c d e f", "en", "train"),
            (30, "p q r s t u v", "en", "train"),
        ],
    )
    rows = sorted(
        retrieve_overlap(spark, sf).collect(), key=lambda r: r["rank"]
    )
    got = [(r["query_id"], r["doc_id"], r["n_shared"], r["rank"]) for r in rows]
    assert got == [(1, 20, 2, 1), (1, 10, 1, 2)], got


def test_stream_shard_feed_budget_boundaries_per_source(spark, tmp_path):
    """Four 800-token docs in one source against the 2000-token budget:
    running totals 0/800/1600/2400 put exactly one doc (the one whose
    total STARTS past the budget) in shard 1, whatever the hash order.
    A second 1-doc source must keep its own independent counter."""
    from etl_pipeline_example_spark.operators.shard import SHARD_TOKENS
    from etl_pipeline_example_spark.streaming.shardfeed import stream_shard_feed

    assert SHARD_TOKENS == 2000
    text = " ".join(["w"] * 800)
    rows = [(i, text, "en", "a") for i in range(4)]
    rows.append((100, " ".join(["w"] * 10), "en", "b"))
    # the stream source matches LEAF files named documents.parquet (the
    # testdata layout), so lay the corpus out as a single file
    import glob as _glob
    import shutil

    staging = tmp_path / "staging"
    _write_docs(spark, staging, rows)
    part = _glob.glob(f"{staging}/documents.parquet/part-*.parquet")[0]
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(part, corpus / "documents.parquet")
    sf = str(corpus)
    out = stream_shard_feed(spark, sf).collect()
    got = {}
    for r in out:
        assert r["n_tokens"] in (800, 10)
        got.setdefault(r["source"], []).append(r["shard_seq"])
    assert sorted(got["a"]) == [0, 0, 0, 1], got
    assert got["b"] == [0], got


def test_pii_by_source_ranks_planted_pii_domains(spark, tmp_path):
    """Source 'a': one of two docs carries an email and a phone → rate
    0.5; source 'b' is clean → 0.0 and sorts after."""
    from etl_pipeline_example_spark.operators.piireport import pii_by_source

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "write to bob@example.org or call 555-123-4567 now", "en", "a"),
            (1, "nothing sensitive here", "en", "a"),
            (2, "clean text", "en", "b"),
        ],
    )
    rows = pii_by_source(spark, sf).collect()
    got = [
        (
            r["source"],
            r["n_docs"],
            r["n_emails"],
            r["n_phones"],
            r["n_docs_with_pii"],
            r["pii_doc_rate"],
        )
        for r in rows
    ]
    assert got == [("a", 2, 1, 1, 1, 0.5), ("b", 1, 0, 0, 0, 0.0)], got


def test_neardup_incremental_statuses_by_hand(spark, tmp_path):
    """History doc 10 and batch doc 300 share identical text (identical
    signatures → 16/16 agreement): 300 is a near-dup of history. Batch
    docs 301/302 are identical to each other but unlike anything in
    history: the lower id stays 'new' (the keeper rule), the higher is
    a within-batch near-dup. Doc 303 is too short to shingle → 'new'."""
    from etl_pipeline_example_spark.operators.nearincremental import (
        neardup_incremental,
    )

    t_hist = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t_new = "one two three four five six seven eight nine ten"
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (10, t_hist, "en", "s"),
            (300, t_hist, "en", "s"),
            (301, t_new, "en", "s"),
            (302, t_new, "en", "s"),
            (303, "a b", "en", "s"),
        ],
    )
    got = {
        r["doc_id"]: r["status"] for r in neardup_incremental(spark, sf).collect()
    }
    assert got == {
        300: "neardup_of_history",
        301: "new",
        302: "neardup_in_batch",
        303: "new",
    }, got


def _write_embeddings(spark, tmp_path, rows):
    """rows: list of (vec_id, list[float], label)."""
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_embed_trunc_tune_monotone_with_full_dim_anchor(spark, sf_dir):
    """Recall@K can only grow as the truncation widens, and the
    full-width row is 1.0 by construction."""
    from etl_pipeline_example_spark.operators.trunctune import (
        TRUNC_DIMS,
        embed_trunc_tune,
    )

    rows = sorted(embed_trunc_tune(spark, sf_dir).collect(), key=lambda r: r["dim"])
    assert [r["dim"] for r in rows] == list(TRUNC_DIMS)
    recalls = [r["recall_at_k"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] == 1.0
    assert all(r["n_possible"] == 50 for r in rows)


def test_embed_trunc_tune_finds_prefix_informative_structure(spark, tmp_path):
    """Vectors whose FIRST dims carry ALL the angular signal (the
    Matryoshka premise): distinct angles on the unit circle in dims
    0-1, a constant shared tail elsewhere (equal norms and equal dot
    contribution for every vector, so the full-dim ranking provably
    equals the prefix ranking). Truncation to 4 dims must already rank
    perfectly — recall 1.0 at every tabulated dim."""
    import math

    from etl_pipeline_example_spark.operators.trunctune import embed_trunc_tune

    rows = []
    for i in range(40):
        theta = 0.07 * i
        vec = [math.cos(theta), math.sin(theta), 0.0, 0.0] + [0.05] * 60
        rows.append((i, [float(x) for x in vec], 0))
    sf = _write_embeddings(spark, tmp_path, rows)
    out = {r["dim"]: r["recall_at_k"] for r in embed_trunc_tune(spark, sf).collect()}
    assert all(v == 1.0 for v in out.values()), out


def test_quality_compress_contract(spark, sf_dir, tmp_path):
    """The no-oracle contract (zlib has no DuckDB twin): deterministic
    across runs, ratios in sane bounds, and a planted highly-repetitive
    doc compresses strictly better than diverse prose."""
    from etl_pipeline_example_spark.operators.compressq import quality_compress

    a = {r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio"])
         for r in quality_compress(spark, sf_dir).collect()}
    b = {r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio"])
         for r in quality_compress(spark, sf_dir).collect()}
    assert a == b  # bit-deterministic
    assert all(0 < v[2] <= 1.2 for v in a.values())

    sf = _write_docs(
        spark,
        tmp_path,
        [
            (0, "spam " * 400, "en", "s"),
            (1, " ".join(f"w{i}x{i * 7 % 113}" for i in range(400)), "en", "s"),
            (2, "", "en", "s"),
        ],
    )
    got = {r["doc_id"]: r["ratio"] for r in quality_compress(spark, sf).collect()}
    assert got[0] < got[1] / 3, got  # repetition compresses far better
    assert got[2] == 0.0  # empty doc: no compressibility to measure


def test_doc_chunk_sliding_windows_by_hand(spark, tmp_path):
    """40 tokens, window 32, stride 16 → starts 0/16/32 with lengths
    32/24/8; hashes recomputed independently in Python."""
    from etl_pipeline_example_spark.operators.sliding import (
        SLIDE_STRIDE,
        SLIDE_WINDOW,
        doc_chunk_sliding,
    )

    assert (SLIDE_WINDOW, SLIDE_STRIDE) == (32, 16)
    toks = [f"t{i}" for i in range(1, 41)]
    sf = _write_docs(spark, tmp_path, [(0, " ".join(toks), "en", "s")])
    rows = sorted(doc_chunk_sliding(spark, sf).collect(), key=lambda r: r["chunk_id"])
    got = [(r["chunk_id"], r["start_tok"], r["n_tokens"], r["chunk_hash"]) for r in rows]
    expect = []
    for i, start in enumerate([0, 16, 32]):
        window = toks[start : start + 32]
        expect.append(
            (i, start, len(window), hashlib.md5(" ".join(window).encode()).hexdigest())
        )
    assert got == expect, got


def test_shard_manifest_totals_match_assignment(spark, sf_dir):
    """The manifest is a lossless rollup: doc and token totals equal the
    assignment's, exactly one shard is flagged last, ids are dense."""
    from etl_pipeline_example_spark.operators.shard import shard_by_tokens
    from etl_pipeline_example_spark.operators.shardmanifest import shard_manifest

    assign = shard_by_tokens(spark, sf_dir).collect()
    man = sorted(shard_manifest(spark, sf_dir).collect(), key=lambda r: r["shard_id"])
    assert sum(r["n_docs"] for r in man) == len(assign)
    assert sum(r["n_tokens"] for r in man) == sum(r["n_tokens"] for r in assign)
    assert [r["shard_id"] for r in man] == list(range(len(man)))
    assert [r["is_last"] for r in man].count(True) == 1
    assert man[-1]["is_last"]


def test_stream_neardup_gate_flags_only_the_history_clone(spark, tmp_path):
    """Same corpus as the batch hand test: only doc 300 (the history
    clone) is flagged; the within-batch pair and the short doc are not
    the gate's business."""
    from etl_pipeline_example_spark.streaming.neargate import stream_neardup_gate

    import glob as _glob
    import shutil

    t_hist = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t_new = "one two three four five six seven eight nine ten"
    staging = tmp_path / "staging"
    _write_docs(
        spark,
        staging,
        [
            (10, t_hist, "en", "s"),
            (300, t_hist, "en", "s"),
            (301, t_new, "en", "s"),
            (302, t_new, "en", "s"),
            (303, "a b", "en", "s"),
        ],
    )
    part = _glob.glob(f"{staging}/documents.parquet/part-*.parquet")[0]
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    shutil.copy(part, corpus / "documents.parquet")
    got = {
        r["doc_id"]: r["near_hist"]
        for r in stream_neardup_gate(spark, str(corpus)).collect()
    }
    assert got == {300: True, 301: False, 302: False, 303: False}, got


def _write_events(spark, tmp_path, rows):
    """rows: list of (event_id, ts_str, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint,"
        " event_type string, value double, props string",
    ).withColumn("ts", __import__("pyspark").sql.functions.expr("cast(ts as timestamp)"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_pack_efficiency_by_hand(spark, tmp_path):
    """One stream (en, shard 0): docs 8 and 16 with 200+100 tokens →
    2 bins of 256, tail waste 212, and doc 16 (offset 200, 100 tokens)
    straddles the first boundary."""
    from etl_pipeline_example_spark.operators.corpus import PACK_BUDGET, PACK_SHARDS
    from etl_pipeline_example_spark.operators.packstats import pack_efficiency

    assert (PACK_BUDGET, PACK_SHARDS) == (256, 8)
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (8, " ".join(["w"] * 200), "en", "s"),
            (16, " ".join(["w"] * 100), "en", "s"),
        ],
    )
    rows = pack_efficiency(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["lang"], r["shard"], r["n_docs"], r["n_tokens"],
        r["n_bins"], r["tail_waste"], r["n_straddle"],
    ) == ("en", 0, 2, 300, 2, 212, 1), r


def test_new_vs_returning_by_hand(spark, tmp_path):
    """u1 active in both weeks, u2 only week 2: week 1 = 1 new;
    week 2 = 1 new (u2) + 1 returning (u1)."""
    from etl_pipeline_example_spark.plans.drift import q_new_vs_returning

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2026-01-05 10:00:00", 1, "view", 1.0, "{}"),
            (2, "2026-01-12 10:00:00", 1, "view", 1.0, "{}"),
            (3, "2026-01-13 10:00:00", 2, "view", 1.0, "{}"),
        ],
    )
    got = [
        (str(r["week"]), r["n_active"], r["n_new"], r["n_returning"])
        for r in q_new_vs_returning(spark, sf).collect()
    ]
    assert got == [
        ("2026-01-05", 1, 1, 0),
        ("2026-01-12", 2, 1, 1),
    ], got


def test_props_schema_drift_sees_the_weekly_key_change(spark, tmp_path):
    """Key 'a' covers 100% of week 1 but only half of week 2 (the
    producer change the weekly panel exists to expose); key 'b' appears
    only in week 2."""
    from etl_pipeline_example_spark.plans.drift import props_schema_drift

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, "2026-01-05 10:00:00", 1, "view", 1.0, '{"a": "1"}'),
            (2, "2026-01-06 10:00:00", 2, "view", 1.0, '{"a": "2"}'),
            (3, "2026-01-12 10:00:00", 1, "view", 1.0, '{"a": "3", "b": "x"}'),
            (4, "2026-01-13 10:00:00", 2, "view", 1.0, '{"b": "y"}'),
        ],
    )
    got = {
        (str(r["week"]), r["key"]): (r["n_present"], r["coverage"])
        for r in props_schema_drift(spark, sf).collect()
    }
    assert got == {
        ("2026-01-05", "a"): (2, 1.0),
        ("2026-01-12", "a"): (1, 0.5),
        ("2026-01-12", "b"): (2, 1.0),
    }, got


def test_mix_temperature_flattens_and_sums_to_budget(spark, tmp_path):
    """Source 'big' has 4x the tokens of 'small': under T=2 sampling it
    gets ~2x the slots (sqrt flattening), never 4x, and the allocation
    sums exactly to the budget. Weights recomputed independently."""
    import math

    from etl_pipeline_example_spark.operators.mixtemp import (
        MIX_BUDGET,
        MIX_SCALE,
        mix_temperature,
    )

    rows = [(0, " ".join(["w"] * 400), "en", "big"),
            (1, " ".join(["w"] * 100), "en", "small")]
    sf = _write_docs(spark, tmp_path, rows)
    got = {
        r["source"]: (r["n_tokens"], r["w_scaled"], r["alloc"])
        for r in mix_temperature(spark, sf).collect()
    }
    assert got["big"][0] == 400 and got["small"][0] == 100
    assert got["big"][1] == int(math.floor(math.sqrt(400.0) * MIX_SCALE))
    assert got["small"][1] == int(math.floor(math.sqrt(100.0) * MIX_SCALE))
    # sqrt flattening: 4x tokens -> exactly 2x weight -> 2:1 slot split
    assert got["big"][2] + got["small"][2] == MIX_BUDGET
    assert got["big"][2] in (666, 667) and got["small"][2] in (333, 334)
