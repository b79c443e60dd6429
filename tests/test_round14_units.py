"""Round-14 hand-computed unit tests (new/changed operators this round)."""

from __future__ import annotations

import pytest


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


def test_derived_lsh_bits_occupancy_ladder():
    """The scale-safe knn-join bit rule: smallest bits>=6 with
    64*2^bits >= N, capped at 24 — hand-pinned at the boundaries so the
    Spark ladder and the oracle's VALUES min-join can never drift."""
    from etl_pipeline_example_spark.operators.knnjoin import (
        KNN_MAX_BITS,
        KNN_TARGET_OCC,
        derived_lsh_bits,
    )

    assert (KNN_TARGET_OCC, KNN_MAX_BITS) == (64, 24)
    assert derived_lsh_bits(0) == 6
    assert derived_lsh_bits(500) == 6  # sf0.01 grading scale: unchanged
    assert derived_lsh_bits(4096) == 6  # exactly at the 6-bit cap
    assert derived_lsh_bits(4097) == 7  # first step
    assert derived_lsh_bits(20000) == 9  # the sf1 probe regime
    assert derived_lsh_bits(1 << 40) == 24  # hard cap


def test_derived_bits_matches_oracle_ladder(spark):
    """The oracle's (bits, cap) VALUES ladder IS derived_lsh_bits:
    evaluate the SQL min-join for a sweep of corpus sizes in DuckDB and
    compare against the Python rule."""
    duckdb = pytest.importorskip("duckdb")
    from etl_pipeline_example_spark.operators.knnjoin import (
        _DUCK_BITS_LADDER,
        derived_lsh_bits,
    )

    con = duckdb.connect()
    for n in [1, 63, 64, 500, 4096, 4097, 8192, 8193, 20000, 10**7, 1 << 40]:
        got = con.sql(
            f"SELECT min(t.b) FROM (VALUES {_DUCK_BITS_LADDER}) t(b, cap)"
            f" WHERE t.cap >= {n}"
        ).fetchone()[0]
        assert got == derived_lsh_bits(n), (n, got)


def test_knn_join_derived_bits_used_in_blocking(spark, tmp_path):
    """At N=5, bits floor to 6 and planted twins still rank first (the
    round-12 semantics pin, re-run against the occupancy-derived
    configuration to prove the floor regime is byte-identical)."""
    from etl_pipeline_example_spark.operators.knnjoin import ann_knn_join

    def vec(axis, eps_axis=None):
        v = [0.0] * 64
        v[axis] = 1.0
        if eps_axis is not None:
            v[eps_axis] = 0.05
        return v

    rows = [
        (1, vec(0)),
        (2, vec(0, eps_axis=1)),
        (3, vec(7)),
        (4, vec(7, eps_axis=8)),
        (5, [-x for x in vec(0)]),
    ]
    _write(
        spark,
        tmp_path,
        "embeddings",
        rows,
        "vec_id bigint, embedding array<float>",
    )
    got = ann_knn_join(spark, str(tmp_path)).collect()
    top1 = {r["vec_id"]: r["neighbor_id"] for r in got if r["rank"] == 1}
    assert top1[1] == 2 and top1[2] == 1, top1
    assert top1[3] == 4 and top1[4] == 3, top1


def _py_tokens(text):
    import re

    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if t]


def _py_perceptron(docs, rounds=3, buckets=512):
    """Pure-Python replica of the batch perceptron: docs is a list of
    (doc_id, lang, text)."""
    import hashlib

    feat = {}  # doc_id -> (y, {bucket: count})
    for doc_id, lang, text in docs:
        y = 1 if lang == "en" else -1
        counts = {}
        for t in _py_tokens(text):
            b = int(hashlib.md5(f"qt:{t}".encode()).hexdigest()[:15], 16) % buckets
            counts[b] = counts.get(b, 0) + 1
        feat[doc_id] = (y, counts)
    w = {}
    for _ in range(rounds):
        upd = {}
        for y, counts in feat.values():
            sc = sum(c * w.get(b, 0) for b, c in counts.items())
            if (y == 1) != (sc > 0):
                for b, c in counts.items():
                    upd[b] = upd.get(b, 0) + y * c
        for b, u in upd.items():
            w[b] = w.get(b, 0) + u
    return w, feat


def test_quality_trained_matches_python_perceptron(spark, tmp_path):
    """train_quality_weights IS the batch perceptron: identical weights
    and scores to an independent pure-Python implementation on a
    planted corpus with real per-language vocabulary signal."""
    from etl_pipeline_example_spark.operators.qtrain import (
        quality_trained,
        train_quality_weights,
    )

    docs = [
        (1, "en", "the quick brown fox jumps over the lazy dog"),
        (2, "en", "the cat sat on the mat with the dog"),
        (3, "en", "a quick dog and a lazy fox"),
        (4, "fr", "le chat est sur le tapis avec le chien"),
        (5, "fr", "un renard rapide et un chien paresseux"),
        (6, "de", "der schnelle fuchs springt ueber den faulen hund"),
        (7, "en", ""),  # zero-token doc: score 0, keep false
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        [(i, t, l, "s", len(t)) for i, l, t in docs],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    w_py, feat = _py_perceptron(docs)
    w_spark = train_quality_weights(spark, str(tmp_path))
    assert w_spark == {b: u for b, u in w_py.items() if u != 0} or w_spark == w_py

    got = {r["doc_id"]: r for r in quality_trained(spark, str(tmp_path)).collect()}
    assert len(got) == 7
    for doc_id, (y, counts) in feat.items():
        sc = sum(c * w_py.get(b, 0) for b, c in counts.items())
        r = got[doc_id]
        assert r["label"] == y
        assert r["score"] == sc, (doc_id, r["score"], sc)
        assert r["n_terms"] == sum(counts.values())
        assert r["keep"] == (sc > 0)
    assert got[7]["score"] == 0 and not got[7]["keep"]
    # the classifier actually LEARNED the split: training accuracy 7/7
    # (en docs kept, non-en rejected) on this separable corpus
    assert all(
        (got[i]["label"] == 1) == got[i]["keep"] for i in range(1, 7)
    ), {i: (got[i]["label"], got[i]["keep"]) for i in range(1, 7)}


def test_quality_trained_deterministic(spark):
    """Two trainings over the same corpus produce identical weights
    (integer batch updates are order-independent)."""
    from etl_pipeline_example_spark.operators.qtrain import (
        train_quality_weights,
    )

    d = "/root/testdata/sf0.001"
    assert train_quality_weights(spark, d) == train_quality_weights(spark, d)


def test_mutual_top_pairs_hand(spark, tmp_path):
    """Hand-built market: c1's top part is p1 (30 > 20) and p1's top
    customer is c1 (30 > 25) -> mutual; c2's top is p1 but p1 prefers
    c1 -> not mutual; c3/p3 exclusive pair -> mutual. Tie on spend
    resolves to the smaller key on both sides."""
    from etl_pipeline_example_spark.plans.mutualtop import (
        q_mutual_top_pairs,
    )

    # orders: one per customer
    _write(spark, tmp_path, "orders",
           [(1, 1), (2, 2), (3, 3)],
           "o_orderkey bigint, o_custkey bigint")
    # lineitem: (orderkey, partkey, price)
    _write(spark, tmp_path, "lineitem",
           [(1, 1, 30.0), (1, 2, 20.0),
            (2, 1, 25.0),
            (3, 3, 7.0)],
           "l_orderkey bigint, l_partkey bigint, l_extendedprice double")
    got = {(r["c_custkey"], r["p_partkey"]): r["pair_spend"]
           for r in q_mutual_top_pairs(spark, str(tmp_path)).collect()}
    assert got == {(1, 1): 30.0, (3, 3): 7.0}, got


def test_dq_dup_rows_hand(spark, tmp_path):
    """Planted duplicates: region has one row twice (1 dup row, 1 dup
    value) and nation is duplicate-free."""
    import shutil

    from etl_pipeline_example_spark.plans.duprows import dq_dup_rows

    # full warehouse surface: copy sf0.001 tables, then overwrite two
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        f"{tmp_path}/{t}.parquet")
    _write(spark, tmp_path, "region",
           [(1, "a"), (1, "a"), (2, "b"), (1, "x")],
           "r_regionkey bigint, r_name string")
    got = {r["tbl"]: r for r in dq_dup_rows(spark, str(tmp_path)).collect()}
    r = got["region"]
    assert (r["n_rows"], r["n_distinct"], r["n_dup_rows"],
            r["n_dup_values"]) == (4, 3, 1, 1), r
    n = got["nation"]
    assert n["n_dup_rows"] == 0 and n["n_rows"] == n["n_distinct"]
    assert len(got) == 10


def test_ann_radius_planted(spark, tmp_path):
    """Planted twin inside the radius, anti-parallel vector outside:
    radius search returns exactly the qualifying candidates, no top-k
    truncation (3 co-bucketed positives for query 0)."""
    from etl_pipeline_example_spark.operators.annradius import ann_radius

    def vec(axis, eps=0.0, eps_axis=1):
        v = [0.0] * 64
        v[axis] = 1.0
        if eps:
            v[eps_axis] = eps
        return v

    rows = [
        (0, vec(0)),
        (1, vec(0, 0.05)),      # cosine ~0.999 with q0
        (2, vec(0, 0.30)),      # cosine ~0.958
        (3, vec(0, 3.00)),      # cosine ~0.316 — still >= 0.2
        (4, [-x for x in vec(0)]),  # cosine -1: outside radius
    ]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>")
    got = ann_radius(spark, str(tmp_path)).collect()
    q0 = {r["neighbor_id"]: r["cosine"] for r in got if r["query_id"] == 0}
    # near-identical vectors share every bucket -> guaranteed in-radius;
    # id 3 (cosine ~0.32) is in-radius only if LSH co-buckets it (the
    # honest recall caveat), id 4 (anti-parallel) must never appear
    assert {1, 2} <= set(q0) <= {1, 2, 3}, q0
    assert q0[1] > q0[2] >= 0.2
    assert all(r["cosine"] >= 0.2 for r in got)
    assert all(r["neighbor_id"] != 4 for r in got if r["query_id"] == 0)


def test_events_lag_spearman_hand(spark, tmp_path):
    """14-day series: week 2 repeats week 1's counts exactly ->
    spearman = 1.0 (7 paired days, perfectly monotone ranks); a
    constant series -> NULL (zero variance)."""
    from etl_pipeline_example_spark.plans.lagspearman import (
        events_lag_spearman,
    )

    rows = []
    eid = 0
    counts = [1, 2, 3, 4, 5, 6, 7] * 2  # lag-7 pairs are identical
    for day, c in enumerate(counts, start=1):
        for _ in range(c):
            eid += 1
            rows.append((eid, f"2024-01-{day:02d} 10:00:00", "up"))
    for day in range(1, 15):  # constant 2/day
        for _ in range(2):
            eid += 1
            rows.append((eid, f"2024-01-{day:02d} 11:00:00", "flat"))
    from datetime import datetime

    _write(spark, tmp_path, "events",
           [(i, datetime.strptime(t, "%Y-%m-%d %H:%M:%S"), e)
            for i, t, e in rows],
           "event_id bigint, ts timestamp, event_type string")
    got = {r["event_type"]: r for r in
           events_lag_spearman(spark, str(tmp_path)).collect()}
    assert got["up"]["n_days"] == 7 and got["up"]["spearman"] == 1.0
    assert got["flat"]["spearman"] is None
    assert got["up"]["lag_days"] == 7


def test_audio_clip_census_matches_planted_lattice(spark, tmp_path):
    """Per-segment peak and clip counts recomputed in numpy from the
    planted lattice equal the decode-path output exactly."""
    import numpy as np

    from etl_pipeline_example_spark.operators.audioclip import (
        CLIP_T,
        multimodal_audio_clip,
    )
    from etl_pipeline_example_spark.operators.audiofeat import SEGS
    from etl_pipeline_example_spark.operators.mediapixels import (
        planted_samples,
    )

    _write(spark, tmp_path, "documents",
           [(i,) for i in range(1, 9)], "doc_id bigint")
    got = {(r["doc_id"], r["seg"]): r for r in
           multimodal_audio_clip(spark, str(tmp_path)).collect()}
    assert {d for d, _ in got} == {1, 3, 5, 7}  # odd ids = audio
    for doc_id in (1, 3, 5, 7):
        smp = planted_samples(doc_id)
        n = smp.shape[0]
        cuts = [(k * n) // SEGS for k in range(SEGS + 1)]
        amp = np.abs(smp.astype(np.int64))
        for seg in range(SEGS):
            blk = amp[cuts[seg]:cuts[seg + 1], :]
            r = got[(doc_id, seg)]
            assert r["n_samples"] == blk.size
            assert r["peak_abs"] == int(blk.max())
            assert r["n_clipped"] == int((blk >= CLIP_T).sum())


def test_split_leakage_composition(spark):
    """The leakage grid is exactly dedup_minhash ⨝ sample_split: cell
    sums equal the pair count, and every (pair, split) attribution
    recomputes from the two registered ops."""
    from etl_pipeline_example_spark.operators.dedup import dedup_minhash
    from etl_pipeline_example_spark.operators.evaluation import sample_split
    from etl_pipeline_example_spark.operators.splitleak import split_leakage

    d = "/root/testdata/sf0.001"
    grid = {(r["split_lo"], r["split_hi"]): r
            for r in split_leakage(spark, d).collect()}
    pairs = dedup_minhash(spark, d).collect()
    splits = {r["doc_id"]: r["split"] for r in sample_split(spark, d).collect()}
    expect = {}
    for p in pairs:
        key = tuple(sorted((splits[p["doc_a"]], splits[p["doc_b"]])))
        n, mx = expect.get(key, (0, 0.0))
        expect[key] = (n + 1, max(mx, p["jaccard"]))
    assert {k: (r["n_pairs"], r["max_jaccard"]) for k, r in grid.items()} \
        == expect
    assert sum(r["n_pairs"] for r in grid.values()) == len(pairs)


def test_lang_margin_hand(spark, tmp_path):
    """Hand corpus: clear English (margin >= 2, confident), an en/fr
    tie (margin 0, pred follows langid's tie order), and an empty doc
    ('und', margin 0)."""
    from etl_pipeline_example_spark.operators.langmargin import lang_margin
    from etl_pipeline_example_spark.operators.text import text_langid

    docs = [
        (1, "the cat and the dog was in the house of it"),  # en-heavy
        (2, "le et the of"),  # s_en=2, s_fr=2 tie -> en by tie order
        (3, ""),  # und
        (4, "der und von le les des"),  # fr 3 vs de 3 tie -> fr
    ]
    _write(spark, tmp_path, "documents", docs,
           "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in lang_margin(spark, str(tmp_path)).collect()}
    assert got[1]["pred_lang"] == "en" and got[1]["margin"] >= 2 \
        and got[1]["confident"]
    assert got[2]["pred_lang"] == "en" and got[2]["margin"] == 0 \
        and not got[2]["confident"]
    assert got[3]["pred_lang"] == "und" and got[3]["best_score"] == 0
    assert got[4]["pred_lang"] == "fr" and got[4]["margin"] == 0
    # argmax agrees with the registered langid bit-for-bit
    lid = {r["doc_id"]: r["pred_lang"]
           for r in text_langid(spark, str(tmp_path)).collect()}
    assert {i: got[i]["pred_lang"] for i in got} == lid


def test_dq_distinct_census_hand(spark, tmp_path):
    """Planted cardinalities: region has 3 distinct keys over 4 rows
    and a name column with 2 distinct non-null values (NULL excluded
    from count(distinct) on both engines)."""
    import shutil

    from etl_pipeline_example_spark.plans.distinctcensus import (
        dq_distinct_census,
    )

    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        f"{tmp_path}/{t}.parquet")
    _write(spark, tmp_path, "region",
           [(1, "a"), (1, "a"), (2, None), (3, "b")],
           "r_regionkey bigint, r_name string")
    got = {r["table_col"]: r for r in
           dq_distinct_census(spark, str(tmp_path)).collect()}
    assert got["region.r_regionkey"]["n_distinct"] == 3
    assert got["region.r_regionkey"]["n_rows"] == 4
    assert got["region.r_name"]["n_distinct"] == 2  # NULL not counted
    assert len(got) == 51  # every column of every table


def test_quality_blocklist_hand(spark, tmp_path):
    """Per-occurrence category counts: doc 1 has 2 quality + 1 spam
    hits (keep=false), doc 2 is clean, doc 3 empty."""
    from etl_pipeline_example_spark.operators.blocklist import (
        quality_blocklist,
    )

    _write(spark, tmp_path, "documents",
           [(1, "the slow join is slow spam today"),
            (2, "clean fast merge"),
            (3, "")],
           "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in
           quality_blocklist(spark, str(tmp_path)).collect()}
    r1 = got[1]
    assert (r1["n_quality"], r1["n_spam"], r1["n_unsafe"]) == (2, 1, 0)
    assert r1["n_flagged"] == 3 and not r1["keep"] and r1["n_terms"] == 7
    assert got[2]["keep"] and got[2]["n_flagged"] == 0
    assert got[3]["keep"] and got[3]["n_terms"] == 0


def test_shard_balance_audit_invariants(spark):
    """The audit is exactly the sharder aggregated: loads sum to the
    corpus total, dev_x_s sums to zero, every full shard's ratio is
    near 1, and dev_x_s = S·load − T recomputes per row."""
    from etl_pipeline_example_spark.operators.shard import shard_by_tokens
    from etl_pipeline_example_spark.operators.shardbalance import (
        shard_balance_audit,
    )

    d = "/root/testdata/sf0.001"
    rows = shard_balance_audit(spark, d).collect()
    assign = shard_by_tokens(spark, d).collect()
    t = sum(r["n_tokens"] for r in assign)
    s = len(rows)
    assert sum(r["n_tokens"] for r in rows) == t
    assert sum(r["dev_x_s"] for r in rows) == 0
    for r in rows:
        assert r["dev_x_s"] == s * r["n_tokens"] - t
        assert abs(r["load_ratio"] - (s * r["n_tokens"]) / t) < 1e-12
    assert sum(r["n_docs"] for r in rows) == len(assign)


def test_stream_blocklist_quarantine_parity(spark, tmp_path):
    """Stream/batch parity: the quarantine feed equals the batch op's
    flagged set with identical category counts; clean docs never
    appear. Planted single FILE named documents.parquet (the
    pathGlobFilter contract)."""
    import shutil

    from etl_pipeline_example_spark.operators.blocklist import (
        quality_blocklist,
    )
    from etl_pipeline_example_spark.streaming.blockgate import (
        stream_blocklist_quarantine,
    )

    df = spark.createDataFrame(
        [(1, "the slow join is slow spam today", "en", "s", 1),
         (2, "clean fast merge", "en", "s", 1),
         (3, "exploit leak crash", "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    tmp = str(tmp_path / "stage")
    df.coalesce(1).write.parquet(tmp)
    import glob

    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    shutil.copyfile(part, f"{tmp_path}/documents.parquet")

    got = {r["doc_id"]: r for r in
           stream_blocklist_quarantine(spark, str(tmp_path)).collect()}
    batch = {r["doc_id"]: r for r in
             quality_blocklist(spark, str(tmp_path)).collect()
             if not r["keep"]}
    assert set(got) == set(batch) == {1, 3}
    for i in got:
        for c in ("n_quality", "n_spam", "n_unsafe", "n_flagged"):
            assert got[i][c] == batch[i][c], (i, c)
    assert got[3]["n_unsafe"] == 3


def test_events_fano_hand(spark, tmp_path):
    """Constant series -> fano 0; planted dispersed series -> exact
    hand value ((n·Σx²−T²)/((n−1)·T)); single-day series -> NULL."""
    from datetime import datetime

    from etl_pipeline_example_spark.plans.fano import events_fano

    rows = []
    eid = 0
    for day, c in enumerate([2, 2, 2, 2], start=1):  # constant
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, day, 9), "flat"))
    for day, c in enumerate([1, 5, 1, 5], start=1):  # bursty
        for _ in range(c):
            eid += 1
            rows.append((eid, datetime(2024, 1, day, 9), "burst"))
    eid += 1
    rows.append((eid, datetime(2024, 1, 1, 9), "once"))  # n_days=1
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, ts timestamp, event_type string")
    got = {r["event_type"]: r for r in
           events_fano(spark, str(tmp_path)).collect()}
    assert got["flat"]["fano"] == 0.0
    # burst: n=4, T=12, Σx²=52 -> (4·52−144)/(3·12) = 64/36
    assert abs(got["burst"]["fano"] - 64 / 36) < 1e-12
    assert got["once"]["fano"] is None


def test_table_checksum_parts_localizes_divergence(spark, tmp_path):
    """Two warehouses differing in exactly one order row: the grids
    agree everywhere except that order's month, and per-month sums
    recompute from the hash construct."""
    import hashlib
    import shutil
    from datetime import date

    from etl_pipeline_example_spark.plans.partchecksum import (
        table_checksum_parts,
    )

    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"]:
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        f"{tmp_path}/{t}.parquet")
    rows = [(1, 10, "HIGH", date(2024, 1, 5)),
            (2, 11, "LOW", date(2024, 1, 20)),
            (3, 12, "LOW", date(2024, 2, 3))]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string,"
           " o_orderdate date")
    grid = {(r["table_name"], r["part"]): r for r in
            table_checksum_parts(spark, str(tmp_path)).collect()}

    def h(k, c, p):
        return int(hashlib.md5(f"{k}|{c}|{p}".encode()).hexdigest()[:15], 16)

    assert grid[("orders", "2024-01")]["n_rows"] == 2
    assert grid[("orders", "2024-01")]["checksum"] == str(
        h(1, 10, "HIGH") + h(2, 11, "LOW"))
    assert grid[("orders", "2024-02")]["checksum"] == str(h(3, 12, "LOW"))

    # divergent copy: one row changed in Feb only
    d2 = tmp_path / "w2"
    d2.mkdir()
    for t in ["region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"]:
        shutil.copyfile(f"{tmp_path}/{t}.parquet", f"{d2}/{t}.parquet")
    rows2 = rows[:2] + [(3, 12, "HIGH", date(2024, 2, 3))]
    _write(spark, d2, "orders", rows2,
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string,"
           " o_orderdate date")
    grid2 = {(r["table_name"], r["part"]): r["checksum"] for r in
             table_checksum_parts(spark, str(d2)).collect()}
    diffs = [k for k in grid2
             if k in grid and grid2[k] != grid[k]["checksum"]]
    assert diffs == [("orders", "2024-02")], diffs


def test_graph_kcore2_peels_fringe_keeps_cycles(spark, tmp_path):
    """Planted graph: a K4 clique and a triangle both survive the
    2-core (every node on a cycle) with their exact in-core degrees;
    the pendant vertex peels away; converged true."""
    from etl_pipeline_example_spark.plans.kcore import graph_kcore2

    rows = []
    ok = 0

    def order(parts, times=2):
        nonlocal ok
        for _ in range(times):
            ok += 1
            for p in parts:
                rows.append((ok, p))

    # K4 on {1,2,3,4}: every pair co-ordered twice via pair orders
    import itertools

    for a, b in itertools.combinations([1, 2, 3, 4], 2):
        order([a, b])
    # pendant: 5 attaches to 1 only (degree 1 -> peeled round 1)
    order([1, 5])
    # triangle {6,7,8}: degree 2 each -> SURVIVES the 2-core
    for a, b in itertools.combinations([6, 7, 8], 2):
        order([a, b])
    _write(spark, tmp_path, "lineitem", rows,
           "l_orderkey bigint, l_partkey bigint")
    got = {r["node"]: r for r in graph_kcore2(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3, 4, 6, 7, 8}, got
    assert all(got[n]["core_deg"] == 3 for n in (1, 2, 3, 4))
    assert all(got[n]["core_deg"] == 2 for n in (6, 7, 8))
    assert all(r["converged"] for r in got.values())


def test_q_decile_migration_hand(spark, tmp_path):
    """Planted migrations: a churned customer (A only) lands in
    (band, 0), a new one in (0, band), a stayer on the diagonal; the
    matrix sums to the customer universe."""
    from datetime import date

    from etl_pipeline_example_spark.plans.decilemig import (
        q_decile_migration,
    )

    rows = []
    ok = 0

    def order(cust, price, d):
        nonlocal ok
        ok += 1
        rows.append((ok, cust, float(price), d))

    before, after = date(1996, 1, 1), date(1999, 1, 1)
    # five customers in both periods with increasing spend (quintiles
    # 1..5 in each period), one churned, one new
    for c in range(1, 6):
        order(c, 100 * c, before)
        order(c, 100 * c, after)
    order(6, 50, before)   # churned: band -> 0
    order(7, 999, after)   # new: 0 -> top band
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
           " o_orderdate date")
    got = {(r["q_from"], r["q_to"]): r["n_customers"]
           for r in q_decile_migration(spark, str(tmp_path)).collect()}
    # hand-computed: each period's quintile cuts interpolate over ITS
    # OWN six present customers, so the churn/new rows shift everyone
    # else's band by one — A cuts (100,200,300,400), B cuts
    # (200,300,400,500):
    #   c1 100->100: (1,1)   c2 200->200: (2,1)  c3 300->300: (3,2)
    #   c4 400->400: (4,3)   c5 500->500: (5,4)
    #   c6 churned (A-min):   (1,0)
    #   c7 new at the top:    (0,5)
    assert got == {(1, 1): 1, (2, 1): 1, (3, 2): 1, (4, 3): 1,
                   (5, 4): 1, (1, 0): 1, (0, 5): 1}, got
