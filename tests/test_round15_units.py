"""Round-15 hand-computed unit tests (new/changed operators this round)."""

from __future__ import annotations


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


def test_bm25_rank_hand_computed(spark, tmp_path):
    """Fixed-point odds-IDF BM25, hand-computed on a planted corpus.

    Candidates (N=3, L=3+4+4=11 tokens):
      d1 'red fox jumps'      (dl=3)
      d2 'red fox red fox'    (dl=4, tf('red fox')=2)
      d3 'blue whale swims deep' (dl=4)
    Query q10 (EVAL_SOURCE) 'red fox jumps' → bigrams
      'red fox'  (df=2, odds-IDF 3/5)
      'fox jumps'(df=1, odds-IDF 5/3)

    contrib = (10^6·44·L·tf·(2N−2df+1)) DIV ((20·L·tf+6·L+18·dl·N)(2df+1)):
      d1,'red fox' : 1452000000 DIV 2240 = 648214
      d1,'fox jumps': 2420000000 DIV 1344 = 1800595
      d2,'red fox' : 2904000000 DIV 3610 = 804432
    → d1 score_scaled 2448809 (2 terms, rank 1), d2 804432 (rank 2),
    d3 absent."""
    from etl_pipeline_example_spark.operators.bm25 import bm25_rank

    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, "red fox jumps", "en", "srcA", 13),
            (2, "red fox red fox", "en", "srcA", 15),
            (3, "blue whale swims deep", "en", "srcA", 21),
            (10, "red fox jumps", "en", "src0", 13),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = bm25_rank(spark, str(tmp_path)).collect()
    rows = [
        (r["query_id"], r["doc_id"], r["n_terms"], r["score"], r["rank"])
        for r in got
    ]
    assert rows == [
        (10, 1, 2, 2448809 / 1_000_000, 1),
        (10, 2, 1, 804432 / 1_000_000, 2),
    ], rows


def test_bm25_rank_deterministic_integer_tiebreak(spark, tmp_path):
    """Two identical candidate docs score the same integer; the tie
    breaks on doc_id ascending — no float-comparison ambiguity."""
    from etl_pipeline_example_spark.operators.bm25 import bm25_rank

    _write(
        spark,
        tmp_path,
        "documents",
        [
            (5, "gray wolf howls", "en", "srcA", 15),
            (4, "gray wolf howls", "en", "srcA", 15),
            (10, "gray wolf", "en", "src0", 9),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = bm25_rank(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["rank"]) for r in got] == [(4, 1), (5, 2)]
    assert got[0]["score"] == got[1]["score"]


def test_jpeg_roundtrip_coefficients_and_dc_exact_pixels():
    """Coefficient-level entropy-decode truth and DC-only pixel
    exactness, checked against the planted pattern for a spread of
    doc_ids (no Spark needed — the codec is pure)."""
    import numpy as np

    from etl_pipeline_example_spark.operators.jpegdecode import (
        _grid,
        decode_jpeg,
        encode_jpeg,
        planted_acs,
        planted_dcq,
    )

    for doc_id in (0, 3, 17, 254):
        planes, quant = decode_jpeg(encode_jpeg(doc_id))
        nbx, nby = _grid(doc_id)
        assert planes[0].shape == (nby * 8, nbx * 8)
        for by in range(nby):
            for bx in range(nbx):
                acs = planted_acs(doc_id, bx, by)
                for c in range(3):
                    zz = quant[by, bx, c]
                    assert zz[0] == planted_dcq(doc_id, bx, by, c)
                    exp = np.zeros(64, dtype=np.int32)
                    for p, v in acs:
                        exp[p] = v
                    assert (zz[1:] == exp[1:]).all()
                    if not acs:
                        blk = planes[c][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ]
                        assert (
                            blk == planted_dcq(doc_id, bx, by, c) + 128
                        ).all()


def test_jpeg_ac_block_pixels_match_numpy_idct_replay():
    """AC-bearing blocks run the full dequantize + IDCT; replay one
    independently (explicit double-loop cosine IDCT straight from the
    T.81 formula) and require identical rounded pixels."""
    import math

    import numpy as np

    from etl_pipeline_example_spark.operators.jpegdecode import (
        Q_LUMA,
        ZIGZAG,
        _grid,
        decode_jpeg,
        encode_jpeg,
        planted_acs,
    )

    doc_id = 5
    planes, quant = decode_jpeg(encode_jpeg(doc_id))
    nbx, nby = _grid(doc_id)
    checked = 0
    for by in range(nby):
        for bx in range(nbx):
            if not planted_acs(doc_id, bx, by):
                continue
            zz = quant[by, bx, 0]
            nat = np.zeros((8, 8))
            for i in range(64):
                nat[ZIGZAG[i] // 8, ZIGZAG[i] % 8] = zz[i] * Q_LUMA[i]
            ref = np.zeros((8, 8))
            for y in range(8):
                for x in range(8):
                    s = 0.0
                    for u in range(8):
                        for v in range(8):
                            cu = math.sqrt(0.5) if u == 0 else 1.0
                            cv = math.sqrt(0.5) if v == 0 else 1.0
                            s += (
                                cu * cv * nat[u, v]
                                * math.cos((2 * y + 1) * u * math.pi / 16)
                                * math.cos((2 * x + 1) * v * math.pi / 16)
                            )
                    ref[y, x] = s / 4.0
            want = np.clip(np.rint(ref + 128.0), 0, 255).astype(np.uint8)
            got = planes[0][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (got == want).all(), (bx, by)
            checked += 1
    assert checked > 0


def test_jpeg_byte_stuffing_really_exercised_and_sof2_rejected():
    """At least one synthesized doc's scan contains a stuffed FF00 and
    still decodes exactly; a progressive (SOF2) marker is rejected
    loudly instead of misdecoded."""
    import pytest

    from etl_pipeline_example_spark.operators.jpegdecode import (
        decode_jpeg,
        encode_jpeg,
    )

    stuffed_doc = next(
        d for d in range(500) if b"\xff\x00" in encode_jpeg(d)[2:-2]
    )
    planes, quant = decode_jpeg(encode_jpeg(stuffed_doc))
    assert quant.any()
    b = bytearray(encode_jpeg(3))
    i = bytes(b).index(b"\xff\xc0")
    b[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(b))


def test_sketch_cms_topk_matches_hashlib_replay(spark, tmp_path):
    """CMS estimates replayed independently in pure Python (hashlib
    md5 slots over the same 'cms<j>:<user>' keys): exact_n from the
    planted counts, cms_n = min over 4 rows of colliding mass, and the
    never-undercount contract."""
    import hashlib
    from collections import Counter
    from datetime import datetime

    from etl_pipeline_example_spark.operators.cmsketch import (
        CMS_D,
        CMS_K,
        CMS_W,
        sketch_cms_topk,
    )

    # 30 users, user u occurs (u % 7) + 1 times: known counts, forced
    # collisions at W=64 only via hash coincidence — replay decides
    occ = [(u, u % 7 + 1) for u in range(30)]
    rows = []
    eid = 0
    for u, n in occ:
        for _ in range(n):
            rows.append(
                (eid, datetime(2024, 1, 1), u, "click", 1.0, "{}")
            )
            eid += 1
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )

    def slot(j, u):
        h = hashlib.md5(f"cms{j}:{u}".encode()).hexdigest()
        return int(h[:15], 16) % CMS_W

    counters = [Counter() for _ in range(CMS_D)]
    for u, n in occ:
        for j in range(CMS_D):
            counters[j][slot(j, u)] += n
    exact = dict(occ)
    expect_cms = {
        u: min(counters[j][slot(j, u)] for j in range(CMS_D)) for u in exact
    }
    topk = sorted(exact, key=lambda u: (-exact[u], u))[:CMS_K]

    got = sketch_cms_topk(spark, str(tmp_path)).collect()
    assert [r["user_id"] for r in got] == topk
    for r in got:
        u = r["user_id"]
        assert r["exact_n"] == exact[u]
        assert r["cms_n"] == expect_cms[u], (u, r["cms_n"], expect_cms[u])
        assert r["overcount"] == expect_cms[u] - exact[u] >= 0


def test_retrieval_agreement_hand_planted(spark, tmp_path):
    """Planted corpus where the two scorers provably agree on the
    winner for one query: q10 'red fox jumps' retrieves d1 first under
    BOTH scorers (d1 shares two bigrams / the rare 5-gram is absent so
    overlap falls back to... no — overlap uses 5-token shingles, so
    docs need >= 5 shared tokens for overlap to fire). Corpus built so
    overlap and bm25 both retrieve d1 (exact 6-token copy) and bm25
    additionally retrieves d2 (partial bigram match) — n_common = 1,
    rank1_agree = true."""
    from etl_pipeline_example_spark.operators.retragree import (
        retrieval_agreement,
    )

    q = "red fox jumps over lazy dog"
    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, q, "en", "srcA", len(q)),  # exact copy: both scorers hit
            (2, "red fox something else entirely here", "en", "srcA", 30),
            (3, "blue whale swims deep tonight alone", "en", "srcA", 30),
            (10, q, "en", "src0", len(q)),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = retrieval_agreement(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["query_id"] == 10
    assert r["rank1_agree"] is True  # d1 wins under both scorers
    assert r["n_common"] >= 1
    assert r["n_bm25"] >= r["n_common"]
    assert r["n_overlap"] >= r["n_common"]


def test_dedup_editdist_hand_planted_distances(spark, tmp_path):
    """Two near-dup docs whose minhash pair survives, with a known
    prefix edit distance (one word substituted inside the first 64
    normalized chars: 'silver' vs 'golden' = 4 substitutions), and a
    verbatim pair at distance 0."""
    from etl_pipeline_example_spark.operators.editdist import (
        dedup_editdist,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the silver "
        "moon rises slowly over the quiet harbor town tonight and the "
        "fishing boats rest against the old wooden pier"
    )
    twin = base.replace("silver", "golden")
    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, base, "en", "srcA", len(base)),
            (2, twin, "en", "srcA", len(twin)),
            (3, base, "en", "srcB", len(base)),
            (4, "completely unrelated text about database engines and "
                "distributed query planning with columnar storage formats "
                "and vectorized execution pipelines everywhere", "en",
             "srcB", 100),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["prefix_dist"]
        for r in dedup_editdist(spark, str(tmp_path)).collect()
    }
    assert got.get((1, 3)) == 0, got  # verbatim copy
    # 'silver' -> 'golden': s/g, i/o, v/d, e/e(keep), r/n -> check by hand:
    # silver vs golden = substitutions at 4 positions (l<->l, e<->e match)
    import re

    def norm(t):
        return re.sub("[^a-z0-9]+", " ", t.lower()).strip()[:64]

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (ca != cb)
                )
        return d[len(b)]

    want = lev(norm(base), norm(twin))
    assert want == 4  # silver -> golden: 4 substitutions in the prefix
    assert got[(1, 2)] == want and got[(2, 3)] == want, got
    assert all(4 not in pair for pair in got), got  # unrelated doc absent


def test_basket_triples_apriori_hand_computed(spark, tmp_path):
    """Orders {1,2,3},{1,2,3},{1,2,4},{2,3,4}: L2 at min-sup 2 is
    {(1,2),(1,3),(2,3),(2,4)}; the only triple whose THREE pairs are
    all frequent AND whose own support reaches 2 is (1,2,3) — (1,2,4)
    and (2,3,4) are a-priori-pruned by their infrequent sub-pair."""
    from etl_pipeline_example_spark.plans.triples import q_basket_triples

    baskets = {10: [1, 2, 3], 11: [1, 2, 3], 12: [1, 2, 4], 13: [2, 3, 4]}
    rows = [(o, p) for o, ps in baskets.items() for p in ps]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_partkey bigint",
    )
    got = [tuple(r) for r in q_basket_triples(spark, str(tmp_path)).collect()]
    assert got == [(1, 2, 3, 2)], got


def test_stream_cms_topk_equals_batch(spark, tmp_path):
    """Stream/batch parity: the streaming sketch build (complete-mode
    bounded-state aggregation) must reproduce the batch op's rows
    exactly — a dropped microbatch or replay double-count would
    diverge."""
    import glob
    import os
    import shutil
    from datetime import datetime

    from etl_pipeline_example_spark.operators.cmsketch import (
        sketch_cms_topk,
    )
    from etl_pipeline_example_spark.streaming.cmsfeed import stream_cms_topk

    rows = []
    eid = 0
    for u in range(25):
        for _ in range(u % 5 + 1):
            rows.append((eid, datetime(2024, 1, 1), u, "click", 1.0, "{}"))
            eid += 1
    stage = f"{tmp_path}/_stage"
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    # the stream's pathGlobFilter matches a FILE named events.parquet
    shutil.copy(part, f"{tmp_path}/events.parquet")
    shutil.rmtree(stage)
    batch = [tuple(r) for r in sketch_cms_topk(spark, str(tmp_path)).collect()]
    stream = [tuple(r) for r in stream_cms_topk(spark, str(tmp_path)).collect()]
    assert stream == batch, (stream, batch)
    assert len(batch) == 10


def test_retrieval_rrf_hand_planted(spark, tmp_path):
    """Planted corpus from the agreement test: d1 tops BOTH lists
    (rrf = 1/61 + 1/61); d2 is bm25-only at some rank r (rrf =
    1/(60+r)); the fused winner is d1 with the exact double score."""
    from etl_pipeline_example_spark.operators.rrf import retrieval_rrf

    q = "red fox jumps over lazy dog"
    _write(
        spark,
        tmp_path,
        "documents",
        [
            (1, q, "en", "srcA", len(q)),
            (2, "red fox something else entirely here", "en", "srcA", 30),
            (3, "blue whale swims deep tonight alone", "en", "srcB", 30),
            (10, q, "en", "src0", len(q)),
        ],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )
    got = retrieval_rrf(spark, str(tmp_path)).collect()
    assert got[0]["query_id"] == 10 and got[0]["doc_id"] == 1
    assert got[0]["rank"] == 1
    assert got[0]["rrf"] == 1 / 61 + 1 / 61  # both lists, rank 1 each
    by_doc = {r["doc_id"]: r for r in got}
    if 2 in by_doc:  # bm25-only doc: overlap term contributes exactly 0
        r = by_doc[2]
        assert r["rank_ov"] is None
        assert r["rrf"] == 1 / (60 + r["rank_bm"])


def test_sketch_hll_registers_matches_hashlib_replay(spark, tmp_path):
    """Registers replayed independently with hashlib md5: register =
    h % 64, w = h // 64, rho = 55 - bitlen(w); max per register and
    the distinct-pattern count must match exactly."""
    import hashlib
    from datetime import datetime

    from etl_pipeline_example_spark.operators.hll import (
        HLL_P,
        HLL_Q,
        sketch_hll_registers,
    )

    users = list(range(40))
    rows = [
        (i, datetime(2024, 1, 1), u, "click", 1.0, "{}")
        for i, u in enumerate(users + users)  # duplicates: distinct first
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    m = 1 << HLL_P
    regs: dict[int, set[int]] = {}
    for u in users:
        h = int(hashlib.md5(f"hll:{u}".encode()).hexdigest()[:15], 16)
        regs.setdefault(h % m, set()).add(h // m)
    expect = {
        r: (max(HLL_Q - w.bit_length() + 1 for w in ws), len(ws))
        for r, ws in regs.items()
    }
    got = {
        r["register"]: (r["reg_val"], r["n_keys"])
        for r in sketch_hll_registers(spark, str(tmp_path)).collect()
    }
    assert got == expect, (got, expect)


def test_jpeg_dchash_matches_planted_arithmetic(spark, tmp_path):
    """DC-map aHash replayed independently from the planted DC
    formula (no decode): bits, popcount, and the packed bigint must
    match the really-decoded pipeline exactly."""
    from etl_pipeline_example_spark.operators.jpegdchash import (
        multimodal_jpeg_dchash,
    )

    doc_ids = [0, 1, 2, 7, 41]
    _write(
        spark,
        tmp_path,
        "documents",
        [(d, "x", "en", "srcA", 1) for d in doc_ids],
        "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint",
    )

    def replay(d):
        nbx, nby = 2 + d % 6, 2 + (d * 3) % 6
        dcs = [
            (d + 5 * (i % nbx) + 11 * (i // nbx)) % 256 - 128
            for i in range(nbx * nby)
        ]
        n, total = len(dcs), sum(dcs)
        bits = [v * n > total for v in dcs]
        return (
            n,
            sum(bits),
            sum(1 << i for i, b in enumerate(bits) if b),
        )

    got = {
        r["doc_id"]: (r["n_blocks"], r["n_above"], r["dc_hash"])
        for r in multimodal_jpeg_dchash(spark, str(tmp_path)).collect()
    }
    assert got == {d: replay(d) for d in doc_ids}, got


def test_stream_hll_registers_equals_batch(spark, tmp_path):
    """Stream/batch parity for the HLL registers, including duplicate
    key occurrences (the stream collapses them in-cell instead of a
    stream-wide distinct)."""
    import glob
    import shutil
    from datetime import datetime

    from etl_pipeline_example_spark.operators.hll import (
        sketch_hll_registers,
    )
    from etl_pipeline_example_spark.streaming.hllfeed import (
        stream_hll_registers,
    )

    rows = [
        (i, datetime(2024, 1, 1), u, "click", 1.0, "{}")
        for i, u in enumerate(list(range(30)) * 3)  # heavy duplication
    ]
    stage = f"{tmp_path}/_stage"
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(f"{stage}/part-*.parquet")[0]
    shutil.copy(part, f"{tmp_path}/events.parquet")
    shutil.rmtree(stage)
    batch = [
        tuple(r) for r in sketch_hll_registers(spark, str(tmp_path)).collect()
    ]
    stream = [
        tuple(r) for r in stream_hll_registers(spark, str(tmp_path)).collect()
    ]
    assert stream == batch and len(batch) > 0, (stream, batch)


def test_graph_node_jaccard_hand_computed(spark, tmp_path):
    """4-node co-purchase graph built from planted baskets: edges
    require >= 2 shared orders (the MIN_CO_ORDERS support), so plant
    each basket twice. Graph: 1-2, 1-3, 2-3, 2-4. Non-edges with
    wedges: (1,4) via midpoint 2 (cn=1, deg 2 and 1 -> 1/2) and (3,4)
    via midpoint 2 (cn=1, deg 2 and 1 -> 1/2). Tie on everything but
    (u,v): (1,4) sorts first."""
    from etl_pipeline_example_spark.plans.nodejaccard import (
        graph_node_jaccard,
    )

    baskets = [[1, 2], [1, 3], [2, 3], [2, 4]]
    rows = []
    o = 100
    for b in baskets:
        for _ in range(2):  # co-order support >= 2
            for p in b:
                rows.append((o, p))
            o += 1
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_partkey bigint",
    )
    got = [tuple(r) for r in graph_node_jaccard(spark, str(tmp_path)).collect()]
    assert got == [
        (1, 4, 1, 2, 1, 0.5),
        (3, 4, 1, 2, 1, 0.5),
    ], got
