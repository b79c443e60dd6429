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
