"""Fast-hash (xxhash64) production mode: same plan shape and same
*structure* of results as the md5 oracle mode — only hash values differ."""

from __future__ import annotations

import pytest

from etl_pipeline_example_spark.operators import hashing


@pytest.fixture
def fast_hash():
    hashing.set_fast_hash(True)
    yield
    hashing.set_fast_hash(False)


def test_fast_hash_minhash_same_shape(spark, sf_dir, fast_hash):
    """dedup_minhash under xxhash64: runs end-to-end, emits the same
    schema, and every verified pair still meets the Jaccard threshold
    (the verify stage is hash-independent, so correctness survives the
    hash swap; only candidate generation changes)."""
    from etl_pipeline_example_spark.operators.dedup import MH_TAU, dedup_minhash

    out = dedup_minhash(spark, sf_dir)
    rows = out.collect()
    assert out.columns == ["doc_a", "doc_b", "jaccard"]
    assert rows, "fast-hash minhash found no pairs on data with known dups"
    assert all(r.jaccard >= MH_TAU for r in rows)


def test_fast_hash_minhash_pairs_match_oracle_mode(spark, sf_dir, fast_hash):
    """On this corpus the duplicate pairs are near-identical documents —
    their minhash signatures collide in every band under ANY deterministic
    hash, so the VERIFIED pair set must match the md5 mode's exactly."""
    from etl_pipeline_example_spark.operators.dedup import dedup_minhash

    fast = {(r.doc_a, r.doc_b) for r in dedup_minhash(spark, sf_dir).collect()}
    hashing.set_fast_hash(False)
    slow = {(r.doc_a, r.doc_b) for r in dedup_minhash(spark, sf_dir).collect()}
    assert fast == slow


def test_fast_hash_expressions_are_xxhash(fast_hash):
    assert "xxhash64" in hashing.spark_hexint("x")
    assert "xxhash64" in hashing.spark_h32("x", 1)
    assert "md5" in hashing.duck_hexint("x")  # oracle side never flips
    hashing.set_fast_hash(False)
    assert "md5" in hashing.spark_hexint("x")


def test_fast_hash_similarity_samplers_stay_well_formed(spark, sf_dir, fast_hash):
    """The similarity suite derives centroids/codebooks/samples from
    spark_hexint, so fast mode changes WHICH vectors seed them — but
    every structural contract must survive the hash swap: full coverage
    for k-means labels, bounded cells for 2l SemDedup, exactly K ranks
    per query for the ANN indexes."""
    from pyspark.sql import functions as F

    from etl_pipeline_example_spark.operators.similarity import (
        ANN_K,
        ANN_NUM_QUERIES,
        SEMDEDUP_OCC,
        _semdedup_2l_labeled,
        ann_ivfpq,
        ann_pq_adc,
        kmeans_assign,
    )

    km = kmeans_assign(spark, sf_dir)
    n = km.count()
    assert km.select("vec_id").distinct().count() == n  # every vector labeled once

    labeled = _semdedup_2l_labeled(spark, sf_dir)
    occ = labeled.groupBy("cluster_id").count()
    assert occ.agg(F.max("count")).collect()[0][0] <= 8 * SEMDEDUP_OCC

    for op in (ann_pq_adc, ann_ivfpq):
        rows = op(spark, sf_dir).collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rank)
        assert len(per_q) == ANN_NUM_QUERIES, op.__name__
        for q, ranks in per_q.items():
            assert sorted(ranks) == list(range(1, ANN_K + 1)), (op.__name__, q)
