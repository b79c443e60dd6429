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
