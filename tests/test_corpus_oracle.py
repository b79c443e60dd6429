"""Corpus-prep operators (chunking, sampling, tf-idf, PII scrub) vs their
DuckDB oracles at sf0.001 — exact match."""

from __future__ import annotations

import pytest

from etl_pipeline_example_spark.operators import CORPUS_ORACLES, CORPUS_QUERIES

from tests.oracle_util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(CORPUS_QUERIES))
def test_corpus_matches_oracle(spark, duck, sf_dir, name):
    df = CORPUS_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, CORPUS_ORACLES[name])
