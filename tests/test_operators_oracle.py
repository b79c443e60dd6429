"""Every LLM-pipeline operator vs its DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from etl_pipeline_example_spark.operators import (
    DEDUP_ORACLES,
    DEDUP_QUERIES,
    MM_ORACLES,
    MM_QUERIES,
    SIM_ORACLES,
    SIM_QUERIES,
    TEXT_ORACLES,
    TEXT_QUERIES,
)

from tests.oracle_util import assert_matches_oracle

ALL_Q = {**TEXT_QUERIES, **DEDUP_QUERIES, **SIM_QUERIES, **MM_QUERIES}
ALL_O = {**TEXT_ORACLES, **DEDUP_ORACLES, **SIM_ORACLES, **MM_ORACLES}


@pytest.mark.parametrize("name", sorted(ALL_Q))
def test_operator_matches_oracle(spark, duck, sf_dir, name):
    df = ALL_Q[name](spark, sf_dir)
    assert_matches_oracle(df, duck, ALL_O[name])
