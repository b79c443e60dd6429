"""Connected-components dedup clustering vs a DuckDB recursive-CTE
reachability oracle, plus a synthetic-graph unit test (chain + clique +
isolated pair) for the iteration itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_example_spark.operators.cluster import (
    CLUSTER_ORACLES,
    CLUSTER_QUERIES,
    connected_components,
)

from tests.oracle_util import assert_matches_oracle


def test_connected_components_synthetic(spark):
    # chain 1-2-3-4, clique 10-11-12, pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["src", "dst"],
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


@pytest.mark.parametrize("name", sorted(CLUSTER_QUERIES))
def test_cluster_matches_oracle(spark, duck, sf_dir, name):
    df = CLUSTER_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, CLUSTER_ORACLES[name])
