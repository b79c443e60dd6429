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
