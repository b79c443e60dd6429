"""Behavioral event analytics vs DuckDB oracles at sf0.001, plus the
hand-checkable funnel/retention contracts."""

from __future__ import annotations

import pytest

from etl_pipeline_example_spark.plans import BEHAVIOR_ORACLES, BEHAVIOR_QUERIES

from tests.oracle_util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(BEHAVIOR_QUERIES))
def test_behavior_matches_oracle(spark, duck, sf_dir, name):
    df = BEHAVIOR_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, duck, BEHAVIOR_ORACLES[name])


def test_funnel_counts_are_monotone(spark, sf_dir):
    rows = sorted(
        BEHAVIOR_QUERIES["q_window_funnel"](spark, sf_dir).collect(),
        key=lambda r: r["step"],
    )
    counts = [r["n_users"] for r in rows]
    assert all(counts[i] >= counts[i + 1] for i in range(len(counts) - 1)), counts


def test_funnel_respects_order_and_window(spark, tmp_path):
    """Three planted users: one converts in order inside 24 h; one
    clicks BEFORE viewing (no step 2); one purchases after the window
    (no step 3)."""
    from etl_pipeline_example_spark.plans.behavior import q_window_funnel

    rows = [
        # user 1: view -> click -> purchase inside the window
        (1, "2024-01-01 00:00:00", 1, "view"),
        (2, "2024-01-01 01:00:00", 1, "click"),
        (3, "2024-01-01 02:00:00", 1, "purchase"),
        # user 2: click precedes the first view -> funnel stalls at view
        (4, "2024-01-02 00:00:00", 2, "click"),
        (5, "2024-01-02 01:00:00", 2, "view"),
        # user 3: purchase lands past view + 24h -> stalls at click
        (6, "2024-01-03 00:00:00", 3, "view"),
        (7, "2024-01-03 01:00:00", 3, "click"),
        (8, "2024-01-04 12:00:00", 3, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, 0.0, "{}") for i, ts, u, et in rows],
        "event_id bigint, ts string, user_id bigint, event_type string,"
        " value double, props string",
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id", "event_type",
                 "value", "props")
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r["step"]: r["n_users"] for r in q_window_funnel(spark, str(tmp_path)).collect()}
    assert got == {"1_view": 3, "2_click": 2, "3_purchase": 1}, got


def test_retention_week_zero_covers_every_user(spark, sf_dir):
    """Every user is active in their own cohort week, so the week_k=0
    rows must sum to the distinct-user count."""
    from etl_pipeline_example_spark.plans.behavior import q_retention
    from etl_pipeline_example_spark.sources.readers import read_table

    rows = q_retention(spark, sf_dir).collect()
    week0 = sum(r["n_active"] for r in rows if r["week_k"] == 0)
    n_users = read_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert week0 == n_users
