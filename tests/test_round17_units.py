"""Round-17 hand-computed unit pins: moments overflow guard (plus the
round-17 operators added later this round)."""

from __future__ import annotations

import pytest


def _write_events(spark, tmp_path, rows):
    import os
    import shutil

    stage = str(tmp_path / "_ev_stage")
    spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double"
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(
        f for f in os.listdir(stage)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    os.replace(f"{stage}/{part}", str(tmp_path / "events.parquet"))
    shutil.rmtree(stage)
    return str(tmp_path)


def test_moments_overflow_raises_loudly(spark, tmp_path):
    """cents⁴ past decimal(38,0) must RAISE (round-16 ADVICE), not
    silently yield the NULL DuckDB would error on."""
    from etl_pipeline_example_spark.operators.moments import sketch_moments

    sf = _write_events(
        spark, tmp_path, [(1, "a", 1e8), (2, "a", 1e8)]
    )  # c = 1e10, c^4 = 1e40 > 10^38
    # under ANSI (Spark 4 default) the decimal multiply itself raises;
    # under non-ANSI the sums NULL out and the _guarded CASE raises —
    # either way the overflow is LOUD, never a silent NULL divergence
    with pytest.raises(
        Exception, match="power-sum overflow|cannot be represented"
    ):
        sketch_moments(spark, sf).collect()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(Exception, match="power-sum overflow"):
            sketch_moments(spark, sf).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")


def test_moments_all_null_group_stays_null(spark, tmp_path):
    """A group whose inputs are all NULL keeps NULL sums on both
    engines — the guard must NOT fire for it."""
    from etl_pipeline_example_spark.operators.moments import sketch_moments

    sf = _write_events(
        spark, tmp_path,
        [(1, "a", None), (2, "a", None), (3, "b", 2.5)],
    )
    rows = {r["grp"]: r for r in sketch_moments(spark, sf).collect()}
    assert rows["a"]["n"] == 2 and rows["a"]["s1"] is None
    assert rows["b"]["s1"] == 250.0 and rows["b"]["s2"] == 62500.0
    assert rows["__merged__"]["s1"] == 250.0
