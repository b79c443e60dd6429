"""run_sql error contract: a user-facing SQL surface needs DEFINED
failure behavior (round-11 verdict ask #7). Every bad query must
surface an AnalysisException eagerly from run_sql itself — never a
silent empty frame, never an error deferred to the first action."""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException, ParseException

from etl_pipeline_example_spark.plans.sqlfacade import run_sql


def test_unresolvable_table_raises_analysis_exception(spark, sf_dir):
    with pytest.raises(AnalysisException) as exc:
        run_sql(spark, sf_dir, "SELECT * FROM no_such_table")
    assert "no_such_table" in str(exc.value)


def test_unresolvable_column_raises_and_names_the_column(spark, sf_dir):
    with pytest.raises(AnalysisException) as exc:
        run_sql(spark, sf_dir, "SELECT n_nonexistent FROM nation")
    assert "n_nonexistent" in str(exc.value)


def test_engine_private_function_raises_unresolved_routine(spark, sf_dir):
    # DuckDB-private list helper: out of the shared dialect, and Spark
    # must say so by name, not return an empty frame
    with pytest.raises(AnalysisException) as exc:
        run_sql(
            spark, sf_dir, "SELECT list_has_any(ARRAY(1), ARRAY(1)) AS x"
        )
    assert "list_has_any" in str(exc.value).lower()


def test_backticked_unresolvable_name_still_raises(spark, sf_dir):
    # backticks PARSE in Spark (they're its quote character) but stay
    # out of the shared dialect; a backticked bad name must still fail
    # resolution loudly
    with pytest.raises(AnalysisException):
        run_sql(spark, sf_dir, "SELECT `does_not_exist` FROM nation")


def test_syntax_garbage_raises_parse_exception(spark, sf_dir):
    # ParseException subclasses the same user-visible error surface
    with pytest.raises((ParseException, AnalysisException)):
        run_sql(spark, sf_dir, "SELEKT 1 FRUM dual")


def test_error_is_eager_not_deferred_to_the_first_action(spark, sf_dir):
    # run_sql itself must throw — a caller never holds a poisoned
    # DataFrame whose failure surfaces at show()/collect() time
    try:
        run_sql(spark, sf_dir, "SELECT * FROM no_such_table")
    except AnalysisException:
        return
    pytest.fail("run_sql returned instead of raising eagerly")


def test_absent_table_view_is_dropped_not_stale(spark, sf_dir, tmp_path):
    """A partial warehouse must not silently serve a STALE view from a
    previously registered directory: querying a table the new directory
    lacks raises, it does not return the old directory's rows."""
    import shutil

    part = tmp_path / "partial"
    part.mkdir()
    shutil.copy(f"{sf_dir}/nation.parquet", part / "nation.parquet")
    # full warehouse registers events; the partial one must revoke it
    run_sql(spark, sf_dir, "SELECT count(*) AS n FROM events").collect()
    with pytest.raises(AnalysisException):
        run_sql(spark, str(part), "SELECT count(*) AS n FROM events")
    # and the tables it HAS still resolve
    n = run_sql(
        spark, str(part), "SELECT count(*) AS n FROM nation"
    ).collect()[0]["n"]
    assert n == 25
