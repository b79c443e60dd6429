"""Due-now evaluation of the DAG's declarative cron schedule
(pipeline/schedule.py) — frozen-clock tests, no daemon."""

from __future__ import annotations

from datetime import datetime

import pytest

from etl_pipeline_example_spark.pipeline.dag import Pipeline
from etl_pipeline_example_spark.pipeline.schedule import (
    cron_matches,
    due_now,
    due_runs,
    next_fire,
    parse_cron,
)

# the reference DAG's spec: 13:30 every Sunday
# (dags/example_etl_dag.py schedule_interval='30 13 * * 0')
REF = "30 13 * * 0"


def test_reference_spec_matches_sunday_1330_only():
    assert cron_matches(REF, datetime(2026, 8, 16, 13, 30))  # a Sunday
    assert not cron_matches(REF, datetime(2026, 8, 16, 13, 31))
    assert not cron_matches(REF, datetime(2026, 8, 17, 13, 30))  # Monday
    assert next_fire(REF, datetime(2026, 8, 16, 13, 30)) == datetime(
        2026, 8, 23, 13, 30
    )  # strictly-after: the NEXT Sunday
    assert next_fire(REF, datetime(2026, 8, 16, 13, 29)) == datetime(
        2026, 8, 16, 13, 30
    )


def test_due_and_not_due():
    last = datetime(2026, 8, 9, 13, 30)  # previous Sunday's run
    # Saturday: nothing due yet
    assert due_runs(REF, datetime(2026, 8, 15, 23, 59), last_run=last) == []
    # Sunday 13:30: exactly one tick due
    assert due_runs(REF, datetime(2026, 8, 16, 13, 30), last_run=last) == [
        datetime(2026, 8, 16, 13, 30)
    ]


def test_catchup_skip_vs_backfill():
    last = datetime(2026, 7, 5, 13, 30)
    now = datetime(2026, 8, 1, 0, 0)  # three Sundays missed
    # Airflow catchup=False default: only the LATEST missed tick
    assert due_runs(REF, now, last_run=last) == [
        datetime(2026, 7, 26, 13, 30)
    ]
    # explicit backfill: all three, oldest first
    assert due_runs(REF, now, last_run=last, catchup=True) == [
        datetime(2026, 7, 12, 13, 30),
        datetime(2026, 7, 19, 13, 30),
        datetime(2026, 7, 26, 13, 30),
    ]


def test_steps_ranges_lists_and_day_union():
    # */15: four ticks an hour
    assert due_runs(
        "*/15 * * * *",
        datetime(2026, 1, 1, 1, 0),
        last_run=datetime(2026, 1, 1, 0, 0),
        catchup=True,
    ) == [datetime(2026, 1, 1, 0, m) for m in (15, 30, 45)] + [
        datetime(2026, 1, 1, 1, 0)
    ]
    # range with step + list
    assert cron_matches("0 9-17/4 * * *", datetime(2026, 1, 1, 13, 0))
    assert not cron_matches("0 9-17/4 * * *", datetime(2026, 1, 1, 10, 0))
    assert cron_matches("5,35 2 * * *", datetime(2026, 1, 1, 2, 35))
    # POSIX union rule: dom=1 OR Sunday when both restricted
    spec = "0 0 1 * 0"
    assert cron_matches(spec, datetime(2026, 8, 1, 0, 0))  # dom=1 (a Sat)
    assert cron_matches(spec, datetime(2026, 8, 2, 0, 0))  # a Sunday
    assert not cron_matches(spec, datetime(2026, 8, 3, 0, 0))  # Monday 3rd
    # dow 7 == Sunday == 0
    assert cron_matches("0 0 * * 7", datetime(2026, 8, 2, 0, 0))


def test_never_run_dag_needs_start_and_manual_dag_never_due():
    p = Pipeline("weekly", schedule=REF)
    with pytest.raises(ValueError, match="start"):
        due_now(p, datetime(2026, 8, 16, 14, 0))
    assert due_now(
        p,
        datetime(2026, 8, 16, 14, 0),
        start=datetime(2026, 8, 10, 0, 0),
    ) == [datetime(2026, 8, 16, 13, 30)]
    manual = Pipeline("adhoc")  # schedule=None
    assert due_now(manual, datetime(2026, 8, 16, 14, 0)) == []


def test_malformed_and_unsatisfiable_specs_fail_loudly():
    with pytest.raises(ValueError, match="5 fields"):
        parse_cron("* * * *")
    with pytest.raises(ValueError, match="outside"):
        parse_cron("99 * * * *")
    with pytest.raises(ValueError, match="bad cron"):
        parse_cron("a * * * *")
    with pytest.raises(ValueError, match="never fires"):
        next_fire("0 0 30 2 *", datetime(2026, 1, 1))  # Feb 30


def test_due_now_drives_pipeline_run_end_to_end():
    """The orchestrator loop in miniature, frozen clock: a weekly DAG
    misses three Sundays; one due_now() call enqueues exactly one
    catchup-skipped run, run() executes the tasks in dependency
    order, and after recording last_run the next tick is not due."""
    ran = []
    p = Pipeline("weekly", schedule=REF)
    p.task("extract", lambda: ran.append("extract") or "e")
    p.task("transform", lambda: ran.append("transform") or "t",
           after=["extract"])

    last_run = datetime(2026, 7, 5, 13, 30)
    now = datetime(2026, 8, 1, 0, 0)
    due = due_now(p, now, last_run=last_run)
    assert due == [datetime(2026, 7, 26, 13, 30)]
    for _tick in due:
        results = p.run()
        last_run = _tick
    assert ran == ["extract", "transform"]
    assert results["transform"] == "t"
    assert p.last_state["extract"]["status"] == "success"
    # the loop is quiescent until the next Sunday 13:30
    assert due_now(p, datetime(2026, 8, 1, 12, 0), last_run=last_run) == []
    assert due_now(p, datetime(2026, 8, 2, 13, 30), last_run=last_run) == [
        datetime(2026, 8, 2, 13, 30)
    ]


def test_prev_fire_backward_twin():
    from etl_pipeline_example_spark.pipeline.schedule import prev_fire

    # at a tick: the tick itself (AT or before)
    assert prev_fire(REF, datetime(2026, 8, 16, 13, 30)) == datetime(
        2026, 8, 16, 13, 30
    )
    # one minute before the Sunday tick: the PREVIOUS Sunday
    assert prev_fire(REF, datetime(2026, 8, 16, 13, 29)) == datetime(
        2026, 8, 9, 13, 30
    )


def test_catchup_false_survives_long_idle_minutely_spec():
    """Round-14 ADVICE (low): catchup=False used to enumerate every
    missed tick and raise the 100000-tick cap for a minutely spec idle
    ~69 days+ — Airflow's catchup=False runs that pipeline fine. Now it
    resolves the latest tick with one backward scan."""
    last = datetime(2025, 8, 16, 12, 0)  # a full year idle
    now = datetime(2026, 8, 16, 12, 34, 56)
    got = due_runs("* * * * *", now, last_run=last, catchup=False)
    assert got == [datetime(2026, 8, 16, 12, 34)]
    # catchup=True still caps loudly instead of silently enumerating
    with pytest.raises(ValueError, match="100000"):
        due_runs("* * * * *", now, last_run=last, catchup=True)
    # nothing due: latest tick at-or-before now is not after last_run
    assert (
        due_runs(
            REF,
            datetime(2026, 8, 15, 23, 59),
            last_run=datetime(2026, 8, 9, 13, 30),
            catchup=False,
        )
        == []
    )
