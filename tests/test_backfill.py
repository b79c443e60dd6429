"""Backfill semantics: ledger skip, independent-date failure,
depends_on_past blocking, crash resume."""

from __future__ import annotations

import os

from etl_pipeline_example_spark.pipeline.backfill import backfill
from etl_pipeline_example_spark.pipeline.dag import Pipeline

DATES = ["2024-01-01", "2024-01-02", "2024-01-03"]


def _builder(out_dir, fail_dates):
    """Two-task pipeline per ds: produce writes <ds>.txt, audit reads
    it back; the produce task raises for dates in fail_dates."""

    def build(ds: str) -> Pipeline:
        p = Pipeline(name="bf")
        path = os.path.join(out_dir, f"{ds}.txt")

        def produce():
            if ds in fail_dates:
                raise RuntimeError(f"boom {ds}")
            with open(path, "w") as f:
                f.write(ds)

        def audit():
            with open(path) as f:
                assert f.read() == ds

        p.task("produce", produce, done=lambda: os.path.exists(path))
        p.task("audit", audit, after=["produce"])
        return p

    return build


def test_backfill_full_range_and_ledger_skip(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    ledger = str(tmp_path / "ledger")
    build = _builder(str(out), fail_dates=set())
    assert backfill(build, DATES, ledger) == {d: "complete" for d in DATES}
    # second invocation: everything rides the ledger, nothing re-runs
    assert backfill(build, DATES, ledger) == {d: "skipped" for d in DATES}
    assert sorted(os.listdir(out)) == [f"{d}.txt" for d in DATES]


def test_backfill_failed_date_fails_alone_then_resumes(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    ledger = str(tmp_path / "ledger")
    flaky = {"2024-01-02"}
    got = backfill(_builder(str(out), flaky), DATES, ledger)
    assert got == {
        "2024-01-01": "complete",
        "2024-01-02": "failed",
        "2024-01-03": "complete",
    }, got
    # the failure cleared (transient): re-backfill runs ONLY the hole
    got = backfill(_builder(str(out), set()), DATES, ledger)
    assert got == {
        "2024-01-01": "skipped",
        "2024-01-02": "complete",
        "2024-01-03": "skipped",
    }, got


def test_backfill_depends_on_past_blocks_later_dates(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    ledger = str(tmp_path / "ledger")
    got = backfill(
        _builder(str(out), {"2024-01-02"}), DATES, ledger, depends_on_past=True
    )
    assert got == {
        "2024-01-01": "complete",
        "2024-01-02": "failed",
        "2024-01-03": "blocked",
    }, got
    assert not os.path.exists(out / "2024-01-03.txt")


def test_backfill_ledger_complete_dates_skip_even_when_blocked(tmp_path):
    """Airflow parity (round-10 ADVICE): with depends_on_past=True, a
    date that completed in a PRIOR run reports 'skipped', not
    'blocked', when an earlier date fails in this run — the blocked
    status only gates new work."""
    out = tmp_path / "out"
    out.mkdir()
    ledger = str(tmp_path / "ledger")
    # prior run completes date 2 only
    backfill(_builder(str(out), set()), ["2024-01-02"], ledger)
    got = backfill(
        _builder(str(out), {"2024-01-01"}), DATES, ledger,
        depends_on_past=True,
    )
    assert got == {
        "2024-01-01": "failed",
        "2024-01-02": "skipped",
        "2024-01-03": "blocked",
    }, got


def test_backfill_crash_resume_reruns_unmarked_date(tmp_path):
    """A missing marker (crash between run() and rename) re-runs the
    date; the pipeline's done-probe absorbs the repeat without
    duplicating work."""
    out = tmp_path / "out"
    out.mkdir()
    ledger = str(tmp_path / "ledger")
    build = _builder(str(out), set())
    backfill(build, DATES, ledger)
    # simulate the crash: date 2's marker vanishes, its output remains
    os.remove(os.path.join(ledger, "bf__2024-01-02.complete"))
    got = backfill(build, DATES, ledger)
    assert got["2024-01-02"] == "complete", got
    # and the produce task was SKIPPED by its done probe (output intact)
    with open(out / "2024-01-02.txt") as f:
        assert f.read() == "2024-01-02"


def test_backfill_properties_hold_for_any_failure_pattern(tmp_path):
    """Hypothesis over (date count, failing subset): statuses partition
    the range correctly, the ledger is exactly the completed set, and a
    clean re-run completes precisely the holes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        n=st.integers(min_value=1, max_value=8),
        fail_mask=st.lists(st.booleans(), min_size=8, max_size=8),
        blocking=st.booleans(),
    )
    @settings(max_examples=40, deadline=None)
    def prop(n, fail_mask, blocking):
        import os
        import shutil
        import tempfile

        work = tempfile.mkdtemp(dir=tmp_path)
        try:
            out = os.path.join(work, "out")
            os.makedirs(out)
            ledger = os.path.join(work, "ledger")
            dates = [f"2024-01-{d + 1:02d}" for d in range(n)]
            flaky = {d for d, f in zip(dates, fail_mask) if f}
            got = backfill(
                _builder(out, flaky), dates, ledger, depends_on_past=blocking
            )
            assert set(got) == set(dates)
            first_fail = min(
                (dates.index(d) for d in flaky), default=None
            )
            for i, d in enumerate(dates):
                if blocking and first_fail is not None and i > first_fail:
                    assert got[d] == "blocked", got
                elif d in flaky:
                    assert got[d] == "failed", got
                else:
                    assert got[d] == "complete", got
            # ledger holds exactly the completed dates
            marked = {
                f.split("__")[1].removesuffix(".complete")
                for f in os.listdir(ledger)
            }
            assert marked == {d for d in dates if got[d] == "complete"}
            # a clean re-run completes exactly the holes
            rerun = backfill(_builder(out, set()), dates, ledger)
            for d in dates:
                want = "skipped" if got[d] == "complete" else "complete"
                assert rerun[d] == want, (got, rerun)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    prop()
