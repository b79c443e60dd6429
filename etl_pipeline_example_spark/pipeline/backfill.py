"""Date-range backfill over the pipeline runner: Airflow parity.

The reference's DAG runs on a weekly cron (dags/example_etl_dag.py:19
``schedule_interval='30 13 * * 0'``); the operation every such
deployment eventually needs is the BACKFILL — "run the pipeline for
every logical date in [start, end], skipping dates that already
completed, resumable after a crash". Airflow semantics replicated
here:

- one pipeline instance per logical date (the ``ds`` every task
  closure receives — the reference's tasks get it via templated
  ``--snapshot-date`` arguments);
- a durable completion LEDGER (one marker file per ds, written
  atomically via tmp+rename): a re-invoked backfill — tomorrow, or
  after the driver died mid-range — skips completed dates without
  consulting any task state, and the per-task ``done`` probes inside
  the pipeline make a half-finished date safe to re-run;
- ``depends_on_past=False`` (the Airflow default, and the
  reference's): a failed date does NOT block later dates — each
  logical date is independent; with ``depends_on_past=True`` the
  first failure blocks everything after it.

Returns {ds: complete | skipped | failed | blocked} — the grid the
Airflow UI shows.

Reference: dags/example_etl_dag.py:19-33 (schedule, retry args,
date-parameterized tasks); engine surface, SURVEY.md §2.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable, Iterable

from etl_pipeline_example_spark.pipeline.dag import Pipeline


def _marker(ledger_dir: str, name: str, ds: str) -> str:
    return os.path.join(ledger_dir, f"{name}__{ds}.complete")


def backfill(
    build_pipeline: Callable[[str], Pipeline],
    dates: Iterable[str],
    ledger_dir: str,
    depends_on_past: bool = False,
) -> dict[str, str]:
    """Run ``build_pipeline(ds)`` for every ds in order, with a durable
    completion ledger. Dates already in the ledger are skipped; a
    failed date fails alone (or blocks the rest with
    ``depends_on_past=True``)."""
    os.makedirs(ledger_dir, exist_ok=True)
    statuses: dict[str, str] = {}
    blocked = False
    for ds in sorted(dates):
        pipe = build_pipeline(ds)
        mark = _marker(ledger_dir, pipe.name, ds)
        # ledger first: a date that already completed in a prior run
        # reports 'skipped' even when an earlier date just failed —
        # Airflow shows previously-succeeded runs as success, not
        # blocked (depends_on_past only gates NEW work)
        if os.path.exists(mark):
            statuses[ds] = "skipped"
            continue
        if blocked:
            statuses[ds] = "blocked"
            continue
        try:
            pipe.run()
        except Exception:
            statuses[ds] = "failed"
            if depends_on_past:
                blocked = True
            continue
        # atomic completion marker: a crash between run() and rename
        # leaves no marker, so the next backfill re-runs the date and
        # the pipeline's own done-probes/overwrite-atomic sinks absorb
        # the repeat
        fd, tmp = tempfile.mkstemp(dir=ledger_dir)
        with os.fdopen(fd, "w") as f:
            f.write("complete\n")
        os.replace(tmp, mark)
        statuses[ds] = "complete"
    return statuses
