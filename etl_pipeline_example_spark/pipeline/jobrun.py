"""Out-of-process job submission with poll-to-completion.

The reference never runs its Glue job in the orchestrator's process: a
thin wrapper builds job arguments, submits, and polls until the cluster
reports a terminal state (reference: python_scripts/run_glue_job.py:1-19
— ``job.run_job(); job.wait_for_completion(verbose=True)`` over
etl_manager's GlueJob). This module is that submission shape for the
Spark engine: the DAG stays a pure orchestrator, each stage runs in its
own interpreter/driver, and a stage crash surfaces as an exit code plus
captured logs instead of taking the orchestrator down.

``SparkJob`` mirrors the GlueJob surface the reference scripts use —
job directory (containing ``job.py``), ``job_arguments`` passed as
``--key value`` argv pairs, ``run_job()`` / ``wait_for_completion()`` —
with submission locally shaped as ``sys.executable job.py ...``. On a
real cluster the identical contract rides ``spark-submit`` (pass
``submit_cmd=["spark-submit", "--deploy-mode", "cluster", ...]``): the
wrapper only composes argv, polls, and propagates, exactly like the
reference's wrapper only drives the Glue API.

States follow the Glue vocabulary: READY → RUNNING → SUCCEEDED /
FAILED. ``wait_for_completion`` raises ``JobFailedError`` carrying the
exit code and the log tail on failure — the DAG's retry policy
(pipeline/dag.py) then decides whether to resubmit.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path
from typing import IO, Any


class JobFailedError(RuntimeError):
    def __init__(self, job_name: str, exit_code: int, log_tail: str):
        super().__init__(
            f"job {job_name!r} FAILED with exit code {exit_code}\n{log_tail}"
        )
        self.job_name = job_name
        self.exit_code = exit_code
        self.log_tail = log_tail


class SparkJob:
    """Submit ``<job_dir>/job.py`` out of process and poll it.

    Parameters mirror the reference's GlueJob call shape
    (run_glue_job.py:14): a job directory, and ``job_arguments`` as a
    ``--flag: value`` dict appended to the child argv verbatim.
    """

    SCRIPT_NAME = "job.py"

    def __init__(
        self,
        job_dir: str,
        job_arguments: dict[str, str] | None = None,
        submit_cmd: list[str] | None = None,
        log_dir: str | None = None,
    ):
        self.job_dir = Path(job_dir)
        self.script = self.job_dir / self.SCRIPT_NAME
        if not self.script.is_file():
            raise FileNotFoundError(f"no {self.SCRIPT_NAME} in {job_dir!r}")
        self.job_name = self.job_dir.name
        self.job_arguments = dict(job_arguments or {})
        self.submit_cmd = list(submit_cmd) if submit_cmd else [sys.executable]
        self.log_dir = Path(log_dir) if log_dir else self.job_dir
        self.state = "READY"
        self._proc: subprocess.Popen[Any] | None = None
        self._log: IO[bytes] | None = None
        self.log_path = self.log_dir / f"{self.job_name}.log"

    def _argv(self) -> list[str]:
        argv = [*self.submit_cmd, str(self.script)]
        for flag, value in self.job_arguments.items():
            argv += [flag if flag.startswith("--") else f"--{flag}", str(value)]
        return argv

    def run_job(self) -> None:
        """Submit and return immediately (state → RUNNING)."""
        if self._proc is not None:
            raise RuntimeError(f"job {self.job_name!r} already submitted")
        self.log_dir.mkdir(parents=True, exist_ok=True)
        env = dict(os.environ)
        # the child resolves the engine package exactly as the parent did
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in [str(Path(__file__).resolve().parents[2]),
                        env.get("PYTHONPATH", "")] if p
        )
        self._log = open(self.log_path, "wb")
        self._proc = subprocess.Popen(
            self._argv(), stdout=self._log, stderr=subprocess.STDOUT, env=env
        )
        self.state = "RUNNING"

    def job_status(self) -> str:
        if self._proc is not None and self.state == "RUNNING":
            rc = self._proc.poll()
            if rc is not None:
                self.state = "SUCCEEDED" if rc == 0 else "FAILED"
                self._log.close()
        return self.state

    def wait_for_completion(
        self, verbose: bool = False, poll_seconds: float = 0.5
    ) -> str:
        """Poll to a terminal state (the reference's
        ``wait_for_completion(verbose=True)``); raise ``JobFailedError``
        with the log tail on failure, return 'SUCCEEDED' otherwise."""
        if self._proc is None:
            raise RuntimeError(f"job {self.job_name!r} was never submitted")
        while self.job_status() == "RUNNING":
            if verbose:
                print(f"job {self.job_name!r}: RUNNING")
            time.sleep(poll_seconds)
        if verbose:
            print(f"job {self.job_name!r}: {self.state}")
        if self.state == "FAILED":
            tail = ""
            try:
                tail = self.log_path.read_text(errors="replace")[-2000:]
            except OSError:
                pass
            raise JobFailedError(self.job_name, self._proc.returncode, tail)
        return self.state
