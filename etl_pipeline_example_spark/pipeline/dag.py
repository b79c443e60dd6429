"""Minimal dependency-ordered pipeline runner.

The reference orchestrates four containerized tasks with Airflow
(reference: dags/example_etl_dag.py:108-110 ``extract >> test-extract >>
run-curated >> deploy-database``). The engine keeps orchestration out of
the data plane: a pipeline is named thunks + dependency edges, executed in
topological order. Swapping this runner for Airflow/Step Functions on a
real deployment changes nothing about the tasks.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any, Callable


@dataclass
class Pipeline:
    name: str
    tasks: dict[str, Callable[[], Any]] = field(default_factory=dict)
    deps: dict[str, set[str]] = field(default_factory=dict)

    def task(self, task_id: str, fn: Callable[[], Any], after: list[str] | None = None) -> None:
        if task_id in self.tasks:
            raise ValueError(f"duplicate task id {task_id!r}")
        for dep in after or []:
            if dep not in self.tasks:
                raise ValueError(f"unknown dependency {dep!r} for task {task_id!r}")
        self.tasks[task_id] = fn
        self.deps[task_id] = set(after or [])

    def run(self) -> dict[str, Any]:
        """Run all tasks respecting dependencies; return results by task id."""
        order = list(TopologicalSorter(self.deps).static_order())
        results: dict[str, Any] = {}
        for task_id in order:
            results[task_id] = self.tasks[task_id]()
        return results
