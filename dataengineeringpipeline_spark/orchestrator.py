"""In-process pipeline orchestration (SURVEY.md §3.2).

The reference splits orchestration across a DynamoDB-backed Lambda loop
(``lambda/pipeline_orchestrator/lambda_function.py:283-497``: execution
record, ready-job scan over a dependency DAG, ≤50 iterations, final
status) and a retry/circuit-breaker error handler
(``lambda/snowflake_extractor/error_handler.py:31-76,197-377``). In a
Spark-native engine the control plane is the driver process, so the whole
thing collapses to a topological execution loop over Python callables —
each job a ``dict[str, DataFrame] -> DataFrame`` transform whose laziness
Spark already manages.

Scale note: orchestration state is O(jobs), never O(rows) — it must stay
on the driver. What matters at 100 TB is that independent DAG branches
submit concurrently so the cluster stays busy; ``run`` keeps the
reference's sequential semantics, and Spark's scheduler overlaps stages
of the *same* action anyway.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable


class CircuitBreakerOpen(RuntimeError):
    """Raised when a job is invoked while its breaker is open."""


@dataclass
class CircuitBreaker:
    """Failure-count breaker with timed half-open recovery
    (``error_handler.py:31-76``)."""

    failure_threshold: int = 5
    recovery_timeout_s: float = 60.0
    failures: int = 0
    opened_at: float | None = None

    def check(self) -> None:
        if self.opened_at is None:
            return
        if time.monotonic() - self.opened_at >= self.recovery_timeout_s:
            self.opened_at = None  # half-open: allow one attempt
            return
        raise CircuitBreakerOpen("circuit breaker is open")

    def record_success(self) -> None:
        self.failures = 0
        self.opened_at = None

    def record_failure(self) -> None:
        self.failures += 1
        if self.failures >= self.failure_threshold:
            self.opened_at = time.monotonic()


def execute_with_retry(
    fn: Callable[[], Any],
    max_retries: int = 3,
    base_delay_s: float = 1.0,
    max_delay_s: float = 60.0,
    breaker: CircuitBreaker | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Exponential-backoff retry (delay = base·2^attempt, capped —
    ``error_handler.py:289-377``; the reference adds jitter, which matters
    for fleets of Lambdas hammering one endpoint, not for a driver loop).
    """
    last_exc: Exception | None = None
    for attempt in range(max_retries + 1):
        if breaker is not None:
            breaker.check()
        try:
            result = fn()
        except Exception as exc:  # noqa: BLE001 — reference retries broadly
            last_exc = exc
            if breaker is not None:
                breaker.record_failure()
            if attempt == max_retries:
                break
            sleep(min(base_delay_s * (2**attempt), max_delay_s))
        else:
            if breaker is not None:
                breaker.record_success()
            return result
    raise last_exc  # type: ignore[misc]


@dataclass
class Job:
    """One pipeline node: a named transform with upstream dependencies.

    ``fn`` receives the dict of upstream results keyed by job name (plus
    any initial inputs) and returns this job's result (typically a
    DataFrame, but any value works — quality reports, run stats, paths).
    """

    name: str
    fn: Callable[[dict[str, Any]], Any]
    depends_on: tuple[str, ...] = ()
    max_retries: int = 0


@dataclass
class Pipeline:
    """Dependency-DAG pipeline with the reference's execution-record shape.

    ``run`` mirrors the orchestrator loop: repeatedly collect jobs whose
    dependencies are all satisfied (``get_ready_jobs``,
    ``lambda_function.py:283-307``), execute them, record per-job status,
    stop on failure of any job (downstream jobs are marked ``skipped``).
    """

    jobs: list[Job] = field(default_factory=list)
    max_iterations: int = 50

    def add(self, name: str, fn, depends_on: tuple[str, ...] = (), max_retries: int = 0) -> "Pipeline":
        if any(j.name == name for j in self.jobs):
            raise ValueError(f"duplicate job name {name!r}")
        self.jobs.append(Job(name, fn, tuple(depends_on), max_retries))
        return self

    def _validate(self) -> None:
        names = {j.name for j in self.jobs}
        for j in self.jobs:
            missing = set(j.depends_on) - names
            if missing:
                raise ValueError(f"job {j.name!r} depends on unknown jobs {sorted(missing)}")

    def run(
        self, inputs: dict[str, Any] | None = None, sleep: Callable[[float], None] = time.sleep
    ) -> dict[str, Any]:
        """Execute the DAG; returns an execution record:
        ``{status, results, job_status, failed, iterations}``."""
        self._validate()
        results: dict[str, Any] = dict(inputs or {})
        status: dict[str, str] = {j.name: "pending" for j in self.jobs}
        failed: dict[str, str] = {}

        for iteration in range(1, self.max_iterations + 1):
            ready = [
                j
                for j in self.jobs
                if status[j.name] == "pending"
                and all(status.get(d) == "succeeded" for d in j.depends_on)
            ]
            if not ready:
                break
            for job in ready:
                try:
                    results[job.name] = execute_with_retry(
                        lambda job=job: job.fn(results),
                        max_retries=job.max_retries,
                        sleep=sleep,
                    )
                    status[job.name] = "succeeded"
                except Exception as exc:  # noqa: BLE001
                    status[job.name] = "failed"
                    failed[job.name] = f"{type(exc).__name__}: {exc}"

        for j in self.jobs:  # anything still pending is unreachable
            if status[j.name] == "pending":
                status[j.name] = "skipped"

        overall = "succeeded" if all(s == "succeeded" for s in status.values()) else "failed"
        return {
            "status": overall,
            "results": results,
            "job_status": status,
            "failed": failed,
            "iterations": iteration if self.jobs else 0,
        }
