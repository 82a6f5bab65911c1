"""Operational metrics (S7 — the reference's statsd instrumentation,
Gemfile.lock:168,202, re-expressed with Spark-native hooks).

Two surfaces:
- ``observed_run_results``: ``df.observe`` attaches named aggregates to the
  evaluation DataFrame; metrics arrive with the job's QueryExecution
  listener events — zero extra passes over the data.
- ``TickMetrics``: driver-side counters the scheduler emits per tick;
  ``to_statsd_lines`` renders the plain-text statsd wire format so any
  statsd-compatible collector can ingest them (emission transport is
  environment-specific and injectable).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_run_results(results: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach run-outcome counters to an evaluation result frame; read
    ``observation.get`` after the action that materializes it."""
    obs = Observation("monitor_run")
    out = results.observe(
        obs,
        F.count(F.lit(1)).alias("runs"),
        F.sum(F.when(F.col("status") == "failed", 1).otherwise(0)).alias("failed"),
        F.sum(F.when(F.col("status") == "error", 1).otherwise(0)).alias("errors"),
    )
    return out, obs


@dataclass
class TickMetrics:
    ran: int = 0
    alerts: int = 0
    failed: int = 0
    errors: int = 0
    tick_seconds: float = 0.0
    at: dt.datetime | None = None
    extra: dict[str, float] = field(default_factory=dict)

    def to_statsd_lines(self, prefix: str = "rearview") -> list[str]:
        base = [
            f"{prefix}.scheduler.ran:{self.ran}|c",
            f"{prefix}.scheduler.alerts:{self.alerts}|c",
            f"{prefix}.scheduler.failed:{self.failed}|c",
            f"{prefix}.scheduler.errors:{self.errors}|c",
            f"{prefix}.scheduler.tick_ms:{int(self.tick_seconds * 1000)}|ms",
        ]
        base += [f"{prefix}.{k}:{v}|g" for k, v in self.extra.items()]
        return base
