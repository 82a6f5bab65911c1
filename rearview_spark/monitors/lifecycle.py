"""Alert lifecycle state machine + debounce.

Reconstructed from the reference's artifacts (SURVEY.md §2.4 S4/S5):
state_machine gem (Gemfile.lock:167) over jobs.status (db/schema.rb:57),
jobs.error_timeout default 60 minutes (db/schema.rb:61) and
job_errors.last_alerted_at (db/schema.rb:43) for re-alert throttling;
job_errors.status (db/schema.rb:42) carries the incident lifecycle
(triggered -> resolved here; 'acknowledged' reserved for the UI layer).

Pure functions — the scheduler applies them and persists the outcome, so
the same transition code serves the batch loop and a streaming
``applyInPandasWithState`` deployment unchanged.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

SUCCESS, FAILED, ERROR = "success", "failed", "error"
TRIGGERED, RESOLVED = "triggered", "resolved"


@dataclass(frozen=True)
class Transition:
    new_status: str
    should_alert: bool
    new_last_alerted_at: dt.datetime | None
    incident: str | None  # None | 'open' | 'close'


def transition(
    prev_status: str | None,
    last_alerted_at: dt.datetime | None,
    run_status: str,
    now: dt.datetime,
    error_timeout_minutes: int,
) -> Transition:
    """One step of the job status machine.

    - run failed/error: alert unless within the debounce window
      (``error_timeout`` minutes since last alert; 0 disables debounce
      i.e. always alert). Opens an incident if none open.
    - run success after failed/error: incident closes (no alert —
      recovery notification is a sink concern).
    """
    if run_status == SUCCESS:
        closing = prev_status in (FAILED, ERROR)
        return Transition(SUCCESS, False, None, "close" if closing else None)

    if run_status not in (FAILED, ERROR):
        raise ValueError(f"unknown run status {run_status!r}")

    debounced = (
        last_alerted_at is not None
        and error_timeout_minutes > 0
        and now < last_alerted_at + dt.timedelta(minutes=error_timeout_minutes)
    )
    newly_failing = prev_status not in (FAILED, ERROR)
    should_alert = not debounced
    return Transition(
        run_status,
        should_alert,
        now if should_alert else last_alerted_at,
        "open" if newly_failing else None,
    )
