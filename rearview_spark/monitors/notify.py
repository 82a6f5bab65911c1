"""Alert fan-out sinks.

Reference routing (SURVEY.md §2.4 S6): jobs.alert_keys (db/schema.rb:59)
holds a list of routing keys — ``email:ops@example.com``,
``pagerduty:SVCKEY``, ``campfire:room`` (README.md:6: "email, pagerduty,
or campfire"; broach/actionmailer deps Gemfile.lock:159,4). Delivery is
at-least-once; the debounce state (lifecycle.py) is what bounds re-fires,
exactly the reference semantic.

Real transports need network credentials, so the shipped notifiers are a
collecting sink (tests/metrics) and a JSONL file sink (audit trail);
``register`` plugs real ones in by key prefix.
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Protocol


@dataclass(frozen=True)
class Alert:
    job_id: int
    key: str  # full routing key, e.g. 'email:ops@example.com'
    message: str
    fired_at: dt.datetime
    status: str


class Notifier(Protocol):
    def send(self, alert: Alert) -> None: ...


@dataclass
class CollectingNotifier:
    sent: list[Alert] = field(default_factory=list)

    def send(self, alert: Alert) -> None:
        self.sent.append(alert)


@dataclass
class JsonlNotifier:
    path: str

    def send(self, alert: Alert) -> None:
        rec = {
            "job_id": alert.job_id,
            "key": alert.key,
            "message": alert.message,
            "fired_at": alert.fired_at.isoformat(),
            "status": alert.status,
        }
        with Path(self.path).open("a") as f:
            f.write(json.dumps(rec) + "\n")


class AlertRouter:
    """Dispatch alerts to notifiers by key prefix (the part before ':')."""

    def __init__(self, default: Notifier | None = None):
        self._by_prefix: dict[str, Notifier] = {}
        self._default = default if default is not None else CollectingNotifier()

    def register(self, prefix: str, notifier: Notifier) -> None:
        self._by_prefix[prefix] = notifier

    @property
    def default(self) -> Notifier:
        return self._default

    def dispatch(
        self,
        job_id: int,
        alert_keys: list[str] | None,
        message: str,
        fired_at: dt.datetime,
        status: str,
    ) -> int:
        keys = alert_keys or []
        n = 0
        for key in keys:
            prefix = key.split(":", 1)[0]
            notifier = self._by_prefix.get(prefix, self._default)
            notifier.send(Alert(job_id, key, message, fired_at, status))
            n += 1
        return n
