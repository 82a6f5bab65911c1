"""Alert fan-out sinks.

Reference routing (SURVEY.md §2.4 S6): jobs.alert_keys (db/schema.rb:59)
holds a list of routing keys — ``email:ops@example.com``,
``pagerduty:SVCKEY``, ``campfire:room`` (README.md:6: "email, pagerduty,
or campfire"; broach/actionmailer deps Gemfile.lock:159,4). Delivery is
at-least-once; the debounce state (lifecycle.py) is what bounds re-fires,
exactly the reference semantic.

Shipped notifiers: a collecting sink (tests/metrics), a JSONL file sink
(audit trail), and a real HTTP webhook transport (stdlib urllib POST —
the S6 delivery path; email/pagerduty/campfire are all webhook-shaped
behind their provider APIs and need only credentials + endpoint).
``register`` plugs transports in by key prefix.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request
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


@dataclass
class WebhookNotifier:
    """POST each alert as a JSON document to an HTTP endpoint.

    The routing key's payload part overrides the default URL
    (``webhook:http://host/hook`` posts there; bare ``webhook`` uses
    ``url``), matching the reference pattern of per-job routing targets
    in jobs.alert_keys. Delivery is at-least-once: a failed POST raises
    (the scheduler tick surfaces it) rather than being silently dropped;
    the lifecycle debounce bounds re-fires."""

    url: str = ""
    timeout_s: float = 5.0

    def send(self, alert: Alert) -> None:
        _, _, key_url = alert.key.partition(":")
        target = key_url or self.url
        if not target:
            raise ValueError("webhook alert key carries no URL and no default set")
        body = json.dumps(
            {
                "job_id": alert.job_id,
                "message": alert.message,
                "fired_at": alert.fired_at.isoformat(),
                "status": alert.status,
            }
        ).encode()
        req = urllib.request.Request(
            target, data=body, headers={"Content-Type": "application/json"}, method="POST"
        )
        with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
            if resp.status >= 300:
                raise RuntimeError(f"webhook {target} returned {resp.status}")


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
