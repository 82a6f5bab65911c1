"""Alert fan-out sinks.

Reference routing (SURVEY.md §2.4 S6): jobs.alert_keys (db/schema.rb:59)
holds a list of routing keys — ``email:ops@example.com``,
``pagerduty:SVCKEY``, ``campfire:room`` (README.md:6: "email, pagerduty,
or campfire"; broach/actionmailer deps Gemfile.lock:159,4). Delivery is
at-least-once; the debounce state (lifecycle.py) is what bounds re-fires,
exactly the reference semantic.

Shipped notifiers: a collecting sink (tests/metrics), a JSONL file sink
(audit trail), a real HTTP webhook transport, a PagerDuty Events-v2
envelope (trigger/resolve with per-job dedup_key), a Campfire
speak.json envelope (token basic-auth), and an SMTP email transport —
every routing key the reference's README names now has a real
transport. ``register`` plugs them in by key prefix;
:func:`default_router` wires all four from a config dict in one call.
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


def _post_json(
    url: str, doc: dict, timeout_s: float, headers: dict[str, str] | None = None
) -> None:
    """Shared stdlib HTTP POST used by the provider envelopes. Failures
    raise (at-least-once: the outbox redelivers on the next drain)."""
    body = json.dumps(doc).encode()
    req = urllib.request.Request(
        url,
        data=body,
        headers={"Content-Type": "application/json", **(headers or {})},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
        if resp.status >= 300:
            raise RuntimeError(f"{url} returned {resp.status}")


@dataclass
class PagerDutyNotifier:
    """PagerDuty Events API v2 envelope (public API: POST
    https://events.pagerduty.com/v2/enqueue) — the real transport behind
    the reference's ``pagerduty:`` routing keys (README.md:6; pagerduty
    gem Gemfile.lock:159-area).

    Key form ``pagerduty:<integration_key>`` — the payload part is the
    Events-v2 ``routing_key``. The ``dedup_key`` is stable per job, so a
    recovery alert (status ``success``) RESOLVES the open incident the
    failure alert triggered, matching the reference's open/close
    incident semantics (job_errors.status db/schema.rb:38-48)."""

    endpoint: str = "https://events.pagerduty.com/v2/enqueue"
    source: str = "rearview-spark"
    timeout_s: float = 5.0

    def envelope(self, alert: Alert) -> dict:
        _, _, routing_key = alert.key.partition(":")
        if not routing_key:
            raise ValueError("pagerduty alert key carries no integration key")
        return {
            "routing_key": routing_key,
            "event_action": "resolve" if alert.status == "success" else "trigger",
            "dedup_key": f"rearview-job-{alert.job_id}",
            "payload": {
                "summary": (alert.message or f"job {alert.job_id} {alert.status}")[:1024],
                "source": self.source,
                "severity": "critical" if alert.status == "failed" else "error",
                "timestamp": alert.fired_at.isoformat(),
                "custom_details": {"job_id": alert.job_id, "status": alert.status},
            },
        }

    def send(self, alert: Alert) -> None:
        _post_json(self.endpoint, self.envelope(alert), self.timeout_s)


@dataclass
class CampfireNotifier:
    """Campfire 'speak' envelope (public API: POST
    /room/<id>/speak.json with token basic-auth) — the transport behind
    ``campfire:<room_id>`` keys (broach dep, Gemfile.lock:159)."""

    base_url: str = ""
    token: str = ""
    timeout_s: float = 5.0

    def envelope(self, alert: Alert) -> dict:
        return {
            "message": {
                "type": "TextMessage",
                "body": f"[rearview] job {alert.job_id} {alert.status}: {alert.message}",
            }
        }

    def send(self, alert: Alert) -> None:
        import base64

        _, _, room = alert.key.partition(":")
        if not (room and self.base_url):
            raise ValueError("campfire needs a room id key and a base_url")
        auth = base64.b64encode(f"{self.token}:X".encode()).decode()
        _post_json(
            f"{self.base_url.rstrip('/')}/room/{room}/speak.json",
            self.envelope(alert),
            self.timeout_s,
            headers={"Authorization": f"Basic {auth}"},
        )


@dataclass
class EmailNotifier:
    """SMTP transport for ``email:<rcpt>`` keys (actionmailer dep,
    Gemfile.lock:4). Plain stdlib smtplib against a configured relay —
    production points ``host``/``port`` at its MTA; STARTTLS/auth are
    opt-in so the zero-config localhost-relay case (the reference's
    Rails default) works out of the box."""

    host: str = "localhost"
    port: int = 25
    sender: str = "rearview@localhost"
    subject_prefix: str = "[rearview]"
    starttls: bool = False
    username: str = ""
    password: str = ""
    timeout_s: float = 10.0

    def message(self, alert: Alert) -> "email.message.EmailMessage":
        import email.message

        _, _, rcpt = alert.key.partition(":")
        if not rcpt:
            raise ValueError("email alert key carries no recipient")
        msg = email.message.EmailMessage()
        msg["From"] = self.sender
        msg["To"] = rcpt
        msg["Subject"] = f"{self.subject_prefix} job {alert.job_id} {alert.status}"
        msg.set_content(
            f"job_id: {alert.job_id}\nstatus: {alert.status}\n"
            f"fired_at: {alert.fired_at.isoformat()}\n\n{alert.message}"
        )
        return msg

    def send(self, alert: Alert) -> None:
        import smtplib

        msg = self.message(alert)
        with smtplib.SMTP(self.host, self.port, timeout=self.timeout_s) as s:
            if self.starttls:
                s.starttls()
            if self.username:
                s.login(self.username, self.password)
            s.send_message(msg)


def default_router(config: dict | None = None) -> AlertRouter:
    """One-call wiring of the reference's alert_keys grammar to the four
    real transports — no manual ``register()`` per prefix.

    The reference routes per-job ``alert_keys`` of the form
    ``email:<rcpt>`` / ``pagerduty:<svc_key>`` / ``campfire:<room>``
    (db/schema.rb:59; README.md:6 "email, pagerduty, or campfire");
    this repo adds ``webhook:<url>``. ``config`` carries optional
    per-prefix constructor kwargs for the matching notifier dataclass::

        default_router({
            "email": {"host": "mta.internal", "sender": "rearview@corp"},
            "pagerduty": {},                        # real Events-v2 endpoint
            "campfire": {"base_url": "https://acme.campfirenow.com",
                         "token": "..."},
            "webhook": {"url": "https://hooks.example.com/rearview"},
            "default": JsonlNotifier("/var/log/rearview-alerts.jsonl"),
        })

    Prefixes absent from ``config`` still get a notifier built with its
    defaults, so every key grammar the reference supports routes to a
    real transport out of the box. Keys with an unknown prefix go to
    ``default`` (a :class:`CollectingNotifier` unless overridden) —
    a typo'd key is observable, not an exception mid-drain.
    """
    cfg = dict(config or {})
    router = AlertRouter(default=cfg.pop("default", None))
    for prefix, cls in (
        ("email", EmailNotifier),
        ("pagerduty", PagerDutyNotifier),
        ("campfire", CampfireNotifier),
        ("webhook", WebhookNotifier),
    ):
        kwargs = cfg.pop(prefix, {})
        if kwargs is None:  # explicit opt-out of a transport
            continue
        router.register(prefix, cls(**kwargs))
    if cfg:
        raise ValueError(f"default_router: unknown config sections {sorted(cfg)}")
    return router


class AlertRouter:
    """Dispatch alerts to notifiers by key prefix (the part before ':').

    :func:`default_router` builds one pre-wired with the four real
    transports from a config dict."""

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
