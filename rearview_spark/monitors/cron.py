"""Crontab-expression parsing and next-fire computation.

The reference schedules monitors with "crontab compatible time
specification" (README.md:6; jobs.cron_expr db/schema.rb:56, parsed by a
treetop PEG grammar per Gemfile.lock:169). This is a dependency-free
implementation of standard 5-field crontab semantics:

    minute hour day-of-month month day-of-week
    fields: '*', N, N-M, N-M/S, '*/S', comma lists; dow 0 and 7 = Sunday

Standard cron rule: when BOTH day-of-month and day-of-week are
restricted, a date matches if EITHER matches (Vixie cron semantics).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]


def _parse_field(spec: str, lo: int, hi: int, dow: bool = False) -> frozenset[int]:
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"bad step in cron field {spec!r}")
        if part in ("*", ""):
            lo2, hi2 = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            lo2, hi2 = int(a), int(b)
        else:
            v = int(part)
            if dow and v == 7:
                v = 0
            if "/" in spec and step > 1:
                lo2, hi2 = v, hi
            else:
                lo2 = hi2 = v
        for v in range(lo2, hi2 + 1, step):
            vv = 0 if (dow and v == 7) else v
            if not (lo <= vv <= hi):
                raise ValueError(f"cron value {v} out of range {lo}-{hi} in {spec!r}")
            out.add(vv)
    return frozenset(out)


@dataclass(frozen=True)
class Cron:
    minutes: frozenset[int]
    hours: frozenset[int]
    doms: frozenset[int]
    months: frozenset[int]
    dows: frozenset[int]
    dom_restricted: bool
    dow_restricted: bool

    def matches(self, t: dt.datetime) -> bool:
        if t.minute not in self.minutes or t.hour not in self.hours or t.month not in self.months:
            return False
        dom_ok = t.day in self.doms
        dow_ok = ((t.weekday() + 1) % 7) in self.dows  # python Mon=0 -> cron Sun=0
        if self.dom_restricted and self.dow_restricted:
            return dom_ok or dow_ok
        return dom_ok and dow_ok

    def next_fire(self, after: dt.datetime) -> dt.datetime:
        """First matching minute strictly after ``after`` (minute floor)."""
        t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
        # bounded scan: at worst ~4 years of minutes for pathological specs;
        # practical specs hit within days. Hour/day skipping keeps it fast.
        for _ in range(4 * 366 * 24 * 60):
            if t.month not in self.months:
                # jump to first day of next month
                t = (t.replace(day=1, hour=0, minute=0) + dt.timedelta(days=32)).replace(day=1)
                continue
            dom_ok = t.day in self.doms
            dow_ok = ((t.weekday() + 1) % 7) in self.dows
            day_ok = (dom_ok or dow_ok) if (self.dom_restricted and self.dow_restricted) else (dom_ok and dow_ok)
            if not day_ok:
                t = t.replace(hour=0, minute=0) + dt.timedelta(days=1)
                continue
            if t.hour not in self.hours:
                t = t.replace(minute=0) + dt.timedelta(hours=1)
                continue
            if t.minute not in self.minutes:
                t += dt.timedelta(minutes=1)
                continue
            return t
        raise ValueError("no matching time found in 4 years")


def parse_cron(expr: str) -> Cron:
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron expression must have 5 fields: {expr!r}")
    parsed = []
    for spec, (lo, hi) in zip(fields, _FIELD_RANGES):
        parsed.append(_parse_field(spec, lo, hi, dow=(hi == 6)))
    return Cron(
        minutes=parsed[0],
        hours=parsed[1],
        doms=parsed[2],
        months=parsed[3],
        dows=parsed[4],
        dom_restricted=fields[2] != "*",
        dow_restricted=fields[4] != "*",
    )


def next_fire(expr: str, after: dt.datetime) -> dt.datetime:
    return parse_cron(expr).next_fire(after)
