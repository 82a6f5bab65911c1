"""Crontab semantics (reference: crontab-compatible cron_expr,
README.md:6; db/schema.rb:56)."""

from __future__ import annotations

import datetime as dt

import pytest

from rearview_spark.monitors.cron import next_fire, parse_cron

T = dt.datetime


def test_every_minute():
    assert next_fire("* * * * *", T(2024, 1, 1, 0, 0, 30)) == T(2024, 1, 1, 0, 1)


def test_every_five_minutes():
    assert next_fire("*/5 * * * *", T(2024, 1, 1, 0, 1)) == T(2024, 1, 1, 0, 5)
    assert next_fire("*/5 * * * *", T(2024, 1, 1, 0, 5)) == T(2024, 1, 1, 0, 10)


def test_hourly_at_30():
    assert next_fire("30 * * * *", T(2024, 1, 1, 0, 31)) == T(2024, 1, 1, 1, 30)


def test_daily_at_time():
    assert next_fire("15 9 * * *", T(2024, 1, 1, 10, 0)) == T(2024, 1, 2, 9, 15)


def test_ranges_and_lists():
    c = parse_cron("0 9-17 * * 1-5")
    assert c.matches(T(2024, 1, 1, 9, 0))  # Monday
    assert not c.matches(T(2024, 1, 6, 9, 0))  # Saturday
    assert not c.matches(T(2024, 1, 1, 8, 0))
    c2 = parse_cron("0,30 * * * *")
    assert c2.matches(T(2024, 1, 1, 5, 30)) and c2.matches(T(2024, 1, 1, 5, 0))


def test_dow_seven_is_sunday():
    c = parse_cron("0 0 * * 7")
    assert c.matches(T(2024, 1, 7, 0, 0))  # a Sunday


def test_dom_dow_either_semantics():
    # Vixie cron: both restricted -> OR
    c = parse_cron("0 0 13 * 5")  # 13th OR Friday
    assert c.matches(T(2024, 9, 13, 0, 0))  # Friday the 13th
    assert c.matches(T(2024, 1, 13, 0, 0))  # Saturday the 13th (dom matches)
    assert c.matches(T(2024, 1, 5, 0, 0))  # Friday the 5th (dow matches)
    assert not c.matches(T(2024, 1, 6, 0, 0))


def test_month_rollover():
    assert next_fire("0 0 1 * *", T(2024, 1, 15, 12, 0)) == T(2024, 2, 1, 0, 0)


def test_invalid():
    with pytest.raises(ValueError):
        parse_cron("* * * *")
    with pytest.raises(ValueError):
        parse_cron("61 * * * *")
