"""Target-expression compiler: grammar + compiled-plan semantics
(reference: jobs.metrics target strings, db/schema.rb:65)."""

from __future__ import annotations

import datetime as dt

import pytest

from rearview_spark.functions.graphite import (
    FuncNode,
    PathNode,
    evaluate_target,
    interval_seconds,
    parse_target,
)

T0 = dt.datetime(2024, 1, 1)


def make_series(spark, data: dict[str, list[float | None]]):
    rows = [
        (m, T0 + dt.timedelta(minutes=i), float(v) if v is not None else None)
        for m, vals in data.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "metric string, ts timestamp, value double")


def vals(df, metric=None):
    rows = df.orderBy("metric", "ts").collect()
    if metric:
        rows = [r for r in rows if r["metric"] == metric]
    return [r["value"] for r in rows]


def test_parse_shapes():
    ast = parse_target("movingAverage(sumSeries(stats.prod.*.req), 5)")
    assert isinstance(ast, FuncNode) and ast.name == "movingAverage"
    inner = ast.args[0]
    assert isinstance(inner, FuncNode) and inner.name == "sumSeries"
    assert isinstance(inner.args[0], PathNode)
    assert inner.args[0].path == "stats.prod.*.req"
    assert ast.args[1].value == 5.0


def test_parse_braces_and_strings():
    ast = parse_target('aliasSub(stats.{a,b}.cpu, "w+", "x")')
    assert ast.name == "aliasSub"
    assert ast.args[0].path == "stats.{a,b}.cpu"
    assert ast.args[1].value == "w+"


def test_parse_errors():
    with pytest.raises(ValueError):
        parse_target("sumSeries(a.b")
    with pytest.raises(ValueError):
        parse_target("foo(a) extra")


def test_intervals():
    assert interval_seconds("5min") == 300
    assert interval_seconds("1hour") == 3600
    assert interval_seconds("-1d") == -86400


def test_bare_path(spark):
    df = make_series(spark, {"a.b": [1, 2], "a.c": [3, 4]})
    assert vals(evaluate_target("a.b", df)) == [1.0, 2.0]
    assert vals(evaluate_target("a.*", df)) == [1.0, 2.0, 3.0, 4.0]


def test_nested_pipeline(spark):
    df = make_series(spark, {"s.x": [1, 2, 3], "s.y": [10, 20, 30]})
    out = evaluate_target("movingAverage(sumSeries(s.*), 2)", df)
    assert vals(out) == [11.0, 16.5, 27.5]


def test_diff_and_divide_positional(spark):
    df = make_series(spark, {"n": [10, 9], "d": [2, 3]})
    assert vals(evaluate_target("diffSeries(n, d)", df)) == [8.0, 6.0]
    assert vals(evaluate_target("divideSeries(n, d)", df)) == [5.0, 3.0]


def test_scalar_chain(spark):
    df = make_series(spark, {"m": [4.0]})
    assert vals(evaluate_target("offset(scale(m, 2), 1)", df)) == [9.0]
    assert vals(evaluate_target("squareRoot(m)", df)) == [2.0]


def test_filters_and_naming(spark):
    df = make_series(spark, {"s.hi": [100, 100], "s.lo": [1, 1]})
    assert vals(evaluate_target("averageAbove(s.*, 50)", df)) == [100.0, 100.0]
    assert vals(evaluate_target("highestAverage(s.*, 1)", df)) == [100.0, 100.0]
    out = evaluate_target("alias(s.hi, total)", df)
    assert out.collect()[0]["metric"] == "total"
    out = evaluate_target("aliasByNode(s.hi, 1)", df)
    assert out.collect()[0]["metric"] == "hi"


def test_summarize_and_null_fns(spark):
    df = make_series(spark, {"m": [1, None, 3, 4, 5, 6]})
    out = evaluate_target('summarize(m, "5min", "sum")', df)
    assert sorted(vals(out)) == [6.0, 13.0]
    assert vals(evaluate_target("transformNull(m, -1)", df))[1] == -1.0
    assert vals(evaluate_target("keepLastValue(m)", df))[1] == 1.0


def test_time_shift_semantics(spark):
    df = make_series(spark, {"m": [1, 2]})
    out = evaluate_target('timeShift(m, "-1d")', df).collect()
    assert min(r["ts"] for r in out) == T0 + dt.timedelta(days=1)
    # '+1d' draws FUTURE data at today's position -> ts shifted backward
    # (round 1 discarded the sign, ADVICE r01)
    out = evaluate_target('timeShift(m, "+1d")', df).collect()
    assert min(r["ts"] for r in out) == T0 - dt.timedelta(days=1)


def test_time_shift_bounds_reported():
    from rearview_spark.functions.graphite import compile_target

    p = compile_target('diffSeries(m, timeShift(m, "-1d"))')
    assert p.lookback_s == 86400 and p.lookahead_s == 0
    p = compile_target('timeShift(timeShift(m, "-1d"), "-2h")')
    assert p.lookback_s == 86400 + 7200
    p = compile_target('timeShift(m, "+30min")')
    assert p.lookahead_s == 1800 and p.lookback_s == 0
    p = compile_target("sumSeries(m)")
    assert p.lookback_s == 0 and p.lookahead_s == 0


def test_unknown_function(spark):
    df = make_series(spark, {"m": [1]})
    with pytest.raises(ValueError, match="unsupported"):
        evaluate_target("noSuchFn(m)", df)


def test_time_slice_parsed(spark):
    df = make_series(spark, {"cpu.user": [1, 2, 3, 4, 5, 6]})
    out = evaluate_target('timeSlice(cpu.user, "2024-01-01 00:02:00", "2024-01-01 00:04:00")', df)
    rows = {r["ts"].minute: r["value"] for r in out.collect()}
    assert all(v is None for m, v in rows.items() if m < 2 or m > 4)
    assert all(v is not None for m, v in rows.items() if 2 <= m <= 4)


def test_clamp_parsed(spark):
    df = make_series(spark, {"m": [1, 5, 9]})
    assert vals(evaluate_target("clamp(m, 2, 8)", df)) == [2.0, 5.0, 8.0]


def test_constant_line_parsed(spark):
    df = make_series(spark, {"m": [1, 2, 3]})
    out = evaluate_target("constantLine(4.5)", df).collect()
    assert {r["value"] for r in out} == {4.5}
    assert out[0]["metric"] == "constantLine(4.5)"
    assert len(out) == 3  # spans the input frame's window at 60s step


def test_hw_confidence_bands_parsed(spark):
    df = make_series(spark, {"m": [10.0] * 20})
    out = evaluate_target("holtWintersConfidenceBands(m, 5)", df)
    names = {r["metric"] for r in out.collect()}
    assert names == {
        "holtWintersConfidenceUpper(m)",
        "holtWintersConfidenceLower(m)",
    }
