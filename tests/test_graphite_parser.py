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


def test_long_tail_weighted_average(spark):
    series = make_series(spark, {
        "a.cpu": [2.0, 4.0], "a.mem": [10.0, 10.0],
        "w.cpu": [1.0, 3.0], "w.mem": [3.0, 1.0],
    })
    out = evaluate_target(
        "weightedAverage(grep(a.*, '^a\\.'), grep(w.*, '^w\\.'), 1)", series
    )
    # ts0: (2*1 + 10*3) / (1+3) = 8.0 ; ts1: (4*3 + 10*1) / (3+1) = 5.5
    assert vals(out) == [8.0, 5.5]


def test_long_tail_wildcards_and_stddev(spark):
    series = make_series(spark, {"u0.req": [1.0, 3.0], "u1.req": [3.0, 5.0]})
    avg = evaluate_target("averageSeriesWithWildcards(u*.req, 0)", series)
    assert [r["metric"] for r in avg.collect()][0] == "req"
    assert vals(avg) == [2.0, 4.0]
    sd = evaluate_target("stddevSeries(u0.req, u1.req)", series)
    assert vals(sd) == [1.0, 1.0]  # population stddev of {1,3} / {3,5}


def test_long_tail_npercentile_most_deviant(spark):
    series = make_series(spark, {
        "flat": [5.0, 5.0, 5.0, 5.0],
        "wild": [0.0, 10.0, 0.0, 10.0],
        "mild": [4.0, 6.0, 4.0, 6.0],
    })
    kept = evaluate_target("mostDeviant(2, *)", series)  # 0.9.x arg order
    assert set(r["metric"] for r in kept.collect()) == {"wild", "mild"}
    kept2 = evaluate_target("mostDeviant(*, 2)", series)  # 1.x arg order
    assert set(r["metric"] for r in kept2.collect()) == {"wild", "mild"}
    np_ = evaluate_target("nPercentile(flat, 50)", series)
    assert set(vals(np_, "flat")) == {5.0}


def test_long_tail_pointwise_and_naming(spark):
    series = make_series(spark, {"x.y.z": [60.0, None, 120.0]})
    assert vals(evaluate_target("scaleToSeconds(x.y.z, 1)", series)) == [1.0, None, 2.0]
    assert vals(evaluate_target("offsetToZero(x.y.z)", series)) == [0.0, None, 60.0]
    assert vals(evaluate_target("isNonNull(x.y.z)", series)) == [1.0, 0.0, 1.0]
    assert [r["metric"] for r in evaluate_target("aliasByMetric(x.y.z)", series).collect()][0] == "z"
    assert [r["metric"] for r in evaluate_target("substr(x.y.z, 1)", series).collect()][0] == "y.z"
    assert [r["metric"] for r in evaluate_target("substr(x.y.z, 0, 2)", series).collect()][0] == "x.y"
    assert vals(evaluate_target("minimumAbove(x.y.z, 100)", series)) == []
    # display decorations are data no-ops
    assert vals(evaluate_target("secondYAxis(stacked(x.y.z))", series)) == [60.0, None, 120.0]


def test_long_tail_smart_summarize(spark):
    # points at minutes 0..4; 2-minute buckets anchored at min ts
    series = make_series(spark, {"m": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = evaluate_target("smartSummarize(m, '2min', 'sum')", series)
    assert vals(out) == [3.0, 7.0, 5.0]
    thr = evaluate_target("threshold(4, 'limit')", series)
    assert set(r["metric"] for r in thr.collect()) == {"limit"}
    assert set(vals(thr)) == {4.0}


def test_long_tail_percentile_band_filters(spark):
    series = make_series(spark, {
        "low":  [1.0, 1.0, 1.0, 1.0],
        "mid1": [5.0, 5.0, 5.0, 5.0],
        "mid2": [5.5, 5.5, 5.5, 5.5],
        "mid3": [6.0, 6.0, 6.0, 6.0],
        "high": [9.0, 9.0, 9.0, 9.0],
    })
    out = evaluate_target("averageOutsidePercentile(*, 20)", series)
    assert set(r["metric"] for r in out.collect()) == {"low", "high"}
    # one mid series spikes outside the per-ts band once -> it survives
    series2 = make_series(spark, {
        "low":  [1.0, 1.0, 1.0, 1.0],
        "mid":  [5.0, 99.0, 5.0, 5.0],
        "mid2": [5.5, 5.5, 5.5, 5.5],
        "mid3": [5.2, 5.2, 5.2, 5.2],
        "high": [9.0, 9.0, 9.0, 9.0],
    })
    out2 = evaluate_target("removeBetweenPercentile(*, 20)", series2)
    kept = set(r["metric"] for r in out2.collect())
    assert "mid" in kept and "low" in kept and "high" in kept
    assert "mid2" not in kept and "mid3" not in kept


def test_compiled_glob_resolves_to_in_list_with_names_dimension(spark):
    """SURVEY §4.2 #5: with a metric-names dimension supplied, a glob
    inside a compiled target becomes a pushable IN-list (no rlike in the
    plan); without it, the rlike fallback remains."""
    from rearview_spark.functions.graphite import evaluate_target

    rows = [(m, i) for m in ("u0.click", "u1.click", "u2.view") for i in range(3)]
    ts = spark.createDataFrame(
        [(m, __import__("datetime").datetime(2024, 1, 1, i), float(i)) for m, i in rows],
        "metric string, ts timestamp, value double",
    )
    names = ts.select("metric").distinct()

    pruned = evaluate_target("sumSeries(u{0,2}.*)", ts, metric_names=names)
    plan = pruned._jdf.queryExecution().optimizedPlan().toString()
    assert "RLIKE" not in plan.upper()
    assert "u0.click" in plan  # resolved literal IN-list reached the plan

    fallback = evaluate_target("sumSeries(u{0,2}.*)", ts)
    plan_fb = fallback._jdf.queryExecution().optimizedPlan().toString()
    assert "RLIKE" in plan_fb.upper()

    # identical values either way
    assert sorted(map(tuple, pruned.collect())) == sorted(map(tuple, fallback.collect()))
