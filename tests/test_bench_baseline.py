"""The bench comparable block must measure CROSS-round drift: the
baseline picker skips BENCH files tagged with the round being run, so a
run never compares against its own round's earlier output (ADVICE r05
#3 — observed when BENCH_r05.json already sat in the repo root while
round 5 was still running). No Spark needed."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _write_bench(
    tmp_path, rnd: int, wrapped: bool, spread: bool = False, closed: bool = True
) -> None:
    doc = {"queries": {"q1": 1.0 + rnd}, "sf": 0.1}
    if spread:
        doc["spread"] = {"q1": [1.0 + rnd, 1.2 + rnd, 1.5 + rnd]}
    if wrapped:  # the driver wraps our JSON line under "parsed"
        doc = {"parsed": doc}
    (tmp_path / f"BENCH_r{rnd:02d}.json").write_text(json.dumps(doc))
    if closed:  # the end-of-round commit writes the correctness file too
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text("{}")


def test_current_round_from_verdict_header(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BASELINE_ROUND", raising=False)
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 5\n\nbody\n")
    assert bench._current_round(str(tmp_path)) == 6
    # no VERDICT.md (round 1): no exclusion possible
    assert bench._current_round(str(tmp_path / "nowhere")) is None


def test_current_round_env_pin_wins(tmp_path, monkeypatch):
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 9\n")
    monkeypatch.setenv("SPARK_GRAFT_BASELINE_ROUND", "4")
    # pin means "baseline exactly round 4" -> everything >= 5 excluded
    assert bench._current_round(str(tmp_path)) == 5


def test_previous_bench_skips_current_round(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BASELINE_ROUND", raising=False)
    _write_bench(tmp_path, 4, wrapped=True)
    # mid-round-5 state (ADVICE r05 #3): a LONE BENCH_r05 with no
    # CORRECTNESS_r05 — round 5 is still running, baseline stays r04
    _write_bench(tmp_path, 5, wrapped=True, closed=False)
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 4\n")
    tag, queries, sf, _spread, path = bench._previous_bench(str(tmp_path))
    assert tag == "r04" and queries == {"q1": 5.0} and sf == 0.1
    assert path == "BENCH_r04.json"
    # round 5 closes (artifact pair complete): r05 becomes the baseline
    # even while the verdict header lags (judge skipped the round — the
    # r12-observed state)
    (tmp_path / "CORRECTNESS_r05.json").write_text("{}")
    tag, queries, _, _, _ = bench._previous_bench(str(tmp_path))
    assert tag == "r05" and queries == {"q1": 6.0}


def test_previous_bench_accepts_unwrapped_shape_and_no_verdict(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BASELINE_ROUND", raising=False)
    _write_bench(tmp_path, 3, wrapped=False)
    _write_bench(tmp_path, 4, wrapped=False, closed=False)  # current round
    tag, queries, sf, spread, _path = bench._previous_bench(str(tmp_path))
    assert tag == "r03" and queries == {"q1": 4.0} and sf == 0.1
    assert spread == {}  # pre-spread rounds read back as empty


def test_previous_bench_returns_spread_when_recorded(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BASELINE_ROUND", raising=False)
    _write_bench(tmp_path, 9, wrapped=True, spread=True)
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 9\n")
    _write_bench(tmp_path, 10, wrapped=True, closed=False)  # current round
    _tag, _q, _sf, spread, _path = bench._previous_bench(str(tmp_path))
    assert spread == {"q1": [10.0, 10.2, 10.5]}


def test_previous_bench_none_when_all_excluded(tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BASELINE_ROUND", raising=False)
    # round 1 still running (lone BENCH, no correctness pair), and the
    # verdict header confirms no prior round completed
    _write_bench(tmp_path, 1, wrapped=True, closed=False)
    (tmp_path / "VERDICT.md").write_text("# VERDICT — round 0\n")
    assert bench._previous_bench(str(tmp_path)) is None
