"""apply_cdc (operators/cdc.py): last-writer-wins collapse, upsert and
delete semantics, replay idempotence, and the execution-time op guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rearview_spark.operators.cdc import apply_cdc


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )


def test_apply_cdc_semantics(spark):
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [
            # delete key 1
            (1, None, None, "D", 5),
            # two updates on key 2 delivered OUT OF ORDER: seq 7 wins
            (2, "b2-late", 22.0, "U", 7),
            (2, "b2-early", 21.0, "U", 6),
            # insert a new key 4
            (4, "d", 40.0, "I", 1),
            # I on an EXISTING key is an upsert (CDC feeds deliver both)
            (3, "c-re", 33.0, "I", 2),
        ],
        "k long, s string, v double, op string, seq long",
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in apply_cdc(snap, changes, ["k"], ["seq"]).collect()
    }
    assert got == {
        2: ("b2-late", 22.0),
        3: ("c-re", 33.0),
        4: ("d", 40.0),
    }


def test_apply_cdc_replay_idempotent(spark):
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [(1, None, None, "D", 1), (2, "b9", 29.0, "U", 9), (2, "b8", 28.0, "U", 8)],
        "k long, s string, v double, op string, seq long",
    )
    once = apply_cdc(snap, changes, ["k"], ["seq"])
    twice = apply_cdc(once, changes, ["k"], ["seq"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    # a delete that wins over an earlier update stays deleted on replay
    assert {r["k"] for r in twice.collect()} == {2, 3}


def test_apply_cdc_rejects_unknown_op_and_empty_keys(spark):
    snap = _snap(spark)
    bad = spark.createDataFrame(
        [(1, "x", 1.0, "Z", 1)], "k long, s string, v double, op string, seq long"
    )
    with pytest.raises(Exception, match="I/U/D"):
        apply_cdc(snap, bad, ["k"], ["seq"]).collect()
    with pytest.raises(ValueError, match="key column"):
        apply_cdc(snap, bad, [], ["seq"])


def test_apply_cdc_losing_op_never_validated_but_winner_is(spark):
    """The guard applies to the WINNING row per key: a stale bad op that
    loses the collapse is filtered before validation (the guard rides
    the post-collapse projection), while a winning bad op raises."""
    snap = _snap(spark)
    changes = spark.createDataFrame(
        [(2, "ok", 25.0, "U", 9), (2, "stale", 0.0, "Z", 1)],
        "k long, s string, v double, op string, seq long",
    )
    got = {r["k"]: r["v"] for r in apply_cdc(snap, changes, ["k"], ["seq"]).collect()}
    assert got[2] == 25.0


def test_cdc_foreach_batch_cross_batch_late_arrivals(spark, tmp_path):
    """The streaming state must make last-writer-wins associative ACROSS
    micro-batches: a seq-5 update in batch 0 is not regressed by a
    straggling seq-3 update in batch 1; a seq-7 delete tombstone keeps
    blocking a seq-6 update that arrives two batches later; a retried
    batch re-merges from its predecessor (no double-apply); and the
    final snapshot equals one apply_cdc pass over the union."""
    from rearview_spark.operators.cdc import (
        apply_cdc,
        cdc_foreach_batch,
        cdc_state_snapshot,
    )

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    schema = "k long, s string, v double, op string, seq long"
    batches = [
        # batch 0: the WINNING update on 2 and the delete on 3
        [(2, "b5", 25.0, "U", 5), (3, None, None, "D", 7)],
        # batch 1: stragglers that must both lose
        [(2, "b3-late", 23.0, "U", 3), (3, "c6-late", 36.0, "U", 6)],
        # batch 2: a fresh insert + another straggler on 2
        [(4, "d", 40.0, "I", 1), (2, "b4-late", 24.0, "U", 4)],
    ]
    state = str(tmp_path / "cdc_state")
    proc = cdc_foreach_batch(spark, state, snap, ["k"], ["seq"])
    for i, rows in enumerate(batches):
        proc(spark.createDataFrame(rows, schema), i)
    proc(spark.createDataFrame(batches[2], schema), 2)  # retry

    got = sorted(map(tuple, cdc_state_snapshot(spark, state).collect()))
    union = spark.createDataFrame(
        [r for b in batches for r in b], schema
    )
    want = sorted(map(tuple, apply_cdc(snap, union, ["k"], ["seq"]).collect()))
    assert got == want
    assert got == [(1, "a", 10.0), (2, "b5", 25.0), (4, "d", 40.0)]
