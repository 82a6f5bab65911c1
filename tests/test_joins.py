"""asof_join / range_join semantics against hand-computed expectations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from rearview_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [("u1", _ts(0), 100), ("u1", _ts(5), 101), ("u1", _ts(10), 102), ("u2", _ts(3), 200)],
        "k string, ts timestamp, lid int",
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), 1.0), ("u1", _ts(9), 2.0), ("u2", _ts(4), 3.0)],
        "k string, ts timestamp, v double",
    )
    got = {
        r["lid"]: (r["v"], r["ts_r"])
        for r in asof_join(left, right, on="ts", by=("k",)).collect()
    }
    assert got[100] == (None, None)  # nothing at-or-before t0
    assert got[101] == (1.0, _ts(5))  # inclusive: equal ts matches
    assert got[102] == (2.0, _ts(9))  # latest at-or-before wins
    assert got[200] == (None, None)  # u2's only right row is after t3


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [("u1", _ts(0), 1), ("u1", _ts(6), 2)], "k string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [("u1", _ts(5), 10.0), ("u1", _ts(60), 20.0)], "k string, ts timestamp, v double"
    )
    fwd = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, on="ts", by=("k",), direction="forward").collect()
    }
    assert fwd == {1: 10.0, 2: 20.0}  # nearest at-or-after
    tol = {
        r["lid"]: r["v"]
        for r in asof_join(
            left, right, on="ts", by=("k",), direction="forward", tolerance_s=600
        ).collect()
    }
    assert tol == {1: 10.0, 2: None}  # 54 min away > 10-min tolerance


def test_asof_collision_suffix(spark):
    left = spark.createDataFrame([("u1", _ts(1), 1.0)], "k string, ts timestamp, v double")
    right = spark.createDataFrame([("u1", _ts(0), 9.0)], "k string, ts timestamp, v double")
    out = asof_join(left, right, on="ts", by=("k",))
    assert "v" in out.columns and "v_r" in out.columns and "ts_r" in out.columns
    row = out.collect()[0]
    assert (row["v"], row["v_r"]) == (1.0, 9.0)


def test_asof_join_is_single_shuffle(spark):
    """The plan must contain exactly one Exchange — the union+LOCF shape —
    and no BroadcastNestedLoop/Cartesian (what a theta-join would plan)."""
    left = spark.createDataFrame([("a", _ts(1), 1)], "k string, ts timestamp, lid int")
    right = spark.createDataFrame([("a", _ts(0), 2.0)], "k string, ts timestamp, v double")
    plan = asof_join(left, right, on="ts", by=("k",))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_buckets(spark):
    fact = spark.createDataFrame(
        [(i, _ts(i * 30)) for i in range(10)], "fid int, ts timestamp"
    )  # every 30 min over 4.5h
    iv = spark.createDataFrame(
        [("w1", _ts(0), _ts(60)), ("w2", _ts(45), _ts(180))],
        "name string, w_start timestamp, w_end timestamp",
    )
    out = range_join(fact, iv, bucket_s=3600)
    got = sorted((r["name"], r["fid"]) for r in out.collect())
    # w1 = [0, 60): fids 0,1 (t=0,30); t=60 excluded (half-open)
    # w2 = [45, 180): fids 2..5 (t=60..150)
    assert got == [("w1", 0), ("w1", 1), ("w2", 2), ("w2", 3), ("w2", 4), ("w2", 5)]
    inc = range_join(fact, iv, bucket_s=3600, end_inclusive=True)
    assert sorted((r["name"], r["fid"]) for r in inc.collect()) == [
        ("w1", 0), ("w1", 1), ("w1", 2), ("w2", 2), ("w2", 3), ("w2", 4), ("w2", 5), ("w2", 6),
    ]


def test_range_join_no_nested_loop(spark):
    fact = spark.createDataFrame([(1, _ts(1))], "fid int, ts timestamp")
    iv = spark.createDataFrame([("w", _ts(0), _ts(5))], "name string, w_start timestamp, w_end timestamp")
    plan = range_join(fact, iv)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "Cartesian" not in plan


# --- Bloom-filter join pruning ------------------------------------------------

def test_bloom_semi_join_equals_plain_join(spark):
    from rearview_spark.operators import bloom as B

    big = spark.createDataFrame(
        [(i % 97, f"e{i}") for i in range(500)] + [(None, "enull")],
        "k long, tag string",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(0, 97, 7)], "dk long, name string"
    )
    got = sorted(
        (r["k"], r["tag"], r["name"])
        for r in B.bloom_semi_join(big, dim, "k", "dk", m_bits=256, k=3).collect()
    )
    want = sorted(
        (r["k"], r["tag"], r["name"])
        for r in big.join(dim, big["k"] == dim["dk"]).collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prune_no_false_negatives_and_prunes(spark):
    from rearview_spark.operators import bloom as B

    dim = spark.createDataFrame([(i,) for i in range(10)], "dk long")
    words = B.bloom_build(dim, "dk", m_bits=1024, k=4)
    big = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    kept = {r["k"] for r in B.bloom_prune(big, "k", words, m_bits=1024, k=4).collect()}
    assert set(range(10)) <= kept          # every true key survives
    assert len(kept) < 100                 # and the prune actually prunes
    # empty build side prunes everything
    empty = B.bloom_build(dim.filter("dk < 0"), "dk", m_bits=1024, k=4)
    assert B.bloom_prune(big, "k", empty, m_bits=1024, k=4).count() == 0
    with pytest.raises(ValueError):
        B.bloom_build(dim, "dk", m_bits=100)
    # null build keys are ignored (an inner join ignores them too),
    # not a driver-side TypeError
    dim_null = spark.createDataFrame([(1,), (None,)], "dk long")
    words_n = B.bloom_build(dim_null, "dk", m_bits=1024, k=4)
    assert {r["k"] for r in B.bloom_prune(big, "k", words_n, m_bits=1024, k=4).collect()} >= {1}
    # mismatched key types would silently false-negative via the string
    # rendering ("5" vs "5.0") — rejected loudly instead
    bigd = spark.createDataFrame([(5.0,)], "k double")
    with pytest.raises(ValueError, match="key types"):
        B.bloom_semi_join(bigd, dim, "k", "dk")


# --- Edit-distance (fuzzy string) join -----------------------------------------

def test_edit_distance_join_matches_brute_force(spark):
    from rearview_spark.operators.joins import edit_distance_join

    import random

    rng = random.Random(11)
    alphabet = "abcdef"
    strings = []
    for i in range(80):
        s = "".join(rng.choices(alphabet, k=rng.randint(6, 12)))
        strings.append((i, s))
        if rng.random() < 0.5:  # planted near-duplicates
            t = list(s)
            for _ in range(rng.randint(1, 2)):
                t[rng.randrange(len(t))] = rng.choice(alphabet)
            strings.append((1000 + i, "".join(t)))
    df = spark.createDataFrame(strings, "id long, s string")
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "s", "id", max_dist=2, q=2).collect()
    )
    a = df.selectExpr("id AS id_a", "s AS sa")
    b = df.selectExpr("id AS id_b", "s AS sb")
    want = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.crossJoin(b)
        .filter("id_a < id_b")
        .select("id_a", "id_b", F.levenshtein("sa", "sb").alias("dist"))
        .filter("dist <= 2")
        .collect()
    )
    assert got == want and len(got) >= 40  # the planted twins are all found


def test_edit_distance_join_repeated_grams_and_contract(spark):
    from rearview_spark.operators.joins import edit_distance_join

    # repeated q-grams: multiset intersection must count multiplicity,
    # and strings below the q + k*q contract length are excluded
    df = spark.createDataFrame(
        [(1, "aaaaaaaa"), (2, "aaaaaaab"), (3, "abc")], "id long, s string"
    )
    rows = edit_distance_join(df, "s", "id", max_dist=2, q=2).collect()
    assert [(r["id_a"], r["id_b"], r["dist"]) for r in rows] == [(1, 2, 1)]


def test_sorted_neighborhood_exact_pair_set(spark):
    """The bucket-join blocking emits exactly {(a,b): rn_a < rn_b <=
    rn_a + w} over the total order — checked against the definition on
    a shuffled input, including pairs that span bucket boundaries."""
    import itertools

    from rearview_spark.operators.joins import sorted_neighborhood_pairs

    vals = [(i, f"k{i:03d}", i * 10.0) for i in range(13)]
    import random

    random.Random(7).shuffle(vals)
    df = spark.createDataFrame(vals, "id long, key string, bal double")
    for w in (1, 3, 13, 20):
        got = {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(
                df, ["key"], window=w, id_col="id"
            ).collect()
        }
        want = {
            (a, b)
            for a, b in itertools.combinations(range(13), 2)
            if b - a <= w  # key order == id order by construction
        }
        assert got == want, f"window={w}"


def test_sorted_neighborhood_carry_cols_and_guard(spark):
    import pytest

    from rearview_spark.operators.joins import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.0)], "id long, key string, bal double"
    )
    rows = sorted_neighborhood_pairs(
        df, ["key"], window=2, id_col="id", carry_cols=("bal",)
    ).collect()
    assert [(r.id_a, r.id_b, r.bal_a, r.bal_b) for r in rows] == [(1, 2, 5.0, 7.0)]
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, ["key"], window=0, id_col="id")


def test_table_diff_classification_and_null_safety(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from rearview_spark.operators.joins import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "id long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),        # unchanged
            (2, "b", 20.0),        # NULL -> value counts as change
            (4, None, 40.0),       # NULL == NULL is NOT a change
            (5, "e", 50.0),        # added
        ],                          # id 3 removed
        "id long, s string, v double",
    )
    got = {
        r["kind"]: r["n_rows"]
        for r in table_diff(old, new, ["id"], ["s", "v"]).collect()
    }
    assert got == {
        "added": 1,
        "removed": 1,
        "changed": 1,
        "unchanged": 2,
        "col_changed:s": 0,
        "col_changed:v": 1,
    }
    # empty compare set is a clear validation error, not a TypeError
    # from F.when(None, ...) deep in the agg (ADVICE r12)
    with pytest.raises(ValueError, match="at least one compare column"):
        table_diff(old, new, ["id"], [])


def test_allocate_proportional_exact_reconciliation(spark):
    from pyspark.sql import functions as F

    from rearview_spark.operators.allocation import allocate_proportional

    # group 1: T=100 over weights 1,1,1 -> 34,33,33 (pennies to the
    # smallest tiebreak); group 2: T=7 over weights 5,3 -> 5,2 exactly
    # (floor 4,2 + penny to larger remainder 5*7%8=3 vs 3*7%8=5 -> w=3)
    rows = [
        (1, 1, 1, 100), (1, 2, 1, 100), (1, 3, 1, 100),
        (2, 1, 5, 7), (2, 2, 3, 7),
    ]
    df = spark.createDataFrame(rows, "g long, line long, w long, t long")
    got = {
        (r["g"], r["line"]): r["alloc"]
        for r in allocate_proportional(df, "g", "w", "t", "line").collect()
    }
    assert got == {(1, 1): 34, (1, 2): 33, (1, 3): 33, (2, 1): 4, (2, 2): 3}
    # invariant: per-group sums equal the amount exactly
    out = allocate_proportional(df, "g", "w", "t", "line")
    sums = {
        r["g"]: (r["s"], r["t"])
        for r in out.groupBy("g")
        .agg(F.sum("alloc").alias("s"), F.first("t").alias("t"))
        .collect()
    }
    assert all(s == t for s, t in sums.values())


def test_allocate_proportional_rejects_negative_inputs(spark):
    """Negative amounts/weights break the floor-share invariant
    (truncating div != floor on negatives) — the execution-time guard
    must fire instead of silently failing reconciliation (ADVICE r12)."""
    from rearview_spark.operators.allocation import allocate_proportional

    neg_amount = spark.createDataFrame(
        [(1, 1, 1, -100), (1, 2, 1, -100)], "g long, line long, w long, t long"
    )
    with pytest.raises(Exception, match="nonnegative"):
        allocate_proportional(neg_amount, "g", "w", "t", "line").collect()
    neg_weight = spark.createDataFrame(
        [(1, 1, -5, 100), (1, 2, 3, 100)], "g long, line long, w long, t long"
    )
    with pytest.raises(Exception, match="nonnegative"):
        allocate_proportional(neg_weight, "g", "w", "t", "line").collect()
