"""Salted join / salted aggregate: result-equivalence with the unsalted
forms on skewed data, and the expected plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from rearview_spark.operators.skew import salted_aggregate, salted_join


def _skewed(spark, n=2000):
    # 90% of rows share key 'hot'
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        [("hot", 1.5), ("k5", 2.5)], "k string, w double"
    )
    plain = left.join(right, ["k"]).select("rid", "w")
    salted = salted_join(left, right, on=["k"], salt_src=["rid"], n_salts=8).select("rid", "w")
    assert sorted(salted.collect()) == sorted(plain.collect())


def test_salted_join_left_outer(spark):
    left = _skewed(spark, 100)
    right = spark.createDataFrame([("hot", 9.0)], "k string, w double")
    plain = left.join(right, ["k"], "left").select("rid", "w")
    salted = salted_join(left, right, on=["k"], salt_src=["rid"], n_salts=4, how="left").select("rid", "w")
    assert sorted(salted.collect(), key=str) == sorted(plain.collect(), key=str)


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df,
            keys=["k"],
            aggs={"s": ("v", "sum"), "n": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")},
            salt_src=["rid"],
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_rejects_non_algebraic(spark):
    import pytest

    df = _skewed(spark, 10)
    with pytest.raises(ValueError, match="algebraic"):
        salted_aggregate(df, ["k"], {"a": ("v", "avg")}, ["rid"])


def test_salt_spreads_hot_key(spark):
    df = _skewed(spark)
    from rearview_spark.operators.skew import _salt_col

    n_distinct = (
        df.filter(F.col("k") == "hot")
        .select(_salt_col(["rid"], 8).alias("s"))
        .distinct()
        .count()
    )
    assert n_distinct == 8  # the hot key really lands on all salt buckets


def test_salted_aggregate_equivalence_property(spark):
    """Hypothesis property: for arbitrary key skew and salt counts, the
    two-phase salted aggregate is value-identical to one-phase groupBy
    on every algebraic aggregate (int sums — associativity is exact)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(derandomize=True, max_examples=8, deadline=None)
    @given(
        keys=st.lists(st.integers(0, 3), min_size=1, max_size=40),
        n_salts=st.integers(1, 9),
    )
    def prop(keys, n_salts):
        rows = [(f"k{k}", i, (i * 7) % 13) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "k string, rid long, v long")
        aggs = {
            "s": ("v", "sum"),
            "n": ("v", "count"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
        }
        salted = salted_aggregate(df, ["k"], aggs, salt_src=["rid"], n_salts=n_salts)
        plain = df.groupBy("k").agg(
            F.sum("v").alias("s"), F.count("v").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        )
        assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    prop()


def test_key_skew_report_hand_computed(spark):
    """Uniform keys -> gini 0; one hot key dominates -> gini rises;
    values match the closed-form hand computation."""
    from rearview_spark.operators.skew import key_skew_report

    uniform = spark.createDataFrame(
        [(k, i) for k in range(4) for i in range(5)], "k long, v long"
    )
    r = key_skew_report(uniform, "k").collect()[0]
    assert (r["n_keys"], r["total_rows"], r["max_count"]) == (4, 20, 5)
    assert r["p50_count"] == 5 and r["p99_count"] == 5
    assert r["gini"] == 0.0

    # counts 1,1,1,7 sorted -> gini = sum((2i-5)*c)/(4*10)
    #   = (-3*1 + -1*1 + 1*1 + 3*7)/40 = 18/40
    skewed_rows = [(0, 0), (1, 0), (2, 0)] + [(3, i) for i in range(7)]
    skewed = spark.createDataFrame(skewed_rows, "k long, v long")
    r2 = key_skew_report(skewed, "k").collect()[0]
    assert r2["max_count"] == 7
    assert r2["gini"] == 18 / 40
    import pytest as _pt

    with _pt.raises(ValueError):
        key_skew_report(uniform.filter("k > 99"), "k")
