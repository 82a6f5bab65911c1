"""Property-based tests (hypothesis): G-layer operators vs independent
pandas reference implementations over randomized series with nulls.

These target the divergence-prone semantics SURVEY.md §5.2 flags — null
propagation through windows, LOCF, delta across gaps — on inputs the
hand-written table tests don't enumerate. Example counts are kept small
(each example runs Spark jobs); the value is the randomized null
patterns, not volume.

Determinism policy (VERDICT_r15 next-round #2): every settings block
sets ``derandomize=True`` so suite-green is a stable gate signal — a
latent falsifying example either fails every run or none, instead of
surfacing as a flake rounds later (the r15 correlation-matrix red).
Exact-equality assertions are permitted ONLY where both sides compute
the identical float expression over exact integers, or the inputs are
generated on the operator's own quantization grid; everything else
bounds the comparison by the operator's stated error envelope.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rearview_spark.operators import timeseries as G

# Whole module runs in the slow lane (VERDICT r16 next-round #8): ~8 min
# of Hypothesis sweeps — the single biggest block of suite wall time.
# `pytest tests/ -q -m slow` runs it; the default lane deselects it so
# the driver's verification window is met (see pytest.ini).
pytestmark = pytest.mark.slow

T0 = dt.datetime(2024, 1, 1)

series_strategy = st.lists(
    st.one_of(
        st.none(),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=30,
)

SETTINGS = settings(
    derandomize=True,
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, vals):
    rows = [
        ("m", T0 + dt.timedelta(minutes=i), float(v) if v is not None else None)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "metric string, ts timestamp, value double")


def _out(df):
    return [r["value"] for r in df.orderBy("ts").collect()]


def _close(a, b):
    if a is None and (b is None or (isinstance(b, float) and math.isnan(b))):
        return True
    if a is None or b is None or (isinstance(b, float) and math.isnan(b)):
        return False
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)


@SETTINGS
@given(vals=series_strategy)
def test_keep_last_value_is_ffill(spark, vals):
    got = _out(G.keep_last_value(_df(spark, vals)))
    want = pd.Series(vals, dtype="float64").ffill().tolist()
    assert all(_close(g, w) for g, w in zip(got, want, strict=True))


@SETTINGS
@given(vals=series_strategy, n=st.integers(min_value=1, max_value=5))
def test_moving_average_matches_pandas_rolling(spark, vals, n):
    got = _out(G.moving_average(_df(spark, vals), n))
    want = pd.Series(vals, dtype="float64").rolling(n, min_periods=1).mean().tolist()
    assert all(_close(g, w) for g, w in zip(got, want, strict=True))


@SETTINGS
@given(vals=series_strategy)
def test_derivative_is_diff_with_null_gaps(spark, vals):
    got = _out(G.derivative(_df(spark, vals)))
    s = pd.Series(vals, dtype="float64")
    # Graphite semantics: delta vs the immediately preceding POINT (null
    # neighbor -> null), not the last non-null observation.
    want = (s - s.shift(1)).tolist()
    assert all(_close(g, w) for g, w in zip(got, want, strict=True))


@SETTINGS
@given(vals=series_strategy)
def test_integral_is_nan_skipping_cumsum(spark, vals):
    got = _out(G.integral(_df(spark, vals)))
    s = pd.Series(vals, dtype="float64")
    want = s.fillna(0).cumsum().where(s.notna()).tolist()
    assert all(_close(g, w) for g, w in zip(got, want, strict=True))


@SETTINGS
@given(
    vals=st.lists(
        st.floats(min_value=0.125, max_value=1e5, allow_nan=False),
        min_size=1,
        max_size=30,
    )
)
def test_summarize_sum_matches_pandas_resample(spark, vals):
    # contiguous 1-min series -> every 10-min bucket in range is non-empty,
    # so Spark's sparse output and pandas' dense resample coincide
    got = G.summarize(_df(spark, vals), "10 minutes", "sum")
    got_map = {r["ts"]: r["value"] for r in got.collect()}
    idx = pd.DatetimeIndex([T0 + dt.timedelta(minutes=i) for i in range(len(vals))])
    want = pd.Series([float(v) for v in vals], index=idx).resample("10min").sum()
    want_map = {t.to_pydatetime(): v for t, v in want.items()}
    assert set(got_map) == set(want_map)
    assert all(_close(got_map[t], want_map[t]) for t in got_map)


@SETTINGS
@given(vals=series_strategy)
def test_transform_null_leaves_no_nulls(spark, vals):
    got = _out(G.transform_null(_df(spark, vals), -1.0))
    assert None not in got
    want = pd.Series(vals, dtype="float64").fillna(-1.0).tolist()
    assert all(_close(g, w) for g, w in zip(got, want, strict=True))


@pytest.mark.parametrize("n", [2, 7])
def test_minhash_signature_identical_docs_collide(spark, n):
    """Deterministic MinHash property: identical text -> identical
    signature, regardless of permutation family constants."""
    from pyspark.sql import functions as F

    from rearview_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * n) for i in range(4)],
        "doc_id long, text string",
    )
    sigs = D.minhash_signature(docs).select(F.col("sig").cast("string")).distinct()
    assert sigs.count() == 1


# --- curation operators ------------------------------------------------------

token_counts_strategy = st.lists(
    st.integers(min_value=1, max_value=120), min_size=1, max_size=60
)


@given(counts=token_counts_strategy, budget=st.integers(min_value=16, max_value=200))
@SETTINGS
def test_pack_sequences_greedy_invariants(spark, counts, budget):
    """Independent replay of the greedy recurrence + structural
    invariants, over randomized doc lengths and budgets (single shard so
    the recurrence is global)."""
    from rearview_spark.operators.curation import pack_sequences

    rows = [(i, " ".join(["w"] * c), "en") for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc_id"]: (r["pack_seq"], r["pack_pos"], r["pack_fill"])
        for r in pack_sequences(df, budget=budget, n_shards=1).collect()
    }
    # reference replay
    seq, fill, pos = 0, 0, 0
    for i, c in enumerate(counts):
        if pos > 0 and fill + c > budget:
            seq, fill, pos = seq + 1, 0, 0
        fill += c
        pos += 1
        assert out[i] == (seq, pos, fill), (i, counts, budget)


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=80, unique=True),
    rate=st.sampled_from([0.0, 0.15, 0.5, 1.0]),
)
@SETTINGS
def test_stratified_sample_matches_md5_rule_exactly(spark, ids, rate):
    import hashlib

    from rearview_spark.operators.curation import stratified_sample

    df = spark.createDataFrame([(i, "t", "xx") for i in ids],
                               "doc_id long, text string, lang string")
    kept = sorted(
        r["doc_id"] for r in stratified_sample(df, {}, default_rate=rate).collect()
    )
    expect = sorted(
        i for i in ids
        if int(hashlib.md5(f"{i}:strat".encode()).hexdigest()[:15], 16) % 10000
        < rate * 10000
    )
    assert kept == expect


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=16),
        min_size=3,
        max_size=25,
    )
)
@SETTINGS
def test_mad_scores_match_pandas_median(spark, vals):
    """Exact per-series median/MAD vs the independent pandas reference."""
    from rearview_spark.operators.anomaly import mad_scores

    df = _df(spark, vals)
    row = mad_scores(df).limit(1).collect()[0]
    s = pd.Series([float(v) for v in vals])
    med = s.median()
    mad = (s - med).abs().median()
    assert _close(row["med"], med) and _close(row["mad"], mad)


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=16),
        min_size=4,
        max_size=20,
    ),
    a=st.floats(min_value=0.5, max_value=3.0, allow_nan=False),
    b=st.floats(min_value=-100.0, max_value=100.0, allow_nan=False),
)
@SETTINGS
def test_mad_robust_z_invariant_under_affine_map(spark, vals, a, b):
    """robust_z is invariant under value -> a*value + b (a > 0): the
    affine map scales med and MAD together. Flags must not depend on
    units (ms vs s, bytes vs MB)."""
    from rearview_spark.operators.anomaly import mad_anomalies

    base = mad_anomalies(_df(spark, vals)).orderBy("ts").collect()
    mapped_vals = [a * v + b for v in vals]
    mapped = mad_anomalies(_df(spark, mapped_vals)).orderBy("ts").collect()
    assert [r["ts"] for r in base] == [r["ts"] for r in mapped]
    for r1, r2 in zip(base, mapped):
        # invariance holds at engineering precision, not bit-exactness:
        # each mapped value rounds once (a*v+b), and (x - med)/MAD
        # amplifies that ulp by |v|/MAD — for a near-degenerate MAD
        # (~1e-8 from values ~1) the relative error reaches ~1e-8, which
        # hypothesis duly found at _close's former rel_tol=1e-9
        assert r2["robust_z"] == pytest.approx(r1["robust_z"], rel=1e-6)


@given(
    n=st.integers(min_value=2, max_value=8),
    k=st.integers(min_value=1, max_value=8),
)
@SETTINGS
def test_mmr_lambda_one_is_relevance_topk(spark, n, k):
    """With lam=1 the diversity term vanishes: MMR must reproduce the
    relevance ranking exactly, for any candidate count and k."""
    from rearview_spark.operators.retrieval import mmr_rerank

    rows = [
        (0, i, 1.0 - i * 0.01, [float(i % 3), float(i % 5), 1.0])
        for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(
        rows, "query_id long, vec_id long, cosine_sim double, embedding array<double>"
    )
    out = mmr_rerank(df, k=k, lam=1.0).orderBy("mmr_rank").collect()
    assert [r["vec_id"] for r in out] == list(range(1, min(k, n) + 1))


# --- completeness of the exact-join candidate filters -------------------------

_corpus_strategy = st.lists(
    st.text(alphabet="abcd", min_size=6, max_size=14),
    min_size=5,
    max_size=30,
)

# each example runs several Spark jobs INCLUDING a brute-force cross
# join — fewer, larger examples beat many small ones here
_JOIN_SETTINGS = settings(
    derandomize=True,
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_JOIN_SETTINGS
@given(strings=_corpus_strategy, k=st.integers(min_value=1, max_value=2))
def test_edit_distance_join_complete_on_random_corpora(spark, strings, k):
    """The q-gram count filter may prune candidates but never results:
    on arbitrary corpora (within the length contract) the filtered join
    equals brute-force levenshtein."""
    from pyspark.sql import functions as F

    from rearview_spark.operators.joins import edit_distance_join

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "id long, s string"
    ).filter(F.length("s") >= 2 + k * 2)
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, "s", "id", max_dist=k, q=2).collect()
    )
    a = df.selectExpr("id AS id_a", "s AS sa")
    b = df.selectExpr("id AS id_b", "s AS sb")
    want = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.crossJoin(b)
        .filter("id_a < id_b")
        .select("id_a", "id_b", F.levenshtein("sa", "sb").alias("dist"))
        .filter(F.col("dist") <= k)
        .collect()
    )
    assert got == want


@_JOIN_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=4,
        max_size=20,
    ),
    t=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_setsim_prefix_complete_on_random_corpora(spark, docs, t):
    """AllPairs/PPJoin prefix filtering equals brute force on random
    word-set corpora at several thresholds — the structural
    completeness guarantee, fuzzed."""
    from pyspark.sql import functions as F

    from rearview_spark.operators.dedup import setsim_prefix_pairs

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in setsim_prefix_pairs(df, threshold=t).collect()
    }
    base = df.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("s"),
    )
    a = base.selectExpr("id AS id_a", "s AS sa")
    b = base.selectExpr("id AS id_b", "s AS sb")
    jac = F.round(
        F.size(F.array_intersect("sa", "sb")).cast("double")
        / F.size(F.array_union("sa", "sb"))
        + F.lit(5e-10),
        6,
    )
    want = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in a.crossJoin(b)
        .filter("id_a < id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= t)
        .collect()
    }
    assert got == want


# --- round 12: blocking-join completeness + attribution conservation --------

@given(
    keys=st.lists(st.integers(min_value=0, max_value=40), min_size=2, max_size=25),
    window=st.integers(min_value=1, max_value=8),
)
@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sorted_neighborhood_completeness_fuzzed(spark, keys, window):
    """The bucket-join blocking emits EXACTLY the definition's pair set
    {(i, j): rank_i < rank_j <= rank_i + w} under random (possibly
    duplicated) sort keys — duplicates resolved by the unique-id
    tiebreaker, pairs across bucket boundaries included."""
    from rearview_spark.operators.joins import sorted_neighborhood_pairs

    rows = [(i, k) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "id long, k long")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(
            df, ["k", "id"], window=window, id_col="id"
        ).collect()
    }
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    want = {
        (order[a], order[b])
        for a in range(len(order))
        for b in range(a + 1, min(a + window, len(order) - 1) + 1)
    }
    assert got == want


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=3600),   # seconds offset
            st.sampled_from(["click", "purchase"]),
            st.floats(min_value=0.01, max_value=100.0, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_multi_touch_attribution_conserves_value_fuzzed(spark, events):
    """Every attributed conversion's credits sum to exactly its value
    (one double division can't lose mass beyond float addition error);
    conversions with no in-window touch produce no rows; weights stay
    within [1, W+1]."""
    from rearview_spark.operators.behavior import multi_touch_attribution

    rows = [
        (i, T0 + dt.timedelta(seconds=off), u, et, round(v, 2))
        for i, (u, off, et, v) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    out = multi_touch_attribution(df, window_seconds=600).collect()
    by_conv: dict = {}
    for r in out:
        assert 1 <= r.w <= 601
        by_conv.setdefault(r.conversion_id, []).append(r.credit)
    values = {eid: v for eid, _, _, et, v in rows if et == "purchase"}
    for cid, credits in by_conv.items():
        assert abs(sum(credits) - values[cid]) < 1e-9


# --- r12 graph operators vs pure-Python references on random graphs ---------

edge_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=18,
)

GRAPH_SETTINGS = settings(
    derandomize=True,
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _sym_edges(pairs):
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    return sorted({(a, b) for a, b in und} | {(b, a) for a, b in und})


def _kcore_py(edges, k):
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


def _bfs_py(edges, seeds, max_hops):
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    dist = {v: 0 for v in seeds if v in adj}
    frontier = set(dist)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.add(v)
        frontier = nxt
    return dist


@GRAPH_SETTINGS
@given(pairs=edge_strategy, k=st.integers(min_value=1, max_value=4))
def test_k_core_matches_python_peel(spark, pairs, k):
    from rearview_spark.operators.graph import k_core

    edges = _sym_edges(pairs)
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r["node"]: r["core_degree"] for r in k_core(df, k=k, max_rounds=12).collect()}
    assert got == _kcore_py(edges, k)


@GRAPH_SETTINGS
@given(pairs=edge_strategy, seed_bits=st.integers(min_value=1, max_value=1023))
def test_bfs_hops_matches_python_bfs(spark, pairs, seed_bits):
    from rearview_spark.operators.graph import bfs_hops

    edges = _sym_edges(pairs)
    seeds = [v for v in range(10) if seed_bits & (1 << v)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node bigint")
    got = {r["node"]: r["hops"] for r in bfs_hops(df, sdf, max_hops=4).collect()}
    assert got == _bfs_py(edges, seeds, 4)


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 1)),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_ks_two_sample_matches_scipy_style_bruteforce(spark, pairs):
    """KS D equals the brute-force max CDF gap computed in Python, and
    the integer numerator is exactly D * n_a * n_b."""
    from rearview_spark.operators.anomaly import ks_two_sample

    df = spark.createDataFrame(
        [(float(v), g) for v, g in pairs], "v double, grp int"
    )
    r = ks_two_sample(df, "v", "grp").collect()[0]
    a = sorted(v for v, g in pairs if g == 0)
    b = sorted(v for v, g in pairs if g == 1)
    assert (r["n_a"], r["n_b"]) == (len(a), len(b))
    if not a or not b:
        assert r["d_stat"] is None
        return
    vals = sorted({v for v, _ in pairs})
    best = 0
    for x in vals:
        ca = sum(1 for v in a if v <= x)
        cb = sum(1 for v in b if v <= x)
        best = max(best, abs(ca * len(b) - cb * len(a)))
    assert r["d_num"] == best
    assert r["d_stat"] == best / (len(a) * len(b))


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 1)),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_kaplan_meier_matches_python_product(spark, subjects):
    """KM survival equals the brute-force product-limit estimate at
    every event time (to the 6dp contract), and the risk sets are
    exact."""
    import math

    from rearview_spark.operators.stats import kaplan_meier

    df = spark.createDataFrame(
        [(t, e) for t, e in subjects], "dur int, evt int"
    )
    rows = kaplan_meier(df, "dur", "evt").collect()
    # brute force
    times = sorted({t for t, e in subjects if e == 1})
    surv = 1.0
    want = []
    for t in times:
        n_risk = sum(1 for tt, _ in subjects if tt >= t)
        d = sum(1 for tt, e in subjects if tt == t and e == 1)
        surv *= (n_risk - d) / n_risk
        want.append((t, n_risk, d))
    assert [(r["t"], r["n_risk"], r["d"]) for r in rows] == want
    # survival monotone nonincreasing in [0, 1], matching brute force
    surv = 1.0
    for r, (t, n_risk, d) in zip(rows, want):
        surv *= (n_risk - d) / n_risk
        assert abs(r["survival"] - surv) < 2e-6
        assert 0.0 <= r["survival"] <= 1.0


@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 1)),
        min_size=2,
        max_size=40,
    ),
    st.integers(2, 7),
)
@SETTINGS
def test_cumulative_gains_invariants(spark, pairs, n_bins):
    """Bucket populations differ by <= 1, cum_pos is monotone, the
    final row always reads gain=1/lift=1 when positives exist, and
    totals reconcile."""
    from rearview_spark.operators.evaluation import cumulative_gains

    rows = [(i, s, y) for i, (s, y) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id int, s int, y int")
    out = cumulative_gains(df, "y", "s", "id", n_bins=n_bins).collect()
    ns = [r["n"] for r in out]
    assert max(ns) - min(ns) <= 1
    assert sum(ns) == len(pairs)
    assert sum(r["n_pos"] for r in out) == sum(y for _, y in pairs)
    cps = [r["cum_pos"] for r in out]
    assert cps == sorted(cps)
    if sum(y for _, y in pairs) > 0:
        assert out[-1]["gain"] == 1.0 and out[-1]["lift"] == 1.0


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=1, max_size=6),
        ),
        min_size=2,
        max_size=12,
    )
)
@SETTINGS
def test_chi2_tokens_matches_python_contingency(spark, docs):
    """chi2 values equal a direct Python computation of the 2x2
    presence-contingency statistic over the full label x vocab cross."""
    from rearview_spark.operators.classify import chi2_tokens

    rows = [(i, lab, " ".join(toks)) for i, (lab, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, lab string, text string")
    out = chi2_tokens(df, "lab", k=100).collect()

    n = len(docs)
    labels = {lab for lab, _ in docs}
    presence = {}
    for i, (lab, toks) in enumerate(docs):
        for w in set(toks):
            presence.setdefault(w, []).append((i, lab))
    n_label = {l: sum(1 for lab, _ in docs if lab == l) for l in labels}
    want = {}
    for w, members in presence.items():
        dfw = len(members)
        for l in labels:
            a = sum(1 for _, lab in members if lab == l)
            b = dfw - a
            c = n_label[l] - a
            d = n - n_label[l] - b
            den = (
                float(a + b) * float(c + d) * float(a + c) * float(b + d)
            )
            if den > 0:
                adbc = a * d - b * c
                want[(l, w)] = (
                    float(n) * float(adbc) * float(adbc) / den
                )
    got = {(r["label"], r["token"]): r["chi2"] for r in out}
    for key, v in got.items():
        assert key in want
        assert abs(v - want[key]) < 1e-9


@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=24),
    st.integers(1, 4),
)
@SETTINGS
def test_burstiness_fano_matches_numpy(spark, per_bucket, width):
    """Fano over the dense grid equals numpy var/mean of the count
    vector including interior zeros."""
    import numpy as np

    from rearview_spark.operators.behavior import burstiness_fano

    rows = []
    for b, k in enumerate(per_bucket):
        for i in range(k):
            rows.append(("K", b * width * 3600 + i))
    if not rows:
        return
    df = spark.createDataFrame(rows, "event_type string, ts long")
    r = burstiness_fano(df, bucket_seconds=width * 3600).collect()[0]
    # numpy reference over the grid spanned by OCCUPIED buckets
    occupied = [b for b, k in enumerate(per_bucket) if k > 0]
    lo, hi = min(occupied), max(occupied)
    grid = np.array(per_bucket[lo : hi + 1], dtype=float)
    assert r["n_buckets"] == len(grid)
    assert abs(r["mean_per_bucket"] - grid.mean()) < 1e-12
    if grid.sum() > 0:
        assert abs(r["fano"] - grid.var() / grid.mean()) < 1e-9


@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    )
)
@SETTINGS
def test_vocab_growth_invariants(spark, docs):
    """vocab_size is strictly increasing across emitted deciles, its
    last value equals the corpus vocabulary, and new_tokens sums to
    the same total."""
    from rearview_spark.operators.text import vocab_growth

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = vocab_growth(df, deciles=4).collect()
    vocab = len({w for toks in docs for w in toks})
    sizes = [r["vocab_size"] for r in out]
    assert sizes == sorted(sizes) and len(set(sizes)) == len(sizes)
    assert sizes[-1] == vocab
    assert sum(r["new_tokens"] for r in out) == vocab
    # deciles with no new tokens are absent (documented), so the last
    # EMITTED row only closes the corpus when it IS the final decile
    if out[-1]["decile"] == 3:
        assert out[-1]["docs_processed"] == len(docs)
    assert all(1 <= r["docs_processed"] <= len(docs) for r in out)


# --- r14 behavior/profiling operators: invariants a pandas reference
# can check on randomized small frames ---------------------------------

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),       # user id
        st.integers(min_value=0, max_value=3 * 86400),  # ts seconds
        st.sampled_from(["a", "b", "c"]),            # kind
    ),
    min_size=1,
    max_size=40,
)


@given(rows=events_strategy)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pareto_share_invariants(spark, rows):
    """cum_share is monotone non-decreasing, ends at exactly 1.0, and
    cum_keys/cum_rows reconstruct the per-bucket columns."""
    from rearview_spark.operators.behavior import pareto_share

    df = spark.createDataFrame(
        [(f"u{u}",) for u, _t, _k in rows], "user_id string"
    )
    out = pareto_share(df, n_buckets=4).collect()
    assert out, "non-empty input must produce buckets"
    assert out[-1]["cum_share"] == 1.0
    shares = [r["cum_share"] for r in out]
    assert shares == sorted(shares)
    assert sum(r["n_keys"] for r in out) == out[-1]["cum_keys"]
    assert sum(r["n_rows"] for r in out) == out[-1]["cum_rows"] == len(rows)


@given(rows=events_strategy)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interarrival_summary_matches_pandas(spark, rows):
    """Gap statistics agree with an independent pandas computation of
    the same ceil(p*n) discrete-percentile definition."""
    import math as _math

    from rearview_spark.operators.behavior import interarrival_summary

    df = spark.createDataFrame(
        [(f"u{u}", t, k) for u, t, k in rows],
        "user_id string, ts long, event_type string",
    )
    got = {r["kind"]: r for r in interarrival_summary(df).collect()}

    gaps: dict = {}
    byk: dict = {}
    for u, t, k in rows:
        byk.setdefault((u, k), []).append(t)
    for (u, k), ts in byk.items():
        ts.sort()
        for a, b in zip(ts, ts[1:]):
            gaps.setdefault(k, []).append(b - a)
    assert set(got) == set(gaps)
    for k, g in gaps.items():
        g.sort()
        n = len(g)
        r = got[k]
        assert r["n_gaps"] == n
        assert _math.isclose(r["mean_gap_s"], sum(g) / n, rel_tol=1e-12)
        assert r["p50_gap_s"] == g[_math.ceil(0.5 * n) - 1]
        assert r["p90_gap_s"] == g[_math.ceil(0.9 * n) - 1]
        assert r["max_gap_s"] == g[-1]


@given(rows=events_strategy)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_new_vs_returning_invariants(spark, rows):
    """n_new + n_returning == n_active per bucket; each user is new in
    exactly one bucket; totals match the distinct user count."""
    from rearview_spark.operators.behavior import new_vs_returning

    df = spark.createDataFrame(
        [(f"u{u}", t) for u, t, _k in rows], "user_id string, ts long"
    )
    out = new_vs_returning(df).collect()
    users = {f"u{u}" for u, _t, _k in rows}
    assert sum(r["n_new"] for r in out) == len(users)
    for r in out:
        assert r["n_new"] + r["n_returning"] == r["n_active"]
        assert r["new_share"] == r["n_new"] / r["n_active"]
    # the first active bucket is all-new by construction
    assert out[0]["n_returning"] == 0


@given(
    # Inputs on the operator's own 1/quant grid (quant=100): an affine
    # relation y = 2x + 1 survives round(x*quant) ONLY for grid-aligned
    # x — e.g. x=0.375 quantizes to 38 while 2*0.375+1 quantizes to 175
    # != 2*38+100, so corr < 1 is the CORRECT answer off the grid
    # (VERDICT_r15 falsifying example). Exact-±1 is the operator's
    # contract only on the grid, so generate there.
    xs=st.lists(
        st.integers(min_value=-(10**6), max_value=10**6).map(
            lambda k: k / 100.0
        ),
        min_size=3,
        max_size=25,
    )
)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_correlation_matrix_bounds_and_symmetry(spark, xs):
    """Correlations stay in [-1, 1] (quantized-domain Cauchy-Schwarz);
    corr(x, x-derived) of a positive affine image is 1.0 at the
    operator's own quantization, PROVIDED the inputs sit on the 1/quant
    grid (off-grid, independent per-column rounding legitimately breaks
    exact affinity — see the strategy comment)."""
    from rearview_spark.operators.profiling import correlation_matrix

    rows = [(float(x), float(2.0 * x + 1.0), float(-x)) for x in xs]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {(r["col_x"], r["col_y"]): r["corr"] for r in
           correlation_matrix(df, ["x", "y", "z"]).collect()}
    for v in out.values():
        if v is not None:
            assert -1.0 <= v <= 1.0
    # affine image: exactly +1 / -1 unless quantization collapsed x
    if out[("x", "y")] is not None:
        assert out[("x", "y")] == 1.0
        assert out[("x", "z")] == -1.0


# --- r15 wave: gini / simpson / seasonal MAD vs independent references


@given(rows=events_strategy)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gini_concentration_matches_reference(spark, rows):
    """The published Gini equals the textbook ascending-rank formula
    computed independently in Python; bounds hold (0 <= G < 1, 0 for
    perfectly even counts, NULL below 2 keys)."""
    from collections import Counter

    from rearview_spark.operators.behavior import gini_concentration

    df = spark.createDataFrame(
        [(f"u{u}",) for u, _t, _k in rows], "user_id string"
    )
    out = gini_concentration(df).collect()
    assert len(out) == 1
    r = out[0]
    counts = sorted(Counter(f"u{u}" for u, _t, _k in rows).values())
    n, sx = len(counts), sum(counts)
    assert r["n_keys"] == n and r["n_rows"] == sx
    if n < 2:
        assert r["gini"] is None
        return
    ref = (2 * sum(i * x for i, x in enumerate(counts, 1)) - (n + 1) * sx) / (
        n * sx
    )
    assert 0.0 <= r["gini"] < 1.0
    assert abs(r["gini"] - ref) <= 5e-7 + 1e-9
    if len(set(counts)) == 1:
        assert r["gini"] == 0.0


@given(rows=events_strategy)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_source_simpson_matches_reference(spark, rows):
    """Per-source Simpson equals the independent pandas/Counter
    reference sum n(n-1)/(N(N-1)); bounds hold."""
    from collections import Counter

    from rearview_spark.operators.text import source_simpson_diversity

    docs = [
        (i, " ".join(f"w{(u + j) % 4}" for j in range(t % 5 + 1)), f"s{k}")
        for i, (u, t, k) in enumerate(rows)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    out = {r["source"]: r for r in source_simpson_diversity(df).collect()}

    by_src: dict = {}
    for _i, text, src in docs:
        for w in text.split():
            by_src.setdefault(src, Counter())[w] += 1
    assert set(out) == set(by_src)
    for src, cnt in by_src.items():
        r = out[src]
        N = sum(cnt.values())
        assert r["n_tokens"] == N and r["vocab"] == len(cnt)
        if N < 2:
            assert r["simpson"] is None
            continue
        ref = sum(c * (c - 1) for c in cnt.values()) / (N * (N - 1))
        assert 0.0 <= r["simpson"] <= 1.0
        assert abs(r["simpson"] - ref) <= 5e-7 + 1e-9


@given(rows=events_strategy)
@settings(derandomize=True, max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_seasonal_mad_matches_per_slot_reference(spark, rows):
    """Every flagged point (and no other) exceeds the per-(metric, slot)
    rank-explicit median/MAD rule computed independently in Python."""
    from rearview_spark.operators.anomaly import seasonal_mad_anomalies

    pts = [
        ("m", t, float(u * 7 + (t % 13)))
        for u, t, _k in rows
    ]
    # (metric, ts) must be unique — dedupe ts collisions
    seen = set()
    uniq = []
    for m, t, v in pts:
        if t not in seen:
            seen.add(t)
            uniq.append((m, t, v))
    df = spark.createDataFrame(uniq, "metric string, ts long, value double")
    period, bucket = 3, 7
    got = {(r["slot"], r["ts"]): r["robust_z"]
           for r in seasonal_mad_anomalies(
               df, threshold=3.5, period=period, bucket_seconds=bucket
           ).collect()}

    def median(sorted_pairs):
        # rank-explicit: ranks (n+1)//2 and n//2+1 of (value, ts) order
        n = len(sorted_pairs)
        lo = sorted_pairs[(n + 1) // 2 - 1][0]
        hi = sorted_pairs[n // 2][0]
        return (lo + hi) / 2

    by_slot: dict = {}
    for m, t, v in uniq:
        by_slot.setdefault((t // bucket) % period, []).append((t, v))
    expect = {}
    for slot, pv in by_slot.items():
        med = median(sorted((v, t) for t, v in pv))
        mad = median(sorted((abs(v - med), t) for t, v in pv))
        if mad <= 0:
            continue
        for t, v in pv:
            if abs(0.6745 * (v - med)) > 3.5 * mad:
                expect[(slot, t)] = 0.6745 * (v - med) / mad
    assert set(got) == set(expect)
    for k, z in expect.items():
        assert got[k] == z


# --- r16 wave: modularity / weighted shortest paths vs brute force ----------

graph_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=14,
)


@given(pairs=graph_strategy, k=st.integers(1, 3))
@SETTINGS
def test_modularity_matches_brute_force(spark, pairs, k):
    """modularity vs a literal Python evaluation of Newman's formula on
    random small graphs with a deterministic (node % k) partition.
    All-integer contract -> exact equality is legitimate."""
    from rearview_spark.operators.graph import modularity

    und = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    edges = [(a, b) for a, b in und] + [(b, a) for a, b in und]
    nodes = sorted({n for e in edges for n in e})
    labels = [(n, n % k) for n in nodes]
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    ldf = spark.createDataFrame(labels, "node bigint, label bigint")
    got = {r["label"]: r for r in modularity(edf, ldf).collect()}

    m2 = len(edges)
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    lab = dict(labels)
    for c in sorted({l for _, l in labels}):
        members = [n for n in nodes if lab[n] == c]
        intra2 = sum(1 for s, d in edges if lab[s] == c and lab[d] == c)
        deg_sum = sum(deg[n] for n in members)
        r = got[c]
        assert (r["n_nodes"], r["intra2"], r["deg_sum"], r["m2"]) == (
            len(members), intra2, deg_sum, m2
        )
        assert r["dq_num"] == m2 * intra2 - deg_sum * deg_sum
    # global Q bounds: sum of contributions in [-1/2, 1)
    q = sum(r["dq_num"] for r in got.values()) / (m2 * m2)
    assert -0.5 <= q < 1.0


wgraph_strategy = st.lists(
    st.tuples(
        st.integers(0, 6), st.integers(0, 6), st.integers(1, 9)
    ).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=10,
)


@given(tris=wgraph_strategy, rounds=st.integers(1, 4))
@SETTINGS
def test_shortest_paths_matches_bounded_bellman_ford(spark, tris, rounds):
    """shortest_paths vs a literal Python bounded Bellman-Ford on
    random weighted graphs from seed node 0 (plus an off-graph seed).
    Pure int64 min/plus -> exact equality is legitimate; also pins the
    round cap as a path-length bound."""
    from rearview_spark.operators.graph import shortest_paths

    und = {}
    for a, b, w in tris:
        key = (min(a, b), max(a, b))
        und[key] = min(und.get(key, 10), w)  # parallel edges keep min w
    edges = [(a, b, w) for (a, b), w in und.items()] + [
        (b, a, w) for (a, b), w in und.items()
    ]
    edf = spark.createDataFrame(edges, "src bigint, dst bigint, w bigint")
    seeds = spark.createDataFrame([(0,), (99,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in shortest_paths(edf, seeds, rounds=rounds).collect()
    }

    nodes = sorted({n for s, d, _ in edges for n in (s, d)})
    INF = float("inf")
    ref = {n: (0 if n == 0 else INF) for n in nodes}
    if 0 not in nodes:
        assert got == {}
        return
    for _ in range(rounds):
        nxt = dict(ref)
        for s, d, w in edges:
            if ref[s] + w < nxt[d]:
                nxt[d] = ref[s] + w
        ref = nxt
    assert got == {n: d for n, d in ref.items() if d != INF}
