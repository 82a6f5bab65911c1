"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The per-query timing is wall clock of plan execution + result
materialization (count only — the driver compares engine throughput, not
driver-side collect cost). A warmup pass on sf0.001 primes the JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rearview_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family (scan-agg, join, window, pandas-UDF,
# dedup, similarity, text). Full coverage runs in the correctness gate.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "top3_parts_per_brand",
    "latest_order_per_customer",
    "ts_hourly_summarize",  # restored: bench lines are never removed (r16 contract)
    "ts_daily_stats",  # r16 ADDED line: the multi-agg G15 variant
    "ts_moving_average",
    "ts_as_percent",
    "ts_ema",
    "doc_text_features",
    "dedup_minhash_lsh",
    "sim_brute_force_topk",
    "q7_nation_volume",
    "ev_sessionization",
    "monitor_run_statuses",
    "stream_hourly_stats",
    "dedup_embedding_cosine",
    "dedup_simhash_pairs",
    "q10_returned_items",
    "ev_asof_last_purchase",
    "q8_market_share",
    "ts_rollup_cascade",
    "doc_tfidf_top_terms",
    # round-2 additions: curation + graphite long tail + compressed ANN
    "doc_benchmark_contamination",
    "doc_pack_sequences",
    "ts_weighted_average",
    # round-4: ANN serving split — the PQ index (codebooks + codes) is
    # built ONCE and persisted, as a deployment would (build amortizes
    # across millions of queries); the headline line times only the
    # ADC scan over the persisted index. Build cost is reported as its
    # own line (sim_pq_fit_encode) so neither number hides the other.
    "sim_pq_scan_topk",
    # round-5: rollup-tier routing (serve summarize from materialized tiers)
    "ts_rollup_router",
    # round-6: subquery-shape join family + new pipeline restructurings
    "q21_shape_waiting_suppliers",
    "doc_segment_dedup",
    "doc_bm25_topk",
    # round-6: selection + robust-anomaly families
    "doc_dsir_importance",
    "ts_anomaly_mad",
    # round-7: the r06-staged gates, now registered
    "ts_lttb_downsample",
    "sim_range_search",
    # round-9: the r07-staged gates, now registered — one line per new
    # operator family (incremental dedup, span dedup, cluster-balanced
    # selection); doc_html_clean / doc_leakage_safe_split share plan
    # families already timed (regexp chain, component join).
    "dedup_incremental_minhash",
    "dedup_duplicated_spans",
    "sel_cluster_balanced",
    # round-9: the bounded-mapInPandas media decode family (synthesize +
    # zlib inflate + unfilter per row) gets its own perf line
    "media_png_pixels",
    # round-10: one line per new plan family — two-scan exact heavy
    # hitters (vs the full GROUP BY it replaces), iterative fixed-point
    # PageRank (checkpointed edge reuse across 5 joins), and the
    # index-served BM25 (posting-list probe vs corpus scan)
    "ev_heavy_hitters",
    "graph_pagerank",
    "doc_bm25_indexed",
    # round-10 second batch: corpus-level PMI (two explodes into
    # vocab-sized aggs), seasonal decomposition (window pass + tiny
    # joins), Bloom-pruned join (runtime-filter probe). The exact
    # set-similarity join (dedup_setsim_prefix) is deliberately NOT a
    # bench line: it is output-bound by design (~3-8 s warm at sf0.1, but
    # cold/loaded samples ranged to 31 s against a ~23 s whole-bench
    # total) and its perf story is the measured decade-scaling table
    # in PLANS.md.
    "doc_pmi_collocations",
    "ts_seasonal_decompose",
    "ev_bloom_prune_join",
    # round-12: one line per new plan family — asymmetric sign-LSH
    # probe against a broadcast benchmark (decontamination), global-rank
    # bucket join (sorted-neighborhood blocking), sketch-merge sliding
    # distinct (daily HLL registers + window max), and the outer
    # stream-stream join's state/flush cost
    "sim_contamination",
    "dedup_sorted_neighborhood",
    "ev_hll_sliding_distinct",
    "stream_outer_attribution",
    # round-13: one line per newly REGISTERED plan family (the r12
    # backlog flipped live this round) — end-to-end entity resolution
    # (blocking + match + closure), Arrow-batched integer Gram + power
    # iteration (distributed PCA), the global-running-sum sweep line
    # (peak concurrency), the index-served trigram LIKE probe, and the
    # two-joins-per-iteration HITS fixed point. The other new gates ride
    # plan families already timed (window sweeps, group windows,
    # iterative min-label joins).
    "er_customer_entities",
    "sim_top_component",
    "ev_peak_concurrency",
    "doc_trigram_search",
    "graph_hits",
    # round-13 second wave: broadcast-model scoring (Naive Bayes
    # classify) and the full-outer changelog merge (CDC apply) — the
    # two remaining new plan families; AUC/PR ride the same collapse
    # machinery as ev_peak_concurrency's running sum, bucketed-join
    # cost is write-dominated and measured in PLANS.md instead.
    "doc_nb_language",
    "rel_cdc_apply",
    # round-13 third wave (the eval/drift family): the label x vocab
    # contingency cross (chi-squared feature selection — one corpus
    # explode+distinct, everything after on the vocab domain) and the
    # full-table global_row_number rank pass (equi-depth histogram —
    # the ranked-pass family's representative). KS/KM/gains ride the
    # distinct-value-collapse + global_running_sum machinery already
    # timed by ev_peak_concurrency; stream_ks_drift's cost is the
    # foreachBatch harness, measured in PLANS.md like its PSI sibling.
    "doc_chi2_tokens",
    "rel_equidepth_hist",
    # round-14: one line per newly REGISTERED plan family (the 16-gate
    # staged wave flipped live this round) — the two-EMA-passes + join
    # + lag standing-alert shape (crossover), the constant-factor
    # contribution-explode distinct (stickiness), and the candidate-
    # pair sketch-fidelity audit (per-pair signature zip + exact
    # verify). The other flips ride timed families: slo_burn/burstiness
    # the grid + prefix-sum machinery, winsorize/benford the ranked and
    # string-render passes, degree_hist/roi the graph joins,
    # ks_drift_by_type the collapsed-domain windows, vocab/zipf/overlap
    # the corpus-explode vocab aggregates already on the board.
    "ts_ema_crossover",
    "ev_stickiness",
    "dedup_minhash_fidelity",
]


def _current_round(here: str) -> int | None:
    """The round being run, so the drift baseline never compares a run
    against its own round's earlier output (ADVICE r05 #3). Inferred
    from the newest COMPLETED round: the max of VERDICT.md's header
    round and the rounds whose end-of-round artifact PAIR exists (the
    driver writes BENCH_rN and CORRECTNESS_rN together when round N
    closes; a lone BENCH file is the ADVICE-r05 mid-round state and
    does NOT count). The verdict header alone goes stale when the judge
    skips a round — round 12's bench wrongly treated r11 as "current"
    and fell back to the r10 baseline. Overridable via
    SPARK_GRAFT_BASELINE_ROUND (baseline pinned to exactly that
    round)."""
    import glob
    import re

    pin = os.environ.get("SPARK_GRAFT_BASELINE_ROUND")
    if pin:
        try:
            return int(pin) + 1  # caller excludes >= current
        except ValueError:
            pass
    done: list[int] = []
    try:
        with open(os.path.join(here, "VERDICT.md")) as f:
            m = re.search(r"round\s+(\d+)", f.readline())
        if m:
            done.append(int(m.group(1)))
    except OSError:
        pass
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and os.path.exists(
            os.path.join(here, f"CORRECTNESS_r{m.group(1)}.json")
        ):
            done.append(int(m.group(1)))
    return max(done) + 1 if done else None


def _previous_bench(
    here: str | None = None,
    want_sf: object | None = None,
) -> tuple[str, dict, object, dict] | None:
    """(round tag, timings, sf, spread) of the newest prior-round bench
    record — the cross-round drift baseline.

    Two sources, per round: ``bench_history/r*.json`` (written by this
    script — the FULL payload, always parseable) is preferred over the
    driver's ``BENCH_r*.json``, because the driver stores only the last
    ~2000 chars of stdout: round 9's JSON line outgrew that window, its
    ``parsed`` field came back empty, and the drift comparison silently
    lost its baseline (the r10 root cause for the missing comparable
    block). Records without per-query timings are skipped. Files tagged
    with the current (or a later) round are skipped so the comparable
    block always measures cross-round drift, even when this round's
    output already sits in the repo."""
    import glob
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    current = _current_round(here)

    def _rounds(pattern: str, rx: str):
        for p in glob.glob(pattern):
            m = re.search(rx, p)
            if not m:
                continue
            rnd = int(m.group(1))
            if current is not None and rnd >= current:
                continue
            yield rnd, p

    records: dict[int, tuple[dict, object, dict, str]] = {}
    # driver files first; history files overwrite (preferred source)
    for rnd, p in _rounds(
        os.path.join(here, "BENCH_r*.json"), r"BENCH_r(\d+)\.json$"
    ):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        parsed = data.get("parsed") or {}
        queries = (data.get("queries") or parsed.get("queries")) or {}
        sf = data.get("sf", parsed.get("sf"))
        if queries and (want_sf is None or sf == want_sf):
            spread = (data.get("spread") or parsed.get("spread")) or {}
            records[rnd] = (dict(queries), sf, dict(spread), os.path.basename(p))
    for rnd, p in _rounds(
        os.path.join(here, "bench_history", "r*.json"),
        r"r(\d+)(?:_sf[0-9.]+)?\.json$",
    ):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if data.get("queries") and (
            want_sf is None or data.get("sf") == want_sf
        ):
            # a stray archive from a quick low-SF local run never masks
            # the real prior-round baseline at the bench SF
            records[rnd] = (
                dict(data["queries"]),
                data.get("sf"),
                dict(data.get("spread") or {}),
                os.path.join("bench_history", os.path.basename(p)),
            )
    if not records:
        return None
    rnd = max(records)
    queries, sf, spread, path = records[rnd]
    return f"r{rnd:02d}", queries, sf, spread, path


def format_driver_line(out: dict, limit: int = 1900) -> str:
    """The PRINTED one-line JSON contract, guaranteed under the driver's
    ~2000-char stdout tail window (VERDICT r16 next-round #2: the r15
    and r16 lines both outgrew it, which nulled the driver's own
    cross-round baseline two rounds running). Unconditionally: compact
    separators, per-query seconds at 2dp, and a SUMMARY-only
    ``comparable`` (vs_round, n, totals, delta) — the full-precision
    timings, spreads, per-pass samples and detail maps all live in
    ``bench_history/`` (the archive _previous_bench prefers). If the
    line still exceeds ``limit`` (far more queries than today's 63),
    the comparable drops, then per-query precision falls to 1dp; the
    contract keys (metric/value/unit/queries/sf) are never dropped.
    tests/test_bench_baseline.py pins the real headline set's headroom."""
    slim = dict(out)
    slim["queries"] = {q: round(v, 2) for q, v in out["queries"].items()}
    comp = out.get("comparable")
    if comp:
        summary = {
            k: comp[k]
            for k in ("vs_round", "n_queries", "total", "prev_total", "delta_pct")
            if k in comp
        }
        slim["comparable"] = summary
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) > limit and "comparable" in slim:
        del slim["comparable"]
        line = json.dumps(slim, separators=(",", ":"))
    if len(line) > limit:
        slim["queries"] = {q: round(v, 1) for q, v in slim["queries"].items()}
        line = json.dumps(slim, separators=(",", ":"))
    return line


def _pq_index_build(spark, sf_dir: str, base: str) -> None:
    """Untimed-headline index build: fit + encode + persist (its wall
    time is reported separately as sim_pq_fit_encode)."""
    from pyspark.sql import functions as F  # noqa: F401

    from rearview_spark.operators import similarity as S
    from rearview_spark.sources.loader import Tables

    emb = Tables(spark, sf_dir).embeddings
    cb = S.pq_fit(emb, m=4, k=16, iters=2)
    codes = S.pq_encode(emb, cb, m=4)
    cb.write.mode("overwrite").parquet(f"{base}/pq_codebook")
    codes.write.mode("overwrite").parquet(f"{base}/pq_codes")


def _pq_scan_from_index(spark, sf_dir: str, base: str):
    """Serving path: read the persisted index, ADC-scan it."""
    from pyspark.sql import functions as F

    from rearview_spark.operators import similarity as S
    from rearview_spark.sources.loader import Tables

    cb = spark.read.parquet(f"{base}/pq_codebook")
    codes = spark.read.parquet(f"{base}/pq_codes")
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    return S.pq_scan_topk(codes, cb, queries, topk=10, m=4)


def main() -> None:
    import tempfile

    from rearview_spark.plans import all_queries

    spark = get_spark("rearview_bench")
    qs = all_queries()
    index_dir = tempfile.mkdtemp(prefix="rearview_bench_idx_")

    # warmup: prime JVM JIT + whole-stage-codegen class compilation for
    # EVERY headline plan shape on the smallest SF, so the timed sf0.1 runs
    # measure engine throughput, not first-compile of the generated code
    # (codegen classes are keyed by plan shape and reused across SFs).
    warm_idx = f"{index_dir}/warm"
    for name in HEADLINE:
        if name == "sim_pq_scan_topk":
            _pq_index_build(spark, "/root/testdata/sf0.001", warm_idx)
            _pq_scan_from_index(spark, "/root/testdata/sf0.001", warm_idx).count()
        else:
            qs[name]["fn"](spark, "/root/testdata/sf0.001").count()

    # N full interleaved PASSES over the whole headline set (VERDICT_r15
    # next-round #4): each pass times every query once, so the artifact
    # carries >= 3 whole-suite same-code samples (per-pass totals +
    # loadavg below) instead of a single run's story — three rounds
    # running, the single-sample comparable told a false drift story
    # (+37%, +7.5%) that had to be adjudicated away in prose. Per-query
    # point estimate stays the MIN across passes (the standard low-noise
    # estimator — one-off host interference inflates a single sample up
    # to ~50%, and the engine's own post-warmup variance is small), so
    # per-query values and the min-based cross-round delta remain
    # apples-to-apples with every prior round's archive. Interleaving
    # passes (A B C, A B C) rather than repeating each query back-to-
    # back additionally decorrelates a load burst from any one query's
    # samples. Caches created inside a query fn are dropped between
    # samples so every sample pays the query's real materialization
    # cost. The per-query spread [min, median, max] is also emitted:
    # round 8 measured per-query swings up to ±40% on byte-identical
    # code, so drift adjudication needs the spread, not the point.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def _spread(s: list[float]) -> list[float]:
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        return [round(s[0], 3), round(med, 3), round(s[-1], 3)]

    def _loadavg() -> str:
        try:
            with open("/proc/loadavg") as f:
                return " ".join(f.read().split()[:3])
        except OSError:
            return "n/a"

    def _timed(thunk) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        thunk()
        return time.perf_counter() - t0

    pass_times: list[dict[str, float]] = []
    pass_loads: list[str] = []
    for _p in range(passes):
        pass_loads.append(_loadavg())
        cur: dict[str, float] = {}
        for name in HEADLINE:
            if name == "sim_pq_scan_topk":
                # build once per pass (its own line), then time the scan
                cur["sim_pq_fit_encode"] = _timed(
                    lambda: _pq_index_build(spark, SF_DIR, f"{index_dir}/main")
                )
                cur[name] = _timed(
                    lambda: _pq_scan_from_index(
                        spark, SF_DIR, f"{index_dir}/main"
                    ).count()
                )
            else:
                fn = qs[name]["fn"]
                cur[name] = _timed(lambda: fn(spark, SF_DIR).count())
        pass_times.append(cur)

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in pass_times[0]:
        s = sorted(pt[name] for pt in pass_times)
        timings[name] = round(s[0], 3)
        spreads[name] = _spread(s)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "repeats": passes,
    }
    # Cross-round drift, computed on the queries BOTH rounds timed so new
    # headline lines never skew the comparison (VERDICT r04 next-round #8).
    prev = _previous_bench(want_sf=out["sf"])
    if prev is not None:
        tag, prev_timings, prev_sf, prev_spread, prev_file = prev
        shared = sorted(set(timings) & set(prev_timings))
        if shared and prev_sf == out["sf"]:  # same scale factor only
            now_total = round(sum(timings[q] for q in shared), 3)
            prev_total = round(sum(prev_timings[q] for q in shared), 3)
            # Per-query drift candidates past +/-30% (min-vs-min). When
            # the PREVIOUS round also recorded spread, a candidate only
            # counts as real drift if the two [min, max] sample ranges
            # DON'T overlap — round 8 proved overlapping ranges are
            # measurement noise (±40% swings on byte-identical code).
            outliers = {}
            noise = {}
            for q in shared:
                if not prev_timings[q]:
                    continue
                delta = (timings[q] - prev_timings[q]) / prev_timings[q]
                if abs(delta) <= 0.30:
                    continue
                ps = prev_spread.get(q)
                cs = spreads.get(q)
                overlapping = (
                    ps is not None
                    and cs is not None
                    and cs[0] <= ps[2]
                    and ps[0] <= cs[2]
                )
                (noise if overlapping else outliers)[q] = round(100.0 * delta, 1)
            # Whole-suite same-code samples (VERDICT_r15 next-round #4):
            # one total per interleaved pass over the SHARED query set,
            # plus the median — the robust headline reading. `total`
            # stays the min-based sum so delta_pct remains comparable
            # with prior rounds' min-based archives; a real regression
            # moves BOTH numbers, load noise moves only the median.
            sample_totals = [
                round(sum(pt[q] for q in shared), 3) for pt in pass_times
            ]
            st = sorted(sample_totals)
            median_total = round(
                st[len(st) // 2]
                if len(st) % 2
                else (st[len(st) // 2 - 1] + st[len(st) // 2]) / 2,
                3,
            )
            out["comparable"] = {
                "vs_round": tag,
                # which archived run the totals were compared against
                # (VERDICT r10 next-round #8)
                "baseline_file": prev_file,
                "n_queries": len(shared),
                "total": now_total,
                "sample_totals": sample_totals,
                "median_total": median_total,
                "loadavg": pass_loads,
                "prev_total": prev_total,
                "delta_pct": round(100.0 * (now_total - prev_total) / prev_total, 1)
                if prev_total
                else None,
                "outliers": outliers,
                # >30% min-vs-min movement whose sample ranges overlap
                # the prior round's — reported, but adjudicated as noise
                "within_noise": noise,
            }

    # Archive the FULL payload (queries + per-query spread + uncapped
    # comparable) under bench_history/r{N}.json: the driver records only
    # the last ~2000 chars of stdout, and once the printed line outgrew
    # that window (r09) its parse silently failed and the next round lost
    # its drift baseline. The archive is the durable cross-round record
    # _previous_bench prefers; the PRINTED line stays the driver contract
    # and is kept under the window by moving spread out of it and capping
    # the comparable detail maps (full versions live in the archive).
    here = os.path.dirname(os.path.abspath(__file__))
    full = dict(out)
    full["spread"] = spreads
    # raw per-pass per-query samples — the material drift adjudication
    # actually needs (the printed line stays within the driver window)
    full["pass_queries"] = [
        {q: round(v, 3) for q, v in pt.items()} for pt in pass_times
    ]
    try:
        hist = os.path.join(here, "bench_history")
        os.makedirs(hist, exist_ok=True)
        rnd = _current_round(here)
        name = (
            f"r{rnd:02d}_sf{out['sf']}.json" if rnd else f"local_sf{out['sf']}.json"
        )
        with open(os.path.join(hist, name), "w") as f:
            json.dump(full, f)
        # ALSO keep a per-run copy (…_runK.json): the latest-run file
        # above is what _previous_bench reads (its glob regex skips the
        # _runK suffix), but a round often benches several times and the
        # per-run spreads are the raw material for noise adjudication —
        # overwriting them erased r10's earlier runs (PLANS.md note).
        k = 1
        while os.path.exists(
            os.path.join(hist, name.replace(".json", f"_run{k}.json"))
        ):
            k += 1
        with open(
            os.path.join(hist, name.replace(".json", f"_run{k}.json")), "w"
        ) as f:
            json.dump(full, f)
    except OSError:
        pass  # archiving is best-effort; the printed contract line rules

    print(format_driver_line(out))


if __name__ == "__main__":
    main()
