"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, stratified sampling, repetition (Gopher-style) quality
metrics, and sequence packing.

Not rearview parity (the reference has no text processing) — these are
BASELINE.json north-star extensions, shaped for 100 TB:

- **decontamination**: the benchmark side is tiny by construction
  (benchmarks are MBs, the corpus is TBs), so its distinct n-gram set
  broadcasts and the corpus side is scanned once with a broadcast hash
  join — no shuffle of the training data at all.
- **stratified sampling**: a pure narrow map — keep/drop is a
  deterministic md5 threshold on the doc id, so the sample is
  reproducible across runs/retries (resumable backfills at scale) and
  needs no count-first pass or RNG state.
- **repetition metrics**: explode + codegen'd hash aggregates with
  map-side partial reduction (the same shape as the SimHash votes);
  nothing quadratic, shuffle keyed on doc_id.
- **sequence packing**: greedy first-fit packing is inherently a
  sequential recurrence, so it runs per *shard* (``doc_id % n_shards``):
  each shard packs independently inside one ``applyInPandas`` group —
  shard count scales with the cluster while the per-shard loop stays
  linear. This mirrors how production packers shard by file/partition.

All hashing is the md5-prefix scheme (``conv(substr(md5(x),1,15),16,10)``)
so the DuckDB oracles reproduce every decision bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rearview_spark.operators._util import ensure_parallelism
from rearview_spark.operators.dedup import md5_bucket, word_shingles
from rearview_spark.operators.text import token_count, tokens

# ---------------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap against an eval set)
# ---------------------------------------------------------------------------

def benchmark_contamination(
    train: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training docs sharing at least one word ``n``-gram with any
    benchmark doc (the public GPT-3/PaLM decontamination recipe:
    13-gram overlap flags a training doc as contaminated; ``n`` is a
    parameter because the right width depends on tokenizer and corpus).

    Returns ``(doc_id, n_shared_grams, n_bench_docs)`` — distinct
    overlapping n-grams and distinct benchmark docs touched — for
    flagged docs only.

    Scale shape: the benchmark gram set is broadcast (eval sets are MBs
    against a TB corpus), so the training side is one scan + broadcast
    semi-join + one aggregate keyed on doc_id; the corpus never
    shuffles on gram.
    """
    tgrams = ensure_parallelism(train, id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    bgrams = (
        bench.select(
            F.col(id_col).alias("bench_id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("gram"),
        )
        .distinct()
    )
    return (
        tgrams.join(F.broadcast(bgrams), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_shared_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.1,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Keep each row with its stratum's probability, decided by a
    deterministic md5 threshold on the id — the training-mix primitive
    (e.g. upsample en, downsample boilerplate sources).

    ``keep ⇔ md5_60(id || ':' || salt) mod 10000 < rate * 10000`` — no
    RNG, so reruns/backfills keep exactly the same rows, and the filter
    is a narrow map evaluated at scan time (predicate pushdown applies;
    no count-first pass, no sampleBy approximation).
    """
    bucket = md5_bucket(F.col(id_col), salt)
    rate = F.lit(int(default_rate * 10000))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(int(v * 10000))).otherwise(rate)
    return df.filter(bucket < rate)


# ---------------------------------------------------------------------------
# PII scrubbing (typed redaction)
# ---------------------------------------------------------------------------

#: (placeholder, pattern) applied IN ORDER — email first (so an address's
#: digits can't be half-eaten by the phone rule), then IPv4 (dotted octets
#: would otherwise partially match the phone rule), then phone. Patterns
#: stick to the regex subset with identical semantics in Java (Spark) and
#: RE2 (DuckDB): character classes, bounded repetition, \b, (?:...).
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("<EMAIL>", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("<IPV4>", r"\b(?:\d{1,3}\.){3}\d{1,3}\b"),
    ("<PHONE>", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Redact PII spans with typed placeholders — the safety-filtering
    pass every training-data pipeline runs before tokenization. Returns
    the input plus ``scrubbed`` (text with every match of every pattern
    replaced by its placeholder) and one ``n_<type>`` count column per
    pattern (match counts BEFORE redaction — the audit metric a curation
    report aggregates).

    Scale shape: a pure narrow map — ``regexp_replace``/``regexp_count``
    are JVM intrinsics inside whole-stage codegen, no UDF, no shuffle;
    the scan's column pruning and partition pruning are untouched.
    Counting happens on the original text and each replace feeds the
    next, in declaration order, so placeholders (letters only) are never
    re-matched by later numeric patterns. Oracle parity: DuckDB runs the
    same patterns via ``regexp_replace(..., 'g')`` +
    ``len(regexp_extract_all(...))`` (gate ``doc_pii_scrub``)."""
    out = df
    scrubbed = F.col(text_col)
    for placeholder, pat in patterns:
        name = placeholder.strip("<>").lower()
        out = out.withColumn(f"n_{name}", F.regexp_count(F.col(text_col), F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, placeholder)
    return out.withColumn("scrubbed", scrubbed)


# ---------------------------------------------------------------------------
# Training-mix upsampling (deterministic fractional epochs)
# ---------------------------------------------------------------------------

def upsample_mix(
    df: DataFrame,
    weights: dict[str, float],
    default_weight: float = 1.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Materialize a training mix with FRACTIONAL per-stratum epoch
    weights: a row with weight ``w`` appears ``floor(w)`` times plus one
    more with probability ``frac(w)``, decided by the same deterministic
    md5-threshold used by :func:`stratified_sample` — so ``w=2.5`` means
    "every doc twice, half the docs a third time", the standard way a
    data recipe says "see source X for 2.5 epochs". ``w<1`` downsamples
    (generalizing stratified_sample); ``w=0`` drops the stratum.

    Output adds ``copy`` (1-based repeat index) so downstream shuffling
    /sharding can treat repeats as distinct rows. Deterministic: reruns
    and task retries regenerate the identical mix (no RNG), which
    resumable 100 TB backfills require.

    Scale shape: copies are generated executor-side by exploding
    ``sequence(1, n_copies)`` — a narrow Generate, no shuffle, no driver
    involvement; rows with ``n_copies=0`` are filtered at the scan.
    The weight table is a literal CASE expression (config-scale, like
    stratified_sample's rates), never a join."""
    for k, v in weights.items():
        if v < 0:
            raise ValueError(f"negative weight {v!r} for stratum {k!r}")
    if default_weight < 0:
        raise ValueError(f"negative default_weight {default_weight!r}")
    w = F.lit(float(default_weight))
    for k, v in sorted(weights.items()):
        w = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(w)
    whole = F.floor(w).cast("int")
    frac_bp = (F.round(w * 10000).cast("long") - whole.cast("long") * 10000).cast("int")
    bucket = md5_bucket(F.col(id_col), salt)
    n_copies = whole + F.when(bucket < frac_bp, F.lit(1)).otherwise(F.lit(0))
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") >= 1)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


# ---------------------------------------------------------------------------
# Token-budget mix balancing (data-derived sampling rates)
# ---------------------------------------------------------------------------

def token_budget_mix(
    df: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Downsample each stratum to a TOKEN budget — the mix-balancing
    stage where a recipe says "at most 2B tokens of language X" rather
    than a fixed rate (:func:`stratified_sample`'s contract). The rate is
    derived from the data: with ``T_s`` the stratum's total tokens,

        threshold_s = min(10000, (budget_s * 10000) div T_s)
        keep  ⇔  md5_60(id || ':' || salt) mod 10000 < threshold_s

    Strata without a budget keep everything. The whole decision path is
    INTEGER arithmetic (token counts, integer div, md5 buckets) — no
    floats anywhere, so reruns, retries, and the oracle gate agree
    exactly. Expected kept tokens ≈ budget (binomial over docs; exact
    budget enforcement would need a sequential prefix-sum cut, which is
    a per-stratum sort at scale for no curation benefit).

    Two-pass shape, both cheap: a map-side-combined per-stratum token
    total (|strata| rows, broadcast back), then the narrow keep filter
    at scan time. Adds ``n_tokens``, ``keep_threshold_bp``; returns kept
    rows only."""
    for k, v in budgets.items():
        if v < 0:
            raise ValueError(f"negative budget {v!r} for stratum {k!r}")
    # greatest-with-0: Spark's size() returns -1 for a NULL array (the
    # legacy sizeOfNull default), so a null-text doc would otherwise
    # SUBTRACT from its stratum's token total and from tokens_kept
    with_tok = df.withColumn(
        "n_tokens", F.greatest(F.lit(0), token_count(F.col(text_col)))
    )
    totals = with_tok.groupBy(stratum_col).agg(
        F.sum("n_tokens").alias("_stratum_tokens")
    )
    b = F.lit(None).cast("long")
    for k, v in sorted(budgets.items()):
        b = F.when(F.col(stratum_col) == k, F.lit(int(v))).otherwise(b)
    thr = (
        totals.withColumn("_budget", b)
        .withColumn(
            "keep_threshold_bp",
            F.when(
                F.col("_budget").isNotNull(),
                F.least(
                    F.lit(10000).cast("long"),
                    F.expr("(_budget * 10000) div _stratum_tokens"),
                ),
            )
            .otherwise(F.lit(10000).cast("long"))
            .cast("int"),
        )
        .select(stratum_col, "keep_threshold_bp")
    )
    bucket = md5_bucket(F.col(id_col), salt)
    # null-safe equality: a NULL stratum is a legitimate "no budget"
    # group (kept whole) — a plain equi-join would silently drop it
    thr = thr.withColumnRenamed(stratum_col, "_thr_stratum")
    return (
        with_tok.join(
            F.broadcast(thr),
            F.col(stratum_col).eqNullSafe(F.col("_thr_stratum")),
        )
        .drop("_thr_stratum")
        .filter(bucket < F.col("keep_threshold_bp"))
    )


# ---------------------------------------------------------------------------
# Repetition metrics (Gopher-style quality rules)
# ---------------------------------------------------------------------------

def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc repetition profile (public Gopher quality-rule family):

    - ``top_token_ratio`` — occurrences of the most frequent token over
      all tokens (Gopher: "fraction of most common word").
    - ``top_bigram_ratio`` — same for word 2-grams.
    - ``distinct_token_ratio`` — type/token ratio (low = repetitive).

    Shape: two explode → hash-aggregate passes (tokens, bigrams), both
    map-side partial, joined on doc_id. No arrays are carried through
    the shuffle — only (doc, term, count) rows.
    """
    df = ensure_parallelism(df, id_col)
    toks = tokens(F.col(text_col))
    toked = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    tok_stats = (
        toked.groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_tok"),
            F.count("*").alias("n_distinct"),
        )
    )
    # bigrams: adjacent pairs, NOT distinct (counts matter)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
    grams = F.when(
        n >= 2,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    bigrammed = df.select(F.col(id_col), F.explode(grams).alias("bg"))
    bg_stats = (
        bigrammed.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg"))
    )
    r6 = lambda c: F.round(c + F.lit(5e-10), 6)  # noqa: E731
    return (
        tok_stats.join(bg_stats, id_col)
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            r6(F.col("top_tok") / F.col("n_tokens")).alias("top_token_ratio"),
            r6(F.col("top_bg") / F.col("n_bigrams")).alias("top_bigram_ratio"),
            r6(F.col("n_distinct") / F.col("n_tokens")).alias("distinct_token_ratio"),
        )
    )


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    max_top_token_ratio: float = 0.10,
    max_top_bigram_ratio: float = 0.04,
    min_distinct_ratio: float = 0.5,
) -> DataFrame:
    """Repetition metrics plus the pass/fail verdict a curation pipeline
    filters on. Thresholds are parameters; defaults are in the spirit of
    the published Gopher rules, scaled to short synthetic docs."""
    m = repetition_metrics(df, text_col, id_col)
    passed = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("top_token_ratio") <= max_top_token_ratio)
        & (F.col("top_bigram_ratio") <= max_top_bigram_ratio)
        & (F.col("distinct_token_ratio") >= min_distinct_ratio)
    )
    return m.withColumn("gopher_pass", passed)


# ---------------------------------------------------------------------------
# Sequence packing (greedy first-fit per shard)
# ---------------------------------------------------------------------------

def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-token-budget training sequences: within each
    shard (``id mod n_shards``), walk docs in id order and start a new
    pack whenever adding the next doc would exceed ``budget`` (docs
    longer than the budget get a pack of their own — the standard greedy
    packer used to build pretraining batches).

    Returns one row per doc: ``(doc_id, shard, n_tokens, pack_seq,
    pack_pos, pack_fill)`` — pack index within the shard, position
    within the pack, and cumulative tokens through this doc.

    Scale shape: packing is a sequential recurrence, so it is sharded —
    each shard's docs meet in ONE ``applyInPandas`` group (one shuffle
    keyed on shard; Arrow-batched, linear loop per shard). n_shards
    scales with the cluster; determinism comes from the id ordering, not
    arrival order. At 100 TB, shard by file/partition id instead so the
    shuffle disappears entirely (sortWithinPartitions + mapInPandas);
    the mod-shard form keeps the oracle enumerable.
    """
    docs = df.select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seqs, poss, fills = [], [], []
        pack_seq, fill, pos = 0, 0, 0
        for nt in pdf["n_tokens"]:
            if pos > 0 and fill + nt > budget:
                pack_seq += 1
                fill, pos = 0, 0
            fill += nt
            pos += 1
            seqs.append(pack_seq)
            poss.append(pos)
            fills.append(fill)
        pdf["pack_seq"] = pd.Series(seqs, dtype="int64")
        pdf["pack_pos"] = pd.Series(poss, dtype="int64")
        pdf["pack_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out_schema = (
        f"{id_col} long, shard long, n_tokens long, "
        "pack_seq long, pack_pos long, pack_fill long"
    )
    return docs.groupBy("shard").applyInPandas(pack, schema=out_schema)


# ---------------------------------------------------------------------------
# Leakage-safe train/validation split
# ---------------------------------------------------------------------------

def leakage_safe_split(
    df: DataFrame,
    components: DataFrame,
    val_bp: int = 1000,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val assignment that cannot leak near-duplicates across the
    boundary: the md5 split decision is taken per duplicate COMPONENT
    (connected_components over the near-dup pair graph,
    operators/dedup.py), never per document — every member of a
    near-dup cluster lands in the SAME split, so an eval example's
    near-twin can never sit in train (the contamination mode a naive
    per-doc split creates in ~every corpus with surviving near-dups).

        split = 'val'  ⇔  md5_60(component || ':' || salt) mod 10000 < val_bp

    ``components`` is the ``(id, component)`` frame from
    :func:`~rearview_spark.operators.dedup.connected_components`; docs
    absent from it are singletons (component = own id). ``val_bp`` is
    the target validation fraction in basis points (1000 = 10%); the
    achieved fraction is binomial over COMPONENTS, so a corpus
    dominated by one giant cluster moves whole — by design (splitting
    it would be the leak). Deterministic: reruns, retries, and the
    oracle gate agree bit-for-bit.

    Scale shape: one broadcast-or-shuffle join on the doc id (the
    component table is |dup docs| rows, usually a small fraction of the
    corpus), then a scan-time hash decision. Adds ``component`` and
    ``split``."""
    if not 0 <= val_bp <= 10000:
        raise ValueError(f"val_bp must be in [0, 10000], got {val_bp}")
    comp = components.select(
        F.col("id").alias(id_col), F.col("component").alias("_comp")
    )
    joined = df.join(comp, id_col, "left").withColumn(
        "component", F.coalesce(F.col("_comp"), F.col(id_col))
    )
    bucket = md5_bucket(F.col("component"), salt)
    return joined.drop("_comp").withColumn(
        "split", F.when(bucket < val_bp, F.lit("val")).otherwise(F.lit("train"))
    )


def source_cap_sample(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "srccap",
    boundary_buckets: int = 1024,
) -> DataFrame:
    """Keep at most ``cap`` documents per source/domain — the
    RefinedWeb/C4-style anti-spam primitive (one link farm must not
    become 4% of the training mix), selected by deterministic md5 order
    so reruns and backfills keep exactly the same rows.

    The naive form — ``row_number() OVER (PARTITION BY source ORDER BY
    hash)`` then ``rank <= cap`` — puts every document of a source in
    ONE task; the exact source this operator exists for (a crawl
    domain with 100M pages) is the one that straddles task memory. So
    selection runs as distributed quantile selection instead:

    1. Hash every doc into one of ``boundary_buckets`` ordered buckets
       (md5 — uniform, deterministic).
    2. Per (source, bucket) counts — map-side combined, ≤ sources ×
       buckets rows — then a per-source running total over the ≤
       ``boundary_buckets`` bucket rows locates the bucket where the
       cap boundary falls. This frame is dimension-sized; it
       broadcasts.
    3. Docs in buckets strictly below the boundary pass outright (a
       scan-time integer filter). Only the SINGLE boundary bucket per
       source — 1/``boundary_buckets`` of the source's docs — needs an
       exact ``row_number`` (ordered by full 60-bit hash, id), so the
       window partition is bounded at ~|source|/buckets rows no matter
       how hot the domain.

    Exactly ``min(cap, |source|)`` docs survive per source (exact, not
    approximate: the boundary bucket's window finishes the count the
    full buckets started). Adds nothing; returns the surviving rows
    with original columns."""
    from pyspark.sql import Window

    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    h = md5_bucket(F.col(id_col), salt, mod=10 ** 15)
    b = F.pmod(h, F.lit(boundary_buckets))
    hashed = df.withColumn("_h", h).withColumn("_b", b)

    per_bucket = hashed.groupBy(source_col, "_b").agg(F.count("*").alias("_bc"))
    wcum = (
        Window.partitionBy(source_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # rows in earlier buckets; the per-source frame is <= boundary_buckets rows
    bounds = per_bucket.withColumn(
        "_before", F.coalesce(F.sum("_bc").over(wcum), F.lit(0))
    ).select(source_col, "_b", "_bc", "_before")

    # one pass: the broadcast bound-filter kills every bucket past the
    # boundary AT THE SCAN (only ~cap + one-bucket rows per source
    # survive into the shuffle), then the (source, bucket) window ranks
    # within surviving buckets only — partitions bounded by
    # ~|source|/boundary_buckets rows no matter how hot the domain. A
    # full bucket's rows all pass the rank predicate (r <= bucket
    # count), the boundary bucket's rank finishes the count, dead
    # buckets never shuffle. (A first cut unioned a no-sort full-bucket
    # branch with a windowed boundary branch — Spark re-executed the
    # whole join subtree per branch: 4 scans, 3 windows. This form is 2
    # scans — counts pass + decision pass — and one candidate-sized
    # shuffle.)
    joined = hashed.join(F.broadcast(bounds), [source_col, "_b"]).filter(
        F.col("_before") < cap
    )
    wb = Window.partitionBy(source_col, "_b").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn("_r", F.row_number().over(wb))
        .filter(F.col("_before") + F.col("_r") <= cap)
        .drop("_r", "_h", "_b", "_bc", "_before")
    )




def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    salt: str,
    id_col: str = "doc_id",
    by: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — top-k by the
    Efraimidis-Spirakis exponential race (A-ES, IPL 2006): each row
    draws ``key = -ln(u) / w`` with u uniform in (0, 1] and the k
    SMALLEST keys win; the inclusion distribution is exactly
    sequential weighted sampling without replacement. The curation
    use: "take n docs per source, preferring high quality/length"
    without the bias of sort-by-weight (which always picks the same
    heavy head) or the variance of uniform sampling.

    Determinism (the md5_bucket discipline): u derives from
    ``md5_60(id:salt) + 1) / 2^60`` — no RNG, so retries and both
    engines draw identical u. Determinism of the RANKING: ``-ln(u)`` is
    BOUNDED in [0, ~41.6], so it is quantized to 1e-12 fixed-point
    int64 (no overflow for ANY weight — quantizing the full ``key =
    -ln(u)/w`` would overflow int64 for weights below ~5e-6) and the
    race key is that integer divided by the weight: one IEEE division
    of identical operands on both engines, with ``id`` as the final
    tiebreak.

    Rows with ``weight <= 0`` or null are excluded (zero weight means
    never sampled; A-ES keys diverge there). Scale shape: one scan-time
    key projection + one ``row_number`` per ``by`` partition — the sort
    is per-stratum; with ``by=None`` it is a single top-k (use modest k
    globally; per-stratum for fan-out).
    """
    from pyspark.sql.window import Window

    from rearview_spark.operators.dedup import _hash60

    u = (
        _hash60(F.concat(F.col(id_col).cast("string"), F.lit(f":{salt}"))) + 1
    ) / F.lit(float(1 << 60))
    lnq = F.round(-F.log(u) * F.lit(1e12)).cast("long")
    key = lnq.cast("double") / F.col(weight_col)
    keyed = df.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_key", key)
    part = Window.partitionBy(by) if by else Window.partitionBy()
    w = part.orderBy("_key", id_col)
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("_key")
    )
