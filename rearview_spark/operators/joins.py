"""As-of and range joins — timeseries join shapes Spark lacks as primitives.

The reference's only joins are FK equi-joins and point-wise ts-equi series
combines (SURVEY.md §2.3, Prov-A "joins beyond FK" — no range/as-of shape
exists in `/root/reference/db/schema.rb`); these operators close that gap
for the engine's own event/metric surface, where "latest reading at or
before t" and "points inside an interval" are the natural join shapes.

Both are built to scale:

- ``asof_join`` is the union + last-observation-carried-forward plan: ONE
  shuffle on the `by` key, one sort by (`on`, side) — the same cost as a
  sort-merge join, with none of the range-condition explosion a naive
  ``left.ts >= right.ts`` theta-join produces (Spark plans that as
  BroadcastNestedLoop / cartesian, O(n*m) per key).
- ``range_join`` buckets time into fixed-width cells and explodes each
  interval into the cells it covers, turning the interval predicate into
  an equi-join Catalyst hash-partitions; the residual range filter then
  runs post-join on co-located rows. Explosion factor = interval_len /
  bucket_width, so pick the bucket near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = (),
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: for each left row, attach the payload of the
    nearest right row with ``right.on <= left.on`` (backward, inclusive —
    pandas ``merge_asof`` semantics) or ``right.on >= left.on``
    (forward), matching on the ``by`` key columns.

    Right payload columns that collide with a left column get ``suffix``;
    the matched right ``on`` value is always emitted as ``f"{on}{suffix}"``.
    With ``tolerance_s``, matches farther than that many seconds are
    nulled out (row is kept — it is a LEFT join).

    Ties: if the right side has several rows at the same (`by`, `on`),
    which one wins is unspecified — pre-aggregate the right side to one
    row per key (as the gate query does) when that matters.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    key = set(by) | {on}
    lpayload = [c for c in left.columns if c not in key]
    rpayload = [c for c in right.columns if c not in key]
    lcols = set(left.columns)
    rmap = {c: (c + suffix if c in lcols else c) for c in rpayload}
    ron = on + suffix

    lrows = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("_side"),
        *lpayload,
        *[F.lit(None).cast(right.schema[c].dataType).alias(rmap[c]) for c in rpayload],
        F.lit(None).cast(right.schema[on].dataType).alias(ron),
    )
    rrows = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpayload],
        *[F.col(c).alias(rmap[c]) for c in rpayload],
        F.col(on).alias(ron),
    )
    # At equal `on`, the right row sorts first (_side 0 < 1) in both
    # directions, so the left row sees it: inclusive match.
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled_cols = [rmap[c] for c in rpayload] + [ron]
    u = lrows.unionByName(rrows)
    filled = u.select(
        *by,
        on,
        "_side",
        *lpayload,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in filled_cols],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if tolerance_s is not None:
        delta = F.abs(F.col(on).cast("double") - F.col(ron).cast("double"))
        keep = F.col(ron).isNotNull() & (delta <= F.lit(float(tolerance_s)))
        for c in [rmap[c] for c in rpayload]:
            out = out.withColumn(c, F.when(keep, F.col(c)))
        out = out.withColumn(ron, F.when(keep, F.col(ron)))
    return out


def range_join(
    fact: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    bucket_s: int = 86400,
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner join of fact rows into the intervals that contain them
    (``start <= ts < end``, or ``<= end`` with ``end_inclusive``), as a
    bucketed equi-join instead of a theta-join.

    Each interval is exploded to the ``bucket_s``-second cells it covers
    (``sequence`` — JVM-side, no UDF); each fact row computes its single
    cell; the join runs hash-partitioned on the cell, and the exact range
    predicate filters co-located rows. A fact row matches one cell per
    interval, so no post-join dedup is needed.
    """
    cell = (F.col(ts_col).cast("double") / bucket_s).cast("long")
    lo = (F.col(start_col).cast("double") / bucket_s).cast("long")
    hi = (F.col(end_col).cast("double") / bucket_s).cast("long")
    iv = intervals.withColumn("_cell", F.explode(F.sequence(lo, hi)))
    fc = fact.withColumn("_cell", cell)
    in_range = F.col(ts_col) >= F.col(start_col)
    in_range &= (
        F.col(ts_col) <= F.col(end_col) if end_inclusive else F.col(ts_col) < F.col(end_col)
    )
    return fc.join(iv, on="_cell", how="inner").filter(in_range).drop("_cell")


def edit_distance_join(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= max_dist`` — the fuzzy
    string join of record linkage — via positional q-gram COUNT
    filtering (Gravano et al. VLDB'01) instead of the n^2 comparison:

    1. each string emits its positional q-grams as ``(gram, occ)``
       multiset elements (the occurrence index makes repeated grams
       distinct, so an equi-join computes the multiset intersection);
    2. candidate pairs are those sharing at least
       ``max(|a|,|b|) - q + 1 - k*q`` grams (the count-filtering bound:
       one edit destroys at most q q-grams) with ``||a|-|b|| <= k``;
    3. candidates are verified with the built-in ``levenshtein`` —
       integer-exact and identically defined in Spark and DuckDB, so
       the gate's oracle (the BRUTE-FORCE all-pairs join) hash-proves
       the filter dropped nothing.

    Completeness domain: the count bound ``max(|a|,|b|) - q + 1 - k*q``
    must be >= 1 or a qualifying pair could share ZERO grams and never
    be generated by the equi-join. Strings shorter than ``q + k*q``
    (length 6 at the q=2, k=2 defaults) are therefore EXCLUDED from the
    join — an explicit contract, not a silent recall hole; handle
    micro-strings with a brute-force pass over that (tiny) subset if
    they matter. The oracle applies the same length predicate, so the
    hash match proves completeness exactly on the contract domain.

    Scale shape: explode is (len - q + 1) rows per string; the gram
    equi-join shuffles on gram (rare grams dominate selectivity); the
    count aggregate is map-side partial; verification is one
    codegen'd levenshtein per CANDIDATE, never per pair of the corpus.
    """
    from rearview_spark.operators.dedup import _ngram_fold

    k = int(max_dist)
    base = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("s")
    ).filter(F.length("s") >= q + k * q)
    # q-grams via the zip_with fold over shifted char slices — NOT
    # transform(sequence(...), i -> substring(...)): higher-order
    # functions evaluate interpreted, and this explode is the corpus-
    # scale hot path (the dedup._ngram_fold 5.8x lesson). Grams come
    # out space-joined ("a b"); identity is what matters for the
    # equi-join and the space is a consistent rendering on every row.
    grams = base.select(
        "id",
        F.length("s").alias("len"),
        F.posexplode(_ngram_fold(F.split(F.col("s"), ""), q)).alias("_pos", "gram"),
    )
    # occurrence index within the string: same gram appearing twice must
    # match twice in the multiset intersection
    occ = Window.partitionBy("id", "gram").orderBy("_pos")
    inv = grams.select(
        "id", "len", "gram", F.row_number().over(occ).alias("occ")
    )
    a = inv.select(
        F.col("id").alias("id_a"), F.col("len").alias("la"), "gram", "occ"
    )
    b = inv.select(
        F.col("id").alias("id_b"), F.col("len").alias("lb"), "gram", "occ"
    )
    cand = (
        a.join(b, ["gram", "occ"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= k)
        )
        .groupBy("id_a", "id_b", "la", "lb")
        .agg(F.count("*").alias("n_shared"))
        .filter(
            F.col("n_shared")
            >= F.greatest(F.col("la"), F.col("lb")) - (q - 1) - k * q
        )
        .select("id_a", "id_b")
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b", F.levenshtein("sa", "sb").alias("dist")
        )
        .filter(F.col("dist") <= k)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    order_cols,
    window: int,
    id_col: str = "id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sorted-neighborhood blocking for entity resolution (Hernández &
    Stolfo '95, the merge/purge method): order the corpus by a blocking
    key, slide a window of ``window`` rows, and emit every ordered pair
    whose rank distance is within the window — the classic linear-cost
    alternative to a quadratic all-pairs comparison when likely
    duplicates sort near each other.

    Distributed shape (no global sort anywhere): ranks come from
    ``_util.global_row_number`` — range repartition + per-partition
    window + broadcast prefix offsets (the VERDICT-r10 pattern that
    replaced partition-less ``Window.orderBy``). Pairing is then an
    EQUI-join on rank-bucket keys: bucket = (rn-1) div window, the left
    row exploded into keys {bucket, bucket+1} — every pair within
    ``window`` ranks spans at most adjacent buckets, so the join meets
    exactly once, shuffles on uniformly-sized integer keys (each holds
    precisely ``window`` rows — blocking is skew-immune by
    construction), and candidate volume is exactly n*window, linear in
    the corpus for fixed window.

    ``order_cols`` must be a STRICT total order (unique tiebreaker) or
    ranks — and therefore the pair set — are nondeterministic; same
    contract as ``global_row_number``. ``carry_cols`` ride along onto
    both sides as ``<col>_a`` / ``<col>_b`` so callers' verify
    predicates (the match step of merge/purge) need no join-back to the
    corpus. Returns ``(id_a, id_b, rn_a, rn_b, *carried)`` with
    ``rn_a < rn_b <= rn_a + window``.
    """
    from rearview_spark.operators._util import global_row_number

    w = int(window)
    if w < 1:
        raise ValueError(f"sorted_neighborhood_pairs: window must be >= 1, got {w}")
    ranked, _n = global_row_number(df, order_cols, out_col="_sn_rn")
    bucket = F.expr(f"(_sn_rn - 1) div {w}")
    left = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("_sn_rn").alias("rn_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("_sn_blk"),
        *[F.col(c).alias(f"{c}_a") for c in carry_cols],
    )
    right = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("_sn_rn").alias("rn_b"),
        bucket.alias("_sn_blk"),
        *[F.col(c).alias(f"{c}_b") for c in carry_cols],
    )
    return (
        left.join(right, "_sn_blk")
        .filter(
            (F.col("rn_b") > F.col("rn_a")) & (F.col("rn_b") <= F.col("rn_a") + w)
        )
        .drop("_sn_blk")
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot reconciliation — the added / removed / changed /
    unchanged audit run between two versions of a keyed table before
    trusting a migration, backfill, or vendor re-delivery, plus a
    per-column change count that localizes WHERE the churn is.

    One full-outer join on the key (both sides shuffle on the same
    key — co-partitioned, broadcastable when one side is a small
    delta), then a single pass of conditional integer sums; column
    comparisons are null-safe (``<=>``), so NULL -> value and
    value -> NULL both count as changes and NULL == NULL does not.
    Output is the long-format summary ``(kind, n_rows)`` with kinds
    ``added | removed | changed | unchanged | col_changed:<col>`` —
    all exact integers, no rounding contract. ``compare_cols`` must be
    non-empty — changed/unchanged are undefined with no columns to
    compare (a keys-only added/removed audit is a different call;
    ADVICE r12 — the old behavior was an opaque TypeError from
    ``F.when(None, ...)``).
    """
    if not compare_cols:
        raise ValueError(
            "table_diff: need at least one compare column (for a "
            "keys-only added/removed audit, pass any key column — "
            "equal-by-construction, so changed is always 0)"
        )
    o = old.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"k_{k}") for k in key_cols],
        *[F.col(c).alias(f"n_{c}") for c in compare_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, [f"k_{k}" for k in key_cols], "full_outer")
    col_changed = {
        c: F.col("_in_old").isNotNull()
        & F.col("_in_new").isNotNull()
        & ~F.expr(f"o_{c} <=> n_{c}")
        for c in compare_cols
    }
    any_changed = None
    for e in col_changed.values():
        any_changed = e if any_changed is None else (any_changed | e)
    aggs = [
        F.sum(
            F.when(F.col("_in_old").isNull(), 1).otherwise(0)
        ).alias("added"),
        F.sum(
            F.when(F.col("_in_new").isNull(), 1).otherwise(0)
        ).alias("removed"),
        F.sum(F.when(any_changed, 1).otherwise(0)).alias("changed"),
        F.sum(
            F.when(
                F.col("_in_old").isNotNull()
                & F.col("_in_new").isNotNull()
                & ~any_changed,
                1,
            ).otherwise(0)
        ).alias("unchanged"),
    ] + [
        F.sum(F.when(e, 1).otherwise(0)).alias(f"col_changed:{c}")
        for c, e in col_changed.items()
    ]
    wide = j.agg(*aggs)
    kinds = ["added", "removed", "changed", "unchanged"] + [
        f"col_changed:{c}" for c in compare_cols
    ]
    stack = ", ".join(f"'{k}', `{k}`" for k in kinds)
    return wide.select(
        F.expr(f"stack({len(kinds)}, {stack}) AS (kind, n_rows)")
    )
