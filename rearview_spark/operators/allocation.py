"""Exact proportional allocation ("penny allocation") — distributing a
group-level integer amount across its members pro-rata so the shares
are whole cents and SUM EXACTLY to the amount: rebates across line
items, budget across campaigns, overhead across cost centers. Naive
``round(T * w / W)`` drifts by a cent or three per group and fails
reconciliation; the largest-remainder method never does.

Not rearview parity; the relational-pipeline scope family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocate_proportional(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    amount_col: str,
    tiebreak_col: str,
    out_col: str = "alloc",
) -> DataFrame:
    """Largest-remainder allocation of ``amount_col`` (an INTEGER
    amount, constant per group — cents, units) across each group's rows
    proportionally to integer ``weight_col``:

        base_i = (T * w_i) div W          (floor shares)
        R      = T - sum(base_i)          (0 <= R < n rows, the pennies)
        +1 to the R rows with the LARGEST division remainder
        ``(T * w_i) mod W`` — ties toward smallest ``tiebreak_col``,
        then larger weight (so the order is total whenever
        (tiebreak, weight) distinguishes rows; rows identical in all
        three are interchangeable — any assignment yields the same
        multiset of allocations).

    Everything is bigint; the group invariant ``sum(out) == T`` holds
    exactly by construction (the oracle can assert it, not just
    approximate it). int64 bound: ``T * w_i`` per row — amounts in
    cents times weights in cents stays inside int64 up to ~10^9-cent
    orders; decimal(38) is the documented swap beyond.

    PRECONDITION: ``amount_col`` and ``weight_col`` must be
    NONNEGATIVE. The floor-share identity relies on truncating ``div``
    == floor division, which holds only for nonnegative operands (same
    contract as graph.hits' integer renorm); with a negative amount or
    weight the floor-share sum can exceed T and the reconciliation
    invariant silently breaks — and Spark ``div`` (truncate) diverges
    from DuckDB ``//`` (floor) on negatives, so the oracle would
    disagree too (ADVICE r12). Violations fail AT EXECUTION via an
    inline ``raise_error`` guard on the output column — no extra
    validation job, the check rides the same scan.

    Scale shape: one group-keyed window pair (sum + rank over the SAME
    partitioning — never global) and a narrow projection; groups are
    natural partitions (orders, campaigns), so no skew beyond the
    group-size distribution itself.

    Returns the input plus ``out_col``.
    """
    w = Window.partitionBy(group_col)
    t = F.col(amount_col).cast("long")
    base = F.expr(
        f"({amount_col} * {weight_col}) div (sum({weight_col}) "
        f"OVER (PARTITION BY {group_col}))"
    )
    rem = F.expr(
        f"({amount_col} * {weight_col}) % (sum({weight_col}) "
        f"OVER (PARTITION BY {group_col}))"
    )
    with_parts = df.withColumn("_base", base).withColumn("_rem", rem)
    rank = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            F.col("_rem").desc(),
            F.col(tiebreak_col).asc(),
            F.col(weight_col).desc(),
        )
    )
    pennies = t - F.sum("_base").over(w)
    alloc = (
        F.col("_base")
        + F.when(F.col("_rank") <= F.col("_pennies"), 1).otherwise(0)
    ).cast("long")
    guarded = F.when(
        (F.col(amount_col) < 0) | (F.col(weight_col) < 0),
        F.raise_error(
            F.lit(
                "allocate_proportional: amount_col and weight_col must be "
                "nonnegative (truncating div breaks the floor-share "
                "invariant on negatives)"
            )
        ).cast("long"),
    ).otherwise(alloc)
    return (
        with_parts.withColumn("_rank", rank)
        .withColumn("_pennies", pennies)
        .withColumn(out_col, guarded)
        .drop("_base", "_rem", "_rank", "_pennies")
    )
