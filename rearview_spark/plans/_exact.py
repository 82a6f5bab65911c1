"""Cross-engine float determinism helpers for the oracle gate.

Two failure modes make naive ``round(sum(x), 4)`` unstable across engines:

1. **Accumulation order.** Spark's partial aggregation and DuckDB's
   group-sum add doubles in different orders; big sums differ in the last
   few ulps, which flips the 4th decimal when the true value sits on a
   rounding boundary.
2. **round() implementation.** Java rounds via the shortest decimal
   representation (BigDecimal HALF_UP), C-family engines via scaled
   multiply — on a boundary value that is not exactly representable
   (e.g. 38.37875) they disagree *even on identical doubles*. And with
   2-decimal source data (prices, discounts), sums/averages land exactly
   on such boundaries all the time.

Fixes, mirrored verbatim in every oracle SQL string:

- ``int_sum``: sums of fixed-decimal columns are computed exactly as
  64-bit integers of scaled units (cents), so both engines hold identical
  values before the final division. (Scale bound: |sum| * 10^dec must fit
  int64 — fine through sf0.1; at 100 TB switch the scale column to
  decimal(38, dec), same plan shape.)
- ``r4``/``r6``: an epsilon nudge (half the remaining noise budget, far
  below the rounding granularity) pushes exact-boundary values off the
  boundary in the same direction in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Nudges: >> cross-engine noise (<=1e-9 at gate scale), << granularity.
EPS4 = 5e-8
EPS6 = 5e-10
SQL_EPS4 = "0.00000005"
SQL_EPS6 = "0.0000000005"


def r4(col: Column) -> Column:
    """round(x, 4), boundary-nudged. SQL mirror: round(x + 0.00000005, 4)."""
    return F.round(col + F.lit(EPS4), 4)


def r6(col: Column) -> Column:
    """round(x, 6), boundary-nudged. SQL mirror: round(x + 0.0000000005, 6)."""
    return F.round(col + F.lit(EPS6), 6)


def int_sum(expr: Column, scale: int) -> Column:
    """Exact sum of a fixed-decimal expression as scaled int64.
    SQL mirror: sum(CAST(round(expr * <scale>.0) AS BIGINT))."""
    return F.sum(F.round(expr * F.lit(float(scale))).cast("long"))


def exact_sum(expr: Column, scale: int) -> Column:
    """int_sum scaled back to a double — bit-identical across engines.
    SQL mirror: sum(CAST(round(expr * S.0) AS BIGINT)) / S.0"""
    return int_sum(expr, scale) / F.lit(float(scale))


def exact_avg(expr: Column, scale: int) -> Column:
    """Exact-sum average: (int_sum/scale)/count, deterministic division.
    SQL mirror: sum(CAST(round(expr * S.0) AS BIGINT)) / S.0 / count(expr)"""
    return exact_sum(expr, scale) / F.count(expr)
