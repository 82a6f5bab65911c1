"""Bloom-filter join pruning — the runtime-filter pattern, made explicit.

Spark's own runtime row-group/bloom filters (AQE `InjectRuntimeFilter`)
only fire for favorable plan shapes; this module is the same idea as a
first-class operator the caller controls: build a Bloom filter over the
SMALL side's join keys, prune the BIG side with a pure-JVM bitmask
expression before the shuffle, then run the exact join on survivors.
Bloom filters have NO false negatives, so the pruned join returns
byte-identical results to the plain join — the property the gate query
`ev_bloom_prune_join` proves by oracling against the plain SQL join.

Design points (100 TB):

- The filter itself is tiny (``m_bits/64`` int64 words — 8 KiB at the
  default 2^16 bits) and is collected to the driver ONCE per build, then
  inlined as an array literal in the probe predicate: the same
  driver-side-control-flow class as the PQ codebooks (VERDICT_r06), not
  a data-path collect. Probe-side work is k md5 hashes per row, fully
  inside whole-stage codegen; zero extra shuffle, zero explode of the
  big side.
- Hashes are md5-prefix based (``_hash60`` — dedup.py:81) so the filter
  is deterministic across retries/engines; no RNG, no JVM-version
  hash-seed hazards.
- Build side is one explode(k) + ``bit_or`` hash aggregation over the
  (small) dim — output bounded by the word count, never the dim size.
- A signed-int64 subtlety: bit 63 makes the word negative; membership
  uses ``(word & mask) != 0`` which is two's-complement safe.

At real dim sizes pick ``m_bits ~ 10-16x`` the expected distinct-key
count for a sub-1% false-positive rate (fpr ~= (1 - e^(-k*n/m))^k); false
positives only cost wasted probe rows, never wrong results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rearview_spark.operators.dedup import _hash60

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 4


def _shl1(bits: Column) -> Column:
    """``1L << bits`` with a Column bit count (``F.shiftleft`` only
    accepts a Python-int count)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), bits)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """The k Bloom bit positions of a key: md5-60bit of ``key:i`` mod m,
    one independent hash per salt i."""
    return [
        F.pmod(
            _hash60(F.concat(key.cast("string"), F.lit(f":{i}"))), F.lit(m_bits)
        )
        for i in range(k)
    ]


def bloom_build(
    dim: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Build the filter over ``dim[key_col]``: returns the dense
    ``m_bits/64`` int64 word list (missing words zero-filled). One
    explode(k) + bit_or hash agg; the collect is word-count-bounded
    (8 KiB at defaults) — driver-side control flow, not data."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("p")
    words = (
        dim.filter(F.col(key_col).isNotNull())  # an inner join ignores null keys
        .select(pos)
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            _shl1((F.col("p") % 64).cast("int")).alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["w"]] = r["bits"]
    return dense


def bloom_prune(
    big: DataFrame,
    key_col: str,
    words: list[int],
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Keep only rows whose key MAY be in the filter (all k bits set).
    Pure-JVM predicate — no shuffle, no UDF. Null keys are dropped (an
    inner join drops them anyway). No false negatives: every key
    present in the build side survives.

    The probe is ONE ``forall`` over the k bit positions (r16): the
    pre-r16 unrolled AND chain inlined the m_bits/64-word array literal
    once per position probe (2k copies of a 1024-element array in the
    condition), which bloated the optimized plan and the generated code
    — at k=4 the literal now appears once and each position's md5 is
    evaluated exactly once. Same arithmetic, same survivors."""
    lit_words = F.lit(words)
    pos_arr = F.array(*_positions(F.col(key_col), m_bits, k))
    probe = F.forall(
        pos_arr,
        lambda p: lit_words[(p / 64).cast("int")].bitwiseAND(
            _shl1((p % 64).cast("int"))
        )
        != 0,
    )
    return big.filter(F.col(key_col).isNotNull() & probe)


def bloom_semi_join(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact inner join of ``big`` to ``dim``, Bloom-pruned: build on the
    dim keys, prune the big side pre-shuffle, join the survivors.
    Result is provably identical to the plain inner join (no false
    negatives); the pruning only shrinks the shuffled/joined volume.

    Key types must match EXACTLY: the hashes run over the string
    rendering of each side's key, so a long 5 ("5") and a double 5.0
    ("5.0") hash differently even though a plain join would coerce and
    match them — that would be a silent false negative, so mismatched
    key types are rejected here instead."""
    bt = big.schema[big_key].dataType
    dt = dim.schema[dim_key].dataType
    if bt != dt:
        raise ValueError(
            f"bloom_semi_join key types must match exactly ({big_key}: {bt} "
            f"vs {dim_key}: {dt}) — string-rendered hashes do not coerce; "
            "cast both sides to one type first"
        )
    words = bloom_build(dim, dim_key, m_bits, k)
    pruned = bloom_prune(big, big_key, words, m_bits, k)
    return pruned.join(dim, pruned[big_key] == dim[dim_key])
