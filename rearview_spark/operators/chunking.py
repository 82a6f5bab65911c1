"""Token-window chunking and sub-document (segment-level) dedup — the
two corpus restructurings every training-data pipeline runs between raw
documents and the tokenizer: fixed-size context windows with overlap
(sliding-window packing for pretraining) and CCNet/Gopher-style removal
of segments repeated across the corpus (boilerplate, headers, license
blocks).

Not rearview parity (the reference has no text processing); these are
north-star pipeline extensions. Both operators are pure DataFrame
plans:

- ``chunk_token_windows`` is a narrow map + explode — zero shuffle, so
  it streams over a 100 TB documents table at scan speed. The chunk
  grid is computed with ``sequence``/``slice``/``transform`` inside
  whole-stage codegen; no Python touches the token arrays.
- ``segment_dedup`` needs corpus-global segment counts. The count
  aggregate is map-side combined on the segment hash; the *hot* set
  (segments above the repeat threshold) is then broadcast anti-joined
  onto the exploded segments — the same dedup-side pattern as
  operators/dedup.py's bucket caps, so the fact-side never shuffles on
  the segment key. The broadcast is safe because the hot set is bounded
  by corpus_tokens / (seg_len * max_count); ``hot_cap`` guards the
  pathological corpus (everything duplicated) by failing loudly rather
  than silently broadcasting gigabytes — at that point switch
  ``broadcast_hot=False`` to take the plain shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rearview_spark.operators.text import tokens


def chunk_token_windows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Sliding token windows: chunk ``i`` covers tokens
    ``[i*stride, i*stride + size)`` of the normalized token stream; the
    last window is short rather than padded. ``stride < size`` gives
    overlapping windows (pretraining style); ``stride == size`` gives a
    partition. Every document yields >= 1 chunk.

    Returns (id, chunk_idx, n_chunk_tokens, chunk_md5) — the md5 of the
    space-joined window, which is what downstream exact-dedup of chunks
    keys on.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of windows whose start < n: ceil((n - size)/stride) + 1, min 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(size)) / F.lit(float(stride))).cast("int") + F.lit(1),
        F.lit(1),
    )
    return (
        docs.select(F.col(id_col), toks.alias("_toks"), n_chunks.alias("_nc"))
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_idx"),
            F.col("_toks"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                F.col("_toks"), F.col("chunk_idx") * stride + 1, size
            ).alias("_chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("_chunk").alias("n_chunk_tokens"),
            F.md5(F.array_join("_chunk", " ")).alias("chunk_md5"),
        )
    )


def segment_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_len: int = 16,
    max_count: int = 2,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Corpus-wide repeated-segment removal (CCNet paragraph dedup
    re-expressed over token segments, since the driver corpus is
    single-line): split each document into consecutive ``seg_len``-token
    segments, count each distinct segment's occurrences across the
    whole corpus, drop every instance of segments occurring more than
    ``max_count`` times, and recompose the survivors in document order.

    Returns one row per document: (id, n_segments, n_kept,
    kept_md5) where kept_md5 fingerprints the recomposed text (md5 of
    the space-joined kept segments). A document whose every segment is
    hot disappears from the output — the standard pipeline reading
    (fully-boilerplate page -> drop), and what an inner regroup over
    surviving segments naturally yields.

    Plan: explode -> hash -> count (map-side combined) -> filter to the
    HOT tail only -> broadcast anti-join -> ordered reassembly via
    sort_array over collected (pos, segment) structs. Only the final
    per-document regroup shuffles document-sized data, and it shuffles
    on the document id — never on segment content, so a viral segment
    cannot skew a reducer.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_segs = F.greatest(
        F.ceil(n / F.lit(float(seg_len))).cast("int"), F.lit(1)
    )
    segs = (
        docs.select(F.col(id_col), toks.alias("_toks"), n_segs.alias("_ns"))
        .select(
            id_col,
            F.col("_ns").alias("n_segments"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_ns") - 1),
                    lambda i: F.array_join(
                        F.slice(F.col("_toks"), i * seg_len + 1, seg_len), " "
                    ),
                )
            ).alias("seg_idx", "seg_text"),
        )
        .withColumn("seg_hash", F.md5("seg_text"))
    )

    counts = segs.groupBy("seg_hash").agg(F.count("*").alias("cnt"))
    hot = counts.filter(F.col("cnt") > max_count).select("seg_hash")
    if broadcast_hot:
        hot = F.broadcast(hot)
    kept = segs.join(hot, "seg_hash", "leftanti")

    return (
        kept.groupBy(id_col, "n_segments")
        .agg(
            F.count("*").alias("n_kept"),
            F.sort_array(
                F.collect_list(F.struct("seg_idx", "seg_text"))
            ).alias("_ordered"),
        )
        .select(
            id_col,
            "n_segments",
            "n_kept",
            F.md5(
                F.array_join(
                    F.transform(F.col("_ordered"), lambda s: s["seg_text"]), " "
                )
            ).alias("kept_md5"),
        )
    )
