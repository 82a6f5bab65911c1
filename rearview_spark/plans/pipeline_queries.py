"""LLM-data-pipeline queries (dedup / text analysis / similarity /
multimodal) over the driver's `documents` and `embeddings` tables, with
DuckDB oracles wherever the computation is SQL-expressible.

Every hash (minhash permutations, simhash bits, fingerprints) is
md5-prefix-based specifically so the oracle can reproduce the arithmetic
bit-for-bit — the correctness gate covers the *whole* pipeline, not just
the SQL-shaped parts. Even the iterative k-means IVF is value-checked
(its oracle unrolls the Lloyd iterations as chained CTEs). Every entry
in this module — media included — carries a full value oracle; zero
rows-only gates remain (COVERAGE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rearview_spark.operators import dedup as D
from rearview_spark.operators import multimodal as M
from rearview_spark.operators import similarity as S
from rearview_spark.operators import text as X
from rearview_spark.sources.loader import Tables

# Shared SQL fragments mirroring text.py's normalization and shingling.
NORM = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
TOKS = f"string_split({NORM}, ' ')"
STOPLIST = "[" + ", ".join(f"'{w}'" for w in X.STOPWORDS) + "]"

SHINGLE_CTE = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
           ELSE [array_to_string(t, ' ')] END) AS sh
  FROM toks
),
inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM sh)
"""


# --- Text analysis -----------------------------------------------------------

def doc_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counts, BPE-ish counts, stopword/punct ratios, quality score,
    md5 fingerprint, heuristic lang-ID — one JVM-side projection."""
    docs = Tables(spark, sf_dir).documents
    return X.with_text_features(docs).select(
        "doc_id", "n_tokens", "n_bpe_tokens", "stop_ratio", "punct_ratio",
        "mean_tok_len", "quality", "fp_md5", "lang_pred",
    )


DOC_FEATURES_SQL = f"""
WITH base AS (
  SELECT doc_id, text, {TOKS} AS toks, {NORM} AS norm FROM documents
), feat AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
         len(list_filter(toks, t -> list_contains({STOPLIST}, t))) * 1.0 / len(toks) AS sr,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / length(text) AS pr,
         list_sum(list_transform(toks, t -> length(t))) * 1.0 / len(toks) AS mtl,
         md5(norm) AS fp_md5
  FROM base
)
SELECT doc_id, n_tokens, n_bpe_tokens,
       round(sr + 0.0000000005, 6) AS stop_ratio,
       round(pr + 0.0000000005, 6) AS punct_ratio,
       round(mtl + 0.0000000005, 6) AS mean_tok_len,
       round(0.4 * least(n_tokens / 200.0, 1.0)
           + 0.3 * least(sr / 0.2, 1.0)
           + 0.3 * (1.0 - least(pr / 0.1, 1.0)) + 0.0000000005, 6) AS quality,
       fp_md5,
       CASE WHEN sr > 0.08 THEN 'en' ELSE 'unk' END AS lang_pred
FROM feat
"""


def doc_lang_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate quality profile per (source, predicted lang) — the
    filter-decision table a curation pipeline acts on."""
    docs = Tables(spark, sf_dir).documents
    feats = X.with_text_features(docs)
    return (
        feats.groupBy("source", "lang_pred")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("quality") + 0.00000005, 4).alias("avg_quality"),
            F.round(F.expr("percentile(n_tokens, 0.5)") + F.lit(5e-8), 4).alias("median_tokens"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
        )
        .orderBy("source", "lang_pred")
    )


DOC_LANG_SUMMARY_SQL = f"""
WITH base AS (
  SELECT doc_id, source, text, {TOKS} AS toks FROM documents
), feat AS (
  SELECT doc_id, source,
         len(toks) AS n_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
         len(list_filter(toks, t -> list_contains({STOPLIST}, t))) * 1.0 / len(toks) AS sr,
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) * 1.0 / length(text) AS pr
  FROM base
), scored AS (
  SELECT *,
         round(0.4 * least(n_tokens / 200.0, 1.0)
             + 0.3 * least(sr / 0.2, 1.0)
             + 0.3 * (1.0 - least(pr / 0.1, 1.0)) + 0.0000000005, 6) AS quality,
         CASE WHEN sr > 0.08 THEN 'en' ELSE 'unk' END AS lang_pred
  FROM feat
)
SELECT source, lang_pred, count(*) AS n_docs,
       round(avg(quality) + 0.00000005, 4) AS avg_quality,
       round(quantile_cont(n_tokens, 0.5) + 0.00000005, 4) AS median_tokens,
       CAST(sum(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM scored GROUP BY source, lang_pred ORDER BY source, lang_pred
"""


def doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style min-hash-of-shingles fingerprint (robust to local
    edits), JVM-side array arithmetic."""
    docs = Tables(spark, sf_dir).documents
    return docs.select(
        "doc_id", X.rolling_fingerprint(F.col("text"), window=8).alias("fp_rolling")
    )


DOC_ROLLFP_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 8
           THEN [array_to_string(t[i:i+7], ' ') for i in range(1, len(t) - 6)]
           ELSE [array_to_string(t[1:len(t)], ' ')] END AS grams
  FROM toks
)
SELECT doc_id,
       list_min(list_transform(grams,
         g -> CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT))) AS fp_rolling
FROM sh
"""


# --- Dedup -------------------------------------------------------------------

def dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(Tables(spark, sf_dir).documents)


DEDUP_EXACT_SQL = f"""
SELECT md5({NORM}) AS fp, min(doc_id) AS canonical_id, count(*) AS group_size
FROM documents GROUP BY 1
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(Tables(spark, sf_dir).documents, threshold=0.1)


DEDUP_JACCARD_SQL = SHINGLE_CTE + """
, common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb, count(*) AS n_common
  FROM inv a JOIN inv b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, round(n_common * 1.0 / (na + nb - n_common) + 0.0000000005, 6) AS jaccard
FROM common
WHERE round(n_common * 1.0 / (na + nb - n_common) + 0.0000000005, 6) >= 0.1
"""


def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment pairs (dedup.ngram_containment_pairs): the
    asymmetric doc-in-doc signal — both directions + Jaccard hashed, so
    the oracle verifies the ordered ratios, not just pair membership."""
    return D.ngram_containment_pairs(
        Tables(spark, sf_dir).documents, threshold=0.4
    ).orderBy("id_a", "id_b")


DEDUP_CONTAIN_SQL = SHINGLE_CTE + """
, common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS n_common
  FROM inv a JOIN inv b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(n_common * 1.0 / na + 0.0000000005, 6) AS containment_ab,
       round(n_common * 1.0 / nb + 0.0000000005, 6) AS containment_ba,
       round(n_common * 1.0 / (na + nb - n_common) + 0.0000000005, 6) AS jaccard
FROM common
WHERE greatest(round(n_common * 1.0 / na + 0.0000000005, 6),
               round(n_common * 1.0 / nb + 0.0000000005, 6)) >= 0.4
ORDER BY id_a, id_b
"""


def dedup_setsim_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join (dedup.setsim_prefix_pairs): AllPairs/
    PPJoin prefix filtering over 3-gram shingle sets. The oracle is the
    BRUTE-FORCE all-pairs inverted join — a value-hash match proves the
    prefix filter's completeness guarantee held (it dropped nothing),
    which is the whole point of an exact join vs minhash."""
    return D.setsim_prefix_pairs(
        Tables(spark, sf_dir).documents, threshold=0.2, shingle_n=3
    ).orderBy("id_a", "id_b")


DEDUP_SETSIM_SQL = SHINGLE_CTE + """
, common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS n_common
  FROM inv a JOIN inv b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(n_common * 1.0 / (na + nb - n_common) + 0.0000000005, 6) AS jaccard
FROM common
WHERE round(n_common * 1.0 / (na + nb - n_common) + 0.0000000005, 6) >= 0.2
ORDER BY id_a, id_b
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_near_duplicates(Tables(spark, sf_dir).documents, threshold=0.05)


DEDUP_MINHASH_SQL = SHINGLE_CTE + """
, hashed AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(shingle), 1, 7)) AS BIGINT) AS h1,
         CAST(concat('0x', substr(md5(shingle), 8, 7)) AS BIGINT) AS h2
  FROM inv
), sigs AS (
  SELECT doc_id, k.k,
         min(([1373158607, 239081665, 53710185, 1592467583, 590620973, 525901257,
               479341425, 299655413, 1581559893, 220106709, 1453201079, 1590571867,
               1915941033, 1171165723, 186699715, 1268073013])[k.k + 1] * h1
           + ([906070221, 68252795, 63989049, 201209007, 469521479, 499635469,
               1085242217, 1292825379, 56985563, 1205264597, 427000597, 1537640409,
               1395616197, 1506083911, 1170252925, 900911955])[k.k + 1] * h2
           + k.k) AS mh
  FROM hashed CROSS JOIN (SELECT unnest(range(0, 16)) AS k) k
  GROUP BY doc_id, k.k
), bands AS (
  SELECT doc_id, CAST(k // 4 AS INT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY k)) AS bh
  FROM sigs GROUP BY doc_id, k // 4
  QUALIFY count(*) OVER (PARTITION BY k // 4,
            md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY k))) <= 1000
), cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.id_a, c.id_b,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0
             / len(list_distinct(list_concat(sa.sh, sb.sh))) + 0.0000000005, 6) AS jaccard
  FROM cands c JOIN sh sa ON c.id_a = sa.doc_id JOIN sh sb ON c.id_b = sb.doc_id
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.05
"""


# RETIRED GATE (r16, VERDICT_r15 next-round #5): dedup_simhash — the
# raw-signature gate was strictly subsumed by the still-gated
# dedup_simhash_pairs, whose oracle embeds the IDENTICAL signature
# derivation (DEDUP_SIMHASH_SQL below, kept as the pairs oracle's
# `sig` CTE) and then drives it through the pigeonhole chunk join +
# bit_count verification — the stronger end-to-end path. Signature
# VALUES stay pinned bit-for-bit by tests/test_pipeline_ops.py::
# test_simhash_signature_matches_python_reference (independent pure-
# Python md5/vote replica, added at retirement). Retiring shortens
# the driver recheck cycle.

DEDUP_SIMHASH_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({TOKS}) AS tok FROM documents),
hashed AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM toks
), votes AS (
  SELECT doc_id, j.j, sum(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT unnest(range(0, 60)) AS j) j
  GROUP BY doc_id, j.j
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""


# --- Similarity search -------------------------------------------------------

def sim_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5 against the corpus."""
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    return S.brute_force_topk(emb, queries, k=10)


SIM_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) + 0.0000000005, 6) AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k probing 3 of the label-centroid buckets. Approximate
    w.r.t. brute force, but fully DETERMINISTIC given the data — the
    oracle reproduces the whole pipeline (centroids, probe selection,
    in-bucket exact cosine) in SQL, so the gate hash-checks the IVF
    semantics themselves, not just row counts."""
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ivf_topk(emb, queries, k=10, nprobe=3)


SIM_IVF_SQL = """
WITH expl AS (
  SELECT label, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (
  SELECT label, list(m ORDER BY pos) AS centroid
  FROM (SELECT label, pos, avg(x) AS m FROM expl GROUP BY 1, 2)
  GROUP BY label
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5),
probes AS (
  SELECT query_id, label FROM (
    SELECT q.query_id, c.label,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qv, c.centroid) DESC, c.label) AS r
    FROM q CROSS JOIN cent c
  ) WHERE r <= 3
),
scored AS (
  SELECT p.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) + 0.0000000005, 6) AS cosine_sim
  FROM probes p
  JOIN embeddings e ON e.label = p.label
  JOIN q ON q.query_id = p.query_id
  WHERE e.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""


def sim_label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean cosine of each vector to its own label centroid — cluster
    cohesion profile; exact, oracle-checked."""
    emb = Tables(spark, sf_dir).embeddings
    cents = S.label_centroids(emb)
    joined = emb.join(F.broadcast(cents), "label")
    sim = S.cosine(
        F.transform(F.col("embedding"), lambda x: x.cast("double")), F.col("centroid")
    )
    return (
        joined.select("label", sim.alias("csim"))
        .groupBy("label")
        .agg(F.round(F.avg("csim") + F.lit(5e-8), 4).alias("avg_cohesion"), F.count("*").alias("n_vectors"))
        .orderBy("label")
    )


SIM_COHESION_SQL = """
WITH expl AS (
  SELECT label, vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), cent AS (
  SELECT label, pos, avg(x) AS m FROM expl GROUP BY label, pos
), cvec AS (
  SELECT label, list(m ORDER BY pos) AS centroid FROM cent GROUP BY label
), scored AS (
  SELECT e.label, round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) + 0.0000000005, 6) AS csim
  FROM embeddings e JOIN cvec c ON e.label = c.label
)
SELECT label, round(avg(csim) + 0.00000005, 4) AS avg_cohesion, count(*) AS n_vectors
FROM scored GROUP BY label ORDER BY label
"""


# --- Multimodal --------------------------------------------------------------

def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing over documents-as-media: payload bytes +
    sniffed MIME, all JVM-side."""
    docs = Tables(spark, sf_dir).documents
    media = M.text_to_media(docs)
    return media.select(
        "media_id", F.col("meta.n_bytes").alias("n_bytes"), F.col("meta.mime").alias("mime")
    )


MEDIA_META_SQL = """
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
       'application/octet-stream' AS mime
FROM documents
"""


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode+feature path over REAL synthesized container
    bytes (PNG/WAV/GIF headers built per doc): the Spark side must parse
    the binary headers; the oracle computes the expected fields from the
    same closed-form id formulas — so the hash check validates the
    decoder round-trip, not just row counts."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_media_payloads(docs)
    feats = M.extract_media_features(media)
    return feats.select("media_id", "mime", "width", "height", "duration_ms", "n_bytes")


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       ELSE 'image/gif' END AS mime,
  CASE WHEN doc_id % 3 = 1 THEN NULL
       ELSE CAST(doc_id % 2000 + 16 AS INT) END AS width,
  CASE WHEN doc_id % 3 = 1 THEN NULL
       ELSE CAST((doc_id * 7) % 1000 + 16 AS INT) END AS height,
  CASE WHEN doc_id % 3 = 1
       THEN CAST(((doc_id % 1000) * 2 + 2000) * 1000
                 // ((doc_id % 5 + 1) * 16000) AS BIGINT)
       ELSE NULL END AS duration_ms,
  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 49 WHEN 1 THEN 60 ELSE 26 END
       AS BIGINT) AS n_bytes
FROM documents
"""


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out over REAL synthesized containers: the
    Spark side PARSES the WAV headers (mapInPandas decode) to get
    duration, then expands each media row into the frame timestamps a
    decoder would extract (multimodal.frame_sample_plan — pure JVM
    sequence/explode). Image rows have no duration and contribute the
    single frame 0. The oracle recomputes durations from the closed-form
    id formulas, so the gate checks the decode -> fan-out round trip."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_media_payloads(docs)
    feats = M.extract_media_features(media)
    plan = M.frame_sample_plan(
        feats.select("media_id", F.struct("duration_ms").alias("meta")),
        every_ms=20,
    )
    return plan.orderBy("media_id", "frame_ms")


MEDIA_FRAMES_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 1
              THEN CAST(((doc_id % 1000) * 2 + 2000) * 1000
                        // ((doc_id % 5 + 1) * 16000) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS dur
  FROM documents
)
SELECT doc_id AS media_id, unnest(generate_series(0, dur, 20)) AS frame_ms
FROM m ORDER BY media_id, frame_ms
"""


def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honest resize gate: synthesized container bytes -> resize_images
    patches the dimension fields and truncates the raster body by the
    integer area ratio -> the OUTPUT PAYLOAD BYTES are hash-checked. The
    oracle rebuilds the expected post-resize hex from the same closed-form
    id formulas (scaled dims ``w*256 // long_side``, body keep
    ``ceil(16 * 256^2 / long_side^2)``), so the gate verifies the
    re-encode byte-for-byte, not just the dimension math."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_media_payloads(docs)
    resized = M.resize_images(media, max_dim=256)
    return resized.select(
        "media_id", "width", "height", F.hex("payload").alias("payload_hex")
    )


def media_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIXEL-level decode gate (the r07-verdict north-star item made
    real): synthesize COMPLETE grayscale PNGs — zlib-compressed IDAT,
    real CRCs — whose pixel (r, c) is the closed-form
    ``(id + 7r + 13c) % 256``, then run them through the SAME
    ``extract_media_features`` path as the header gate. The Spark side
    must inflate the IDAT and reconstruct scanlines
    (multimodal.decode_png_pixels); the oracle re-derives every stat
    from the pixel formula over ``range(h) × range(w)`` — the hash
    check therefore verifies the inflate + unfilter byte-for-byte in
    aggregate, not just the header walk."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_png_pixel_payloads(docs)
    feats = M.extract_media_features(media)
    return feats.select(
        "media_id", "mime", "width", "height",
        "px_count", "px_sum", "px_min", "px_max",
    )


MEDIA_PNG_PIXELS_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(4 + doc_id % 8 AS INT) AS w,
         CAST(4 + (3 * doc_id) % 8 AS INT) AS h
  FROM documents
), rs AS (
  SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS r FROM dims
), cs AS (
  SELECT doc_id, w, h, r, unnest(generate_series(0, w - 1)) AS c FROM rs
), px AS (
  SELECT doc_id, w, h, (doc_id + 7 * r + 13 * c) % 256 AS v FROM cs
)
SELECT doc_id AS media_id, 'image/png' AS mime, w AS width, h AS height,
       CAST(w * h AS BIGINT) AS px_count, CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h ORDER BY media_id
"""


def media_gif_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level GIF decode gate: synthesize COMPLETE GIF89a files —
    grayscale palette, real LZW-coded index stream with clear codes —
    whose palette index (r, c) is the closed-form
    ``(id + 5r + 11c) % 256``, then decode through
    ``extract_media_features``. The Spark side must run the full
    GIF-LZW machinery (variable code width, table resets, palette
    mapping — multimodal.decode_gif_pixels); the oracle re-derives the
    stats from the index formula (×3 for the grayscale RGB triple)."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_gif_pixel_payloads(docs)
    feats = M.extract_media_features(media)
    return feats.select(
        "media_id", "mime", "width", "height",
        "px_count", "px_sum", "px_min", "px_max",
    )


MEDIA_GIF_PIXELS_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(4 + doc_id % 8 AS INT) AS w,
         CAST(4 + (5 * doc_id) % 8 AS INT) AS h
  FROM documents
), rs AS (
  SELECT doc_id, w, h, unnest(generate_series(0, h - 1)) AS r FROM dims
), cs AS (
  SELECT doc_id, w, h, r, unnest(generate_series(0, w - 1)) AS c FROM rs
), px AS (
  SELECT doc_id, w, h, (doc_id + 5 * r + 11 * c) % 256 AS v FROM cs
)
SELECT doc_id AS media_id, 'image/gif' AS mime, w AS width, h AS height,
       CAST(3 * w * h AS BIGINT) AS px_count,
       CAST(3 * sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM px GROUP BY doc_id, w, h ORDER BY media_id
"""


# RETIRED GATE (r15, VERDICT_r14 next-round #3): media_wav_samples —
# whole-file sample stats over the SAME synthesized PCM corpus and the
# SAME RIFF-walk decode the still-gated media_wav_chunk_energy
# exercises (chunk_energy is strictly stronger: identical decode plus
# the 16-sample framing whose phase interacts with the sample
# formula). Coverage inherits to tests/test_pipeline_ops.py's
# extract_audio_samples hand-computed test (~line 1324), which decodes
# handcrafted RIFF bytes sample-by-sample.


def media_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level JPEG decode gate: synthesize COMPLETE baseline
    JPEGs — real Huffman-entropy-coded scans, DC-only blocks so the
    IDCT output is integer-exact — and decode through
    ``extract_media_features``. The Spark side must Huffman-decode the
    scan, track the DC predictor across blocks, dequantize, and run
    the IDCT (multimodal.decode_jpeg_pixels); the oracle re-derives
    every stat from the per-block closed form (flat value
    ``(id + 5*bx + 9*by) % 200 + 28`` over 64 pixels)."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_jpeg_pixel_payloads(docs)
    feats = M.extract_media_features(media)
    return feats.select(
        "media_id", "mime", "width", "height",
        "px_count", "px_sum", "px_min", "px_max",
    )


MEDIA_JPEG_PIXELS_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(1 + doc_id % 4 AS INT) AS bw,
         CAST(1 + (3 * doc_id) % 4 AS INT) AS bh
  FROM documents
), bys AS (
  SELECT doc_id, bw, bh, unnest(generate_series(0, bh - 1)) AS by FROM dims
), bxs AS (
  SELECT doc_id, bw, bh, by, unnest(generate_series(0, bw - 1)) AS bx FROM bys
), blk AS (
  SELECT doc_id, bw, bh, ((doc_id + 5 * bx + 9 * by) % 200) + 28 AS v FROM bxs
)
SELECT doc_id AS media_id, 'image/jpeg' AS mime,
       CAST(8 * bw AS INT) AS width, CAST(8 * bh AS INT) AS height,
       CAST(64 * bw * bh AS BIGINT) AS px_count,
       CAST(64 * sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM blk GROUP BY doc_id, bw, bh ORDER BY media_id
"""


def media_mp4_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-level frame extraction gate: synthesize COMPLETE MP4s
    (ftyp + real mdat + genuine stts/stsc/stsz/stco tables) and fan
    each out to its per-sample read plan via
    ``extract_mp4_samples``. The Spark side must resolve byte offsets
    through the chunk tables (stsc runs → chunk membership → stco base
    + intra-chunk size prefix); the oracle re-derives offset/size/dts
    from the closed-form layout (mdat data starts at byte 32, so the
    offset is 32 + the size prefix sum — computed independently of any
    chunk walk, which cross-checks the table machinery)."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_mp4_sample_payloads(docs)
    return M.extract_mp4_samples(media).orderBy("media_id", "sample_idx")


MEDIA_MP4_SAMPLES_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(5 + doc_id % 10 AS INT) AS n,
         CAST(512 + doc_id % 100 AS BIGINT) AS delta
  FROM documents
), ks AS (
  SELECT doc_id, n, delta, unnest(generate_series(0, n - 1)) AS k FROM dims
), sz AS (
  SELECT doc_id, k, delta, CAST(100 + (doc_id + 13 * k) % 50 AS INT) AS size
  FROM ks
)
SELECT doc_id AS media_id, CAST(k AS INT) AS sample_idx,
       CAST(32 + COALESCE(SUM(size) OVER (
         PARTITION BY doc_id ORDER BY k
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS "offset",
       size, CAST(k * delta AS BIGINT) AS dts,
       CASE WHEN doc_id % 2 = 0 THEN (k % 3 = 0) ELSE TRUE END AS keyframe
FROM sz ORDER BY media_id, sample_idx
"""


def media_mp4_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-aware frame sampling (multimodal.keyframe_sample_plan):
    demux the synthesized MP4s (even ids carry a real stss sync table,
    odd ids rely on the spec's all-sync default) and keep the first
    keyframe per 2048-dts-unit bucket — the seek plan a thumbnail /
    frame-embedding pass issues. The oracle re-derives keyframe
    membership and the bucket argmin from the closed-form layout, so
    the stss parse AND the min_by bucketing are value-checked."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_mp4_sample_payloads(docs)
    samples = M.extract_mp4_samples(media)
    return M.keyframe_sample_plan(samples, every_units=2048).orderBy(
        "media_id", "sample_idx"
    )


MEDIA_MP4_KEYFRAMES_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(5 + doc_id % 10 AS INT) AS n,
         CAST(512 + doc_id % 100 AS BIGINT) AS delta
  FROM documents
), ks AS (
  SELECT doc_id, n, delta, unnest(generate_series(0, n - 1)) AS k FROM dims
), sz AS (
  SELECT doc_id, k, delta,
         CAST(100 + (doc_id + 13 * k) % 50 AS INT) AS size,
         CASE WHEN doc_id % 2 = 0 THEN (k % 3 = 0) ELSE TRUE END AS kf
  FROM ks
), off AS (
  SELECT doc_id, k, delta, size, kf,
         32 + COALESCE(SUM(size) OVER (PARTITION BY doc_id ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS o
  FROM sz
), pick AS (
  SELECT doc_id, (k * delta) // 2048 AS bucket, min(k) AS k
  FROM off WHERE kf GROUP BY doc_id, (k * delta) // 2048
)
SELECT p.doc_id AS media_id, CAST(o.k AS INT) AS sample_idx,
       CAST(o.o AS BIGINT) AS "offset", o.size,
       CAST(o.k * o.delta AS BIGINT) AS dts
FROM pick p JOIN off o ON p.doc_id = o.doc_id AND p.k = o.k
ORDER BY media_id, sample_idx
"""


def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity quality filter (text.bigram_lm_counts +
    doc_perplexity — the CCNet/Gopher signal): the LM trains on the
    corpus itself and every doc is scored under add-0.5 smoothing. The
    oracle replays tokenization, both count tables, the vocab size,
    the smoothed conditional, and the exp(-avg ln P) — so the hash
    check covers the whole train+score pipeline including the
    left-count denominator and the no-bigram NULL contract."""
    docs = Tables(spark, sf_dir).documents
    cb, cl, v = X.bigram_lm_counts(docs)
    return X.doc_perplexity(docs, cb, cl, v).orderBy("doc_id")


DOC_LM_PPL_SQL = f"""
WITH toks AS (
  SELECT doc_id, {TOKS} AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM toks
), big AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g, t[i] AS w1 FROM pos
), cb AS (
  SELECT g, count(*) AS c_bi FROM big GROUP BY g
), cl AS (
  SELECT w1, count(*) AS c_left FROM big GROUP BY w1
), voc AS (
  SELECT count(DISTINCT w) AS v FROM (SELECT unnest(t) AS w FROM toks)
), scored AS (
  SELECT b.doc_id,
         ln((COALESCE(cb.c_bi, 0) + 0.5) / (COALESCE(cl.c_left, 0) + 0.5 * voc.v)) AS lp
  FROM big b
  LEFT JOIN cb ON b.g = cb.g
  LEFT JOIN cl ON b.w1 = cl.w1
  CROSS JOIN voc
), agg AS (
  SELECT doc_id, count(*) AS n_bigrams, avg(lp) AS a FROM scored GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(exp(-agg.a) + 0.00000005, 4) AS ppl
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
"""


# hex-builder fragments (DuckDB): fixed-width big/little-endian of ints
def _behex(expr: str, nbytes: int) -> str:
    return f"lpad(upper(to_hex({expr})), {nbytes * 2}, '0')"


def _lehex(expr: str, nbytes: int) -> str:
    return " || ".join(
        f"lpad(upper(to_hex(({expr}) // {1 << (8 * i)} % 256)), 2, '0')"
        for i in range(nbytes)
    )


MEDIA_RESIZE_SQL = f"""
WITH m AS (
  SELECT doc_id, CAST(doc_id % 3 AS INT) AS fmt,
         CAST(doc_id % 2000 + 16 AS BIGINT) AS w0,
         CAST((doc_id * 7) % 1000 + 16 AS BIGINT) AS h0,
         CAST((doc_id % 5 + 1) * 8000 AS BIGINT) AS sr,
         CAST((doc_id % 1000) * 2 + 2000 AS BIGINT) AS dsz,
         upper(md5(text)) AS filler
  FROM documents
),
s AS (
  SELECT *, greatest(w0, h0) AS mx,
    CASE WHEN greatest(w0, h0) <= 256 THEN w0
         ELSE greatest(1, w0 * 256 // greatest(w0, h0)) END AS nw,
    CASE WHEN greatest(w0, h0) <= 256 THEN h0
         ELSE greatest(1, h0 * 256 // greatest(w0, h0)) END AS nh,
    CASE WHEN greatest(w0, h0) <= 256 THEN CAST(16 AS BIGINT)
         ELSE (16 * 65536 + greatest(w0, h0) * greatest(w0, h0) - 1)
              // (greatest(w0, h0) * greatest(w0, h0)) END AS keep
  FROM m
)
SELECT doc_id AS media_id,
  CASE WHEN fmt = 1 THEN NULL ELSE CAST(nw AS INT) END AS width,
  CASE WHEN fmt = 1 THEN NULL ELSE CAST(nh AS INT) END AS height,
  CASE fmt
    WHEN 0 THEN '89504E470D0A1A0A0000000D49484452'
                || {_behex('nw', 4)} || {_behex('nh', 4)}
                || '080600000000000000'
                || substr(filler, 1, CAST(2 * keep AS INT))
    WHEN 1 THEN '52494646' || {_lehex('dsz + 52', 4)} || '57415645'
                || '666D7420' || {_lehex('16', 4)}
                || {_lehex('1', 2)} || {_lehex('1', 2)}
                || {_lehex('sr', 4)} || {_lehex('sr * 2', 4)}
                || {_lehex('2', 2)} || {_lehex('16', 2)}
                || '64617461' || {_lehex('dsz', 4)} || filler
    ELSE '474946383961' || {_lehex('nw', 2)} || {_lehex('nh', 2)}
         || substr(filler, 1, CAST(2 * keep AS INT))
  END AS payload_hex
FROM s
"""


QUERIES: dict[str, dict] = {
    "doc_text_features": {"fn": doc_text_features, "oracle": DOC_FEATURES_SQL},
    "doc_lang_quality_summary": {"fn": doc_lang_quality_summary, "oracle": DOC_LANG_SUMMARY_SQL},
    "doc_rolling_fingerprint": {"fn": doc_rolling_fingerprint, "oracle": DOC_ROLLFP_SQL},
    "dedup_exact_groups": {"fn": dedup_exact_groups, "oracle": DEDUP_EXACT_SQL},
    "dedup_ngram_jaccard": {"fn": dedup_ngram_jaccard, "oracle": DEDUP_JACCARD_SQL},
    "dedup_setsim_prefix": {"fn": dedup_setsim_prefix, "oracle": DEDUP_SETSIM_SQL},
    "dedup_containment_pairs": {
        "fn": dedup_containment_pairs,
        "oracle": DEDUP_CONTAIN_SQL,
    },
    "dedup_minhash_lsh": {"fn": dedup_minhash_lsh, "oracle": DEDUP_MINHASH_SQL},
    "sim_brute_force_topk": {"fn": sim_brute_force_topk, "oracle": SIM_TOPK_SQL},
    "sim_ivf_topk": {"fn": sim_ivf_topk, "oracle": SIM_IVF_SQL},
    "sim_label_centroid_distance": {"fn": sim_label_centroid_distance, "oracle": SIM_COHESION_SQL},
    "media_metadata": {"fn": media_metadata, "oracle": MEDIA_META_SQL},
    "media_features": {"fn": media_features, "oracle": MEDIA_FEATURES_SQL},
    "media_frame_sample": {"fn": media_frame_sample, "oracle": MEDIA_FRAMES_SQL},
    "media_resize": {"fn": media_resize, "oracle": MEDIA_RESIZE_SQL},
}


# --- Embedding-cosine near-dup (random-hyperplane LSH) -----------------------

_HP_W = S.hyperplane_weights(16, 64)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: the corpus unioned with a derived
    jittered copy (deterministic elementwise distortion, cosine ~0.9996 to
    its source — the synthetic embeddings contain no natural near-dups,
    max pairwise cosine ~0.51), then sign-random-projection LSH ->
    same-bucket candidates -> exact-cosine verification >= 0.99. The
    oracle reproduces the full pipeline (jitter, hyperplanes, banding,
    verification) from the same md5-derived constants."""
    emb = Tables(spark, sf_dir).embeddings
    orig = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    jit = emb.select(
        (F.col("vec_id") + F.lit(1000000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + ((i % 7) - 3).cast("double") * F.lit(0.01)),
        ).alias("embedding"),
    )
    corpus = orig.unionByName(jit)
    return S.embedding_near_duplicates(corpus, threshold=0.99, planes=16, bands=2)


def _hp_wlit(p: int) -> str:
    return "[" + ", ".join(repr(x) for x in _HP_W[p]) + "]"


_HP_BITS = [
    f"CASE WHEN list_inner_product(cv, {_hp_wlit(p)}) > 0 THEN '1' ELSE '0' END"
    for p in range(16)
]

DEDUP_EMB_SQL = f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
corpus AS (
  SELECT vec_id, cv FROM base
  UNION ALL
  SELECT vec_id + 1000000,
         list_transform(range(0, 64), d -> cv[d + 1] * (1.0 + 0.01 * ((d % 7) - 3)))
  FROM base
),
sig0 AS (
  SELECT vec_id, 0 AS band, {" || ".join(_HP_BITS[0:8])} AS bh FROM corpus
  UNION ALL
  SELECT vec_id, 1, {" || ".join(_HP_BITS[8:16])} FROM corpus
),
sig AS (
  SELECT vec_id, band, bh FROM sig0
  QUALIFY count(*) OVER (PARTITION BY band, bh) <= 1000
),
cands AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.bh = b.bh AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
       round(list_cosine_similarity(va.cv, vb.cv) + 0.0000000005, 6) AS cosine_sim
FROM cands c
JOIN corpus va ON c.id_a = va.vec_id
JOIN corpus vb ON c.id_b = vb.vec_id
WHERE round(list_cosine_similarity(va.cv, vb.cv) + 0.0000000005, 6) >= 0.99
"""


QUERIES["dedup_embedding_cosine"] = {"fn": dedup_embedding_cosine, "oracle": DEDUP_EMB_SQL}


def sim_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination
    (similarity.semantic_contamination): benchmark = every 20th vector,
    train corpus = the rest PLUS jittered copies of the benchmark rows
    (vec_id + 2000000, the deterministic ~0.9996-cosine distortion from
    dedup_embedding_cosine — simulated eval leakage, since the synthetic
    embeddings have no natural near-dups). The asymmetric sign-LSH join
    must flag exactly the planted leaks; the oracle replays hyperplanes,
    banding, bucket caps, verification, and the per-doc argmax from the
    same md5-derived constants."""
    emb = Tables(spark, sf_dir).embeddings
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    bench = base.filter(F.col("vec_id") % 20 == 0)
    leaks = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + F.lit(2000000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + ((i % 7) - 3).cast("double") * F.lit(0.01)),
        ).alias("embedding"),
    )
    corpus = base.filter(F.col("vec_id") % 20 != 0).unionByName(leaks)
    return S.semantic_contamination(
        corpus, bench, threshold=0.99, planes=16, bands=2
    ).orderBy("vec_id")


SIM_CONTAM_SQL = f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
bench AS (SELECT vec_id AS bench_id, cv FROM base WHERE vec_id % 20 = 0),
corpus AS (
  SELECT vec_id, cv FROM base WHERE vec_id % 20 <> 0
  UNION ALL
  SELECT vec_id + 2000000,
         list_transform(range(0, 64), d -> cv[d + 1] * (1.0 + 0.01 * ((d % 7) - 3)))
  FROM base WHERE vec_id % 20 = 0
),
csig0 AS (
  SELECT vec_id, 0 AS band, {" || ".join(_HP_BITS[0:8])} AS bh FROM corpus
  UNION ALL
  SELECT vec_id, 1, {" || ".join(_HP_BITS[8:16])} FROM corpus
),
csig AS (
  SELECT vec_id, band, bh FROM csig0
  QUALIFY count(*) OVER (PARTITION BY band, bh) <= 1000
),
bsig AS (
  SELECT bench_id, 0 AS band, {" || ".join(_HP_BITS[0:8])} AS bh FROM bench
  UNION ALL
  SELECT bench_id, 1, {" || ".join(_HP_BITS[8:16])} FROM bench
),
cands AS (
  SELECT DISTINCT c.vec_id, b.bench_id
  FROM csig c JOIN bsig b ON c.band = b.band AND c.bh = b.bh
),
pairs AS (
  SELECT ca.vec_id, ca.bench_id,
         round(list_cosine_similarity(cc.cv, bc.cv) + 0.0000000005, 6) AS cosine_sim
  FROM cands ca
  JOIN corpus cc ON ca.vec_id = cc.vec_id
  JOIN bench bc ON ca.bench_id = bc.bench_id
  WHERE round(list_cosine_similarity(cc.cv, bc.cv) + 0.0000000005, 6) >= 0.99
),
agg AS (
  SELECT vec_id, max(cosine_sim) AS max_cosine, count(*) AS n_matches
  FROM pairs GROUP BY vec_id
)
SELECT p.vec_id, MIN(p.bench_id) AS best_bench_id, a.max_cosine, a.n_matches
FROM pairs p JOIN agg a ON p.vec_id = a.vec_id AND p.cosine_sim = a.max_cosine
GROUP BY p.vec_id, a.max_cosine, a.n_matches
ORDER BY p.vec_id
"""


QUERIES["sim_contamination"] = {"fn": sim_contamination, "oracle": SIM_CONTAM_SQL}


# --- Duplicate groups: iterative connected components, recursive-CTE oracle --

# The minhash pipeline's CTE chain (everything up to its final SELECT),
# reused so the component oracle runs over the exact same verified pairs.
_MINHASH_CTES = DEDUP_MINHASH_SQL.rsplit("SELECT id_a, id_b, jaccard", 1)[0]


def dedup_duplicate_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH pairs -> connected components (iterative min-label
    propagation, an algorithm with no single-query SQL form) -> per-group
    dedup decision table. The oracle reproduces the components with a
    recursive transitive-closure CTE — DuckDB recursion checks Spark
    iteration."""
    return D.duplicate_groups(
        Tables(spark, sf_dir).documents, threshold=0.05
    ).select("component", "n_members", "min_id", "max_id", "canonical_is_min")


DEDUP_GROUPS_SQL = (
    "WITH RECURSIVE"
    + _MINHASH_CTES.lstrip()[4:]
    + """, pairs AS (
  SELECT id_a, id_b FROM verified WHERE jaccard >= 0.05
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src
), comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id)
SELECT component, count(*) AS n_members, min(id) AS min_id, max(id) AS max_id,
       component = min(id) AS canonical_is_min
FROM comp GROUP BY component
"""
)


QUERIES["dedup_duplicate_groups"] = {"fn": dedup_duplicate_groups, "oracle": DEDUP_GROUPS_SQL}


# --- SimHash near-dup pairs (pigeonhole chunk join) --------------------------

def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 1 via the pigeonhole
    chunk join (2 exact-match chunks of 30 bits — guaranteed recall, ~1e9
    distinct values per chunk, so the equi-join stays selective at corpus
    scale). The oracle reproduces chunking, the bucket-size cap, the
    candidate join and bit_count verification."""
    return D.simhash_near_duplicates(
        Tables(spark, sf_dir).documents, max_hamming=1
    ).orderBy("id_a", "id_b")


DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH sig AS ({DEDUP_SIMHASH_SQL}),
chunks AS (
  SELECT doc_id, c.c AS ci, (simhash >> (c.c * 30)) & 1073741823 AS cv
  FROM sig CROSS JOIN (SELECT unnest(range(0, 2)) AS c) c
  QUALIFY count(*) OVER (PARTITION BY c.c, (simhash >> (c.c * 30)) & 1073741823) <= 1000
),
cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b, CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INT) AS hamming
FROM cands c JOIN sig sa ON c.id_a = sa.doc_id JOIN sig sb ON c.id_b = sb.doc_id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 1
"""


QUERIES["dedup_simhash_pairs"] = {"fn": dedup_simhash_pairs, "oracle": DEDUP_SIMHASH_PAIRS_SQL}


# --- IVF with a true k-means coarse quantizer (iterative, value-oracled) -----

def sim_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 with a Lloyd-iteration k-means codebook. The fit is
    deterministic (smallest-id init, fixed 3 iterations, tie-broken
    argmax), so the oracle UNROLLS the three Lloyd iterations as chained
    CTEs — DuckDB re-derives the codebook, the bucket assignment, the
    probe selection, and the in-bucket exact cosine from scratch."""
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ivf_kmeans_topk(emb, queries, k=10, n_buckets=16, nprobe=3, iters=3)


def _kmeans_iteration_sql(i: int) -> str:
    """One Lloyd iteration as CTEs: assign under cb{i-1} -> per-bucket
    means -> cb{i} (empty buckets keep the previous centroid)."""
    return f"""
it{i} AS (
  SELECT vec_id, v, bucket FROM (
    SELECT b.vec_id, b.v, c.bucket,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY list_cosine_similarity(b.v, c.centroid) DESC, c.bucket) AS rn
    FROM base b CROSS JOIN cb{i - 1} c
  ) WHERE rn = 1
),
up{i} AS (
  SELECT bucket, list(m ORDER BY pos) AS centroid FROM (
    SELECT bucket, pos, avg(x) AS m FROM (
      SELECT bucket, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM it{i}
    ) GROUP BY bucket, pos
  ) GROUP BY bucket
),
cb{i} AS (
  SELECT c.bucket, COALESCE(u.centroid, c.centroid) AS centroid
  FROM cb{i - 1} c LEFT JOIN up{i} u ON c.bucket = u.bucket
)"""


SIM_KMEANS_SQL = (
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cb0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS bucket, v AS centroid
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 16)
),"""
    + ",".join(_kmeans_iteration_sql(i) for i in (1, 2, 3))
    + """,
assigned AS (
  SELECT vec_id, v, bucket FROM (
    SELECT b.vec_id, b.v, c.bucket,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY list_cosine_similarity(b.v, c.centroid) DESC, c.bucket) AS rn
    FROM base b CROSS JOIN cb3 c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5),
probes AS (
  SELECT query_id, bucket FROM (
    SELECT q.query_id, c.bucket,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qv, c.centroid) DESC, c.bucket) AS r
    FROM q CROSS JOIN cb3 c
  ) WHERE r <= 3
),
scored AS (
  SELECT p.query_id, a.vec_id,
         round(list_cosine_similarity(a.v, q.qv) + 0.0000000005, 6) AS cosine_sim
  FROM probes p
  JOIN assigned a ON a.bucket = p.bucket
  JOIN q ON q.query_id = p.query_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""
)


QUERIES["sim_ivf_kmeans_topk"] = {"fn": sim_ivf_kmeans_topk, "oracle": SIM_KMEANS_SQL}


# --- TF-IDF keyword extraction ----------------------------------------------

def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document: explode tokens -> tf per
    (doc, term) -> document frequency -> smoothed idf — every stage a
    codegen'd hash aggregate; the corpus size joins in as a broadcast
    1-row aggregate (no driver collect). The ranking runs on the scored
    (doc, term) frame, never the raw token stream."""
    from pyspark.sql import Window

    docs = Tables(spark, sf_dir).documents
    toked = docs.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
    tf = toked.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    ndocs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn("score", F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", F.round(F.col("score") + F.lit(5e-10), 6).alias("score"), "rank")
        .orderBy("doc_id", "rank")
    )


DOC_TFIDF_SQL = f"""
WITH toked AS (
  SELECT doc_id, unnest({TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toked GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term, t.tf * ln((n_docs + 1.0) / (df + 1.0)) AS score
  FROM tf t JOIN dfreq USING (term), nd
)
SELECT doc_id, term, round(score + 0.0000000005, 6) AS score, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS INT) AS rank
  FROM scored
) WHERE rank <= 3
ORDER BY doc_id, rank
"""


QUERIES["doc_tfidf_top_terms"] = {"fn": doc_tfidf_top_terms, "oracle": DOC_TFIDF_SQL}


# --- Corpus curation: decontamination / sampling / quality / packing ---------

def doc_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs sharing a word 3-gram with the
    held-out 'benchmark' slice (doc_id % 97 == 0 — a deterministic
    stand-in for a real eval set). Benchmark gram set broadcasts; the
    corpus side never shuffles on gram."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return C.benchmark_contamination(train, bench, n=3).orderBy("doc_id")


DOC_CONTAMINATION_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in range(1, len(t) - 1)]
           ELSE [array_to_string(t, ' ')] END) AS sh
  FROM toks
),
tr AS (SELECT doc_id, unnest(sh) AS gram FROM sh WHERE doc_id % 97 <> 0),
be AS (SELECT DISTINCT doc_id AS bench_id, gram FROM
         (SELECT doc_id, unnest(sh) AS gram FROM sh WHERE doc_id % 97 = 0))
SELECT tr.doc_id,
       CAST(count(DISTINCT tr.gram) AS BIGINT) AS n_shared_grams,
       CAST(count(DISTINCT be.bench_id) AS BIGINT) AS n_bench_docs
FROM tr JOIN be USING (gram)
GROUP BY tr.doc_id ORDER BY tr.doc_id
"""

QUERIES["doc_benchmark_contamination"] = {
    "fn": doc_benchmark_contamination, "oracle": DOC_CONTAMINATION_SQL,
}


def doc_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample (training-mix primitive): keep 50%
    of en, 30% of de, 20% elsewhere, decided by an md5 threshold on the
    doc id; summarized per (lang, source)."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    kept = C.stratified_sample(docs, {"en": 0.5, "de": 0.3}, default_rate=0.2)
    return (
        kept.groupBy("lang", "source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang", "source")
    )


DOC_STRATIFIED_SQL = """
SELECT lang, source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':strat')), 1, 15)) AS BIGINT) % 10000)
      < (CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 3000 ELSE 2000 END)
GROUP BY lang, source ORDER BY lang, source
"""

QUERIES["doc_stratified_sample"] = {
    "fn": doc_stratified_sample, "oracle": DOC_STRATIFIED_SQL,
}


def doc_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics + pass/fail verdict per doc."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    return C.gopher_quality_filter(docs).orderBy("doc_id")


DOC_REPETITION_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
tok_counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok
),
tok_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top_tok,
         count(*) AS n_distinct
  FROM tok_counts GROUP BY doc_id
),
bgs AS (
  SELECT doc_id, CASE WHEN len(t) >= 2
           THEN [t[i] || ' ' || t[i+1] for i in range(1, len(t))]
           ELSE [array_to_string(t, ' ')] END AS bg
  FROM toks
),
bg_counts AS (
  SELECT doc_id, b, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS b FROM bgs) GROUP BY doc_id, b
),
bg_stats AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bg FROM bg_counts GROUP BY doc_id
),
m AS (
  SELECT t.doc_id, t.n_tokens,
         round(t.top_tok * 1.0 / t.n_tokens + 0.0000000005, 6) AS top_token_ratio,
         round(b.top_bg * 1.0 / b.n_bigrams + 0.0000000005, 6) AS top_bigram_ratio,
         round(t.n_distinct * 1.0 / t.n_tokens + 0.0000000005, 6) AS distinct_token_ratio
  FROM tok_stats t JOIN bg_stats b USING (doc_id)
)
SELECT *,
       (n_tokens >= 20 AND top_token_ratio <= 0.10
        AND top_bigram_ratio <= 0.04 AND distinct_token_ratio >= 0.5) AS gopher_pass
FROM m ORDER BY doc_id
"""

QUERIES["doc_repetition_quality"] = {
    "fn": doc_repetition_quality, "oracle": DOC_REPETITION_SQL,
}


def doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-shard sequence packing into 256-token training
    sequences (8 shards). The oracle replays the packing recurrence with
    a recursive CTE — the round-1 Holt-Winters technique."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    return C.pack_sequences(docs, budget=256, n_shards=8).orderBy("doc_id")


DOC_PACK_SQL = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, doc_id % 8 AS shard, CAST(len({TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM toks
),
packed AS (
  SELECT shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS pack_seq, CAST(1 AS BIGINT) AS pack_pos,
         n_tokens AS pack_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.doc_id, o.n_tokens,
         CASE WHEN p.pack_fill + o.n_tokens > 256 THEN p.pack_seq + 1 ELSE p.pack_seq END,
         CASE WHEN p.pack_fill + o.n_tokens > 256 THEN CAST(1 AS BIGINT) ELSE p.pack_pos + 1 END,
         CASE WHEN p.pack_fill + o.n_tokens > 256 THEN o.n_tokens ELSE p.pack_fill + o.n_tokens END
  FROM packed p JOIN ordered o ON o.shard = p.shard AND o.rn = p.rn + 1
)
SELECT doc_id, shard, n_tokens, pack_seq, pack_pos, pack_fill
FROM packed ORDER BY doc_id
"""

QUERIES["doc_pack_sequences"] = {"fn": doc_pack_sequences, "oracle": DOC_PACK_SQL}


# --- Product quantization ADC top-k ------------------------------------------

def _pq_iteration_sql(i: int) -> str:
    """One per-subspace Lloyd iteration as CTEs (same unrolling technique
    as _kmeans_iteration_sql, with the subspace id carried through)."""
    return f"""
pit{i} AS (
  SELECT vec_id, s, sv, code FROM (
    SELECT sub.vec_id, sub.s, sub.sv, c.code,
           row_number() OVER (PARTITION BY sub.vec_id, sub.s
                              ORDER BY list_sum([(sub.sv[j+1] - c.centroid[j+1]) * (sub.sv[j+1] - c.centroid[j+1]) for j in range(16)]) ASC, c.code) AS rn
    FROM psubs sub JOIN pcb{i - 1} c ON c.s = sub.s
  ) WHERE rn = 1
),
pup{i} AS (
  SELECT s, code, list(m ORDER BY pos) AS centroid FROM (
    SELECT s, code, pos, avg(x) AS m FROM (
      SELECT s, code, generate_subscripts(sv, 1) AS pos, unnest(sv) AS x FROM pit{i}
    ) GROUP BY s, code, pos
  ) GROUP BY s, code
),
pcb{i} AS (
  SELECT c.s, c.code, COALESCE(u.centroid, c.centroid) AS centroid
  FROM pcb{i - 1} c LEFT JOIN pup{i} u ON c.s = u.s AND c.code = u.code
)"""


# RETIRED GATE (r15, VERDICT_r14 next-round #3): sim_pq_topk — the
# monolithic pq_topk wrapper shared SIM_PQ_SQL (and its exact result)
# with the still-gated sim_pq_scan_topk, which is the STRONGER entry:
# it exercises the decomposed serving path (pq_fit + pq_encode +
# pq_scan_topk — the same ADC arithmetic plus the index persistence
# boundary bench.py times). Coverage inherits to
# tests/test_pipeline_ops.py::test_pq_topk_recall_vs_brute_force and
# the ivf_pq consistency tests, which drive pq_topk directly.

SIM_PQ_SQL = (
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
psubs AS (
  SELECT vec_id, s, v[s*16+1 : s*16+16] AS sv
  FROM base, (SELECT unnest(range(4)) AS s)
),
pcb0 AS (
  SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
         sv AS centroid
  FROM psubs
  WHERE vec_id IN (SELECT vec_id FROM base ORDER BY vec_id LIMIT 16)
),"""
    + ",".join(_pq_iteration_sql(i) for i in (1, 2))
    + """,
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, c.code,
           row_number() OVER (PARTITION BY sub.vec_id, sub.s
                              ORDER BY list_sum([(sub.sv[j+1] - c.centroid[j+1]) * (sub.sv[j+1] - c.centroid[j+1]) for j in range(16)]) ASC, c.code) AS rn
    FROM psubs sub JOIN pcb2 c ON c.s = sub.s
  ) WHERE rn = 1
),
dtable AS (
  SELECT q.vec_id AS query_id, q.s, c.code,
         list_sum([(q.sv[j+1] - c.centroid[j+1]) * (q.sv[j+1] - c.centroid[j+1]) for j in range(16)]) AS d
  FROM psubs q JOIN pcb2 c ON c.s = q.s
  WHERE q.vec_id < 5
),
scored AS (
  SELECT d.query_id, codes.vec_id,
         round(sum(d.d) + 0.0000000005, 6) AS approx_dist
  FROM codes JOIN dtable d ON d.s = codes.s AND d.code = codes.code
  WHERE codes.vec_id <> d.query_id
  GROUP BY d.query_id, codes.vec_id
)
SELECT query_id, vec_id, approx_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""
)

def sim_pq_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path PQ gate: build the index once (fit + encode), pin it
    the way a serving system would (materialized, lineage cut), then run
    ONLY the ADC scan (:func:`rearview_spark.operators.similarity.
    pq_scan_topk`). SIM_PQ_SQL re-derives codebooks, assignments, and
    ADC sums from scratch (chained-CTE Lloyd unrolling); this entry
    gates the decomposed serving path that bench.py times as the ANN
    serving headline (index build is reported as its own bench line,
    sim_pq_fit_encode). The monolithic sim_pq_topk twin was retired to
    unit-only coverage in r15 — same oracle, same result, weaker
    surface."""
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    codebook = S.pq_fit(emb, m=4, k=16, iters=2)
    codes = S.pq_encode(emb, codebook, m=4).localCheckpoint(eager=True)
    return S.pq_scan_topk(codes, codebook, queries, topk=10, m=4)


QUERIES["sim_pq_scan_topk"] = {"fn": sim_pq_scan_topk, "oracle": SIM_PQ_SQL}


# --- IVF+PQ composed ANN -----------------------------------------------------

# RETIRED GATE (r16, VERDICT_r15 next-round #5): sim_ivf_pq_topk — the
# raw-space IVF+PQ compose; every constituent stays gated on its own
# (IVF routing via sim_ivf_topk / sim_ivf_kmeans_topk, PQ codebooks +
# ADC via sim_pq_scan_topk) and sim_ivf_rpq_topk keeps the STRICTLY
# larger composition (router + residual encode + per-probe ADC)
# driver-checked through the same chained-CTE oracle unrolling.
# Coverage inherits to tests/test_pipeline_ops.py::
# test_ivf_pq_subset_of_pq_within_probed_buckets and the raw-vs-
# residual comparison test beside it; the operator stays exported.
# --- IVF + residual PQ (IVFADC) ----------------------------------------------

def sim_ivf_rpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF router + RESIDUAL PQ: codes quantize (vector - assigned router
    centroid), and each probe's ADC table is built from the query's own
    residual against that bucket's centroid. The oracle re-derives router
    CTEs, residual frames, residual-space codebooks, code assignment, and
    the (query, bucket)-keyed ADC sums — same chained-CTE unrolling as
    the raw IVF+PQ gate."""
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 5)
    return S.ivf_rpq_topk(
        emb, queries, topk=10, n_buckets=8, nprobe=2, router_iters=2,
        m=4, k_codes=16, pq_iters=2,
    )


SIM_IVF_RPQ_SQL = (
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cb0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS bucket, v AS centroid
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 8)
),"""
    + ",".join(_kmeans_iteration_sql(i) for i in (1, 2))
    + """,
assigned AS (
  SELECT vec_id, bucket FROM (
    SELECT b.vec_id, c.bucket,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY list_cosine_similarity(b.v, c.centroid) DESC, c.bucket) AS rn
    FROM base b CROSS JOIN cb2 c
  ) WHERE rn = 1
),
resid AS (
  SELECT a.vec_id, a.bucket,
         [b.v[j+1] - c.centroid[j+1] for j in range(64)] AS rv
  FROM assigned a
  JOIN base b ON b.vec_id = a.vec_id
  JOIN cb2 c ON c.bucket = a.bucket
),
psubs AS (
  SELECT vec_id, s, rv[s*16+1 : s*16+16] AS sv
  FROM resid, (SELECT unnest(range(4)) AS s)
),
pcb0 AS (
  SELECT s, row_number() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code,
         sv AS centroid
  FROM psubs
  WHERE vec_id IN (SELECT vec_id FROM base ORDER BY vec_id LIMIT 16)
),"""
    + ",".join(_pq_iteration_sql(i) for i in (1, 2))
    + """,
codes AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, c.code,
           row_number() OVER (PARTITION BY sub.vec_id, sub.s
                              ORDER BY list_sum([(sub.sv[j+1] - c.centroid[j+1]) * (sub.sv[j+1] - c.centroid[j+1]) for j in range(16)]) ASC, c.code) AS rn
    FROM psubs sub JOIN pcb2 c ON c.s = sub.s
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5),
probes AS (
  SELECT query_id, bucket FROM (
    SELECT q.query_id, c.bucket,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_cosine_similarity(q.qv, c.centroid) DESC, c.bucket) AS r
    FROM q CROSS JOIN cb2 c
  ) WHERE r <= 2
),
qresid AS (
  SELECT p.query_id, p.bucket,
         [q.qv[j+1] - c.centroid[j+1] for j in range(64)] AS rqv
  FROM probes p
  JOIN q ON q.query_id = p.query_id
  JOIN cb2 c ON c.bucket = p.bucket
),
qsubs AS (
  SELECT query_id, bucket, s, rqv[s*16+1 : s*16+16] AS sv
  FROM qresid, (SELECT unnest(range(4)) AS s)
),
dtable AS (
  SELECT qs.query_id, qs.bucket, qs.s, c.code,
         list_sum([(qs.sv[j+1] - c.centroid[j+1]) * (qs.sv[j+1] - c.centroid[j+1]) for j in range(16)]) AS d
  FROM qsubs qs JOIN pcb2 c ON c.s = qs.s
),
cands AS (
  SELECT p.query_id, a.vec_id, a.bucket
  FROM probes p JOIN assigned a ON a.bucket = p.bucket
  WHERE a.vec_id <> p.query_id
),
scored AS (
  SELECT cd.query_id, cd.vec_id,
         round(sum(d.d) + 0.0000000005, 6) AS approx_dist
  FROM cands cd
  JOIN codes ON codes.vec_id = cd.vec_id
  JOIN dtable d ON d.query_id = cd.query_id AND d.bucket = cd.bucket
               AND d.s = codes.s AND d.code = codes.code
  GROUP BY cd.query_id, cd.vec_id
)
SELECT query_id, vec_id, approx_dist, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""
)

QUERIES["sim_ivf_rpq_topk"] = {"fn": sim_ivf_rpq_topk, "oracle": SIM_IVF_RPQ_SQL}


def sim_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized ANN: per-dimension 8-bit codes, midpoint
    dequantization, asymmetric cosine scoring (full-precision queries) —
    the third compression tier beside PQ and IVF+PQ. The oracle replays
    fit/encode/dequantize/score, so the gate checks the quantizer's
    semantics, not just shapes."""
    emb = Tables(spark, sf_dir).embeddings
    queries = emb.filter(F.col("vec_id") < 3)
    return S.sq8_topk(emb, queries, k=10)


SIM_SQ8_SQL = """
WITH expl AS (
  SELECT generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
bd AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM expl GROUP BY 1),
b AS (SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs FROM bd),
dq AS (
  SELECT vec_id,
         [ mins[i] + ((CAST(
              CASE WHEN maxs[i] = mins[i] THEN 0
                   ELSE least(CAST(floor(((CAST(embedding[i] AS DOUBLE) - mins[i])
                                          / (maxs[i] - mins[i])) * 256.0) AS INT), 255)
              END AS DOUBLE) + 0.5)
            * ((maxs[i] - mins[i]) / 256.0))
           for i in range(1, len(embedding) + 1) ] AS dqv
  FROM embeddings, b
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 3),
scored AS (
  SELECT q.query_id, d.vec_id,
         round(list_cosine_similarity(d.dqv, q.qv) + 0.0000000005, 6) AS sq_sim
  FROM dq d CROSS JOIN q WHERE d.vec_id <> q.query_id
)
SELECT query_id, vec_id, sq_sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sq_sim DESC, vec_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 10
"""

QUERIES["sim_sq8_topk"] = {"fn": sim_sq8_topk, "oracle": SIM_SQ8_SQL}


# --- BPE vocabulary training -------------------------------------------------

def doc_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE merge learning over the documents table (operators/
    text.py bpe_train): 8 merge rounds, each = pair-count aggregation +
    argmax + greedy re-tokenize. The oracle unrolls the same 8 rounds as
    chained CTEs sharing the pipe-delimited merge representation, so the
    hash check covers counts, tie-breaks, AND the re-tokenization."""
    docs = Tables(spark, sf_dir).documents
    return X.bpe_train(docs, n_merges=8)


def _bpe_iteration_sql(i: int) -> str:
    """One BPE round as CTEs: adjacent-pair counts over s{i-1} -> argmax
    with (cnt DESC, l, r) tie-break -> greedy merge via delimited
    replace. MATERIALIZED is load-bearing: each round reads its
    predecessor twice, so DuckDB's default CTE inlining would expand the
    8-round chain into a 2^8 plan tree."""
    return f"""
ex{i} AS MATERIALIZED (
  SELECT seq, freq, generate_subscripts(syms, 1) AS idx, unnest(syms) AS sym
  FROM (SELECT seq, freq,
               str_split(substr(seq, 2, length(seq) - 2), '||') AS syms
        FROM s{i - 1})
),
b{i} AS MATERIALIZED (
  SELECT l, r, cnt FROM (
    SELECT a.sym AS l, b.sym AS r, sum(a.freq) AS cnt
    FROM ex{i} a JOIN ex{i} b ON b.seq = a.seq AND b.idx = a.idx + 1
    GROUP BY 1, 2
  ) ORDER BY cnt DESC, l, r LIMIT 1
),
s{i} AS MATERIALIZED (
  SELECT replace(seq, '|' || l || '||' || r || '|', '|' || l || r || '|') AS seq,
         freq
  FROM s{i - 1}, b{i}
)"""


DOC_BPE_SQL = (
    """
WITH w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(str_split_regex(lower(text), '[^a-z]+')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),
s0 AS MATERIALIZED (
  SELECT '|' || array_to_string(str_split(w, ''), '||') || '|' AS seq, freq
  FROM w0
),"""
    + ",".join(_bpe_iteration_sql(i) for i in range(1, 9))
    + """
SELECT CAST(merge_rank AS INT) AS merge_rank, l AS "left", r AS "right",
       l || r AS merged, CAST(cnt AS BIGINT) AS pair_count
FROM ("""
    + " UNION ALL ".join(
        f"SELECT {i} AS merge_rank, l, r, cnt FROM b{i}" for i in range(1, 9)
    )
    + """)
"""
)

QUERIES["doc_bpe_vocab"] = {"fn": doc_bpe_vocab, "oracle": DOC_BPE_SQL}


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/similarity.py
    semantic_dedup): k-means the embedding space (16 clusters, 3 Lloyd
    iterations — same deterministic fit as sim_ivf_kmeans_topk), prune
    within clusters by earlier-near-twin (pruned iff ANY smaller-id
    same-cluster vector has rounded cosine >= tau — a superset of greedy
    keep-first; see semantic_dedup's docstring). tau=0.3 is the ~p99
    of this corpus's pair-cosine distribution (these embeddings carry no
    >0.52 pairs), so the prune is selective but non-empty. The oracle
    re-derives the whole thing — codebook, assignment, within-cluster
    pairs, keep flags — from scratch in SQL."""
    emb = Tables(spark, sf_dir).embeddings
    out = S.semantic_dedup(emb, threshold=0.3, n_buckets=16, iters=3)
    return out.orderBy("vec_id")


DEDUP_SEM_SQL = (
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cb0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS bucket, v AS centroid
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 16)
),"""
    + ",".join(_kmeans_iteration_sql(i) for i in (1, 2, 3))
    + """,
assigned AS (
  SELECT vec_id, v, bucket FROM (
    SELECT b.vec_id, b.v, c.bucket,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY list_cosine_similarity(b.v, c.centroid) DESC, c.bucket) AS rn
    FROM base b CROSS JOIN cb3 c
  ) WHERE rn = 1
),
removed AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v) + 0.0000000005, 6) >= 0.3
)
SELECT a.vec_id, CAST(a.bucket AS INT) AS bucket, (r.vec_id IS NULL) AS kept
FROM assigned a LEFT JOIN removed r ON a.vec_id = r.vec_id
ORDER BY a.vec_id
"""
)

QUERIES["dedup_semantic"] = {"fn": dedup_semantic, "oracle": DEDUP_SEM_SQL}


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/curation.py pii_scrub): the corpus text
    carries no digits, so the gate PLANTS one deterministic email, phone,
    and IPv4 per doc (derived from doc_id — both engines synthesize the
    identical contact block), then scrubs. The hash check covers the
    typed placeholders, the byte-exact scrubbed text, and the per-type
    match counts — i.e. both the redaction and the audit metrics. All
    three patterns stay inside the Java/RE2-common regex subset
    (curation.PII_PATTERNS)."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com tel 555-"),
            F.lpad(F.pmod(F.col("doc_id") * 37, 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad(F.pmod(F.col("doc_id") * 7919, 10000).cast("string"), 4, "0"),
            F.lit(" host 10.0."),
            F.pmod(F.col("doc_id"), 256).cast("string"),
            F.lit("."),
            F.pmod(F.col("doc_id") * 3, 256).cast("string"),
        ).alias("text"),
    )
    return (
        C.pii_scrub(planted)
        .select("doc_id", "scrubbed", "n_email", "n_ipv4", "n_phone")
        .orderBy("doc_id")
    )


DOC_PII_SQL = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com tel 555-'
              || lpad(CAST((doc_id * 37) % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST((doc_id * 7919) % 10000 AS VARCHAR), 4, '0')
              || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST((doc_id * 3) % 256 AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IPV4>', 'g'),
         '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
       CAST(len(regexp_extract_all(text,
         '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(text,
         '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INT) AS n_phone
FROM planted
ORDER BY doc_id
"""

QUERIES["doc_pii_scrub"] = {"fn": doc_pii_scrub, "oracle": DOC_PII_SQL}


def doc_upsample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix materialization (operators/curation.py
    upsample_mix): src0 seen 2.5 epochs (every doc twice, the md5-chosen
    half a third time), src1 halved, src2 dropped, everything else 1.0.
    Returns the full mixed frame (doc_id, source, copy) so the oracle
    re-derives every whole-copy AND every fractional keep decision from
    the same md5 threshold — the hash check pins the exact mix, not just
    its size."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    mixed = C.upsample_mix(
        docs, {"src0": 2.5, "src1": 0.5, "src2": 0.0}, default_weight=1.0
    )
    return mixed.select("doc_id", "source", "copy").orderBy("doc_id", "copy")


DOC_MIX_SQL = """
WITH w AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
                     WHEN 'src2' THEN 0.0 ELSE 1.0 END AS w,
         (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':mix')), 1, 15)) AS BIGINT) % 10000) AS bucket
  FROM documents
),
n AS (
  SELECT doc_id, source,
         CAST(floor(w) AS INT)
         + CASE WHEN bucket < CAST(round(w * 10000) AS BIGINT) - CAST(floor(w) AS BIGINT) * 10000
                THEN 1 ELSE 0 END AS n_copies
  FROM w
)
SELECT doc_id, source, CAST(unnest(range(1, n_copies + 1)) AS INT) AS copy
FROM n WHERE n_copies >= 1
ORDER BY doc_id, copy
"""

QUERIES["doc_upsample_mix"] = {"fn": doc_upsample_mix, "oracle": DOC_MIX_SQL}


# --- PENDING r07 registration (window-full rule; see plans/__init__.py) ------

RANGE_RADIUS = 0.25


def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine radius query for query vectors 0-2: every corpus vector
    with 6dp-rounded cosine >= 0.25 (operators/similarity.py:
    range_search — the unbounded-count half of the vector API next to
    top-k). Boundary decisions compare identical rounded doubles on
    both engines."""
    from rearview_spark.operators.similarity import range_search

    emb = Tables(spark, sf_dir).embeddings
    out = range_search(emb, emb.filter(F.col("vec_id") < 3), RANGE_RADIUS)
    return out.orderBy("query_id", "vec_id")


SIM_RANGE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 3
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
               + 0.0000000005, 6) AS cosine_sim
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine_sim FROM scored
WHERE cosine_sim >= {RANGE_RADIUS}
ORDER BY query_id, vec_id
"""


def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-chunking fan-out over real WAV headers (multimodal.py:
    audio_chunk_plan): durations parsed from synthesized container
    bytes, then each media row expands to its fixed-length transcription
    windows (20ms chunks so the short WAVs split). Image rows have no
    duration and contribute the single empty chunk at 0 — the plan's
    documented null-duration behavior, pinned by the oracle's
    closed-form id formulas."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_media_payloads(docs)
    feats = M.extract_media_features(media)
    plan = M.audio_chunk_plan(
        feats.select("media_id", F.struct("duration_ms").alias("meta")),
        chunk_ms=20,
    )
    return plan.orderBy("media_id", "chunk_idx")


MEDIA_AUDIO_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 1
              THEN CAST(((doc_id % 1000) * 2 + 2000) * 1000
                        // ((doc_id % 5 + 1) * 16000) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS dur
  FROM documents
),
s AS (
  SELECT doc_id, dur, unnest(generate_series(0, dur, 20)) AS start_ms FROM m
)
SELECT doc_id AS media_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_ms) - 1 AS INT) AS chunk_idx,
       start_ms,
       least(start_ms + 20, dur) AS end_ms
FROM s
WHERE start_ms < greatest(dur, 1)
ORDER BY media_id, chunk_idx
"""

QUERIES["sim_range_search"] = {"fn": sim_range_search, "oracle": SIM_RANGE_SQL}
QUERIES["media_audio_chunks"] = {"fn": media_audio_chunks, "oracle": MEDIA_AUDIO_SQL}


# --- Incremental minhash dedup (built r07, staged for r08 registration) ------

def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup dedup: even-id docs play the accumulated
    signature store, odd-id docs arrive as the new batch
    (operators/dedup.py: incremental_minhash_dedup). The gate hashes
    every new doc's decision — dup_of (store doc or smaller batch-mate,
    best verified Jaccard, id-ascending tie-break; NULL = unique) and
    the exact jaccard — so the banding, union bucket cap, store join,
    and best-match ranking are all value-checked."""
    docs = Tables(spark, sf_dir).documents
    # Both halves come out of ONE corpus signature pass (r17): the
    # shingle+md5 pipeline is the dominant cost and signatures are
    # per-doc, so signing the corpus once and slicing even/odd is
    # value-identical to two half-corpus passes — the gate measured
    # 0.70x (5.3 -> 3.7 s noop, one Exchange and one parquet scan
    # fewer). The eager localCheckpoint materializes the pass once so
    # the store and batch slices don't each replay it; a REAL ingest
    # pipeline never signs its store at all (history arrives as
    # persisted minhash_store_rows), so this materialization is
    # gate-shape-only, not a 100 TB requirement.
    all_rows = D.minhash_store_rows(docs).localCheckpoint(eager=True)
    out = D.incremental_minhash_dedup(
        docs.filter(F.col("doc_id") % 2 == 1),
        all_rows.filter(F.col("doc_id") % 2 == 0),
        threshold=0.05,
        new_sigs=all_rows.filter(F.col("doc_id") % 2 == 1),
    )
    return out.select("doc_id", "dup_of", "jaccard").orderBy("doc_id")


#: the shared CTE chain of DEDUP_MINHASH_SQL up THROUGH the capped bands
#: (the incremental form bands store+new together, so the cap-over-union
#: matches the batch oracle's QUALIFY exactly)
_MINHASH_BANDS_CTES = DEDUP_MINHASH_SQL.split("), cands AS")[0] + ")"

DEDUP_INCREMENTAL_SQL = _MINHASH_BANDS_CTES + """
, cands AS (
  SELECT DISTINCT a.doc_id AS nid, b.doc_id AS mid
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
  WHERE a.doc_id % 2 = 1 AND (b.doc_id % 2 = 0 OR b.doc_id < a.doc_id)
), verified AS (
  SELECT c.nid, c.mid,
         round(len(list_intersect(sa.sh, sb.sh)) * 1.0
             / len(list_distinct(list_concat(sa.sh, sb.sh))) + 0.0000000005, 6) AS jaccard
  FROM cands c JOIN sh sa ON c.nid = sa.doc_id JOIN sh sb ON c.mid = sb.doc_id
), best AS (
  SELECT nid, mid, jaccard FROM verified
  WHERE jaccard >= 0.05
  QUALIFY row_number() OVER (PARTITION BY nid ORDER BY jaccard DESC, mid) = 1
)
SELECT d.doc_id, b.mid AS dup_of, b.jaccard
FROM documents d LEFT JOIN best b ON d.doc_id = b.nid
WHERE d.doc_id % 2 = 1
ORDER BY d.doc_id
"""

# --- Duplicated-span substring dedup (built r07, staged for r08) -------------

_SPAN_W = 8
_SPAN_MIN = 8


def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup (Lee et al. arXiv:2107.06499 as
    positional w-gram fingerprints + island merging —
    operators/dedup.py: duplicated_spans). The synthetic corpus carries
    naturally recurring phrases, so the gate finds real cross-doc spans;
    it hashes every span's exact (start, end, tokens, text-md5), so the
    fingerprinting, >= min_docs threshold, island merge, and boundary
    arithmetic are all value-checked."""
    docs = Tables(spark, sf_dir).documents
    out = D.duplicated_spans(docs, window=_SPAN_W, min_tokens=_SPAN_MIN)
    return out.orderBy("doc_id", "span_start")


DEDUP_SPANS_SQL = f"""
WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
grams AS (
  SELECT doc_id, i - 1 AS pos,
         CAST(concat('0x', substr(md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')), 1, 15)) AS BIGINT) AS h
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {_SPAN_W - 2})) AS i) r
  WHERE len(t) >= {_SPAN_W}
),
duph AS (
  SELECT h FROM (SELECT DISTINCT h, doc_id FROM grams) GROUP BY h HAVING count(*) >= 2
),
dpos AS (SELECT g.doc_id, g.pos FROM grams g JOIN duph USING (h)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + {_SPAN_W}) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS nw
  FROM dpos
),
isl AS (
  SELECT doc_id, pos, sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, min(pos) AS span_start, max(pos) + {_SPAN_W} AS span_end
  FROM isl GROUP BY doc_id, island
)
SELECT s.doc_id,
       CAST(span_start AS INT) AS span_start,
       CAST(span_end AS INT) AS span_end,
       CAST(span_end - span_start AS INT) AS span_tokens,
       md5(array_to_string(t[span_start + 1 : span_end], ' ')) AS span_md5
FROM spans s JOIN toks USING (doc_id)
WHERE span_end - span_start >= {_SPAN_MIN}
ORDER BY doc_id, span_start
"""

# --- Cluster-balanced sampling (built r07, staged for r08) -------------------

def sel_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-diversity balancing: deterministic k-means (2 Lloyd
    iterations, the sim_ivf_kmeans_topk fit) then per-cluster
    md5-threshold downsampling to ceil(N/16) rows
    (operators/selection.py: cluster_balanced_sample). The gate hashes
    every kept row's (id, bucket, threshold), value-checking the fit,
    the assignment, the integer threshold derivation, and each keep
    decision."""
    from rearview_spark.operators.selection import cluster_balanced_sample

    emb = Tables(spark, sf_dir).embeddings
    out = cluster_balanced_sample(emb, n_clusters=16, iters=2)
    return out.orderBy("vec_id")


SEL_CLUSTER_SQL = (
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cb0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS bucket, v AS centroid
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 16)
),"""
    + ",".join(_kmeans_iteration_sql(i) for i in (1, 2))
    + """,
assigned AS (
  SELECT vec_id, bucket FROM (
    SELECT b.vec_id, c.bucket,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY list_cosine_similarity(b.v, c.centroid) DESC, c.bucket) AS rn
    FROM base b CROSS JOIN cb2 c
  ) WHERE rn = 1
),
sizes AS (SELECT bucket, count(*) AS sz FROM assigned GROUP BY bucket),
tot AS (SELECT CAST(ceil(count(*) * 1.0 / 16) AS BIGINT) AS per_cluster FROM assigned),
thr AS (
  SELECT bucket,
         CAST(least(10000, greatest(1, (t.per_cluster * 10000) // sz)) AS INT) AS keep_threshold_bp
  FROM sizes, tot t
)
SELECT a.vec_id, CAST(a.bucket AS INT) AS bucket, thr.keep_threshold_bp
FROM assigned a JOIN thr USING (bucket)
WHERE (CAST(concat('0x', substr(md5(concat(CAST(a.vec_id AS VARCHAR), ':cluster')), 1, 15)) AS BIGINT) % 10000)
      < thr.keep_threshold_bp
ORDER BY a.vec_id
"""
)


# --- Leakage-safe split (built r07, staged for r08) --------------------------

def doc_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split taken per duplicate COMPONENT (near-dup pairs →
    connected components → md5-of-component decision), so an eval doc's
    near-twin can never land in train (operators/curation.py:
    leakage_safe_split). The gate hashes every doc's component and
    split — the pair graph, the component labels, singleton fallback,
    and each split decision are all value-checked."""
    from rearview_spark.operators import curation as CUR

    docs = Tables(spark, sf_dir).documents
    pairs = D.minhash_near_duplicates(docs, threshold=0.05)
    comps = D.connected_components(pairs)
    out = CUR.leakage_safe_split(docs, comps, val_bp=2000)
    return out.select("doc_id", "component", "split").orderBy("doc_id")


#: DEDUP_GROUPS_SQL's CTE chain through comp (pairs -> transitive
#: closure -> min-label components), without its aggregating SELECT
_COMPONENTS_CTES = DEDUP_GROUPS_SQL.rsplit("SELECT component,", 1)[0]

DOC_SPLIT_SQL = _COMPONENTS_CTES + """
SELECT d.doc_id,
       coalesce(c.component, d.doc_id) AS component,
       CASE WHEN (CAST(concat('0x', substr(md5(concat(CAST(coalesce(c.component, d.doc_id) AS VARCHAR), ':split')), 1, 15)) AS BIGINT) % 10000) < 2000
            THEN 'val' ELSE 'train' END AS split
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
ORDER BY d.doc_id
"""

# --- HTML cleaning (built r07, staged for r08) -------------------------------

def doc_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-scrape cleaning on deterministically HTML-ified documents:
    each doc is wrapped in markup (tags, a script block, comments,
    entities — varied by doc_id so every rule is exercised), cleaned
    with operators/text.py: clean_html, and the gate hashes the cleaned
    text md5 per doc — tag stripping, script-with-content removal,
    entity decode order (&amp; last), and whitespace collapse are all
    value-checked."""
    from rearview_spark.operators.text import clean_html

    docs = Tables(spark, sf_dir).documents
    htmlized = F.concat(
        F.lit('<div id="d'), F.col("doc_id").cast("string"), F.lit('">'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit("<script type='text/javascript'>var x = 1 < 2;</script>"),
        ).otherwise(F.lit("<!-- comment -->")),
        F.lit("<p>"), F.col("text"), F.lit("</p>"),
        F.lit("&amp;lt; &quot;q&quot;&nbsp;&#39;s&#39; &lt;tail&gt;</div>"),
    )
    out = docs.select(
        "doc_id", clean_html(htmlized).alias("clean_text")
    )
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_md5")
    ).orderBy("doc_id")


DOC_HTML_SQL = f"""
WITH h AS (
  SELECT doc_id,
         concat('<div id="d', CAST(doc_id AS VARCHAR), '">',
                CASE WHEN doc_id % 3 = 0
                     THEN '<script type=''text/javascript''>var x = 1 < 2;</script>'
                     ELSE '<!-- comment -->' END,
                '<p>', text, '</p>',
                '&amp;lt; &quot;q&quot;&nbsp;&#39;s&#39; &lt;tail&gt;</div>') AS raw
  FROM documents
), stripped AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(raw, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
             '(?s)<!--.*?-->', ' ', 'g'),
           '(?s)<[^>]+>', ' ', 'g') AS t
  FROM h
), decoded AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(t,
           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
  FROM stripped
)
SELECT doc_id, md5(trim(regexp_replace(t, '\\s+', ' ', 'g'))) AS clean_md5
FROM decoded ORDER BY doc_id
"""

def dedup_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding dedup against a persistent vector store
    (similarity.incremental_embedding_dedup): the original embeddings
    play the accumulated store; TWO derived jittered copies (+1e6 with
    a %7 distortion, +2e6 with a %5 distortion — both cosine ~0.9996
    to their base) arrive as the new batch. Every batch vector's
    decision — dup_of (store vector or smaller-id batch-mate, best
    verified cosine, id-ascending tie-break; NULL = unique) and the
    rounded cosine — is hashed, so the store banding, union bucket
    cap, stream-static join shape, and best-match ranking are all
    value-checked. The oracle re-derives the hyperplanes, both
    jitters, the banding, and the verification from the same
    md5-derived constants."""
    emb = Tables(spark, sf_dir).embeddings
    orig = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    def _jit(offset: int, mod: int, center: int) -> DataFrame:
        return emb.select(
            (F.col("vec_id") + F.lit(offset)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x.cast("double")
                * (F.lit(1.0) + ((i % mod) - center).cast("double") * F.lit(0.01)),
            ).alias("embedding"),
        )
    store = S.embedding_store_rows(orig)
    batch = _jit(1000000, 7, 3).unionByName(_jit(2000000, 5, 2))
    decided = S.incremental_embedding_dedup(batch, store, threshold=0.99)
    return decided.select("vec_id", "dup_of", "cosine_sim").orderBy("vec_id")


DEDUP_INCR_EMB_SQL = f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
batch AS (
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(range(0, 64), d -> cv[d + 1] * (1.0 + 0.01 * ((d % 7) - 3))) AS cv
  FROM base
  UNION ALL
  SELECT vec_id + 2000000,
         list_transform(range(0, 64), d -> cv[d + 1] * (1.0 + 0.01 * ((d % 5) - 2)))
  FROM base
),
pool AS (
  SELECT vec_id, cv, FALSE AS isnew FROM base
  UNION ALL
  SELECT vec_id, cv, TRUE FROM batch
),
sig0 AS (
  SELECT vec_id, isnew, 0 AS band, {" || ".join(_HP_BITS[0:8])} AS bh FROM pool
  UNION ALL
  SELECT vec_id, isnew, 1, {" || ".join(_HP_BITS[8:16])} FROM pool
),
sig AS (
  SELECT vec_id, isnew, band, bh FROM sig0
  QUALIFY count(*) OVER (PARTITION BY band, bh) <= 1000
),
cands AS (
  SELECT DISTINCT a.vec_id AS nid, b.vec_id AS mid
  FROM sig a JOIN sig b ON a.band = b.band AND a.bh = b.bh
  WHERE a.isnew AND b.vec_id <> a.vec_id
    AND (NOT b.isnew OR b.vec_id < a.vec_id)
),
scored AS (
  SELECT c.nid, c.mid,
         round(list_cosine_similarity(pa.cv, pb.cv) + 0.0000000005, 6) AS cos
  FROM cands c
  JOIN batch pa ON c.nid = pa.vec_id
  JOIN pool pb ON c.mid = pb.vec_id
  WHERE round(list_cosine_similarity(pa.cv, pb.cv) + 0.0000000005, 6) >= 0.99
),
best AS (
  SELECT nid, mid, cos FROM scored
  QUALIFY row_number() OVER (PARTITION BY nid ORDER BY cos DESC, mid ASC) = 1
)
SELECT b.vec_id, best.mid AS dup_of, best.cos AS cosine_sim
FROM batch b LEFT JOIN best ON b.vec_id = best.nid
ORDER BY b.vec_id
"""


#: r09: the five r07-staged gates (incremental dedup, duplicated-span
#: dedup, cluster-balanced sampling, leakage-safe split, HTML cleaning)
#: are now LIVE below — parity-green since r07 via
#: tests/test_pending_gates.py. The four r09-built gates (incremental
#: embedding dedup, GIF/JPEG pixel decode, WAV sample decode) are also
#: registered immediately: the staging queue exists for FULL windows
#: (plans/__init__.py), and the r09 window has room — 13 new + 37
#: rotations still refreshes every r05-stale row (then 31 of the 65
#: r06 rows). Each passed the driver's exact compare path locally at
#: sf0.01 before registration.
QUERIES["dedup_incremental_minhash"] = {
    "fn": dedup_incremental_minhash,
    "oracle": DEDUP_INCREMENTAL_SQL,
}
QUERIES["dedup_duplicated_spans"] = {
    "fn": dedup_duplicated_spans,
    "oracle": DEDUP_SPANS_SQL,
}
QUERIES["sel_cluster_balanced"] = {
    "fn": sel_cluster_balanced,
    "oracle": SEL_CLUSTER_SQL,
}
QUERIES["doc_leakage_safe_split"] = {
    "fn": doc_leakage_safe_split,
    "oracle": DOC_SPLIT_SQL,
}
QUERIES["doc_html_clean"] = {"fn": doc_html_clean, "oracle": DOC_HTML_SQL}
# r09: pixel-level PNG decode (zlib IDAT inflate + filter reconstruction)
QUERIES["media_png_pixels"] = {
    "fn": media_png_pixels,
    "oracle": MEDIA_PNG_PIXELS_SQL,
}

QUERIES["dedup_incremental_embedding"] = {
    "fn": dedup_incremental_embedding,
    "oracle": DEDUP_INCR_EMB_SQL,
}
QUERIES["media_gif_pixels"] = {
    "fn": media_gif_pixels,
    "oracle": MEDIA_GIF_PIXELS_SQL,
}
QUERIES["media_jpeg_pixels"] = {
    "fn": media_jpeg_pixels,
    "oracle": MEDIA_JPEG_PIXELS_SQL,
}
QUERIES["media_mp4_samples"] = {
    "fn": media_mp4_samples,
    "oracle": MEDIA_MP4_SAMPLES_SQL,
}
QUERIES["media_mp4_keyframes"] = {
    "fn": media_mp4_keyframes,
    "oracle": MEDIA_MP4_KEYFRAMES_SQL,
}


def media_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video→pixels END-TO-END (VERDICT r10 next-round #5): synthesize
    Motion-JPEG MP4s — every mdat sample a complete DC-only baseline
    JPEG behind a real stsd/stts/stsc/stsz/stco (+stss on even ids)
    chain — then demux, codec-gate on the stsd fourcc, seek to the
    first keyframe per 1024-dts bucket, and fully Huffman-decode each
    selected byte range (multimodal.decode_mjpeg_keyframes). The
    oracle re-derives keyframe membership, the bucket argmin, AND
    every pixel stat from the closed forms (frame k's JPEG seed is
    ``doc_id + 131*k``), so the stsd parse, the sample-table offset
    resolution, and the JPEG entropy decode are all value-checked in
    one gate — the demuxed byte ranges are only correct if stsz/stco
    agree with what the entropy coder actually emitted."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_mjpeg_mp4_payloads(docs)
    return M.decode_mjpeg_keyframes(media, every_units=1024).orderBy(
        "media_id", "sample_idx"
    )


MEDIA_MJPEG_FRAMES_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS n,
         CAST(512 + doc_id % 100 AS BIGINT) AS delta
  FROM documents
), ks AS (
  SELECT doc_id, delta, unnest(generate_series(0, n - 1)) AS k FROM dims
), kf AS (
  SELECT doc_id, delta, k,
         CASE WHEN doc_id % 2 = 0 THEN (k % 2 = 0) ELSE TRUE END AS kf
  FROM ks
), pick AS (
  SELECT doc_id, (k * delta) // 1024 AS bucket, min(k) AS k
  FROM kf WHERE kf GROUP BY doc_id, (k * delta) // 1024
), seeds AS (
  SELECT p.doc_id, p.k, f.delta, p.doc_id + 131 * p.k AS s
  FROM pick p JOIN kf f ON p.doc_id = f.doc_id AND p.k = f.k
), bd AS (
  SELECT doc_id, k, delta, s, CAST(1 + s % 4 AS INT) AS bw,
         CAST(1 + (3 * s) % 4 AS INT) AS bh
  FROM seeds
), bys AS (
  SELECT doc_id, k, delta, s, bw, bh,
         unnest(generate_series(0, bh - 1)) AS by
  FROM bd
), bxs AS (
  SELECT doc_id, k, delta, s, bw, bh, by,
         unnest(generate_series(0, bw - 1)) AS bx
  FROM bys
), blk AS (
  SELECT doc_id, k, delta, bw, bh, ((s + 5 * bx + 9 * by) % 200) + 28 AS v
  FROM bxs
)
SELECT doc_id AS media_id, CAST(k AS INT) AS sample_idx,
       CAST(k * delta AS BIGINT) AS dts,
       CAST(64 * bw * bh AS BIGINT) AS px_count,
       CAST(64 * sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max
FROM blk GROUP BY doc_id, k, delta, bw, bh
ORDER BY media_id, sample_idx
"""


QUERIES["media_mjpeg_frames"] = {
    "fn": media_mjpeg_frames,
    "oracle": MEDIA_MJPEG_FRAMES_SQL,
}


def media_wav_chunk_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk→features end-to-end
    (multimodal.extract_audio_chunk_features): decode the PCM WAVs,
    frame into 16-sample windows (last frame keeps the remainder), and
    emit integer features per frame — count, sum, energy (sum of
    squares), min, max. The frame boundary interacts with the sample
    formula's phase, so an off-by-one in the framing (or a decode bug
    anywhere in the RIFF walk) shifts every downstream chunk and cannot
    pass. The oracle re-derives each frame from the closed-form sample
    ``((id*31 + 7k) % 65536) - 32768`` grouped by ``k // 16``."""
    docs = Tables(spark, sf_dir).documents
    media = M.synthesize_wav_sample_payloads(docs)
    return M.extract_audio_chunk_features(media, samples_per_chunk=16).orderBy(
        "media_id", "chunk_idx"
    )


MEDIA_WAV_CHUNK_SQL = """
WITH dims AS (
  SELECT doc_id, CAST(50 + doc_id % 50 AS INT) AS n FROM documents
), ks AS (
  SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS k FROM dims
), smp AS (
  SELECT doc_id, k // 16 AS chunk_idx,
         ((doc_id * 31 + 7 * k) % 65536) - 32768 AS v
  FROM ks
)
SELECT doc_id AS media_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(count(*) AS BIGINT) AS smp_count,
       CAST(sum(v) AS BIGINT) AS smp_sum,
       CAST(sum(v * v) AS BIGINT) AS energy,
       CAST(min(v) AS INT) AS smp_min, CAST(max(v) AS INT) AS smp_max
FROM smp GROUP BY 1, 2 ORDER BY media_id, chunk_idx
"""


QUERIES["media_wav_chunk_energy"] = {
    "fn": media_wav_chunk_energy,
    "oracle": MEDIA_WAV_CHUNK_SQL,
}
QUERIES["doc_lm_perplexity"] = {
    "fn": doc_lm_perplexity,
    "oracle": DOC_LM_PPL_SQL,
}

def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (operators/dedup.canonical_docs):
    the per-document KEEP/DROP table over minhash duplicate clusters,
    keeping each cluster's longest member (n_chars, ties toward min
    doc_id). Restricted to documents participating in a cluster so the
    gate exercises the decision logic, not a singleton echo of the
    corpus. The oracle rebuilds the exact same clusters with the
    recursive transitive-closure CTE, then ranks members with a plain
    window — DuckDB recursion + window checks Spark iteration +
    argmax-struct aggregate."""
    from rearview_spark.operators.dedup import canonical_docs

    docs = Tables(spark, sf_dir).documents
    out = canonical_docs(
        docs, text_col="text", id_col="doc_id", quality_col="n_chars", threshold=0.05
    )
    sizes = out.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        out.join(sizes, "component")
        .filter(F.col("n_members") > 1)
        .select("doc_id", "component", "canonical_id", "keep", "n_members")
        .orderBy("doc_id")
    )


DEDUP_CANONICAL_SQL = _COMPONENTS_CTES + """, q AS (
  SELECT c.id AS doc_id, c.component, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.id
),
best AS (
  SELECT component, doc_id AS canonical_id,
         row_number() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rn
  FROM q
),
sz AS (SELECT component, count(*) AS n_members FROM q GROUP BY component)
SELECT q.doc_id, q.component, b.canonical_id,
       q.doc_id = b.canonical_id AS keep, sz.n_members
FROM q
JOIN (SELECT component, canonical_id FROM best WHERE rn = 1) b USING (component)
JOIN sz USING (component)
ORDER BY q.doc_id
"""

# Staged for round-13 registration (r12 window arithmetic: 8
# never-checked + 42 stale-r08 rows fill the 50 slots; oracle-green via
# tests/test_pending_gates.py meanwhile).
PENDING_QUERIES: dict[str, dict] = {
    "dedup_canonical_docs": {"fn": dedup_canonical_docs, "oracle": DEDUP_CANONICAL_SQL},
}


SRC_CAP = 18


def doc_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (curation.source_cap_sample): at most 18
    docs survive per source, chosen by deterministic md5 order via
    distributed quantile selection — full buckets pass on a scan-time
    integer filter and only each source's single boundary bucket pays
    an exact rank, so no task ever sorts a whole hot domain. The
    oracle is the NAIVE per-source row_number over the same hash order
    — pinning that the two-phase plan equals the straightforward
    semantics."""
    from rearview_spark.operators.curation import source_cap_sample

    docs = Tables(spark, sf_dir).documents.select(
        "doc_id", "lang", "source", "n_chars"
    )
    return source_cap_sample(docs, cap=SRC_CAP).orderBy("doc_id")


_H_SRC = (
    "(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':srccap')), 1, 15)) "
    "AS BIGINT) % 1000000000000000)"
)

DOC_SRC_CAP_SQL = f"""
WITH h AS (
  SELECT doc_id, lang, source, n_chars, {_H_SRC} AS hh
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY source ORDER BY hh % 1024, hh, doc_id) AS rk
  FROM h
)
SELECT doc_id, lang, source, n_chars FROM r WHERE rk <= {SRC_CAP} ORDER BY doc_id
"""

QUERIES["doc_source_cap"] = {"fn": doc_source_cap, "oracle": DOC_SRC_CAP_SQL}


# --- BPE tokenization (serving half of the tokenizer loop) -------------------

def doc_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the 8-merge BPE table trained on
    the same corpus (text.bpe_train -> text.bpe_encode): per-doc word
    count, post-merge token count, and the md5 of the exact token
    stream. The oracle re-derives the merges (the doc_bpe_vocab CTE
    chain, carrying the word key through every round) and replays the
    encode — training AND serving semantics hashed end to end."""
    docs = Tables(spark, sf_dir).documents
    merges = X.bpe_train(docs, n_merges=8)
    return X.bpe_encode(docs, merges).orderBy("doc_id")


def _bpe_iteration_w_sql(i: int) -> str:
    """One BPE round like _bpe_iteration_sql, but the word key rides
    through the state CTEs so the final s8 is a (w -> tokenized seq)
    vocabulary map the encode can join on."""
    return f"""
ex{i} AS MATERIALIZED (
  SELECT w, freq, generate_subscripts(syms, 1) AS idx, unnest(syms) AS sym
  FROM (SELECT w, freq,
               str_split(substr(seq, 2, length(seq) - 2), '||') AS syms
        FROM t{i - 1})
),
c{i} AS MATERIALIZED (
  SELECT l, r FROM (
    SELECT a.sym AS l, b.sym AS r, sum(a.freq) AS cnt
    FROM ex{i} a JOIN ex{i} b ON b.w = a.w AND b.idx = a.idx + 1
    GROUP BY 1, 2
  ) ORDER BY cnt DESC, l, r LIMIT 1
),
t{i} AS MATERIALIZED (
  SELECT w, replace(seq, '|' || l || '||' || r || '|', '|' || l || r || '|') AS seq,
         freq
  FROM t{i - 1}, c{i}
)"""


DOC_BPE_ENCODE_SQL = (
    """
WITH t0 AS MATERIALIZED (
  SELECT w, '|' || array_to_string(str_split(w, ''), '||') || '|' AS seq,
         CAST(count(*) AS BIGINT) AS freq
  FROM (
    SELECT unnest(str_split_regex(lower(text), '[^a-z]+')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
),"""
    + ",".join(_bpe_iteration_w_sql(i) for i in range(1, 9))
    + """,
vocab AS MATERIALIZED (
  SELECT w,
         len(str_split(substr(seq, 2, length(seq) - 2), '||')) AS n_sym,
         array_to_string(str_split(substr(seq, 2, length(seq) - 2), '||'), ' ') AS toked
  FROM t8
),
stream AS (
  SELECT doc_id, pos, w FROM (
    SELECT doc_id, generate_subscripts(ws, 1) AS pos, unnest(ws) AS w
    FROM (SELECT doc_id, str_split_regex(lower(text), '[^a-z]+') AS ws FROM documents)
  ) WHERE w <> ''
)
SELECT s.doc_id, count(*) AS n_words,
       CAST(sum(v.n_sym) AS BIGINT) AS n_tokens,
       md5(string_agg(v.toked, ' ' ORDER BY s.pos)) AS toks_md5
FROM stream s JOIN vocab v ON s.w = v.w
GROUP BY s.doc_id ORDER BY s.doc_id
"""
)

QUERIES["doc_bpe_encode"] = {"fn": doc_bpe_encode, "oracle": DOC_BPE_ENCODE_SQL}


def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocations by PMI (text.pmi_collocations): corpus
    unigram/bigram counts → ln-ratio PMI with a support floor → unique
    deterministic top-k. The oracle replays counts, the ln arithmetic,
    and the ranking."""
    return X.pmi_collocations(
        Tables(spark, sf_dir).documents, min_count=5, top_k=100
    ).orderBy("rank")


DOC_PMI_SQL = f"""
WITH toks AS (SELECT {TOKS} AS t FROM documents),
uni AS (SELECT unnest(t) AS w FROM toks),
ucnt AS (SELECT w, count(*) AS c_w FROM uni GROUP BY 1),
bg AS (
  SELECT unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g
  FROM toks WHERE len(t) >= 2
),
bcnt AS (
  SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
         count(*) AS c_pair
  FROM bg GROUP BY 1, 2
),
tot AS (
  SELECT (SELECT sum(c_w) FROM ucnt) AS n1,
         (SELECT sum(c_pair) FROM bcnt) AS n2
),
scored AS (
  SELECT b.w1, b.w2, b.c_pair,
         round(ln((b.c_pair * 1.0 / t.n2)
               / ((u1.c_w * 1.0 / t.n1) * (u2.c_w * 1.0 / t.n1)))
               + 0.0000000005, 6) AS pmi
  FROM bcnt b
  JOIN ucnt u1 ON u1.w = b.w1
  JOIN ucnt u2 ON u2.w = b.w2
  CROSS JOIN tot t
  WHERE b.c_pair >= 5
)
SELECT w1, w2, CAST(c_pair AS BIGINT) AS c_pair, pmi, rank FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= 100 ORDER BY rank
"""

QUERIES["doc_pmi_collocations"] = {"fn": doc_pmi_collocations, "oracle": DOC_PMI_SQL}


def doc_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift (text.source_kl_divergence):
    KL(p_source || p_corpus) over unigrams, fixed-point micro-unit
    summands. Oracle replays counts, the division/ln sequence, the 1e-9
    quantization, and the integer sum."""
    return X.source_kl_divergence(Tables(spark, sf_dir).documents)


DOC_KL_SQL = f"""
WITH tok AS (SELECT source, unnest({TOKS}) AS w FROM documents),
st AS (SELECT source, w, count(*) AS c_st FROM tok GROUP BY 1, 2),
tt AS (SELECT w, sum(c_st) AS c_t FROM st GROUP BY 1),
tsrc AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
tot AS (SELECT sum(c_st) AS n FROM st),
terms AS (
  SELECT st.source, tsrc.n_s,
         CAST(round((st.c_st * 1.0 / tsrc.n_s)
               * ln((st.c_st * 1.0 / tsrc.n_s) / (tt.c_t * 1.0 / tot.n))
               * 1000000000.0) AS BIGINT) AS ti
  FROM st JOIN tt USING (w) JOIN tsrc USING (source) CROSS JOIN tot
)
SELECT source, CAST(min(n_s) AS BIGINT) AS n_tokens,
       round(sum(ti) / 1000000000.0 + 0.0000000005, 6) AS kl
FROM terms GROUP BY source ORDER BY source
"""

QUERIES["doc_source_kl"] = {"fn": doc_source_kl, "oracle": DOC_KL_SQL}


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-ES weighted sampling (curation.weighted_sample): 5 docs per
    source, weight = token count, md5-deterministic race keys. The
    oracle replays u, the -ln(u)/w key, the 1e-12 quantization, and the
    per-source ranking."""
    from rearview_spark.operators import curation as C

    docs = Tables(spark, sf_dir).documents
    cand = docs.select(
        "doc_id", "source", X.token_count(F.col("text")).alias("n_tokens")
    )
    return (
        C.weighted_sample(cand, "n_tokens", k=5, salt="ws-r10", by="source")
        .select(
            "source", "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
            "rank",
        )
        .orderBy("source", "rank")
    )


DOC_WSAMPLE_SQL = f"""
WITH cand AS (
  SELECT doc_id, source, len({TOKS}) AS n_tokens FROM documents
),
keyed AS (
  SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(CAST(round(
           -ln((CAST(concat('0x', substr(md5(doc_id || ':ws-r10'), 1, 15)) AS BIGINT) + 1)
               / 1152921504606846976.0)
           * 1000000000000.0) AS BIGINT) AS DOUBLE) / n_tokens AS key
  FROM cand WHERE n_tokens > 0
)
SELECT source, doc_id, n_tokens, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY key, doc_id) AS INTEGER) AS rank
  FROM keyed
) WHERE rank <= 5 ORDER BY source, rank
"""

QUERIES["doc_weighted_sample"] = {"fn": doc_weighted_sample, "oracle": DOC_WSAMPLE_SQL}


PC_ITERS = 8


def sim_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus
    (operators/linalg.top_principal_component): distributed integer
    Gram matrix (mapInPandas partial outer products, one pass), then
    the exact fixed-round integer power iteration over the collected
    dim^2 artifact. Loadings + the Rayleigh eigenvalue are hashed —
    the oracle replays quantization, Gram, all 8 renormalized
    iterations (HUGEINT + pmod floor-div), and the quotient."""
    from rearview_spark.operators.linalg import top_principal_component

    emb = Tables(spark, sf_dir).embeddings
    loadings, eigenvalue = top_principal_component(
        emb, iterations=PC_ITERS
    )
    return loadings.withColumn("eigenvalue", F.lit(eigenvalue)).orderBy(
        "dim_idx"
    )


def _top_pc_sql() -> str:
    ctes = [
        """q AS (
  SELECT vec_id,
         unnest(generate_series(1, len(embedding))) - 1 AS j,
         CAST(round(unnest(CAST(embedding AS DOUBLE[])) * 1000.0) AS BIGINT) AS qv
  FROM embeddings)""",
        """gram AS (
  SELECT a.j AS j, b.j AS k, SUM(a.qv * b.qv) AS s
  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2)""",
        "dims AS (SELECT DISTINCT j FROM gram)",
        "v0 AS (SELECT j, CAST(1000000 AS BIGINT) AS v FROM dims)",
    ]
    for i in range(1, PC_ITERS + 1):
        ctes.append(
            f"""w{i} AS (
  SELECT g.j AS j, SUM(CAST(g.s AS HUGEINT) * p.v) AS w
  FROM gram g JOIN v{i - 1} p ON g.k = p.j GROUP BY g.j)"""
        )
        ctes.append(
            f"""v{i} AS (
  SELECT j, CAST((wh - (((wh % m) + m) % m)) // m AS BIGINT) AS v FROM (
    SELECT j, w * 1000000 AS wh, max(abs(w)) OVER () AS m
    FROM w{i}) t)"""
        )
    last = f"v{PC_ITERS}"
    ctes.append(
        f"""ray AS (
  SELECT CAST(SUM(CAST(a.v AS HUGEINT) * g.s * b.v) AS DOUBLE)
         / (SELECT CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE) FROM {last})
           AS eigenvalue
  FROM gram g JOIN {last} a ON g.j = a.j JOIN {last} b ON g.k = b.j)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST({last}.j AS INTEGER) AS dim_idx,
       {last}.v AS loading_fp,
       {last}.v / 1000000.0 AS loading,
       ray.eigenvalue
FROM {last} CROSS JOIN ray
ORDER BY dim_idx"""
    )


PENDING_QUERIES["sim_top_component"] = {
    "fn": sim_top_component,
    "oracle": _top_pc_sql(),
}


def sim_pc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector projection onto the corpus top principal component
    (operators/linalg.pc_scores): the serving half of the PCA pair —
    bigint dot products against the inlined literal loadings, one float
    division per row. The oracle recomputes the full power iteration
    and the projection join."""
    from rearview_spark.operators.linalg import (
        pc_scores,
        top_principal_component,
    )

    emb = Tables(spark, sf_dir).embeddings
    loadings, _ = top_principal_component(emb, iterations=PC_ITERS)
    return pc_scores(emb, loadings).orderBy("vec_id")


def _pc_scores_sql() -> str:
    base = _top_pc_sql()
    # reuse the iteration chain: swap the final projection for the
    # per-vector dot product against v{PC_ITERS}
    head = base[: base.rindex("SELECT CAST(")]
    return (
        head
        + f"""SELECT q.vec_id,
       CAST(SUM(q.qv * v.v) AS BIGINT) AS score_fp,
       CAST(SUM(q.qv * v.v) AS BIGINT) / 1000000000.0 AS score
FROM q JOIN v{PC_ITERS} v ON q.j = v.j
GROUP BY q.vec_id
ORDER BY q.vec_id"""
    )


PENDING_QUERIES["sim_pc_scores"] = {
    "fn": sim_pc_scores,
    "oracle": _pc_scores_sql(),
}


def doc_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus top-20 RAKE keyword phrases (operators/text.rake_keywords):
    stopword-delimited phrase runs, integer-quantized degree/frequency
    word scores, bigint phrase sums, distributed top-k. The oracle
    replays tokenization, the gaps-and-islands run ids, both
    aggregates, and the quantized division."""
    from rearview_spark.operators.text import rake_keywords

    docs = Tables(spark, sf_dir).documents
    return rake_keywords(docs, k=20)


DOC_RAKE_SQL = """
WITH raw AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS ts
  FROM documents),
toks AS (
  SELECT doc_id,
         unnest(generate_series(1, len(ts))) AS pos,
         unnest(ts) AS tok
  FROM raw),
content AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM toks
  WHERE tok NOT IN ('the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it', 'for', 'on', 'with', 'as', 'at', 'by', 'be', 'this', 'that', 'are') AND tok <> ''),
g2 AS (
  SELECT *, count(*) OVER (PARTITION BY doc_id, grp) AS plen FROM content),
wsc AS (
  SELECT tok, (sum(plen) * 1000000) // count(*) AS w_score_fp
  FROM g2 GROUP BY tok),
phrases AS (
  SELECT g2.doc_id, g2.grp,
         CAST(sum(wsc.w_score_fp) AS BIGINT) AS score_fp,
         string_agg(g2.tok, ' ' ORDER BY g2.pos) AS phrase
  FROM g2 JOIN wsc USING (tok) GROUP BY 1, 2),
agg AS (
  SELECT phrase, count(*) AS n_occurrences,
         CAST(max(score_fp) AS BIGINT) AS score_fp
  FROM phrases GROUP BY phrase)
SELECT phrase, n_occurrences, score_fp, score_fp / 1000000.0 AS score,
       CAST(row_number() OVER (ORDER BY score_fp DESC, phrase) AS INT) AS rank
FROM agg
ORDER BY score_fp DESC, phrase
LIMIT 20
"""

PENDING_QUERIES["doc_rake_keywords"] = {
    "fn": doc_rake_keywords,
    "oracle": DOC_RAKE_SQL,
}


def doc_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-served substring search (operators/text.build_trigram_index
    + trigram_search): LIKE '%vector scan%' answered from the trigram
    posting index with conjunctive-containment pruning + exact verify.
    The oracle is the PLAIN LIKE scan — the hash match proves the index
    path returns bit-identical results (the doc_bm25_indexed
    discipline: an index is a plan choice, not a semantics change)."""
    from rearview_spark.operators.text import (
        build_trigram_index,
        trigram_search,
    )

    docs = Tables(spark, sf_dir).documents
    idx = build_trigram_index(docs)
    return trigram_search(docs, idx, "vector scan").orderBy("doc_id")


DOC_TRIGRAM_SQL = """
SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars
FROM documents
WHERE contains(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 'vector scan')
ORDER BY doc_id
"""

PENDING_QUERIES["doc_trigram_search"] = {
    "fn": doc_trigram_search,
    "oracle": DOC_TRIGRAM_SQL,
}

# r13 registration (VERDICT_r12 next-round #1): the staged backlog flips
# live in one move. Never-driver-checked names front-load automatically via
# group (c) in plans/all_queries(), so each gets a first driver row this
# round; the window's remaining slots rotate the stalest green cohort.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def doc_nb_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language ID (operators/classify.py):
    train on the documents table's lang labels (one counting pass —
    exact integer sufficient statistics, vocab x |labels| model,
    broadcastable), classify every document by integer argmax over
    1e-6-quantized log-likelihood sums. The classifier-stage slot of
    the published pretraining-curation recipes; the oracle replays
    tokenization, smoothing, quantization, scoring, and the
    smallest-label tie-break token for token."""
    from rearview_spark.operators.classify import nb_classify, nb_train

    # No parallelism spread (r17 A/B, min-of-5 interleaved at sf0.1):
    # the whole gate read 0.88x WITHOUT any guard (1.43 -> 1.25 s) —
    # the shared repartition exchange cost more than spreading the
    # light tokenize saved. See classify.nb_train's note.
    docs = Tables(spark, sf_dir).documents
    lik, pri = nb_train(docs, "lang")
    return nb_classify(docs, lik, pri).orderBy("doc_id")


DOC_NB_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split({NORM}, ' ')) AS w FROM documents
),
counts AS (SELECT lang AS label, w, count(*) AS c FROM tok GROUP BY 1, 2),
vocab AS (SELECT count(DISTINCT w) AS v FROM counts),
totals AS (SELECT label, sum(c) AS t FROM counts GROUP BY 1),
ndocs AS (SELECT count(*) AS n FROM documents),
docn AS (SELECT lang AS label, count(*) AS n FROM documents GROUP BY 1),
lik AS (
  SELECT label, w,
         CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(t + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS qlp
  FROM counts JOIN totals USING (label) CROSS JOIN vocab
),
pri AS (
  SELECT label,
         CAST(round(ln(CAST(docn.n AS DOUBLE) / CAST(ndocs.n AS DOUBLE)) * 1000000.0) AS BIGINT) AS q_prior,
         CAST(round(ln(1.0 / CAST(t + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS q_default
  FROM docn JOIN totals USING (label) CROSS JOIN ndocs CROSS JOIN vocab
),
scored AS (
  SELECT tok.doc_id, p.label, sum(coalesce(l.qlp, p.q_default)) AS q_tokens
  FROM tok CROSS JOIN pri p
  LEFT JOIN lik l ON l.label = p.label AND l.w = tok.w
  GROUP BY 1, 2
),
tot AS (
  SELECT s.doc_id, s.label, CAST(s.q_tokens + p.q_prior AS BIGINT) AS score
  FROM scored s JOIN pri p USING (label)
),
r AS (
  SELECT doc_id, label, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, label ASC) AS rn
  FROM tot
)
SELECT doc_id, label AS predicted, score AS q_score FROM r WHERE rn = 1
ORDER BY doc_id
"""

QUERIES["doc_nb_language"] = {"fn": doc_nb_language, "oracle": DOC_NB_SQL}


# RETIRED GATE (r16, VERDICT_r15 next-round #5): doc_quality_auc — the
# scalar Mann-Whitney summary of the SAME per-score collapse + running-
# sum machinery doc_pr_curve (and doc_calibration_bins /
# doc_lift_deciles) keep driver-checked over the same
# length-separates-English scored frame. Coverage of roc_auc's exact
# integer tie handling inherits to tests/test_pipeline_ops.py::
# test_roc_auc_matches_brute_force_pair_count (brute-force concordant-
# pair count); the operator stays exported.
def doc_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at every distinct score threshold
    (operators/evaluation.precision_recall_curve) for the same
    length-separates-English rule roc_auc summarizes (gate retired r16) — the
    table a threshold for a scaled filtering pass is actually picked
    from. Counts are exact int64; each ratio is ONE division of exact
    integers (bit-deterministic, no rounding contract)."""
    from rearview_spark.operators.evaluation import precision_recall_curve

    docs = Tables(spark, sf_dir).documents
    labeled = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.col("n_chars").alias("s"),
    )
    return precision_recall_curve(labeled, "y", "s").orderBy("threshold")


DOC_PR_SQL = """
WITH per_score AS (
  SELECT n_chars AS threshold,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np,
         sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS nn
  FROM documents GROUP BY 1
),
cum AS (
  SELECT threshold, np, nn,
         sum(np) OVER (ORDER BY threshold ROWS UNBOUNDED PRECEDING) - np AS below_p,
         sum(nn) OVER (ORDER BY threshold ROWS UNBOUNDED PRECEDING) - nn AS below_n,
         sum(np) OVER () AS tot_p, sum(nn) OVER () AS tot_n
  FROM per_score
),
c AS (
  SELECT threshold,
         CAST(tot_p - below_p AS BIGINT) AS tp,
         CAST(tot_n - below_n AS BIGINT) AS fp,
         CAST(below_p AS BIGINT) AS fn
  FROM cum
)
SELECT threshold, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
FROM c ORDER BY threshold
"""

QUERIES["doc_pr_curve"] = {"fn": doc_pr_curve, "oracle": DOC_PR_SQL}


def doc_nb_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the doc_nb_language classifier
    (operators/evaluation.classification_report over nb_classify
    output) — the compose-the-operators gate: predictions from the
    registered NB pipeline, report machinery from the evaluation
    family, every count exact and every ratio one division. The oracle
    nests the full NB replay as a subquery and re-derives the
    confusion arithmetic."""
    from rearview_spark.operators.evaluation import classification_report

    docs = Tables(spark, sf_dir).documents
    pred = doc_nb_language(spark, sf_dir)
    labeled = docs.select("doc_id", "lang").join(pred, "doc_id")
    return classification_report(labeled, "lang", "predicted").orderBy("class")


DOC_NB_REPORT_SQL = f"""
WITH lab AS (
  SELECT d.lang AS l, p.predicted AS pr
  FROM documents d JOIN ({DOC_NB_SQL}) p USING (doc_id)
),
cm AS (SELECT l, pr, count(*) AS n FROM lab GROUP BY 1, 2),
bl AS (
  SELECT l AS class, sum(n) AS support,
         sum(CASE WHEN pr = l THEN n ELSE 0 END) AS tp,
         sum(CASE WHEN pr <> l THEN n ELSE 0 END) AS fn
  FROM cm GROUP BY 1
),
bp AS (
  SELECT pr AS class, sum(CASE WHEN l <> pr THEN n ELSE 0 END) AS fp
  FROM cm GROUP BY 1
),
j AS (
  SELECT coalesce(bl.class, bp.class) AS class,
         CAST(coalesce(support, 0) AS BIGINT) AS support,
         CAST(coalesce(tp, 0) AS BIGINT) AS tp,
         CAST(coalesce(fp, 0) AS BIGINT) AS fp,
         CAST(coalesce(fn, 0) AS BIGINT) AS fn
  FROM bl FULL OUTER JOIN bp ON bl.class = bp.class
)
SELECT class, support, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE) END AS f1
FROM j ORDER BY class
"""

QUERIES["doc_nb_report"] = {"fn": doc_nb_report, "oracle": DOC_NB_REPORT_SQL}


def doc_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table (operators/evaluation.calibration_bins) for
    the length-separates-English score roc_auc grades: ten
    equal-width n_chars bins, observed English rate next to the bin's
    average score. Bin assignment is integer div over a non-negative
    numerator (Spark div == oracle floor //); avg/rate are single
    divisions of exact int64 sums."""
    from rearview_spark.operators.evaluation import calibration_bins

    docs = Tables(spark, sf_dir).documents
    labeled = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        F.col("n_chars").alias("s"),
    )
    return calibration_bins(labeled, "y", "s", bins=10)


DOC_CALIB_SQL = """
WITH s AS (
  SELECT CAST(n_chars AS BIGINT) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
rng AS (SELECT min(s) AS smin, max(s) AS smax FROM s),
b AS (
  SELECT ((s.s - rng.smin) * 10) // (rng.smax - rng.smin + 1) AS bin,
         s.y, s.s
  FROM s, rng)
SELECT CAST(bin AS BIGINT) AS bin,
       count(*) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(min(s) AS BIGINT) AS lo,
       CAST(max(s) AS BIGINT) AS hi,
       CAST(sum(s) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_score,
       CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS pos_rate
FROM b GROUP BY 1 ORDER BY 1
"""

QUERIES["doc_calibration_bins"] = {
    "fn": doc_calibration_bins,
    "oracle": DOC_CALIB_SQL,
}


def doc_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift by decile
    (operators/evaluation.cumulative_gains): rank documents by the
    n_chars quality score descending (doc_id tiebreak — a strict total
    order, so the equal-population cut is deterministic through tied
    scores), and report what share of English documents the top
    deciles capture vs random. Ranking runs through global_row_number
    (range-partitioned, never a single-task window); gain/lift are
    single divisions of bigint-premultiplied exact integers."""
    from rearview_spark.operators.evaluation import cumulative_gains

    docs = Tables(spark, sf_dir).documents
    labeled = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.col("n_chars").alias("s"),
    )
    return cumulative_gains(labeled, "y", "s", "doc_id", n_bins=10)


DOC_LIFT_SQL = """
WITH s AS (
  SELECT doc_id AS id, CAST(n_chars AS BIGINT) AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents),
r AS (
  SELECT y, row_number() OVER (ORDER BY s DESC, id) AS rn,
         count(*) OVER () AS n_total
  FROM s),
b AS (SELECT ((rn - 1) * 10) // n_total AS bucket, y, n_total FROM r),
p AS (
  SELECT bucket, count(*) AS n, sum(y) AS n_pos, max(n_total) AS n_total
  FROM b GROUP BY 1),
c AS (
  SELECT bucket, n, n_pos, n_total,
         sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_n,
         sum(n_pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_pos,
         sum(n_pos) OVER () AS tot_pos
  FROM p)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(cum_n AS BIGINT) AS cum_n,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       CASE WHEN tot_pos > 0
            THEN CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)
       END AS gain,
       CASE WHEN cum_n * tot_pos > 0
            THEN CAST(cum_pos * n_total AS DOUBLE)
                 / CAST(cum_n * tot_pos AS DOUBLE)
       END AS lift
FROM c ORDER BY bucket
"""

QUERIES["doc_lift_deciles"] = {"fn": doc_lift_deciles, "oracle": DOC_LIFT_SQL}


def doc_chi2_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared token-label feature selection
    (operators/classify.chi2_tokens): the 10 tokens most associated
    with each language label by the 2x2 presence-contingency statistic
    — the vocabulary-pruning / model-inspection read taken next to
    nb_train. Counts are exact int64; the statistic is a FIXED double
    expression (one numerator product, one denominator product, one
    division) mirrored token-for-token in the oracle, so both engines
    produce identical bits and identical ranks; ties break on the
    token ascending."""
    from rearview_spark.operators.classify import chi2_tokens

    docs = Tables(spark, sf_dir).documents
    return chi2_tokens(docs, "lang", k=10)


DOC_CHI2_SQL = f"""
WITH ex AS (
  SELECT doc_id, lang AS label,
         unnest(string_split({NORM}, ' ')) AS token
  FROM documents),
tok AS (SELECT DISTINCT doc_id, label, token FROM ex),
a AS (SELECT label, token, count(*) AS df_in_label FROM tok GROUP BY 1, 2),
dft AS (SELECT token, sum(df_in_label) AS df_token FROM a GROUP BY 1),
nl AS (SELECT lang AS label, count(*) AS n_label FROM documents GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
t AS (
  -- full label x vocab cross: a token absent from a label (a = 0) is
  -- an anti-feature cell the textbook statistic scores too
  SELECT nl.label, dft.token,
         CAST(coalesce(a.df_in_label, 0) AS BIGINT) AS df_in_label,
         CAST(dft.df_token AS BIGINT) AS df_token,
         CAST(nl.n_label AS BIGINT) AS n_label,
         CAST(nd.n AS BIGINT) AS n
  FROM dft CROSS JOIN nl CROSS JOIN nd
  LEFT JOIN a ON a.label = nl.label AND a.token = dft.token
  WHERE dft.df_token >= 1),
s AS (
  SELECT label, token, df_in_label, df_token,
         CAST(df_in_label * (n - n_label - (df_token - df_in_label))
              - (df_token - df_in_label) * (n_label - df_in_label)
              AS BIGINT) AS adbc,
         CAST(df_token AS DOUBLE)
           * CAST(n - df_token AS DOUBLE)
           * CAST(n_label AS DOUBLE)
           * CAST(n - n_label AS DOUBLE) AS den,
         n
  FROM t),
c AS (
  SELECT label, token, df_in_label, df_token,
         CASE WHEN den > 0
              THEN CAST(n AS DOUBLE) * CAST(adbc AS DOUBLE)
                   * CAST(adbc AS DOUBLE) / den
         END AS chi2
  FROM s),
r AS (
  SELECT label, token, df_in_label, df_token, chi2,
         CAST(row_number() OVER (
           PARTITION BY label ORDER BY chi2 DESC, token ASC) AS INT) AS rank
  FROM c WHERE chi2 IS NOT NULL)
SELECT label, token, df_in_label, df_token, chi2, rank
FROM r WHERE rank <= 10 ORDER BY label, rank
"""

QUERIES["doc_chi2_tokens"] = {"fn": doc_chi2_tokens, "oracle": DOC_CHI2_SQL}


def doc_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen-Shannon divergence vs the complement corpus
    (operators/text.source_js_divergence): the symmetric, bounded
    slice-contrast ranking next to doc_source_kl. Token summands are
    1e-9-quantized int64 over the full vocab x sources cross; the
    oracle mirrors the p/q/m arithmetic token for token."""
    from rearview_spark.operators import text as X

    return X.source_js_divergence(Tables(spark, sf_dir).documents)


DOC_JS_SQL = f"""
WITH tokd AS (
  SELECT source, unnest(string_split({NORM}, ' ')) AS w FROM documents
),
st AS (SELECT source, w, count(*) AS c_st FROM tokd GROUP BY 1, 2),
tot_t AS (SELECT w, sum(c_st) AS c_t FROM st GROUP BY 1),
tot_s AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY 1),
nn AS (SELECT sum(c_st) AS n FROM st),
full_d AS (
  SELECT tot_s.source, tot_t.w, tot_t.c_t,
         coalesce(st.c_st, 0) AS c_st, tot_s.n_s, nn.n
  FROM tot_t CROSS JOIN tot_s CROSS JOIN nn
  LEFT JOIN st ON st.source = tot_s.source AND st.w = tot_t.w
  WHERE tot_s.n_s < nn.n
),
terms AS (
  SELECT source, n_s,
         CAST(round((
           CASE WHEN c_st > 0
                THEN (CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                     * ln((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                          / (((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                              + (CAST(c_t - c_st AS DOUBLE) / CAST(n - n_s AS DOUBLE))) / 2.0))
                     * 0.5
                ELSE 0.0 END
           +
           CASE WHEN c_t - c_st > 0
                THEN (CAST(c_t - c_st AS DOUBLE) / CAST(n - n_s AS DOUBLE))
                     * ln((CAST(c_t - c_st AS DOUBLE) / CAST(n - n_s AS DOUBLE))
                          / (((CAST(c_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                              + (CAST(c_t - c_st AS DOUBLE) / CAST(n - n_s AS DOUBLE))) / 2.0))
                     * 0.5
                ELSE 0.0 END
         ) * 1000000000.0) AS BIGINT) AS ti
  FROM full_d
)
SELECT source,
       CAST(min(n_s) AS BIGINT) AS n_tokens,
       round(sum(ti) / 1000000000.0 + 0.0000000005, 6) AS js
FROM terms GROUP BY source ORDER BY source
"""

QUERIES["doc_js_divergence"] = {"fn": doc_js_divergence, "oracle": DOC_JS_SQL}


def doc_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth (operators/text.vocab_growth):
    sweep documents in doc_id order, report per corpus decile the
    never-seen-before token count and cumulative vocabulary — the
    saturation read before committing another ingest round. Pure
    integer arithmetic end to end (rank, min, decile cut, prefix sum);
    no rounding contract needed anywhere."""
    from rearview_spark.operators.text import vocab_growth

    return vocab_growth(Tables(spark, sf_dir).documents)


DOC_VOCAB_GROWTH_SQL = f"""
WITH ranked AS (
  SELECT doc_id, text,
         row_number() OVER (ORDER BY doc_id) AS rnk,
         count(*) OVER () AS n
  FROM documents),
tok AS (
  SELECT rnk, n, unnest(string_split({NORM}, ' ')) AS w FROM ranked),
first_r AS (SELECT w, min(rnk) AS fr, max(n) AS n FROM tok GROUP BY w),
d AS (
  SELECT ((fr - 1) * 10) // n AS decile, max(n) AS n,
         count(*) AS new_tokens
  FROM first_r GROUP BY 1),
c AS (
  SELECT decile, n, new_tokens,
         sum(new_tokens) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
           AS vocab
  FROM d)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(((decile + 1) * n - 1) // 10 + 1 AS BIGINT) AS docs_processed,
       CAST(new_tokens AS BIGINT) AS new_tokens,
       CAST(vocab AS BIGINT) AS vocab_size
FROM c ORDER BY decile
"""

# Staged for r14 (window-full rule, plans/__init__.py): the r13 window
# is exactly 50 never-checked gates, so this entry waits one round —
# driven through the driver's own compare by tests/test_pending_gates.py
# in the meantime, making the r14 flip a known-green one-line move.
PENDING_QUERIES["doc_vocab_growth"] = {
    "fn": doc_vocab_growth,
    "oracle": DOC_VOCAB_GROWTH_SQL,
}


def doc_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency slope of the corpus vocabulary
    (operators/text.zipf_fit): ln-count regressed on ln-rank with
    1e-5-quantized int64 log coordinates, exact integer moment sums,
    and fixed double slope/intercept expressions mirrored
    operation-for-operation in the oracle."""
    from rearview_spark.operators.text import zipf_fit

    return zipf_fit(Tables(spark, sf_dir).documents)


_Z = "100000.0"
_SLOPE = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
DOC_ZIPF_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split({NORM}, ' ')) AS w FROM documents),
counts AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
r AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rnk FROM counts),
q AS (
  SELECT CAST(round(ln(CAST(rnk AS DOUBLE)) * {_Z}) AS BIGINT) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)) * {_Z}) AS BIGINT) AS y
  FROM r),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy
  FROM q)
SELECT n AS n_ranks,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN {_SLOPE} END AS slope,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
            THEN ((CAST(sy AS DOUBLE) - {_SLOPE} * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE)) / {_Z}
       END AS intercept
FROM m
"""

# Staged for r14 alongside doc_vocab_growth (window-full rule).
PENDING_QUERIES["doc_zipf_fit"] = {"fn": doc_zipf_fit, "oracle": DOC_ZIPF_SQL}


def dedup_roi_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dedup ROI accounting (operators/dedup.dedup_savings):
    how many duplicate groups/members exist at the 0.05 Jaccard
    threshold and what fraction of corpus characters a keep-the-largest
    rewrite would remove — the go/no-go read before paying for the full
    pass. Exact counts; frac_removed is one division of exact int64."""
    from rearview_spark.operators import dedup as D

    return D.dedup_savings(Tables(spark, sf_dir).documents, threshold=0.05)


DEDUP_ROI_SQL = (
    "WITH RECURSIVE"
    + _MINHASH_CTES.lstrip()[4:]
    + """, pairs AS (
  SELECT id_a, id_b FROM verified WHERE jaccard >= 0.05
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT re.id, e.dst FROM reach re JOIN edges e ON re.r = e.src
), comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
mem AS (
  SELECT comp.component, d.n_chars
  FROM comp JOIN documents d ON comp.id = d.doc_id),
per_c AS (
  SELECT component, count(*) AS n, sum(n_chars) AS tot,
         max(n_chars) AS keep_ch
  FROM mem GROUP BY 1),
dup_agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_dup_groups,
         CAST(coalesce(sum(n), 0) AS BIGINT) AS n_dup_members,
         CAST(coalesce(sum(tot - keep_ch), 0) AS BIGINT) AS chars_removed
  FROM per_c),
corpus AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS chars_total
  FROM documents)
SELECT n_docs, chars_total, n_dup_groups, n_dup_members, chars_removed,
       CAST(chars_removed AS DOUBLE) / CAST(chars_total AS DOUBLE)
         AS frac_removed
FROM corpus, dup_agg
"""
)

# Staged for r14 (window-full rule) with the forensics/burstiness wave.
PENDING_QUERIES["dedup_roi_summary"] = {
    "fn": dedup_roi_summary,
    "oracle": DEDUP_ROI_SQL,
}


def dedup_minhash_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-fidelity audit (operators/dedup.minhash_estimate_error):
    absolute error of the 16-hash signature Jaccard estimate against
    exact Jaccard over every LSH candidate pair — the width-
    justification measurement before trusting the banding at scale.
    Each pair error is one division of exact integers; the mean sums
    quantized int64 units; p50/p90/max are element picks/comparisons."""
    from rearview_spark.operators import dedup as D

    return D.minhash_estimate_error(Tables(spark, sf_dir).documents)


DEDUP_FIDELITY_SQL = (
    _MINHASH_CTES
    + """, mtc AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS m
  FROM cands c
  JOIN sigs x ON x.doc_id = c.id_a
  JOIN sigs y ON y.doc_id = c.id_b AND y.k = x.k
  GROUP BY 1, 2
), ex AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT) AS i,
         CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT) AS u
  FROM cands c
  JOIN sh sa ON c.id_a = sa.doc_id
  JOIN sh sb ON c.id_b = sb.doc_id
), errs AS (
  SELECT CAST(abs(CAST(mtc.m AS BIGINT) * ex.u - ex.i * 16) AS DOUBLE)
           / CAST(16 * ex.u AS DOUBLE) AS err
  FROM mtc JOIN ex ON mtc.id_a = ex.id_a AND mtc.id_b = ex.id_b
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CAST(round(err * 1000000.0) AS BIGINT)) AS BIGINT)
           AS units,
         quantile_disc(err, 0.5) AS p50_abs_err,
         quantile_disc(err, 0.9) AS p90_abs_err,
         max(err) AS max_abs_err
  FROM errs)
SELECT n_pairs,
       CAST(units AS DOUBLE) / CAST(n_pairs AS DOUBLE) / 1000000.0
         AS mean_abs_err,
       p50_abs_err, p90_abs_err, max_abs_err
FROM agg
"""
)

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["dedup_minhash_fidelity"] = {
    "fn": dedup_minhash_fidelity,
    "oracle": DEDUP_FIDELITY_SQL,
}


def doc_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary Jaccard matrix
    (operators/text.source_vocab_overlap): the redundancy read next to
    the JS/KL divergence contrasts — exact set sizes, one intersection
    self-join, one division per pair."""
    from rearview_spark.operators import text as X

    return X.source_vocab_overlap(Tables(spark, sf_dir).documents)


DOC_OVERLAP_SQL = f"""
WITH ex AS (
  SELECT source, unnest(string_split({NORM}, ' ')) AS w FROM documents),
sv AS (SELECT DISTINCT source, w FROM ex WHERE w <> ''),
sizes AS (SELECT source, count(*) AS vocab FROM sv GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter
  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2),
pairs AS (
  SELECT sa.source AS source_a, sa.vocab AS vocab_a,
         sb.source AS source_b, sb.vocab AS vocab_b
  FROM sizes sa CROSS JOIN sizes sb WHERE sa.source < sb.source)
SELECT p.source_a AS source_a, p.source_b AS source_b,
       CAST(p.vocab_a AS BIGINT) AS vocab_a,
       CAST(p.vocab_b AS BIGINT) AS vocab_b,
       CAST(coalesce(i.inter, 0) AS BIGINT) AS inter,
       CAST(coalesce(i.inter, 0) AS DOUBLE)
         / CAST(p.vocab_a + p.vocab_b - coalesce(i.inter, 0) AS DOUBLE)
         AS jaccard
FROM pairs p
LEFT JOIN inter i ON p.source_a = i.source_a AND p.source_b = i.source_b
ORDER BY p.source_a, p.source_b
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["doc_source_overlap"] = {
    "fn": doc_source_overlap,
    "oracle": DOC_OVERLAP_SQL,
}


def sim_sq8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 quantization-fidelity audit
    (operators/similarity.sq8_error_audit): per-vector reconstruction
    RMSE against the trained bounds, 1e-6-quantized into int64 before
    the mean/percentile/max summary — the 8-bit-storage justification
    measurement next to tools/ann_recall.py, gate-checkable because
    every summary quantity runs on integers."""
    from rearview_spark.operators import similarity as S

    return S.sq8_error_audit(Tables(spark, sf_dir).embeddings)


_SQ8_TERM = (
    "CASE WHEN bl.maxs[{i}] = bl.mins[{i}] THEN "
    "(v.x[{i}] - bl.mins[{i}]) * (v.x[{i}] - bl.mins[{i}]) "
    "ELSE (v.x[{i}] - (bl.mins[{i}] + ((CAST(least(CAST(floor(((v.x[{i}] - bl.mins[{i}]) "
    "/ (bl.maxs[{i}] - bl.mins[{i}])) * 256.0) AS INT), 255) AS DOUBLE) + 0.5) "
    "* (bl.maxs[{i}] - bl.mins[{i}])) / 256.0)) "
    "* (v.x[{i}] - (bl.mins[{i}] + ((CAST(least(CAST(floor(((v.x[{i}] - bl.mins[{i}]) "
    "/ (bl.maxs[{i}] - bl.mins[{i}])) * 256.0) AS INT), 255) AS DOUBLE) + 0.5) "
    "* (bl.maxs[{i}] - bl.mins[{i}])) / 256.0)) END"
)
_SQ8_TERMS = " + ".join(_SQ8_TERM.format(i=i + 1) for i in range(64))

SIM_SQ8_ERR_SQL = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
expl AS (
  SELECT generate_subscripts(x, 1) AS pos, unnest(x) AS xv FROM v),
b AS (SELECT pos, min(xv) AS mn, max(xv) AS mx FROM expl GROUP BY 1),
bl AS (
  SELECT list(mn ORDER BY pos) AS mins, list(mx ORDER BY pos) AS maxs
  FROM b),
u AS (
  SELECT CAST(round(sqrt(({_SQ8_TERMS}) / 64.0) * 1000000.0) AS BIGINT) AS u
  FROM v, bl),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         CAST(sum(u) AS BIGINT) AS su,
         quantile_disc(u, 0.5) AS p50,
         quantile_disc(u, 0.9) AS p90,
         max(u) AS mx
  FROM u)
SELECT n_vectors,
       CAST(su AS DOUBLE) / CAST(n_vectors AS DOUBLE) / 1000000.0 AS mean_rmse,
       CAST(p50 AS DOUBLE) / 1000000.0 AS p50_rmse,
       CAST(p90 AS DOUBLE) / 1000000.0 AS p90_rmse,
       CAST(mx AS DOUBLE) / 1000000.0 AS max_rmse
FROM agg
"""

# Staged for r14 (window-full rule) with the rest of the late-r13 wave.
PENDING_QUERIES["sim_sq8_error"] = {
    "fn": sim_sq8_error,
    "oracle": SIM_SQ8_ERR_SQL,
}

# r14 flip (VERDICT_r13 next-round #1): every staged gate registers —
# the window arithmetic is 16 first-ever checks + 34 stale rotations.
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}

def doc_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Simpson repeat probability
    (operators/text.source_simpson_diversity) — the token-concentration
    scalar next to the Shannon-family contrasts (KL/JS/entropy): the
    boilerplate-farm detector a mixing decision reads before weighting
    a source."""
    from rearview_spark.operators import text as X

    return X.source_simpson_diversity(Tables(spark, sf_dir).documents)


DOC_SIMPSON_SQL = f"""
WITH ex AS (
  SELECT source, unnest(string_split({NORM}, ' ')) AS w FROM documents),
cnt AS (
  SELECT source, w, count(*) AS c FROM ex WHERE w <> '' GROUP BY 1, 2),
m AS (
  SELECT source, sum(c) AS n, count(*) AS vocab,
         sum((c * (c - 1)) // 2147483648) AS shi,
         sum((c * (c - 1)) % 2147483648) AS slo
  FROM cnt GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n_tokens, CAST(vocab AS BIGINT) AS vocab,
       CASE WHEN n >= 2 THEN round(
         (CAST(shi AS DOUBLE) * 2147483648.0 + CAST(slo AS DOUBLE))
         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) + 0.0000000005, 6)
       END AS simpson
FROM m ORDER BY source
"""

# Staged (r15 wave — r16 budget).
PENDING_QUERIES["doc_simpson_diversity"] = {
    "fn": doc_simpson_diversity,
    "oracle": DOC_SIMPSON_SQL,
}

# r16 flip: the r15-staged wave registers (window = 7 flips + 34 r10 +
# 9 r11 rotations, pinned by VERDICT_r15 next-round #3).
QUERIES.update(PENDING_QUERIES)
PENDING_QUERIES = {}


def sim_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector simplified-silhouette audit
    (operators/similarity.silhouette) of a deterministic k-means fit
    (k=8, 2 Lloyd iterations — smallest-id init, tie-broken argmax):
    the clustering-quality table consulted before a k-means partition
    (SemDeDup buckets, IVF routing, cluster-balanced selection) is
    trusted for curation decisions. The oracle unrolls the two Lloyd
    iterations as chained CTEs (the sim_ivf_kmeans_topk discipline)
    and re-derives every a/b distance and score from the final
    codebook; all floats are rounded at the output edge only (nudged
    6dp) — no cross-row float accumulation on either side."""
    emb = Tables(spark, sf_dir).embeddings
    cb = S.kmeans_fit(emb, k=8, iters=2)
    return S.silhouette(emb, cb).orderBy("vec_id")


SIM_SILHOUETTE_SQL = (
    """
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cb0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS bucket, v AS centroid
  FROM (SELECT vec_id, v FROM base ORDER BY vec_id LIMIT 8)
),"""
    + ",".join(_kmeans_iteration_sql(i) for i in (1, 2))
    + """,
sims AS (
  SELECT b.vec_id, c.bucket,
         CASE WHEN list_sum(list_transform(b.v, x -> x * x)) = 0
                OR list_sum(list_transform(c.centroid, x -> x * x)) = 0
              THEN -2.0
              ELSE list_cosine_similarity(b.v, c.centroid) END AS sim
  FROM base b CROSS JOIN cb2 c
),
own AS (
  SELECT vec_id, bucket, sim AS own_sim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY sim DESC, bucket) AS rn
    FROM sims
  ) WHERE rn = 1
),
oth AS (
  SELECT s.vec_id, max(s.sim) AS oth_sim
  FROM sims s JOIN own o ON s.vec_id = o.vec_id AND s.bucket <> o.bucket
  GROUP BY s.vec_id
)
SELECT o.vec_id, o.bucket,
       round(1.0 - o.own_sim + 0.0000000005, 6) AS a_dist,
       round(1.0 - t.oth_sim + 0.0000000005, 6) AS b_dist,
       round(CASE WHEN greatest(1.0 - o.own_sim, 1.0 - t.oth_sim) = 0 THEN 0.0
             ELSE (o.own_sim - t.oth_sim) / (1.0 - least(o.own_sim, t.oth_sim))
             END + 0.0000000005, 6) AS score
FROM own o JOIN oth t ON o.vec_id = t.vec_id
ORDER BY o.vec_id
"""
)

# Staged (r16 wave — r17 budget; pre-verified by
# tests/test_pending_gates.py at three scales before the flip).
PENDING_QUERIES["sim_silhouette"] = {
    "fn": sim_silhouette,
    "oracle": SIM_SILHOUETTE_SQL,
}
