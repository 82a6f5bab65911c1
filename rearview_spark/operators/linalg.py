"""Distributed linear algebra over embedding columns: the integer-exact
Gram (scatter) matrix and a power-iteration top principal component —
the PCA primitive feature pipelines use for whitening checks, drift
monitoring, and "is this embedding space collapsing" diagnostics.

Not rearview parity; north-star pipeline scope (SURVEY.md §6) like the
rest of the similarity family.

Determinism contract (what makes a PCA gate-able against a value-level
DuckDB oracle): embeddings are quantized to integer micro-units with
Spark's own ``round`` (the proven cross-engine rounding), the Gram
matrix is an INTEGER sum of outer products (aggregation order cannot
perturb it), and the power iteration renormalizes with integer floor
division at every step — so the whole eigenvector estimate is exact
integer arithmetic, bit-replayable in SQL, with ONE float division per
output row at the edge. Eigenvector SIGN is pinned by the fixed all-ones
start vector (power iteration preserves it deterministically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAM_QUANT = 1000          # embedding value -> micro-units
PC_SCALE = 1_000_000       # eigenvector fixed-point scale


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", quant: int = GRAM_QUANT
) -> DataFrame:
    """dim x dim integer Gram matrix ``S = Q^T Q`` of the quantized
    embedding matrix (``Q[i][j] = round(e_ij * quant)`` as int64).

    Scale shape — the MLlib ``computeGramian`` pattern re-expressed:
    quantization happens JVM-side (``transform`` over the array — the
    cross-engine-proven rounding), then an Arrow-batched ``mapInPandas``
    emits ONE dim^2-row partial matrix per batch (numpy int64 matmul —
    vectorized, exact), and a (j, k) hash aggregate sums partials.
    Nothing row-scale ever shuffles: the shuffle carries
    dim^2 x batches rows of bigint partials, and the result is dim^2
    rows regardless of corpus size. int64 bound: |S_jk| <=
    n * (quant * max|e|)^2 — at quant 10^3, unit-norm-ish embeddings,
    n can reach ~10^12 before the bound matters (decimal(38) is the
    documented swap beyond).
    """
    import pandas as pd

    quantized = df.select(
        F.expr(
            f"transform({vec_col}, x -> "
            f"CAST(round(CAST(x AS DOUBLE) * {quant}.0) AS BIGINT))"
        ).alias("q")
    )

    def part(batches):
        import numpy as np

        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            g = m.T @ m
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            jj, kk = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {"j": jj.ravel(), "k": kk.ravel(), "s": acc.ravel()}
            )

    partials = quantized.mapInPandas(part, "j int, k int, s long")
    return partials.groupBy("j", "k").agg(F.sum("s").alias("s"))


def top_principal_component(
    df: DataFrame,
    vec_col: str = "embedding",
    iterations: int = 8,
    quant: int = GRAM_QUANT,
    scale: int = PC_SCALE,
):
    """Top principal component (largest-eigenvalue eigenvector of the
    Gram matrix) via fixed-round integer power iteration.

    The n-proportional work is :func:`gram_matrix` (distributed, one
    pass); the dim^2-row matrix is then collected — the bounded offline
    artifact class pq_fit / BPE merge tables established — and iterated
    driver-side in EXACT Python integers:

        v_0[j]     = scale
        w_t[j]     = sum_k S[j][k] * v_t[k]
        v_{t+1}[j] = floor(w_t[j] * scale / max_k |w_t[k]|)

    Max-norm renormalization keeps every quantity integral; Python ints
    never overflow, and the oracle replays the same recurrence in
    HUGEINT with the portable pmod floor-division (the theil_sen
    discipline). Returns ``(loadings_df, eigenvalue)`` — loadings as
    ``(dim_idx, loading_fp, loading)`` with one float division per row,
    eigenvalue the Rayleigh quotient ``(v^T S v) / (v^T v)`` in
    quantized-units^2 as a single float division of exact integers.
    """
    rows = gram_matrix(df, vec_col, quant).collect()
    if not rows:
        raise ValueError("top_principal_component: empty input")
    dim = max(r["j"] for r in rows) + 1
    s = {(r["j"], r["k"]): r["s"] for r in rows}
    v = [scale] * dim
    for _ in range(iterations):
        w = [
            sum(s.get((j, k), 0) * v[k] for k in range(dim))
            for j in range(dim)
        ]
        m = max(abs(x) for x in w)
        if m == 0:
            raise ValueError("top_principal_component: zero Gram matrix")
        v = [(x * scale) // m for x in w]
    num = sum(
        v[j] * s.get((j, k), 0) * v[k] for j in range(dim) for k in range(dim)
    )
    den = sum(x * x for x in v)
    eigenvalue = float(num) / float(den)
    spark = df.sparkSession
    loadings = spark.createDataFrame(
        [(j, v[j], v[j] / float(scale)) for j in range(dim)],
        "dim_idx int, loading_fp long, loading double",
    )
    return loadings, eigenvalue


def pc_scores(
    df: DataFrame,
    loadings: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = GRAM_QUANT,
    scale: int = PC_SCALE,
) -> DataFrame:
    """Project every embedding onto a fixed-point component from
    :func:`top_principal_component` — the serving half of the PCA pair
    (drift scores, collapse diagnostics, 1-D ordering of a corpus along
    its dominant axis).

    The loadings frame is dim rows — collected and inlined as a LITERAL
    array (bounded artifact, same class as the power-iteration input),
    so scoring is a pure narrow projection: ``zip_with`` multiply +
    ``aggregate`` sum in bigint (exact — |q| * |v| * dim stays far
    inside int64 at the module's quant/scale), one float division per
    row at the edge. No shuffle, no UDF; whole-stage codegen end to
    end. Returns ``(id_col, score_fp, score)``.
    """
    v = [
        int(r["loading_fp"])
        for r in loadings.select("dim_idx", "loading_fp")
        .orderBy("dim_idx")
        .collect()
    ]
    arr = F.array(*[F.lit(x).cast("long") for x in v])
    q = F.expr(
        f"transform({vec_col}, x -> "
        f"CAST(round(CAST(x AS DOUBLE) * {quant}.0) AS BIGINT))"
    )
    score_fp = F.aggregate(
        F.zip_with(q, arr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(id_col, score_fp.alias("score_fp")).withColumn(
        "score", F.col("score_fp") / F.lit(float(quant) * float(scale))
    )


def ols_fit(df: DataFrame, y_col: str, x_cols: list[str]) -> DataFrame:
    """Multivariate least squares by the sufficient-statistics method —
    the in-database ML-training pattern: ONE distributed aggregation
    computes the integer moment sums (n, Σx_i, Σx_i x_j, Σy, Σx_i y),
    and the normal equations are then solved driver-side in EXACT
    Python integers (fraction-free Bareiss elimination + Cramer
    ratios), so the coefficients are deterministic down to the bit —
    each β is one float division of two exact integers. Generalizes
    operators/timeseries.linear_trend's single-feature form.

    Inputs must already be INTEGER columns (callers quantize — cents,
    counts, basis points — exactly like the fixed-point gates do);
    that is what keeps the moment sums aggregation-order-immune.
    int64 bound on the Spark side: each moment sum must fit int64
    (n * max|x_i| * max|x_j|) — at TPC-H-ish magnitudes that allows
    n ~ 10^9-10^12 depending on quantization; decimal(38,0) is the
    documented swap beyond. The driver-side solve is O(k^3) on a
    (k+1)-row artifact — the pq_fit bounded-artifact class.

    Returns ``(term, beta)`` — 'intercept' plus one row per feature,
    in y-units per x-unit.
    """
    k = len(x_cols)
    if k < 1:
        raise ValueError("ols_fit: need at least one feature")
    xs = [F.lit(1).cast("long")] + [F.col(c).cast("long") for c in x_cols]
    names = ["intercept"] + list(x_cols)
    aggs = []
    for i in range(k + 1):
        for j in range(i, k + 1):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"m_{i}_{j}"))
        aggs.append(F.sum(xs[i] * F.col(y_col).cast("long")).alias(f"b_{i}"))
    row = df.agg(*aggs).collect()[0]
    m = [[0] * (k + 1) for _ in range(k + 1)]
    b = [int(row[f"b_{i}"]) for i in range(k + 1)]
    for i in range(k + 1):
        for j in range(i, k + 1):
            m[i][j] = m[j][i] = int(row[f"m_{i}_{j}"])

    def det(mat: list[list[int]]) -> int:
        # fraction-free Bareiss: exact integer determinant, no floats
        a = [r[:] for r in mat]
        n = len(a)
        sign, prev = 1, 1
        for p in range(n - 1):
            if a[p][p] == 0:
                swap = next(
                    (r for r in range(p + 1, n) if a[r][p] != 0), None
                )
                if swap is None:
                    return 0
                a[p], a[swap] = a[swap], a[p]
                sign = -sign
            for r in range(p + 1, n):
                for c in range(p + 1, n):
                    a[r][c] = (a[r][c] * a[p][p] - a[r][p] * a[p][c]) // prev
            prev = a[p][p]
        return sign * a[-1][-1]

    d = det(m)
    if d == 0:
        raise ValueError("ols_fit: singular moment matrix (collinear features)")
    betas = []
    for i in range(k + 1):
        mi = [r[:] for r in m]
        for r in range(k + 1):
            mi[r][i] = b[r]
        betas.append((names[i], float(det(mi)) / float(d)))
    return df.sparkSession.createDataFrame(betas, "term string, beta double")
