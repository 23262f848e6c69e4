"""Embedding whitening / PCA for the ANN stack.

The standard pre-ANN transform (Jegou et al. 2012; Babenko & Lempitsky
ICCV 2015: whitening raises recall for product-quantized and LSH search;
"all-but-the-top" mean-removal helps text embeddings): estimate the mean
vector and covariance of an `array<float>` embedding column, then project
every vector with the d×d (or k×d for PCA-k) matrix derived from the
eigendecomposition. d is small (64-1024); N is the web-scale axis — so
moments are ONE distributed pass producing a d² accumulator per
partition, the eigh happens on the driver's d×d matrix (microseconds),
and the projection is one Arrow-batched matmul per batch.

Two moments paths, pytest-gated against each other:

- `embedding_moments` (exact): upper-triangle products built as a pure
  Catalyst nested-`transform` array expression (no self-join), summed
  with the repo's decimal(18,6) policy — bit-portable across engines,
  the auditable path the DuckDB contract oracle replays.
- `embedding_moments_scale`: Arrow `mapInPandas` accumulating
  (n, Σx, Σxxᵀ) per batch in float64 — the 100 TB path: d+d² doubles per
  batch cross the wire, never the vectors.

Whitening modes: 'pca' projects onto the top-k eigenvectors scaled by
1/sqrt(eigenvalue) (decorrelated, unit variance, dim k); 'zca' rotates
back (U Λ^-1/2 Uᵀ, dim d) — the minimum-distortion whitener. eps
regularizes near-zero eigenvalues.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def _dsum(col, alias):
    return F.sum(col.cast("decimal(18,6)")).cast("double").alias(alias)


def embedding_moments(
    embeddings: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Exact decimal-summed first/second moments.

    Returns (i INT, j INT, s DOUBLE): j == -1 rows carry Σ x_i (the mean
    numerator), i <= j rows carry the Gram upper triangle Σ x_i·x_j —
    both under the repo's decimal(18,6) sum policy, so the output is
    engine-portable (the sim5 contract oracle). One explode of a
    Catalyst-built triangle array per row — no self-join.
    """
    v = F.col(vec_col)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    tri = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                F.sequence(i, F.lit(dim - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at(v, i.cast("int") + 1).cast("double")
                        * F.element_at(v, j.cast("int") + 1).cast("double")
                    ).alias("p"),
                ),
            ),
        )
    )
    gram = (
        embeddings.select(F.explode(tri).alias("t"))
        .select("t.i", "t.j", "t.p")
        .groupBy("i", "j")
        .agg(_dsum(F.col("p"), "s"))
    )
    mean = (
        embeddings.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(_dsum(F.col("x").cast("double"), "s"))
        .select(F.col("i").cast("int").alias("i"), F.lit(-1).cast("int").alias("j"), "s")
    )
    return gram.unionByName(mean)


def embedding_moments_scale(
    embeddings: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Arrow-batched moments partials: one row (n, sums d, gram d²) per
    batch; callers reduce the handful of partials (see fit_whitening).
    Only d + d² doubles per batch leave the executors."""
    import pandas as pd

    schema = StructType(
        [
            StructField("n", DoubleType()),
            StructField("sums", ArrayType(DoubleType())),
            StructField("gram", ArrayType(DoubleType())),
        ]
    )

    def acc(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for b in batches:
            X = np.asarray(list(b[vec_col]), dtype=np.float64)
            if X.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "n": [float(len(X))],
                    "sums": [X.sum(axis=0).tolist()],
                    "gram": [(X.T @ X).ravel().tolist()],
                }
            )

    return embeddings.select(vec_col).mapInPandas(acc, schema)


def fit_whitening(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int | None = None,
    eps: float = 1e-6,
    mode: str = "pca",
):
    """Fit (mean, W) from the scale-path moments. Returns NumPy arrays:
    mean (d,), W (k×d or d×d) with rows = projection directions, so
    y = W @ (x - mean). mode='pca' keeps the top-k variance directions
    (k=None -> d); mode='zca' returns the symmetric d×d whitener."""
    import numpy as np

    if mode not in ("pca", "zca"):
        raise ValueError(f"mode must be 'pca' or 'zca', got {mode!r}")
    parts = embedding_moments_scale(embeddings, vec_col, dim).collect()
    if not parts:
        raise ValueError("no embeddings to fit on")
    n = sum(p.n for p in parts)
    sums = np.sum([p.sums for p in parts], axis=0)
    gram = np.sum([np.asarray(p.gram).reshape(dim, dim) for p in parts], axis=0)
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    vals, vecs = vals[::-1], vecs[:, ::-1]
    scale = 1.0 / np.sqrt(np.maximum(vals, 0.0) + eps)
    if mode == "zca":
        W = (vecs * scale) @ vecs.T  # symmetric, full-d
    else:
        kk = dim if k is None else k
        if not 1 <= kk <= dim:
            raise ValueError(f"k must be in [1, {dim}], got {k}")
        W = (vecs[:, :kk] * scale[:kk]).T  # k×d
    return mean, W


def transform_embeddings(
    embeddings: DataFrame,
    mean,
    W,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Project every vector: out = W @ (x - mean), one Arrow-batched
    matmul per batch (the UDF hot path done right — never per-row)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(mean, dtype=np.float64)
    Wt = np.asarray(W, dtype=np.float64).T  # d×k, right-multiplied

    @pandas_udf(ArrayType(DoubleType()))
    def project(col):
        X = np.asarray(list(col), dtype=np.float64)
        Y = (X - mean) @ Wt
        return pd.Series(list(Y))

    return embeddings.withColumn(out_col, project(F.col(vec_col)))


def whiten_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int | None = None,
    eps: float = 1e-6,
    mode: str = "pca",
    out_col: str = "whitened",
) -> DataFrame:
    """fit + transform in one call (fit runs its own one-pass job)."""
    mean, W = fit_whitening(embeddings, vec_col, dim, k=k, eps=eps, mode=mode)
    return transform_embeddings(embeddings, mean, W, vec_col, out_col)
