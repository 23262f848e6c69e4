"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

Training-data-pipeline extension (no reference impl) — the second scale path
for ANN next to `similarity.lsh_ann_topk`, trading LSH's data-independent
buckets for data-adaptive centroid cells:

- **train** (`ivf_train`): spherical k-means on a deterministic hash-sample
  of the vectors. Centroids are tiny by construction (k × dim doubles), so
  — as in every IVF system — they live driver-side and ship to executors
  inside the Arrow-batched assignment UDF's closure. Each Lloyd round is one
  distributed job: assign (vectorized NumPy matmul per Arrow batch) →
  element-wise mean via posexplode + (cid, pos) hash aggregation (pure
  Catalyst; the k·dim result is the only thing collected). Determinism: the
  sample, the seed vectors, and the UDF are all xxhash64/argmax-derived —
  no RNG state anywhere.
- **assign** (`ivf_assign`): one narrow pass, (id, cid) with cid = argmax
  cosine against the centroid matrix. No shuffle.
- **query** (`ivf_ann_topk`): every vector probes its `nprobe` nearest
  centroid cells; candidates are the members of probed cells; exact cosine
  re-rank, same output shape as `cosine_topk` / `lsh_ann_topk`.

Scale shape (the 100 TB story): candidate volume is n·nprobe·(n/k) rows, so
k_centroids is the knob — k ≈ sqrt(n·nprobe) keeps the candidate join
~n^1.5 like the LSH path. The cell join is a plain equi-join on cid: a
popular centroid is an ordinary skewed key, split at runtime by AQE
skew-join handling (same class as the PageRank gather's hub keys — no
custom salting needed because each probed (query, cell) pair contributes
exactly once). An optional `max_cell_size` cap (dedupe._cap_hot_buckets,
with the same `metrics={}` drop accounting) bounds adversarial cells; note
the trade is stronger than for LSH — a vector lives in exactly ONE cell, so
dropping a cell removes its members as neighbors entirely, whereas an LSH
vector keeps its other `tables-1` chances. Default is therefore None here
(rely on AQE + k sizing) where the LSH family defaults the cap on.

Exactness anchor (the pytest oracle): with nprobe = k_centroids every cell
is probed, the candidate set is ALL ordered pairs, and the result equals
`similarity.cosine_topk` row-for-row — recall loss comes only from probing
fewer cells, never from the plumbing.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

from engine.operators.similarity import _dot_col, _estimate_vectors, with_norm

TRAIN_SAMPLE_CAP = 1_000_000  # Lloyd rounds run on at most ~this many vectors


def _as_matrix(vecs: pd.Series) -> np.ndarray:
    return np.stack(vecs.to_numpy()).astype(np.float64)


def _nearest_cid_udf(centroids: np.ndarray):
    """Arrow-batched argmax-cosine assignment. `centroids` rows are
    L2-normalized, so argmax of the raw dot product == argmax cosine (the
    query norm is constant within a row). Ties break to the lowest cid
    (np.argmax first-occurrence) — deterministic."""
    ct = centroids.T.copy()

    @pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        sims = _as_matrix(vecs) @ ct
        return pd.Series(np.argmax(sims, axis=1).astype("int32"))

    return nearest


def _probe_cids_udf(centroids: np.ndarray, nprobe: int):
    """Arrow-batched top-`nprobe` centroid ids per vector, nearest first;
    stable argsort so equal-similarity ties break to the lowest cid."""
    ct = centroids.T.copy()

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="object")
        sims = _as_matrix(vecs) @ ct
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return probes


def ivf_train(
    embeddings: DataFrame,
    k_centroids: int = 16,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_cap: int = TRAIN_SAMPLE_CAP,
) -> np.ndarray:
    """Spherical k-means centroids, shape (k_eff, dim) float64, rows
    L2-normalized. k_eff < k_centroids when the input has fewer vectors.

    Sampling uses Catalyst-stats row estimates (NO count() job — the
    similarity._estimate_vectors rule): above `sample_cap` estimated rows,
    keep ids where xxhash64(seed, id) % ceil(est/cap) == 0. Seeds are the
    k vectors with the smallest xxhash64 — a TakeOrderedAndProject, never a
    full sort. Each Lloyd round collects exactly k·dim (cid, pos, mean)
    cells; empty cells keep their previous centroid. Iteration count is
    fixed (`iters`), like the reference's fixed-budget kernels — k-means
    convergence checks buy little for IVF routing quality."""
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    est = _estimate_vectors(embeddings)
    if est <= 0:
        # unknown stats (join-derived / local plans): assume too big to train
        # on in full — the scale-safe direction, same rule as
        # similarity._num_blocks (the empty-sample fallback below catches
        # genuinely small unknown-stats inputs).
        est = 64 * sample_cap
    if est > sample_cap:
        mod = math.ceil(est / sample_cap)
        e = e.filter(F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(mod)) == 0)

    def _seeds(frame):
        return (
            frame.orderBy(
                F.xxhash64(F.lit(seed + 1), F.col("id")).asc(), F.col("id").asc()
            )
            .limit(k_centroids)
            .select("vec")
            .collect()
        )

    seed_rows = _seeds(e)
    if not seed_rows:
        # the hash sample emptied a small input whose stats were the
        # unknown-size sentinel: train on it unsampled (tiny by definition)
        e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        seed_rows = _seeds(e)
    if not seed_rows:
        raise ValueError("ivf_train: no vectors to train on")
    c = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in seed_rows])
    norms = np.linalg.norm(c, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    c = c / norms
    k_eff = c.shape[0]

    sample = e.persist()
    try:
        for _ in range(iters):
            assigned = sample.select(
                _nearest_cid_udf(c)(F.col("vec")).alias("cid"), "vec"
            )
            cells = (
                assigned.select("cid", F.posexplode("vec").alias("pos", "x"))
                .groupBy("cid", "pos")
                .agg(F.avg(F.col("x").cast("double")).alias("m"))
                .collect()
            )
            new_c = c.copy()
            touched = np.zeros(k_eff, dtype=bool)
            for r in cells:
                new_c[r["cid"], r["pos"]] = r["m"]
                touched[r["cid"]] = True
            norms = np.linalg.norm(new_c, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            new_c = new_c / norms
            new_c[~touched] = c[~touched]  # empty cell: keep previous centroid
            c = new_c
    finally:
        sample.unpersist()
    return c


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid): each vector's nearest-centroid cell. One narrow
    Arrow-batched pass — no shuffle, no driver data."""
    return embeddings.select(
        F.col(id_col).alias("id"),
        _nearest_cid_udf(centroids)(F.col(vec_col)).alias("cid"),
    )


def ivf_ann_topk(
    embeddings: DataFrame,
    k: int = 5,
    k_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_cell_size: int | None = None,
    metrics: dict | None = None,
) -> DataFrame:
    """Approximate k-NN via IVF cells: (query_id, neighbor_id, cosine,
    knn_rank), the cosine_topk/lsh_ann_topk output shape. Pass `centroids`
    (from a prior `ivf_train`) to reuse an index across calls; otherwise
    trains in place. nprobe = k_centroids probes every cell and is exactly
    `cosine_topk` (the pytest gate)."""
    c = centroids if centroids is not None else ivf_train(
        embeddings, k_centroids, iters, seed, id_col, vec_col
    )
    nprobe = min(nprobe, c.shape[0])

    e = with_norm(embeddings, id_col, vec_col)
    data = e.select(
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("dv"),
        F.col("norm").alias("dn"),
        _nearest_cid_udf(c)(F.col("vec")).alias("cid"),
    )
    if max_cell_size is not None:
        from engine.operators.dedupe import _cap_hot_buckets

        data = _cap_hot_buckets(data, ["cid"], max_cell_size, metrics, "ivf_cell")
    qprobe = e.select(
        F.col("id").alias("query_id"),
        F.col("vec").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(_probe_cids_udf(c, nprobe)(F.col("vec"))).alias("cid"),
    )
    # each (query, neighbor) pair appears at most once: a neighbor lives in
    # exactly one cell, and a query probes each cid at most once — no
    # distinct needed before the re-rank
    scored = (
        qprobe.join(data, "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot_col(F.col("qv"), F.col("dv")) / (F.col("qn") * F.col("dn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("knn_rank", F.row_number().over(w)).filter(
        F.col("knn_rank") <= k
    )
