"""Similarity-search kernels: brute-force cosine top-k + LSH/IVF bucketing.

The baseline is exact brute force — a numpy matmul per Arrow batch against a
broadcast query matrix (ray.put once, read per actor).  The scale path
bucket-partitions vectors by random-hyperplane sign bits (LSH) or coarse
centroids (IVF) so each query only touches a few buckets.
"""

from __future__ import annotations

import numpy as np


def random_hyperplanes(dim: int, n_bits: int, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    h = rng.standard_normal((n_bits, dim))
    return h / np.linalg.norm(h, axis=1, keepdims=True)


def lsh_bucket(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-bit bucket id per vector (int64): bucket = bits(sign(V @ P^T))."""
    bits = (vectors @ planes.T) > 0  # (n, n_bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return bits.astype(np.int64) @ weights


def kmeans_lite(vectors: np.ndarray, k: int, iters: int = 10, seed: int = 5) -> np.ndarray:
    """Tiny deterministic k-means for IVF coarse centroids (runs on a sample)."""
    rng = np.random.default_rng(seed)
    cent = vectors[rng.choice(len(vectors), size=min(k, len(vectors)), replace=False)]
    for _ in range(iters):
        d = ((vectors[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                cent[j] = vectors[m].mean(0)
    return cent


def ivf_assign(vectors: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    d = ((vectors[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
    return d.argmin(1).astype(np.int64)


def kmeans_refine_distributed(
    ds,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    iters: int = 3,
) -> np.ndarray:
    """Distributed Lloyd refinement over a whole Dataset.

    Each iteration broadcasts the current centroids (ray.put) and runs ONE
    ``map_batches`` pass emitting per-block partials — a (C, d) sum matrix and
    a (C,) count vector flattened into C rows — so the driver only ever
    reduces blocks × C tiny rows, never the vectors themselves.  This is the
    scale path for IVF training; the driver-side ``kmeans_lite`` over a hash
    sample remains the cheap initializer.
    """
    import pandas as pd

    import ray

    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    # assignment is cosine argmax — centroids must be unit vectors from the
    # FIRST iteration (kmeans_lite's Euclidean means are not; an oversized
    # centroid would win every argmax and collapse the clustering)
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    c, d = cents.shape
    for _ in range(iters):
        cref = ray.put(cents)

        def partials(batch: pd.DataFrame) -> pd.DataFrame:
            cur = ray.get(cref)
            vecs = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
            vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True).clip(min=1e-12)
            assign = (vn @ cur.T).argmax(1)
            sums = np.zeros((c, d), dtype=np.float64)
            np.add.at(sums, assign, vn)
            counts = np.bincount(assign, minlength=c).astype(np.float64)
            return pd.DataFrame(
                {
                    "cid": np.arange(c, dtype=np.int64),
                    "count": counts,
                    "vsum": list(sums),
                }
            )

        part = ds.map_batches(partials, batch_format="pandas").to_pandas()
        if part.empty:  # zero-row dataset: nothing to refine against
            return cents
        counts = np.zeros(c)
        sums = np.zeros((c, d))
        np.add.at(counts, part["cid"].to_numpy(), part["count"].to_numpy())
        np.add.at(sums, part["cid"].to_numpy(), np.vstack(part["vsum"].to_numpy()))
        nonempty = counts > 0
        cents = np.where(
            nonempty[:, None], sums / counts.clip(min=1)[:, None], cents
        )
        cents /= np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    return cents


class TopKMerger:
    """Streaming merge of per-batch (score, id) top-k candidates per query."""

    def __init__(self, n_queries: int, k: int):
        self.k = k
        self.scores = np.full((n_queries, 0), -np.inf)
        self.ids = np.full((n_queries, 0), -1, dtype=np.int64)

    def update(self, scores: np.ndarray, ids: np.ndarray) -> None:
        self.scores = np.concatenate([self.scores, scores], axis=1)
        self.ids = np.concatenate([self.ids, ids], axis=1)
        if self.scores.shape[1] > 4 * self.k:
            self._shrink()

    def _shrink(self) -> None:
        k = min(self.k, self.scores.shape[1])
        idx = np.argpartition(-self.scores, k - 1, axis=1)[:, :k]
        self.scores = np.take_along_axis(self.scores, idx, axis=1)
        self.ids = np.take_along_axis(self.ids, idx, axis=1)

    def result(self) -> tuple[np.ndarray, np.ndarray]:
        self._shrink()
        # deterministic order: score desc, id asc as tiebreak
        order = np.lexsort((self.ids, -self.scores), axis=1)
        return (
            np.take_along_axis(self.scores, order, axis=1),
            np.take_along_axis(self.ids, order, axis=1),
        )


# --------------------------------------------------------------------------
# Product quantization (PQ) — compact codes for billion-vector ANN
# --------------------------------------------------------------------------
#
# PQ splits each d-dim vector into m subvectors and replaces each with the
# index of its nearest per-subspace centroid: a vector becomes m uint8 codes
# (e.g. 768 float32 -> 16 bytes, a 192x shrink).  Query-time scoring is ADC
# (asymmetric distance computation): one (m, ksub) table of exact
# query-to-centroid dot products per query, then a table lookup + sum per
# coded vector — no float vector is ever read at query time.  (Jegou,
# Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
# IEEE TPAMI 2011 — public method.)


def pq_train(
    vectors: np.ndarray, m: int = 8, ksub: int = 256, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Per-subspace codebooks (m, ksub, d//m) via kmeans_lite on a sample.
    ``d`` must be divisible by ``m``; ``ksub`` <= 256 keeps codes uint8."""
    v = np.asarray(vectors, dtype=np.float64)
    n, d = v.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if ksub > 256:
        raise ValueError("ksub > 256 does not fit uint8 codes")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = v[:, j * dsub : (j + 1) * dsub]
        cents = kmeans_lite(sub, ksub, iters=iters, seed=seed + j)
        if len(cents) < ksub:  # fewer points than ksub: pad by repetition
            pad = cents[np.arange(ksub - len(cents)) % len(cents)]
            cents = np.vstack([cents, pad])
        books[j] = cents
    return books


def pq_encode(vectors: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, d) -> (n, m) uint8: nearest per-subspace centroid index."""
    v = np.asarray(vectors, dtype=np.float64)
    m, ksub, dsub = codebooks.shape
    codes = np.empty((len(v), m), dtype=np.uint8)
    for j in range(m):
        sub = v[:, j * dsub : (j + 1) * dsub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
        d2 = (codebooks[j] ** 2).sum(1)[None, :] - 2.0 * (sub @ codebooks[j].T)
        codes[:, j] = d2.argmin(1)
    return codes


def pq_decode(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) uint8 -> (n, d) reconstruction."""
    m, ksub, dsub = codebooks.shape
    return np.concatenate(
        [codebooks[j][codes[:, j]] for j in range(m)], axis=1
    )


def adc_tables(queries: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(q, d) -> (q, m, ksub) exact query-to-centroid dot products.  ADC
    score of a coded vector = sum_j table[q, j, code_j] = <query,
    reconstruction> — exact inner product with the quantized vector."""
    q = np.asarray(queries, dtype=np.float64)
    m, ksub, dsub = codebooks.shape
    return np.stack(
        [q[:, j * dsub : (j + 1) * dsub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )


def adc_scores(codes: np.ndarray, table_q: np.ndarray) -> np.ndarray:
    """(n, m) codes x one query's (m, ksub) table -> (n,) scores, pure
    table-lookup + sum (the PQ hot loop; no vector math)."""
    m = codes.shape[1]
    return table_q[np.arange(m)[None, :], codes].sum(axis=1)
