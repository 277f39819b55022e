"""Training-data pipelines over Ray Data: dedup, similarity search, text ops.

Orchestration shapes (scale notes per pipeline):

- exact dedup: content-hash in map_batches (vectorized) → per-batch partial
  (min id per hash) → groupby(hash) final — shuffle carries one row per
  distinct hash per batch, not one per document.
- MinHash-LSH: shingle→minhash per batch (numpy reduceat) → explode to
  (band, band_hash, id) rows → groupby band bucket → pairwise verify with
  exact n-gram Jaccard inside the group.  ``carry_text`` ships the text
  through the shuffle for in-group verification (fine up to ~TB; at 100 TB
  set carry_text=False and verify candidates with a second hash-join pass).
- ANN: brute-force cosine per batch against a broadcast query matrix
  (ray.put once, ray.get per actor) → per-batch top-k candidates (q×k rows)
  → driver merges heaps.  The IVF variant buckets vectors by coarse centroid
  so each query touches nprobe buckets only.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from cassandra_data_migrator_ray.functions.dedup import (
    cosine_topk_block,
    hamming64,
    lsh_bands,
    minhash_signatures,
    ngram_jaccard,
    simhash64,
)
# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """One survivor (min id) per distinct text. Returns (id_col, text_col, n_dups)."""
    from pandas.util import hash_array

    def partial_fold(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, text_col]].copy()
        batch["text_hash"] = hash_array(
            batch[text_col].fillna("").to_numpy(dtype=object), categorize=False
        ).astype(np.int64)
        batch = batch.sort_values(id_col, kind="mergesort")
        g = batch.groupby("text_hash", sort=False, as_index=False)
        out = g.first()
        out["n_dups"] = g.size()["size"].to_numpy()
        return out

    def final_fold(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(id_col, kind="mergesort")
        # guard against hash collisions: group on the actual text
        g = group.groupby(text_col, sort=False, as_index=False)
        out = g.first()[[id_col, text_col]]
        out["n_dups"] = g["n_dups"].sum()["n_dups"].to_numpy()
        return out

    return (
        ds.map_batches(partial_fold, batch_format="pandas")
        .groupby("text_hash")
        .map_groups(final_fold, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------


def dedup_minhash_lsh(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
) -> ray.data.Dataset:
    """Verified near-duplicate pairs (id_a < id_b, jaccard >= threshold)."""

    def sig_and_bands(batch: pd.DataFrame) -> pd.DataFrame:
        sig = minhash_signatures(batch[text_col], num_perm, shingle_k)
        bands = lsh_bands(sig, num_bands)  # (n, num_bands)
        n = len(batch)
        ids = np.repeat(batch[id_col].to_numpy(), num_bands)
        texts = np.repeat(batch[text_col].fillna("").to_numpy(dtype=object), num_bands)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(num_bands, dtype=np.int32), n),
                "band_hash": bands.ravel(),
                id_col: ids,
                text_col: texts,
            }
        )

    def verify_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
        group = group.sort_values(id_col, kind="mergesort").head(max_bucket)
        ids = group[id_col].to_numpy()
        texts = group[text_col].to_numpy()
        rows = []
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                if ids[i] == ids[j]:
                    continue
                jac = ngram_jaccard(texts[i], texts[j], shingle_k)
                if jac >= threshold:
                    rows.append((int(min(ids[i], ids[j])), int(max(ids[i], ids[j])), jac))
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"]).astype(
            {"id_a": np.int64, "id_b": np.int64, "jaccard": np.float64}
        )

    def dedupe_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return group.head(1)

    pairs = (
        ds.map_batches(sig_and_bands, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(verify_bucket, batch_format="pandas")
    )
    # a pair can surface from several bands — keep one
    return pairs.groupby(["id_a", "id_b"]).map_groups(dedupe_pairs, batch_format="pandas")


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------


def simhash_fingerprints(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """(id, simhash) per document."""

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {id_col: batch[id_col], "simhash": simhash64(batch[text_col])}
        )

    return ds.map_batches(f, batch_format="pandas")


def dedup_simhash(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 256,
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash banding (4×16-bit bands) + Hamming verify."""

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        sh = simhash64(batch[text_col]).astype(np.uint64)
        n = len(batch)
        parts = [((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64) for b in range(4)]
        return pd.DataFrame(
            {
                "band": np.repeat(np.arange(4, dtype=np.int32), n),
                "band_hash": np.concatenate(parts),
                id_col: np.tile(batch[id_col].to_numpy(), 4),
                "simhash": np.tile(sh.astype(np.int64), 4),
            }
        )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        group = group.sort_values(id_col, kind="mergesort").head(max_bucket)
        ids = group[id_col].to_numpy()
        sh = group["simhash"].to_numpy()
        ii, jj = np.triu_indices(len(group), k=1)
        ham = hamming64(sh[ii], sh[jj])
        ok = (ham <= max_hamming) & (ids[ii] != ids[jj])
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ii][ok], ids[jj][ok]).astype(np.int64),
                "id_b": np.maximum(ids[ii][ok], ids[jj][ok]).astype(np.int64),
                "hamming": ham[ok].astype(np.int64),
            }
        )

    pairs = (
        ds.map_batches(bands, batch_format="pandas")
        .groupby(["band", "band_hash"])
        .map_groups(verify, batch_format="pandas")
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# --------------------------------------------------------------------------
# embedding ANN / near-dup
# --------------------------------------------------------------------------


def ann_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, vec_id, score).

    The query matrix is broadcast via ray.put; each batch does one matmul and
    emits q×k candidate rows; the driver merges candidate heaps (tiny).
    """
    queries = np.asarray(queries, dtype=np.float64)
    if queries.ndim == 1:
        queries = queries[None, :]
    qref = ray.put(queries)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        vecs = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
        scores, local = cosine_topk_block(vecs, q, k)
        ids = batch[id_col].to_numpy()[local]  # (q, k)
        nq = q.shape[0]
        return pd.DataFrame(
            {
                "qi": np.repeat(np.arange(nq, dtype=np.int64), scores.shape[1]),
                "score": scores.ravel(),
                id_col: ids.ravel().astype(np.int64),
            }
        )

    cand = ds.map_batches(per_batch, batch_format="pandas").to_pandas()
    # deterministic driver-side merge (candidate set is q × batches × k — tiny)
    cand = cand.sort_values(["qi", "score", id_col], ascending=[True, False, True])
    top = cand.groupby("qi", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("qi").cumcount().astype(np.int64)
    qid = (
        query_ids[top["qi"].to_numpy()]
        if query_ids is not None
        else top["qi"].to_numpy()
    )
    return pd.DataFrame(
        {
            "query_id": qid.astype(np.int64),
            "rank": top["rank"],
            id_col: top[id_col],
            "score": top["score"],
        }
    )


def embedding_neardup(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bits: int = 8,
    max_bucket: int = 512,
) -> ray.data.Dataset:
    """Cosine near-dup pairs via random-hyperplane LSH buckets + exact verify."""
    from cassandra_data_migrator_ray.functions.similarity import (
        lsh_bucket,
        random_hyperplanes,
    )

    planes_ref = {"planes": None}

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
        if planes_ref["planes"] is None:
            planes_ref["planes"] = random_hyperplanes(vecs.shape[1], n_bits)
        b = lsh_bucket(vecs, planes_ref["planes"])
        out = pd.DataFrame({id_col: batch[id_col].to_numpy(), "bucket": b})
        out[vec_col] = list(vecs)
        return out

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        group = group.sort_values(id_col, kind="mergesort").head(max_bucket)
        vecs = np.vstack(group[vec_col].to_numpy())
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True).clip(min=1e-12)
        sims = vn @ vn.T
        ids = group[id_col].to_numpy()
        ii, jj = np.triu_indices(len(group), k=1)
        ok = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {
                "id_a": np.minimum(ids[ii][ok], ids[jj][ok]).astype(np.int64),
                "id_b": np.maximum(ids[ii][ok], ids[jj][ok]).astype(np.int64),
                "cosine": sims[ii, jj][ok].astype(np.float64),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
