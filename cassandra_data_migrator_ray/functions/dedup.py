"""Deduplication kernels: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All kernels are batch-vectorized; the Ray-side orchestration (shuffle by hash
bucket, groupby band, verify pairs) lives in pipelines/dataops.py.  Hashing is
pandas.util.hash_array (stable SipHash) — never Python's builtin hash().

Scale shape (100 TB): per-batch shingle→minhash is a numpy reduceat over the
concatenated shingle array (one pass, no per-doc Python math); what crosses
the shuffle is (band_id, band_hash, doc_id) triples — tiny vs the documents.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pandas.util import hash_array

_MERSENNE = np.uint64((1 << 61) - 1)
_WS = re.compile(r"\s+")


def split_words(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-split every doc: (flat_word_array[object], counts[int64]).

    One pandas C-level split + one chain flatten — the shared front-end for
    every word-level kernel (shingles, stopword profiles, unique-word ratios).
    """
    from itertools import chain

    s = texts.fillna("").astype(str)
    words = s.str.strip().str.split()
    counts = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(s))
    flat = (
        np.array(list(chain.from_iterable(words)), dtype=object)
        if counts.sum()
        else np.empty(0, dtype=object)
    )
    return flat, counts


def _shingle_hashes(texts: pd.Series, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated uint64 shingle hashes + per-doc boundaries (offsets).

    Word-level k-shingles hashed as a polynomial rolling combine over the
    word-hash array (one hash_array pass + k vectorized shifts — no
    per-shingle string materialization).  Docs with < k words contribute the
    hash of their full text as one shingle.  Returns (hashes, offsets[len+1]).
    """
    s = texts.fillna("").astype(str)
    n = len(s)
    flat_words, counts = split_words(s)
    n_sh = np.where(counts >= k, counts - k + 1, 1)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_sh, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint64)
    if n == 0:
        return out, offsets

    big = counts >= k
    if big.any():
        # word hashes for big docs only, as one contiguous slab
        woff_all = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=woff_all[1:])
        big_idx = np.flatnonzero(big)
        take = np.concatenate(
            [np.arange(woff_all[i], woff_all[i + 1]) for i in big_idx]
        )
        wh = hash_array(flat_words[take], categorize=False)
        # rolling polynomial over every window of k consecutive word hashes
        # (windows crossing doc boundaries are computed but never selected)
        m = len(wh) - k + 1
        A = np.uint64(1099511628211)
        acc = np.zeros(m, dtype=np.uint64)
        for j in range(k):
            acc = acc * A + wh[j : j + m]
        nw = counts[big] - k + 1
        woff = np.zeros(len(big_idx) + 1, dtype=np.int64)
        np.cumsum(counts[big], out=woff[1:])
        total_w = int(nw.sum())
        within = np.arange(total_w, dtype=np.int64) - np.repeat(
            np.cumsum(np.r_[np.int64(0), nw[:-1]]), nw
        )
        pos = np.repeat(woff[:-1], nw) + within
        out[np.repeat(offsets[:-1][big], nw) + within] = acc[pos]
    small = ~big
    if small.any():
        out[offsets[:-1][small]] = hash_array(
            s.to_numpy(dtype=object)[small], categorize=False
        )
    return out, offsets


def gram_hashes_strict(
    texts: pd.Series, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """uint64 polynomial hashes of every n-token gram, STRICT semantics:
    docs with fewer than ``n`` whitespace tokens contribute ZERO grams (no
    full-text fallback — decontamination needs gram-count parity with a SQL
    oracle that enumerates token windows, see pipelines/dataops.decontaminate).

    Returns (hashes, gram_offsets[len+1], flat_words, word_counts) — the word
    arrays let callers reconstruct matched gram strings to reject the ~2⁻⁶⁴
    hash collisions, keeping the operator exact."""
    s = texts.fillna("").astype(str)
    ndocs = len(s)
    flat_words, counts = split_words(s)
    n_gr = np.maximum(counts - n + 1, 0)
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(n_gr, out=offsets[1:])
    out = np.empty(offsets[-1], dtype=np.uint64)
    if ndocs == 0 or offsets[-1] == 0:
        return out, offsets, flat_words, counts
    big = counts >= n
    woff_all = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=woff_all[1:])
    big_idx = np.flatnonzero(big)
    take = np.concatenate(
        [np.arange(woff_all[i], woff_all[i + 1]) for i in big_idx]
    )
    wh = hash_array(flat_words[take], categorize=False)
    # rolling polynomial over every window of n consecutive word hashes
    # (windows crossing doc boundaries are computed but never selected)
    m = len(wh) - n + 1
    A = np.uint64(1099511628211)
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(n):
        acc = acc * A + wh[j : j + m]
    nw = n_gr[big]
    woff = np.zeros(len(big_idx) + 1, dtype=np.int64)
    np.cumsum(counts[big], out=woff[1:])
    total_w = int(nw.sum())
    within = np.arange(total_w, dtype=np.int64) - np.repeat(
        np.cumsum(np.r_[np.int64(0), nw[:-1]]), nw
    )
    out[np.repeat(offsets[:-1][big], nw) + within] = acc[
        np.repeat(woff[:-1], nw) + within
    ]
    return out, offsets, flat_words, counts


def minhash_signatures(
    texts: pd.Series, num_perm: int = 64, k: int = 3, seed: int = 7
) -> np.ndarray:
    """(len(texts), num_perm) uint64 MinHash signature matrix.

    Universal hashing h_i(x) = (a_i*x + b_i) mod 2^61-1, minimized per doc via
    one reduceat per permutation over the concatenated shingle array.
    """
    hashes, offsets = _shingle_hashes(texts, k)
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
    n = len(texts)
    sig = np.full((n, num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(hashes) == 0:
        return sig
    # every doc has ≥1 shingle (docs < k words hash their full text), but
    # reduce over nonempty starts anyway — clipped starts for empty groups
    # would shift the previous group's segment boundary
    nonempty = offsets[1:] > offsets[:-1]
    starts = offsets[:-1][nonempty]
    x = hashes % _MERSENNE
    for p in range(num_perm):
        hp = (a[p] * x + b[p]) % _MERSENNE  # uint64 wrap-mod is fine for minhash
        sig[nonempty, p] = np.minimum.reduceat(hp, starts)
    return sig


def lsh_bands(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """(n, num_bands) int64 band hashes of a signature matrix (rows/band =
    num_perm // num_bands); docs sharing any (band, hash) are candidates."""
    n, num_perm = sig.shape
    if num_perm < num_bands or num_perm % num_bands:
        # r=0 would hash every band to the constant FNV basis (all docs
        # collide → O(n²) candidate blowup); a remainder silently ignores
        # trailing permutations — both are configuration errors
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of "
            f"num_bands ({num_bands})"
        )
    r = num_perm // num_bands
    out = np.empty((n, num_bands), dtype=np.int64)
    prime = np.uint64(1099511628211)
    for bidx in range(num_bands):
        seg = sig[:, bidx * r : (bidx + 1) * r]
        acc = np.full(n, np.uint64(14695981039346656037), dtype=np.uint64)
        for j in range(r):
            acc = (acc ^ seg[:, j]) * prime  # FNV-1a over the band values
        out[:, bidx] = acc.astype(np.int64)
    return out


def simhash64(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash over word unigrams (int64 per doc).

    Tokenization via the module's shared ``split_words`` front-end (one
    pandas C-level split for the whole batch — no per-doc Python loop, and no
    second tokenizer that could drift from the shingle kernels)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    flat, counts_per_doc = split_words(texts.fillna("").astype(str))
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts_per_doc, out=offsets[1:])
    if offsets[-1] == 0:
        return out
    h = hash_array(flat, categorize=False)  # uint64 per token
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    signed = bits.astype(np.int32) * 2 - 1  # (ntok, 64) in {-1, +1}
    nonempty = offsets[1:] > offsets[:-1]
    # reduceat over nonempty docs' starts only — a clipped start for an empty
    # doc would shift the previous doc's segment boundary
    sums = np.add.reduceat(signed, offsets[:-1][nonempty], axis=0)
    bitvec = (sums > 0).astype(np.uint8)
    packed = np.packbits(bitvec, axis=1, bitorder="little").view(np.uint64).ravel()
    out[nonempty] = packed.astype(np.int64)
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bitwise Hamming distance between int64 simhashes (vectorized popcount)."""
    x = (a.astype(np.int64) ^ b.astype(np.int64)).astype(np.uint64)
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (the verify step for candidates)."""

    def grams(t: str) -> set:
        ws = _WS.split(t.strip()) if t and t.strip() else []
        if len(ws) < k:
            return {t}
        return {" ".join(ws[j : j + k]) for j in range(len(ws) - k + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


def cosine_topk_block(
    block: np.ndarray, queries: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-batch brute-force cosine top-k: (scores, local_indices).

    block (n, d) float64, queries (q, d) float64 — one matmul per batch
    against the broadcast query matrix; callers merge per-batch top-k heaps.
    """
    bn = block / np.linalg.norm(block, axis=1, keepdims=True).clip(min=1e-12)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)
    sims = qn @ bn.T  # (q, n)
    k = min(k, sims.shape[1])
    idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    scores = np.take_along_axis(sims, idx, axis=1)
    order = np.argsort(-scores, axis=1, kind="stable")
    return np.take_along_axis(scores, order, axis=1), np.take_along_axis(idx, order, axis=1)
