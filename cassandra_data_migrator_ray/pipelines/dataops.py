"""Training-data pipelines over Ray Data: dedup, similarity search, text ops.

Orchestration shapes (scale notes per pipeline):

- exact dedup: content-hash in map_batches (vectorized) → per-batch partial
  (min id per hash) → groupby(hash) final — shuffle carries one row per
  distinct hash per batch, not one per document.
- MinHash-LSH / embedding-LSH: signatures per batch (numpy reduceat /
  matmul) → ONLY (band, band_hash, id) crosses the band shuffle (bytes/doc
  independent of band count) → bucket → candidate (id_a, id_b) pairs,
  chunked-never-silently-truncated → dedup → second pass gathers candidate
  payloads by broadcast point-lookup and verifies exactly.  The candidate
  list materializes at the driver — bounded by true near-dup density, not
  corpus size; a corpus with pathological candidate volume would need the
  gather replaced by a distributed hash-join on id.
- ANN: brute-force cosine per batch against a broadcast query matrix
  (ray.put once, ray.get per actor) → per-batch top-k candidates (q×k rows)
  → driver merges heaps.  The IVF variant buckets vectors by coarse centroid
  so each query touches nprobe buckets only.
"""

from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from cassandra_data_migrator_ray.functions.dedup import (
    cosine_topk_block,
    hamming64,
    lsh_bands,
    minhash_signatures,
    simhash64,
)
# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def dedup_exact(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_text: bool = True,
) -> ray.data.Dataset:
    """One survivor (min id) per distinct text. Returns (id_col, text_col, n_dups).

    ``carry_text=True`` (default): the text rides the shuffle and the final
    fold groups on the actual text — collision-proof.  ``carry_text=False``:
    only a 128-bit content hash (two independent 64-bit SipHash streams) +
    (min id, count) per batch crosses the exchange — the 100-TB shape, where
    shipping the corpus through a shuffle is the cost that matters — and the
    result is (id_col, n_dups) WITHOUT the text column (re-gather texts for
    the survivors separately if needed; at scale you rarely want them back).
    Collision risk at 128 bits is ~n²/2¹²⁹ (≈10⁻²⁰ at 10¹⁰ docs).
    """
    from pandas.util import hash_array

    def partial_fold(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, text_col]].copy()
        # null-aware hashing: a null text is its OWN distinct group, never
        # conflated with '' (fillna would merge them, and groupby.first's
        # NaN-skipping would then stitch values from different rows)
        isnull = batch[text_col].isna().to_numpy()
        h = hash_array(
            batch[text_col].fillna("").to_numpy(dtype=object), categorize=False
        ).astype(np.int64)
        batch["text_hash"] = np.where(isnull, np.int64(-1), h)
        batch = batch.sort_values(id_col, kind="mergesort")
        # group on (hash, TEXT) so two distinct texts colliding in one batch
        # stay separate (the 'collision-proof' claim must hold WITHIN a batch
        # too); dropna=False keeps the null-text group; positional first via
        # drop_duplicates avoids first()'s per-column NaN skipping
        keys = ["text_hash", text_col]
        batch["n_dups"] = (
            batch.groupby(keys, sort=False, dropna=False)[id_col].transform("size")
        )
        out = batch.drop_duplicates(subset=keys, keep="first")
        return out[[id_col, text_col, "text_hash", "n_dups"]]

    def final_fold(group: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of text groups (co-located by hash): every op below
        # is a C-level pandas kernel over the whole partition — no per-text
        # Python.  Grouping on (hash, text) keeps the collision guard: two
        # texts colliding on text_hash stay separate groups.
        group = group.sort_values(id_col, kind="mergesort")
        group = group.copy()
        keys = ["text_hash", text_col]
        group["n_dups"] = group.groupby(keys, sort=False, dropna=False)[
            "n_dups"
        ].transform("sum")
        out = group.drop_duplicates(subset=keys, keep="first")
        return out[[id_col, text_col, "n_dups"]]

    if carry_text:
        return (
            ds.map_batches(partial_fold, batch_format="pandas")
            .map_batches(_tag_part_cols(["text_hash"]), batch_format="pyarrow")
            .groupby("__p")
            .map_groups(final_fold, batch_format="pandas")
        )

    def partial_fold_hash(batch: pd.DataFrame) -> pd.DataFrame:
        isnull = batch[text_col].isna().to_numpy()
        txt = batch[text_col].fillna("").to_numpy(dtype=object)
        # null text is its own group, distinct from '' (sentinel hash pair)
        h1 = np.where(
            isnull, np.int64(-1), hash_array(txt, categorize=False).astype(np.int64)
        )
        h2 = np.where(
            isnull,
            np.int64(-2),
            hash_array(txt, hash_key="b8f327e51b7bce40", categorize=False).astype(
                np.int64
            ),
        )
        part = pd.DataFrame(
            {"h1": h1, "h2": h2, id_col: batch[id_col].to_numpy()}
        ).sort_values(id_col, kind="mergesort")
        g = part.groupby(["h1", "h2"], sort=False, as_index=False)
        out = g.first()
        out["n_dups"] = g.size()["size"].to_numpy()
        return out

    def final_fold_hash(group: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of (h1, h2) groups — C-level groupby within
        group = group.sort_values(id_col, kind="mergesort")
        g = group.groupby(["h1", "h2"], sort=False, as_index=False)
        out = g.first()[[id_col]]
        out["n_dups"] = g["n_dups"].sum()["n_dups"].to_numpy(np.int64)
        return out

    return (
        ds.map_batches(partial_fold_hash, batch_format="pandas")
        .map_batches(_tag_part_cols(["h1", "h2"]), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(final_fold_hash, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

# per-pipeline run stats (bucket truncation is NEVER silent — counts land
# here and in a logging.warning); tests and callers can inspect after a run
LAST_RUN_STATS: dict[str, dict] = {}

_log = logging.getLogger(__name__)


def _require_nonneg_ids(ids: np.ndarray, id_col: str) -> None:
    """Near-dup pipelines encode truncation metrics as id = -1 rows; negative
    real ids would be silently reclassified as metrics — reject them."""
    if len(ids) and (np.asarray(ids) < 0).any():
        raise ValueError(
            f"near-dup pipelines require non-negative {id_col} values "
            "(negative ids collide with internal metric-row sentinels)"
        )


def _bucket_candidate_pairs(
    group: pd.DataFrame, id_col: str, max_bucket: int
) -> pd.DataFrame:
    """One LSH bucket → candidate (id_a, id_b) pairs, id-sorted.

    Oversized buckets are processed in consecutive chunks of ``max_bucket``
    (sorted by id) instead of silently truncating; the count of cross-chunk
    pairs NOT generated is emitted as a metric row (id_a = -1, id_b = count)
    so the driver can surface recall loss instead of hiding it.
    """
    ids = np.unique(group[id_col].to_numpy())
    n = len(ids)
    if n < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                             "id_b": pd.Series([], dtype=np.int64)})
    frames = []
    dropped = 0
    if n <= max_bucket:
        chunks = [ids]
    else:
        chunks = [ids[i : i + max_bucket] for i in range(0, n, max_bucket)]
        total_pairs = n * (n - 1) // 2
        kept = sum(len(c) * (len(c) - 1) // 2 for c in chunks)
        dropped = total_pairs - kept
    for c in chunks:
        m = len(c)
        if m < 2:
            continue
        ii, jj = np.triu_indices(m, k=1)
        frames.append(pd.DataFrame({"id_a": c[ii].astype(np.int64),
                                    "id_b": c[jj].astype(np.int64)}))
    if dropped:
        frames.append(pd.DataFrame({"id_a": np.array([-1], dtype=np.int64),
                                    "id_b": np.array([dropped], dtype=np.int64)}))
    return pd.concat(frames, ignore_index=True)


_BUCKET_NPARTS = 128


def _tag_part_cols(cols: list, nparts: int = 128):
    """Append a bounded partition id derived from one or more int64 hash/key
    columns — the partition-level-groups-only exchange shape (every
    ``groupby(__p).map_groups`` downstream sees ≤ ``nparts`` groups and
    vectorizes WITHIN the partition, instead of paying one interpreter call
    per key at data-scaling key cardinality)."""
    from cassandra_data_migrator_ray.stages.staging import _hash64 as _mix64

    def tag(t: pa.Table) -> pa.Table:
        acc = np.zeros(t.num_rows, dtype=np.uint64)
        for i, c in enumerate(cols):
            v = t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            acc ^= _mix64(v + np.int64(2 * i + 1))
        p = (acc % np.uint64(nparts)).astype(np.int64)
        return t.append_column("__p", pa.array(p))

    return tag



def _auto_lsh_params(
    n: int,
    max_bucket: int,
    threshold: float,
    n_bands_default: int = 8,
    target_recall: float = 0.9,
) -> tuple:
    """Size (bits_per_band, n_bands) for the hyperplane-LSH detector from
    the corpus count — jointly, so neither knob silently eats recall.

    bits: target expected bucket occupancy ≤ ``max_bucket // 2`` so a
    bucket fits ONE all-pairs chunk — the old rule targeted occupancy
    ~4096 against a 512-row chunk cap, which beyond ~2M vectors dropped
    ~7/8 of every bucket's pairs (logged, but still a recall cliff).
    Floor 12 preserves the small-corpus behavior every gate pins.

    bands: raising bits lowers the per-band match probability
    p_band = p^bits (p = 1 − arccos(threshold)/π, the hyperplane
    collision probability), so when bits rise above the floor the band
    count rises to keep predicted recall 1 − (1 − p_band)^bands ≥
    ``target_recall`` (capped at 32 — band rows cost n×bands on the
    shuffle, 3 ints each).  At or below the floor the default band count
    is returned unchanged."""
    occ_target = max(2, max_bucket // 2)
    bits = max(12, int(np.ceil(np.log2(max(n / occ_target, 2.0)))))
    bands = n_bands_default
    if bits > 12:
        p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
        p_band = p**bits
        if 0.0 < p_band < 1.0:
            need = int(np.ceil(np.log(1.0 - target_recall) / np.log(1.0 - p_band)))
            bands = min(32, max(n_bands_default, need))
    return bits, bands


def _bucket_segments(
    band: np.ndarray, bh: np.ndarray, ids: np.ndarray, max_bucket: int
):
    """Shared segment machinery for one PARTITION of LSH buckets: lexsort
    rows by (band, band_hash, id), drop duplicate ids within a bucket (the
    first occurrence stays, so the boundary mask remains valid), and chunk
    each bucket into consecutive ``max_bucket`` runs.

    Returns ``(kept_idx, sid, s_starts, s_sizes, dropped)``: ``kept_idx``
    maps the deduped sorted positions back to INPUT rows (for gathering
    side columns like simhash), ``sid`` the deduped sorted ids,
    ``s_starts``/``s_sizes`` the chunk segments, ``dropped`` the aggregate
    count of cross-chunk pairs not generated."""
    order = np.lexsort((ids, bh, band))
    sid, sb, sh_ = ids[order], band[order], bh[order]
    nb = np.zeros(len(sid), dtype=bool)
    nb[0] = True
    nb[1:] = (sb[1:] != sb[:-1]) | (sh_[1:] != sh_[:-1])
    keep = nb | np.r_[False, sid[1:] != sid[:-1]]
    kept_idx = order[keep]
    sid, nb = sid[keep], nb[keep]
    n = len(sid)
    starts = np.flatnonzero(nb)
    sizes = np.diff(np.r_[starts, n])
    li = np.arange(n, dtype=np.int64) - np.repeat(starts, sizes)
    ci = li // max_bucket
    sbm = nb.copy()
    sbm[1:] |= ci[1:] != ci[:-1]
    s_starts = np.flatnonzero(sbm)
    s_sizes = np.diff(np.r_[s_starts, n])
    dropped = int(
        (sizes * (sizes - 1) // 2).sum() - (s_sizes * (s_sizes - 1) // 2).sum()
    )
    return kept_idx, sid, s_starts, s_sizes, dropped


def _expand_segment_pairs(s_starts: np.ndarray, s_sizes: np.ndarray):
    """Yield (ai, bi) position-index arrays for the all-pairs expansion of
    every segment, one per SIZE CLASS (``triu_indices`` built once per
    distinct size, broadcast over that size's segments)."""
    for m in np.unique(s_sizes):
        if m < 2:
            continue
        segs = s_starts[s_sizes == m]
        ii, jj = np.triu_indices(int(m), k=1)
        yield (
            (segs[:, None] + ii[None, :]).ravel(),
            (segs[:, None] + jj[None, :]).ravel(),
        )


def _bucket_pairs_partition(
    group: pd.DataFrame, id_col: str, max_bucket: int
) -> pd.DataFrame:
    """One PARTITION of LSH buckets → candidate (id_a, id_b) pairs.

    Identical semantics to the per-bucket kernel this replaced (unique
    sorted ids per bucket, consecutive ``max_bucket`` chunks, aggregated
    dropped-cross-chunk-pairs metric row id_a=-1), but processed for ALL
    buckets of the partition in numpy: one lexsort, segment arithmetic, and
    per-SIZE-CLASS ``triu_indices`` expansion — no interpreter call per
    bucket.  (Scale lesson from the clustering rewrite: at 10^6+ buckets a
    per-group Python callback is the stage's dominant cost.)"""
    ids = group[id_col].to_numpy().astype(np.int64)
    band = group["band"].to_numpy().astype(np.int64)
    bh = group["band_hash"].to_numpy().astype(np.int64)
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
        }
    )
    if len(ids) == 0:
        return empty
    _, sid, s_starts, s_sizes, dropped = _bucket_segments(
        band, bh, ids, max_bucket
    )
    frames = [
        pd.DataFrame({"id_a": sid[ai], "id_b": sid[bi]})
        for ai, bi in _expand_segment_pairs(s_starts, s_sizes)
    ]
    if dropped:
        frames.append(
            pd.DataFrame(
                {
                    "id_a": np.array([-1], dtype=np.int64),
                    "id_b": np.array([dropped], dtype=np.int64),
                }
            )
        )
    return pd.concat(frames, ignore_index=True) if frames else empty


def _bucket_pairs_stage(
    cand_rows: ray.data.Dataset, id_col: str, max_bucket: int
) -> ray.data.Dataset:
    """(band, band_hash, id) rows → candidate pairs via ONE bounded exchange
    (≤ _BUCKET_NPARTS partition groups, buckets co-located by hash) and the
    vectorized per-partition kernel above."""
    from cassandra_data_migrator_ray.stages.staging import _hash64 as _mix64

    def tag(t: pa.Table) -> pa.Table:
        band = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        bh = t.column("band_hash").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        key = bh + np.uint64(0x9E3779B97F4A7C15) * band
        p = (_mix64(key) % np.uint64(_BUCKET_NPARTS)).astype(np.int64)
        return t.append_column("__p", pa.array(p))

    return (
        cand_rows.map_batches(tag, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(
            partial(_bucket_pairs_partition, id_col=id_col, max_bucket=max_bucket),
            batch_format="pandas",
        )
    )


def _collect_candidates(cand: ray.data.Dataset, stats_key: str) -> pd.DataFrame:
    """Materialize the deduped candidate pair list (small relative to the
    corpus) and split out truncation metric rows."""
    df = cand.to_pandas()
    if df.empty:
        LAST_RUN_STATS[stats_key] = {"pairs_candidate": 0, "pairs_dropped": 0}
        return df
    metrics = df[df["id_a"] < 0]
    df = df[df["id_a"] >= 0].drop_duplicates(ignore_index=True)
    dropped = int(metrics["id_b"].sum()) if len(metrics) else 0
    LAST_RUN_STATS[stats_key] = {
        "pairs_candidate": int(len(df)),
        "pairs_dropped": dropped,
    }
    if dropped:
        _log.warning(
            "%s: %d candidate pairs skipped in oversized LSH buckets "
            "(raise max_bucket or add bands to recover recall)",
            stats_key,
            dropped,
        )
    return df


def _dedup_pairs_distributed(
    verified: ray.data.Dataset,
    stats_key: str,
    empty: pd.DataFrame,
    count_key: str = "pairs_found",
) -> ray.data.Dataset:
    """Distributed twin of the driver-side pair dedup: the same verified pair
    can surface from several LSH bands; collapse duplicates with a second
    pair-proportional ``groupby(id_a, id_b)`` and reduce the truncation
    metric rows (id_a = -1, id_b = skipped-pair count) with a dataset sum.
    The driver only ever sees two scalars (pair count, dropped count).
    ``empty`` supplies the output schema for the no-pairs corner.

    ``count_key`` names the recorded count: call sites that dedup PRE-verify
    candidates (minhash/embedding ``collect="distributed"``) pass
    ``"pairs_candidate"`` so LAST_RUN_STATS means the same thing on the
    driver and distributed paths; post-verify callers keep ``pairs_found``.
    """
    cols = list(empty.columns)

    def _metric_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["id_a"] < 0]
        return pd.DataFrame({"dropped": np.array([m["id_b"].sum()], dtype=np.int64)})

    def _first_pair(group: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of pairs: a C-level drop_duplicates replaces the
        # per-pair interpreter call (pair duplicates across bands carry
        # identical payload columns, so keep="first" is exact)
        real = group[group["id_a"] >= 0]
        return real.drop_duplicates(subset=["id_a", "id_b"], keep="first")[cols]

    verified = verified.materialize()  # pair-proportional — two passes below
    if verified.count() == 0:
        LAST_RUN_STATS[stats_key] = {count_key: 0, "pairs_dropped": 0}
        return ray.data.from_pandas(empty)
    dropped = int(
        verified.map_batches(_metric_partial, batch_format="pandas").sum("dropped")
        or 0
    )
    out = (
        verified.map_batches(
            _tag_part_cols(["id_a", "id_b"]), batch_format="pyarrow"
        )
        .groupby("__p")
        .map_groups(_first_pair, batch_format="pandas")
        .materialize()
    )
    LAST_RUN_STATS[stats_key] = {
        count_key: int(out.count()),
        "pairs_dropped": dropped,
    }
    if dropped:
        _log.warning(
            "%s: %d candidate pairs skipped in oversized buckets "
            "(raise max_bucket to recover recall)",
            stats_key,
            dropped,
        )
    return out


_EMPTY_CAND = pd.DataFrame(
    {
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64),
    }
)


def _collect_and_verify_distributed(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    stats_key: str,
    id_col: str,
    payload_fn,
    payload_type: pa.DataType,
    score_fn,
    threshold: float,
    score_col: str,
    empty: pd.DataFrame,
    score_vec=None,
) -> ray.data.Dataset:
    """The shared ``collect="distributed"`` protocol: dedup the candidate
    pair Dataset (pair-proportional groupby, driver sees two scalars) and
    verify through the Bloom-broadcast pipeline — one implementation for
    every LSH-family detector (minhash, embedding)."""
    pairs_ds = _dedup_pairs_distributed(
        cand, stats_key, _EMPTY_CAND.copy(), count_key="pairs_candidate"
    )
    return _verify_pairs_ds(
        ds,
        pairs_ds,
        id_col,
        payload_fn,
        payload_type,
        score_fn,
        threshold,
        score_col,
        empty,
        score_vec=score_vec,
    )


def _gather_column(
    ds: ray.data.Dataset, id_col: str, value_col: str, ids: np.ndarray
) -> pd.Series:
    """Distributed point-lookup: fetch ``value_col`` for a bounded id set via
    a broadcast membership filter (ray.put once, read per task) — no shuffle,
    one column-pruned pass over the corpus."""
    import pyarrow.compute as pc

    ref = ray.put(np.asarray(sorted(int(i) for i in ids), dtype=np.int64))

    def pick(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        vs = pa.array(want, pa.int64()).cast(batch.schema.field(id_col).type)
        mask = pc.is_in(batch[id_col], value_set=vs)
        return batch.filter(mask).select([id_col, value_col])

    got = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return got.drop_duplicates(subset=[id_col]).set_index(id_col)[value_col]


def dedup_minhash_lsh(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    num_bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 64,
    verify: str = "driver",
    collect: str = "auto",
    auto_driver_max_docs: int = 2_000_000,
) -> ray.data.Dataset:
    """Verified near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Shuffle-minimal shape: stage 1 ships ONLY (band, band_hash, id) triples —
    the text never crosses the band shuffle (so bytes/doc through the exchange
    are independent of num_bands).  Candidate pairs are deduped, then verified
    exactly (hashed-shingle Jaccard).  ``verify``:

    - ``"driver"``: gather candidate texts via broadcast point-lookup and
      verify on the driver — right while the candidate set (true near-dups +
      LSH false positives) fits one process.
    - ``"distributed"``: the driver holds only the (id_a, id_b) pair list;
      shingle SETS are computed where the docs live (broadcast id filter, one
      column-pruned pass) and flow through two candidate-proportional
      ``groupby`` exchanges — attach-set-per-side, then per-pair Jaccard.
      The corpus text never moves and no text/set ever lands on the driver —
      the 100-TB verification path.

    ``collect="distributed"`` removes the last driver object: candidate
    pairs are deduped through a pair-proportional ``groupby(id_a, id_b)``
    and verified via :func:`_verify_pairs_ds` (Bloom-broadcast payload
    filter) — the pair list stays a Dataset end to end and the result can
    flow straight into ``cluster_pairs``/``dedup_apply`` without the driver
    ever holding a pair.  Implies distributed verification.

    ``collect="auto"`` sizes the route from the corpus: a plain-source
    corpus of ≤ ``auto_driver_max_docs`` rows (metadata-cheap count) takes
    the driver-collect path — at small scale the distributed route's extra
    exchanges are pure fixed overhead (3× slower at 5k docs) while the
    pair list is trivially driver-sized — and anything larger, or any
    transform-bearing lineage whose count would cost a full execution,
    escalates to ``"distributed"``.  The two routes are equality-tested.
    """
    from cassandra_data_migrator_ray.functions.dedup import _shingle_hashes

    collect = _resolve_collect(ds, collect, auto_driver_max_docs)
    if collect == "distributed":
        ds = _ensure_multipass(ds)  # bands pass + payload pass

    def sig_and_bands(batch: pd.DataFrame) -> pd.DataFrame:
        _require_nonneg_ids(batch[id_col].to_numpy(), id_col)
        sig = minhash_signatures(batch[text_col], num_perm, shingle_k)
        bands = lsh_bands(sig, num_bands)  # (n, num_bands)
        n = len(batch)
        return pd.DataFrame(
            {
                "band": np.tile(np.arange(num_bands, dtype=np.int32), n),
                "band_hash": bands.ravel(),
                id_col: np.repeat(batch[id_col].to_numpy(), num_bands),
            }
        )

    cand = _bucket_pairs_stage(
        ds.map_batches(sig_and_bands, batch_format="pandas"),
        id_col,
        max_bucket,
    )
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "jaccard": pd.Series([], dtype=np.float64),
        }
    )
    if collect == "distributed":
        return _collect_and_verify_distributed(
            ds,
            cand,
            "minhash_lsh",
            id_col,
            _jaccard_payload_fn(text_col, shingle_k),
            pa.list_(pa.int64()),
            _jaccard_score,
            threshold,
            "jaccard",
            empty,
            score_vec=_jaccard_score_vec,
        )
    pairs = _collect_candidates(cand, "minhash_lsh")
    if pairs.empty:
        return ray.data.from_pandas(empty)
    if verify == "distributed":
        return _verify_pairs_distributed(
            ds,
            pairs,
            id_col,
            _jaccard_payload_fn(text_col, shingle_k),
            pa.list_(pa.int64()),
            _jaccard_score,
            threshold,
            "jaccard",
            empty,
            score_vec=_jaccard_score_vec,
        )

    need = np.unique(np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]))
    texts = _gather_column(ds, id_col, text_col, need)

    # fully vectorized verify (no per-pair Python loop): hashed shingle set
    # per candidate doc (one reduceat pass), then ONE global lexsort of the
    # per-pair set concatenation — adjacent equal values within a pair are
    # exactly the intersections, counted with a bincount
    hashes, offsets = _shingle_hashes(texts.fillna("").astype(str), shingle_k)
    # per-doc unique sorted hash segments via ONE global (doc, hash) lexsort
    doc_of = np.repeat(
        np.arange(len(texts), dtype=np.int64), np.diff(offsets)
    )
    order = np.lexsort((hashes, doc_of))
    h_s, d_s = hashes[order], doc_of[order]
    if len(h_s):
        keep_m = np.r_[True, (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])]
        uhashes, ud = h_s[keep_m], d_s[keep_m]
    else:
        uhashes, ud = h_s, d_s
    sizes = np.bincount(ud, minlength=len(texts)).astype(np.int64)
    uoff = np.r_[np.int64(0), np.cumsum(sizes)]
    a_ids = pairs["id_a"].to_numpy()
    b_ids = pairs["id_b"].to_numpy()
    idx = pd.Index(texts.index)
    ra = idx.get_indexer(a_ids)  # -1 = doc missing from the corpus
    rb = idx.get_indexer(b_ids)
    jac = _jaccard_vectorized(uhashes, uoff, sizes, ra, rb)
    ok = jac >= threshold
    out = pd.DataFrame(
        {
            "id_a": a_ids[ok],
            "id_b": b_ids[ok],
            "jaccard": jac[ok],
        }
    )
    return ray.data.from_pandas(out if len(out) else empty)


def _attach_payload_partition(group: pd.DataFrame) -> pd.DataFrame:
    """One PARTITION of docs (co-located by doc hash): attach each doc's
    payload row (id_a = -1) to every pair-side row referencing it via ONE
    C-level left merge — payload rows with no sides (Bloom false positives,
    unpaired docs) drop; sides whose doc is missing from the corpus keep a
    null payload (scored -inf downstream).  Replaces a per-doc
    groupby().map_groups (one interpreter call per candidate doc)."""
    m = group["id_a"] < 0
    sides = group.loc[~m, ["doc", "id_a", "id_b"]]
    if sides.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "payload": pd.Series([], dtype=object),
            }
        )
    pay = group.loc[m, ["doc", "payload"]].drop_duplicates("doc")
    out = sides.merge(pay, on="doc", how="left")
    return out[["id_a", "id_b", "payload"]]


def _make_pair_score_partition(
    score_fn, threshold: float, score_col: str, score_vec=None
):
    """One PARTITION of pairs (two side rows each, co-located by pair
    hash): sort, segment, and score.  ``score_vec(list_a, list_b) ->
    np.ndarray`` is the optional vectorized scorer (payload lists may hold
    None for missing docs — those pairs must score -inf); without it the
    generic ``score_fn`` runs per pair INSIDE the partition, which is still
    orders of magnitude cheaper than one map_groups call per pair."""

    def pair_score(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                score_col: pd.Series([], dtype=np.float64),
            }
        )
        if group.empty:
            return empty
        group = group.sort_values(["id_a", "id_b"], kind="mergesort")
        a = group["id_a"].to_numpy(np.int64)
        b = group["id_b"].to_numpy(np.int64)
        payload = group["payload"].to_numpy(dtype=object)
        nbound = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(nbound)
        sizes = np.diff(np.r_[starts, len(a)])
        # a well-formed pair has exactly its two side rows; anything else
        # (side lost, triplicate) scores -inf like the per-group original
        ok2 = sizes == 2
        s2 = starts[ok2]
        pa_list = [payload[i] for i in s2]
        pb_list = [payload[i + 1] for i in s2]
        if score_vec is not None:
            scores = np.asarray(score_vec(pa_list, pb_list), dtype=np.float64)
        else:
            scores = np.array(
                [
                    (
                        -np.inf
                        if x is None or y is None
                        else score_fn(x, y)
                    )
                    for x, y in zip(pa_list, pb_list)
                ],
                dtype=np.float64,
            )
        keep = scores >= threshold
        return pd.DataFrame(
            {
                "id_a": a[s2][keep],
                "id_b": b[s2][keep],
                score_col: scores[keep],
            }
        )

    return pair_score


def _jaccard_score_vec(pa_list, pb_list) -> np.ndarray:
    """Vectorized pair scorer for the distributed verify: payloads are the
    per-doc UNIQUE sorted shingle-hash arrays (None = doc missing → -inf,
    matching the per-pair scorer)."""
    n = len(pa_list)
    segs: list[np.ndarray] = []
    ra = np.empty(n, dtype=np.int64)
    rb = np.empty(n, dtype=np.int64)
    missing = np.zeros(n, dtype=bool)
    for i, (x, y) in enumerate(zip(pa_list, pb_list)):
        if x is None or y is None:
            ra[i] = rb[i] = -1
            missing[i] = True
            continue
        ra[i] = len(segs)
        segs.append(np.asarray(x, dtype=np.int64))
        rb[i] = len(segs)
        segs.append(np.asarray(y, dtype=np.int64))
    sizes = np.fromiter((len(t) for t in segs), dtype=np.int64, count=len(segs))
    uoff = np.r_[np.int64(0), np.cumsum(sizes)]
    uh = np.concatenate(segs) if segs else np.empty(0, dtype=np.int64)
    out = _jaccard_vectorized(uh, uoff, sizes, ra, rb)
    out[missing] = -np.inf
    return out


def _cosine_score_vec(pa_list, pb_list) -> np.ndarray:
    """Vectorized pair scorer for the embedding verify: payloads are the
    NORMALIZED vectors; one stacked einsum row-dot (None = missing → -inf)."""
    n = len(pa_list)
    out = np.full(n, -np.inf, dtype=np.float64)
    ok = [i for i in range(n) if pa_list[i] is not None and pb_list[i] is not None]
    if ok:
        A = np.vstack([np.asarray(pa_list[i], dtype=np.float64) for i in ok])
        B = np.vstack([np.asarray(pb_list[i], dtype=np.float64) for i in ok])
        out[np.asarray(ok)] = np.einsum("ij,ij->i", A, B)
    return out


def _attach_and_score(
    union_ds: ray.data.Dataset,
    score_fn,
    threshold: float,
    score_col: str,
    score_vec=None,
) -> ray.data.Dataset:
    """Shared tail of the distributed verifies: two bounded exchanges — docs
    co-located by doc hash for the payload attach merge, then pairs
    co-located by (id_a, id_b) hash for the segment scorer.  ≤ 128 groups
    per exchange regardless of candidate count."""

    tag_pairs = _tag_part_cols(["id_a", "id_b"])  # built once, not per batch

    return (
        union_ds.map_batches(_tag_part_cols(["doc"]), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(_attach_payload_partition, batch_format="pandas")
        .map_batches(tag_pairs, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(
            _make_pair_score_partition(score_fn, threshold, score_col, score_vec),
            batch_format="pandas",
        )
    )


def _verify_pairs_distributed(
    ds: ray.data.Dataset,
    pairs: pd.DataFrame,
    id_col: str,
    payload_fn,
    payload_type: pa.DataType,
    score_fn,
    threshold: float,
    score_col: str,
    empty: pd.DataFrame,
    score_vec=None,
) -> ray.data.Dataset:
    """Distributed exact verification of candidate (id_a, id_b) pairs.

    Generic over the per-doc payload (hashed shingle set, normalized vector,
    …) and the pair score.  Pipeline — all stages candidate-proportional; the
    corpus payload column never shuffles and nothing row-level lands on the
    driver:

    1. ``payload_fn(picked_batch) -> list`` computes payloads for candidate
       docs only (broadcast id filter via ray.put, one column-pruned pass);
    2. union(payload-rows, pair-side-rows) → ``groupby(doc)`` attaches each
       doc's payload to every pair side referencing it;
    3. ``groupby(id_a, id_b)`` meets a pair's two sides →
       ``score_fn(payload_a, payload_b)`` → threshold filter.
    """
    need = np.unique(
        np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()])
    )
    ref = ray.put(need.astype(np.int64))

    def doc_payloads(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        want = pa.array(ray.get(ref), pa.int64()).cast(batch.schema.field(id_col).type)
        picked = batch.filter(pc.is_in(batch[id_col], value_set=want))
        payloads = payload_fn(picked)
        n = len(picked)
        return pa.table(
            {
                "doc": picked[id_col].cast(pa.int64()),
                "id_a": pa.array(np.full(n, -1, dtype=np.int64)),
                "id_b": pa.array(np.full(n, -1, dtype=np.int64)),
                "payload": pa.array(payloads, payload_type),
            }
        )

    payload_ds = ds.map_batches(doc_payloads, batch_format="pyarrow")

    side = pa.table(
        {
            "doc": pa.array(
                np.concatenate(
                    [pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]
                ).astype(np.int64)
            ),
            "id_a": pa.array(np.tile(pairs["id_a"].to_numpy(), 2).astype(np.int64)),
            "id_b": pa.array(np.tile(pairs["id_b"].to_numpy(), 2).astype(np.int64)),
            "payload": pa.nulls(2 * len(pairs), payload_type),
        }
    )

    out = _attach_and_score(
        payload_ds.union(ray.data.from_arrow(side)),
        score_fn,
        threshold,
        score_col,
        score_vec,
    )
    got = out.to_pandas()
    return ray.data.from_pandas(got if len(got) else empty)


def _bloom_hashes(ids: np.ndarray, m_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """Two independent splitmix64-style probe positions per int64 id."""
    x = ids.astype(np.int64).view(np.uint64)
    h1 = x * np.uint64(0x9E3779B97F4A7C15)
    h1 ^= h1 >> np.uint64(31)
    h2 = (x + np.uint64(0x165667B19E3779F9)) * np.uint64(0xC2B2AE3D27D4EB4F)
    h2 ^= h2 >> np.uint64(29)
    mask = np.uint64(m_bits - 1)
    return (h1 & mask).astype(np.int64), (h2 & mask).astype(np.int64)


def _bloom_member(bits: np.ndarray, ids: np.ndarray, m_bits: int) -> np.ndarray:
    h1, h2 = _bloom_hashes(ids, m_bits)
    got1 = (bits[h1 >> 3] >> (h1 & 7).astype(np.uint8)) & 1
    got2 = (bits[h2 >> 3] >> (h2 & 7).astype(np.uint8)) & 1
    return (got1 & got2).astype(bool)


def _bloom_from_pairs(
    pairs: ray.data.Dataset, n_pairs: int
) -> tuple[np.ndarray, int]:
    """Bloom filter over every id referenced by the pair Dataset, built
    WITHOUT collecting the pairs: each pair batch emits its (deduped) probe
    positions; the driver streams position batches and ORs bits into a
    fixed-size bitmap.  Driver memory is the bitmap (2 bytes/id at the
    sizing below, capped at 256 MiB); a false positive only costs one
    wasted payload row, dropped at the attach groupby — never a wrong
    result."""
    n_ids = max(2 * n_pairs, 1)
    m_bits = 1 << int(np.clip(int(np.ceil(np.log2(16.0 * n_ids))), 16, 31))
    bits = np.zeros(m_bits // 8, dtype=np.uint8)

    def probe_positions(t: pa.Table) -> pa.Table:
        ids = np.unique(
            np.concatenate(
                [
                    t["id_a"].to_numpy(zero_copy_only=False),
                    t["id_b"].to_numpy(zero_copy_only=False),
                ]
            ).astype(np.int64)
        )
        h1, h2 = _bloom_hashes(ids, m_bits)
        pos = np.unique(np.concatenate([h1, h2]))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    for b in pairs.map_batches(
        probe_positions, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        pos = b["pos"].to_numpy()
        np.bitwise_or.at(
            bits, pos >> 3, (np.uint8(1) << (pos & 7).astype(np.uint8))
        )
    return bits, m_bits


def _verify_pairs_ds(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str,
    payload_fn,
    payload_type: pa.DataType,
    score_fn,
    threshold: float,
    score_col: str,
    empty: pd.DataFrame,
    score_vec=None,
) -> ray.data.Dataset:
    """Fully distributed twin of :func:`_verify_pairs_distributed`: the
    candidate pairs stay a Dataset end to end — the driver never holds an
    (id_a, id_b) list, only a fixed-size Bloom bitmap (the 100-TB path when
    dup density makes the pair list itself large).  Reference analogue: the
    bounded record buffer of DiffJobSession.java:134-161 — nothing
    pair-proportional may accumulate in one process.

    Stages (all candidate-proportional, corpus payload never shuffles):
    1. Bloom filter of candidate ids, built by streaming probe positions;
    2. corpus pass computes payloads for Bloom-positive docs only;
    3. each pair row splits into two side rows (map_batches, stays a
       Dataset); union + ``groupby(doc)`` attaches payloads (Bloom false
       positives drop here); ``groupby(id_a, id_b)`` scores and filters.
    """
    pairs = pairs.select_columns(["id_a", "id_b"]).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return ray.data.from_pandas(empty)
    bloom_bits, m_bits = _bloom_from_pairs(pairs, n_pairs)
    ref = ray.put(bloom_bits)

    def doc_payloads(batch: pa.Table) -> pa.Table:
        bits = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        picked = batch.filter(pa.array(_bloom_member(bits, ids, m_bits)))
        payloads = payload_fn(picked)
        n = len(picked)
        return pa.table(
            {
                "doc": picked[id_col].cast(pa.int64()),
                "id_a": pa.array(np.full(n, -1, dtype=np.int64)),
                "id_b": pa.array(np.full(n, -1, dtype=np.int64)),
                "payload": pa.array(payloads, payload_type),
            }
        )

    def pair_sides(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc": pa.array(np.concatenate([a, b])),
                "id_a": pa.array(np.tile(a, 2)),
                "id_b": pa.array(np.tile(b, 2)),
                "payload": pa.nulls(2 * len(a), payload_type),
            }
        )

    out = _attach_and_score(
        ds.map_batches(doc_payloads, batch_format="pyarrow").union(
            pairs.map_batches(pair_sides, batch_format="pyarrow")
        ),
        score_fn,
        threshold,
        score_col,
        score_vec,
    ).materialize()
    if out.count() == 0:
        return ray.data.from_pandas(empty)
    return out


def _jaccard_vectorized(
    uhashes: np.ndarray,
    uoff: np.ndarray,
    sizes: np.ndarray,
    ra: np.ndarray,
    rb: np.ndarray,
) -> np.ndarray:
    """Jaccard for P pairs of doc rows in one pass, no per-pair loop.

    ``uhashes`` holds each doc's UNIQUE sorted shingle hashes concatenated
    (doc row j occupies ``uhashes[uoff[j]:uoff[j+1]]``, ``sizes[j]`` long);
    ``ra``/``rb`` are the two doc rows per pair (−1 = doc missing from the
    corpus → jaccard 0, matching the loop this replaced).  Both pair-side
    segments are gathered with the repeat-offset trick, lexsorted by
    (pair, value) once, and adjacent equal values within a pair — each side
    is already unique — are exactly the intersections, counted per pair
    with a bincount.  Memory and time are pair-set-size proportional, the
    same work the old loop touched one pair at a time."""
    n_pairs = len(ra)
    if sizes.size == 0:
        # no doc payloads at all → every pair references a missing doc
        # (review finding: the eager np.where index crashed on the empty
        # sizes array where the per-pair loop scored these 0.0)
        return np.zeros(n_pairs, dtype=np.float64)
    present = (ra >= 0) & (rb >= 0)
    la = np.where(ra >= 0, sizes[np.clip(ra, 0, None)], 0)
    lb = np.where(rb >= 0, sizes[np.clip(rb, 0, None)], 0)

    def seg_take(rows: np.ndarray, lens: np.ndarray):
        starts = np.where(rows >= 0, uoff[np.clip(rows, 0, None)], 0)
        total = int(lens.sum())
        if total == 0:
            return (
                np.empty(0, dtype=uhashes.dtype),
                np.empty(0, dtype=np.int64),
            )
        out_start = np.r_[np.int64(0), np.cumsum(lens)][:-1]
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_start, lens)
            + np.repeat(starts, lens)
        )
        return uhashes[pos], np.repeat(np.arange(n_pairs, dtype=np.int64), lens)

    va, pa_of_a = seg_take(ra, np.where(present, la, 0))
    vb, pa_of_b = seg_take(rb, np.where(present, lb, 0))
    v = np.concatenate([va, vb])
    p = np.concatenate([pa_of_a, pa_of_b])
    if len(v):
        order = np.lexsort((v, p))
        v, p = v[order], p[order]
        dup = (v[1:] == v[:-1]) & (p[1:] == p[:-1])
        inter = np.bincount(p[1:][dup], minlength=n_pairs).astype(np.int64)
    else:
        inter = np.zeros(n_pairs, dtype=np.int64)
    union = la + lb - inter
    jac = np.zeros(n_pairs, dtype=np.float64)
    nz = present & (union > 0)
    jac[nz] = inter[nz] / union[nz]
    jac[present & (union == 0)] = 1.0  # two empty shingle sets are identical
    return jac


def _jaccard_payload_fn(text_col: str, shingle_k: int):
    from cassandra_data_migrator_ray.functions.dedup import _shingle_hashes

    def payloads(picked: pa.Table) -> list:
        texts = picked[text_col].to_pandas().fillna("").astype(str)
        hashes, offsets = _shingle_hashes(texts, shingle_k)
        return [
            np.unique(hashes[offsets[j] : offsets[j + 1]]).astype(np.int64)
            for j in range(len(texts))
        ]

    return payloads


def _jaccard_score(sa, sb) -> float:
    sa = np.asarray(sa, dtype=np.int64)
    sb = np.asarray(sb, dtype=np.int64)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / max(1, len(sa) + len(sb) - inter)


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
    collect: str = "auto",
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash banding (4×16-bit bands) + Hamming verify.

    ``collect``: the Hamming verify always runs inside the band ``groupby``;
    what remains is deduping the SAME pair surfacing from multiple bands.
    ``"driver"`` does that in one pandas pass (pair list is bounded by
    near-dup density).  ``"distributed"`` dedups through a second
    pair-proportional ``groupby(id_a, id_b)`` and reduces the truncation
    metric with a dataset ``sum`` — the driver never holds the pair list;
    the 100-TB path when near-dup density itself is large.  ``"auto"``
    picks by corpus size (see :func:`_resolve_collect`).
    """
    collect = _resolve_collect(ds, collect)

    def bands(batch: pd.DataFrame) -> pd.DataFrame:
        _require_nonneg_ids(batch[id_col].to_numpy(), id_col)
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

    def verify_partition(group: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of buckets (co-located by (band, band_hash) hash):
        # lexsort + segment arithmetic + per-size-class triu expansion, the
        # vectorized Hamming check on the expanded pairs — no interpreter
        # call per bucket (same rewrite as _bucket_pairs_partition, whose
        # chunk/dedup/metric semantics are hypothesis-pinned against the
        # per-bucket reference kernel)
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "hamming": pd.Series([], dtype=np.int64),
            }
        )
        if len(group) < 2:
            return empty
        ids = group[id_col].to_numpy().astype(np.int64)
        band_a = group["band"].to_numpy().astype(np.int64)
        bh = group["band_hash"].to_numpy().astype(np.int64)
        shv = group["simhash"].to_numpy().astype(np.int64)
        kept_idx, sid, s_starts, s_sizes, dropped = _bucket_segments(
            band_a, bh, ids, max_bucket
        )
        ssh = shv[kept_idx]
        frames = []
        for ai, bi in _expand_segment_pairs(s_starts, s_sizes):
            ham = hamming64(ssh[ai], ssh[bi])
            ok = ham <= max_hamming
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": sid[ai][ok],  # ids ascend within a segment
                        "id_b": sid[bi][ok],
                        "hamming": ham[ok].astype(np.int64),
                    }
                )
            )
        if dropped:
            frames.append(
                pd.DataFrame(
                    {
                        "id_a": np.array([-1], dtype=np.int64),
                        "id_b": np.array([dropped], dtype=np.int64),
                        "hamming": np.array([-1], dtype=np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    verified = (
        ds.map_batches(bands, batch_format="pandas")
        .map_batches(
            _tag_part_cols(["band", "band_hash"]), batch_format="pyarrow"
        )
        .groupby("__p")
        .map_groups(verify_partition, batch_format="pandas")
    )
    if collect == "distributed":
        return _dedup_pairs_distributed(
            verified,
            "simhash",
            pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            ),
        )
    pairs_df = verified.to_pandas()
    metrics = pairs_df[pairs_df["id_a"] < 0] if len(pairs_df) else pairs_df
    pairs_df = (
        pairs_df[pairs_df["id_a"] >= 0].drop_duplicates(
            subset=["id_a", "id_b"], ignore_index=True
        )
        if len(pairs_df)
        else pairs_df
    )
    dropped = int(metrics["id_b"].sum()) if len(metrics) else 0
    LAST_RUN_STATS["simhash"] = {
        "pairs_found": int(len(pairs_df)),
        "pairs_dropped": dropped,
    }
    if dropped:
        _log.warning(
            "simhash: %d candidate pairs skipped in oversized buckets "
            "(raise max_bucket to recover recall)",
            dropped,
        )
    if pairs_df.empty:
        pairs_df = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
                "hamming": pd.Series([], dtype=np.int64),
            }
        )
    return ray.data.from_pandas(pairs_df)


# --------------------------------------------------------------------------
# embedding ANN / near-dup
# --------------------------------------------------------------------------


def _is_plain_source(ds: ray.data.Dataset) -> bool:
    """True when the dataset is a bare source read (read_parquet /
    from_arrow, no transforms) — metadata ops on it (count) are cheap and
    re-scans don't re-execute a transform chain.  Inspects private plan
    internals; callers must treat False as the safe answer."""
    try:
        return len(ds._logical_plan.dag.input_dependencies) == 0
    except AttributeError:
        return False


def _resolve_collect(
    ds: ray.data.Dataset, collect: str, auto_driver_max_docs: int = 2_000_000
) -> str:
    """Resolve ``collect="auto"`` for the near-dup detectors: a plain-source
    corpus of ≤ ``auto_driver_max_docs`` rows (metadata-cheap count) takes
    the driver-collect route — at small scale the distributed route's extra
    exchanges are pure fixed overhead (measured 3× at 5k docs) while the
    pair list is trivially driver-sized; anything larger, or any transform-
    bearing lineage whose count would cost a full execution, escalates to
    ``"distributed"``."""
    if collect != "auto":
        return collect
    n = ds.count() if _is_plain_source(ds) else None
    return (
        "driver" if n is not None and n <= auto_driver_max_docs else "distributed"
    )


def _ensure_multipass(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Prepare a dataset for a MULTI-PASS algorithm: a transform-bearing
    lineage is materialized once (else every pass re-executes the chain);
    a plain source read (read_parquet / from_arrow, no transforms) is
    returned as-is — re-scans are cheap and pinning a 100-TB corpus in the
    object store is the anti-pattern.  Falls back to pinning if the plan
    internals ever move."""
    if _is_plain_source(ds):
        return ds
    return ds.materialize()


def ann_topk(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
    merge: str = "auto",
) -> pd.DataFrame:
    """Exact brute-force cosine top-k: (query_id, rank, vec_id, score).

    The query matrix is broadcast via ray.put; each batch does one matmul and
    emits q×k candidate rows.  ``merge`` picks the reduction: ``"driver"``
    (heap merge of the q × blocks × k candidate frame on the driver — right
    for small query sets), ``"distributed"`` (``groupby(qi).map_groups`` —
    the candidate shuffle is distributed and the driver only ever sees the
    final q × k rows, the shape for 10^5+ query workloads), or ``"auto"``
    (distributed from 256 queries up).
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

    cand_ds = ds.map_batches(per_batch, batch_format="pandas")
    if merge == "auto":
        merge = "distributed" if queries.shape[0] >= 256 else "driver"
    if merge == "distributed":
        return _merge_topk_distributed(cand_ds, k, id_col, query_ids)
    cand = cand_ds.to_pandas()
    # deterministic driver-side merge (candidate set is q × batches × k)
    return _merge_topk(cand, k, id_col, query_ids)


def _merge_topk_distributed(
    cand_ds: ray.data.Dataset, k: int, id_col: str, query_ids: np.ndarray | None
) -> pd.DataFrame:
    """Per-query top-k as a distributed groupby — the candidate rows are
    shuffled by query id and reduced in parallel; the driver materializes
    only the final q × k result frame."""

    def head_k(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        top = g.head(k).reset_index(drop=True)
        top["rank"] = np.arange(len(top), dtype=np.int64)
        return top

    top = cand_ds.groupby("qi").map_groups(head_k, batch_format="pandas").to_pandas()
    top = top.sort_values(["qi", "rank"], ignore_index=True)
    qid = (
        query_ids[top["qi"].to_numpy()]
        if query_ids is not None
        else top["qi"].to_numpy()
    )
    return pd.DataFrame(
        {
            "query_id": qid.astype(np.int64),
            "rank": top["rank"].astype(np.int64),
            id_col: top[id_col].astype(np.int64),
            "score": top["score"],
        }
    )


def _merge_topk(
    cand: pd.DataFrame, k: int, id_col: str, query_ids: np.ndarray | None
) -> pd.DataFrame:
    """Deterministic driver-side merge of per-batch top-k candidate rows."""
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


def _hash_sample(
    ds: ray.data.Dataset, id_col: str, train_sample: int
) -> pd.DataFrame:
    """Unbiased hash-of-id sample of ~``train_sample`` rows: one counted
    pass + one broadcast-free filter pass (``limit()`` would sample only the
    first blocks).  Shared by the IVF coarse trainer and the PQ codebook
    trainer so an index build draws its sample exactly once."""
    total = max(1, ds.count())
    frac = min(1.0, train_sample / total)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.uint64)
        h = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)  # top 24 bits
        return batch[h < np.uint64(frac * (1 << 24))]

    sample = ds.map_batches(pick, batch_format="pandas").to_pandas()
    if len(sample) == 0:
        sample = ds.limit(min(train_sample, total)).to_pandas()
    # block arrival order is nondeterministic (cluster size / parallelism
    # change it) and kmeans init is order-sensitive — sort so the SAME
    # corpus always trains the SAME index, whatever executed the sample
    return sample.sort_values(id_col, kind="mergesort", ignore_index=True)


def _train_ivf_centroids(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    train_sample: int,
    refine_iters: int,
    sample: pd.DataFrame | None = None,
) -> np.ndarray:
    """Coarse-centroid training: unbiased hash-of-id sample → kmeans_lite →
    optional distributed Lloyd refinement.  Returns L2-normalized (C, d)."""
    from cassandra_data_migrator_ray.functions.similarity import (
        kmeans_lite,
        kmeans_refine_distributed,
    )

    if sample is None:
        sample = _hash_sample(ds, id_col, train_sample)
    sv = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
    sv /= np.linalg.norm(sv, axis=1, keepdims=True).clip(min=1e-12)
    cents = kmeans_lite(sv, n_centroids)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    if refine_iters > 0:
        # refined centroids stay un-normalized (cluster means), matching the
        # inline-training behavior — cosine assignment is scale-sensitive
        # only through argmax ties, and probe/assign must agree between the
        # index-building and index-loading paths (load re-normalizes both)
        cents = kmeans_refine_distributed(
            ds, cents, vec_col=vec_col, iters=refine_iters
        )
    return cents


def build_ivf_index(
    ds: ray.data.Dataset,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 32,
    train_sample: int = 4096,
    refine_iters: int = 2,
    materialize: "str | bool" = "auto",
) -> np.ndarray:
    """Train the IVF coarse-centroid index ONCE and persist it (a single
    parquet file: one row per centroid, params in the file metadata) — the
    train-once / query-many shape.  ``ann_topk_ivf(..., index=path)`` then
    scans the corpus exactly once per query set.  Returns the centroids."""
    import json

    import pyarrow.parquet as pq

    if materialize == "auto":
        ds = _ensure_multipass(ds)
    elif materialize:
        ds = ds.materialize()
    cents = _train_ivf_centroids(
        ds, vec_col, id_col, n_centroids, train_sample, refine_iters
    )
    meta = {
        "n_centroids": int(cents.shape[0]),
        "dim": int(cents.shape[1]),
        "vec_col": vec_col,
        "refine_iters": int(refine_iters),
        "train_sample": int(train_sample),
        "metric": "cosine",
    }
    tbl = pa.table(
        {
            "centroid_id": pa.array(np.arange(len(cents), dtype=np.int64)),
            "vector": pa.array(list(cents), pa.list_(pa.float64())),
        }
    ).replace_schema_metadata({b"ivf_index_meta": json.dumps(meta).encode()})
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    import os

    os.replace(tmp, path)
    return cents


def load_ivf_index(path: str) -> np.ndarray:
    """Centroid matrix from a :func:`build_ivf_index` file (row order =
    centroid_id)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    order = np.argsort(tbl["centroid_id"].to_numpy())
    return np.vstack(tbl["vector"].to_numpy(zero_copy_only=False)[order]).astype(
        np.float64
    )


def ann_topk_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
    n_centroids: int = 32,
    nprobe: int = 8,
    train_sample: int = 4096,
    refine_iters: int = 0,
    merge: str = "auto",
    materialize: "str | bool" = "auto",
    index: "str | np.ndarray | None" = None,
) -> pd.DataFrame:
    """IVF (inverted-file) cosine top-k — the bucketed scale path.

    Coarse centroids are initialized with kmeans_lite over an UNBIASED
    hash-of-id sample (a broadcast membership-free filter — ``limit()`` would
    sample only the first blocks) and optionally refined with
    ``refine_iters`` distributed Lloyd passes (one ``map_batches`` per pass;
    the driver reduces blocks × C partial-sum rows, never vectors —
    ``functions/similarity.py kmeans_refine_distributed``).  Centroids are
    broadcast once (ray.put); each batch assigns its vectors and scores only
    rows whose centroid is among a query's ``nprobe`` closest — scan fraction
    ~nprobe/n_centroids per query.  nprobe == n_centroids degenerates to
    exact brute force; clustered real embeddings need far lower nprobe than
    random gaussians.

    ``merge``: candidate reduction — ``"driver"``, ``"distributed"``
    (groupby(qi), driver sees only the final q × k rows) or ``"auto"``
    (distributed from 256 queries).  ``materialize``: ``"auto"`` pins only
    transform-bearing lineages, never plain source reads (see body).

    ``index``: a prebuilt coarse-centroid index (path from
    :func:`build_ivf_index`, or the centroid matrix itself) — the
    train-once / query-many shape.  With an index, training is skipped
    entirely and the corpus gets exactly ONE pass (no count, no sample, no
    multi-pass pinning).
    """
    queries = np.asarray(queries, dtype=np.float64)
    if queries.ndim == 1:
        queries = queries[None, :]
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)

    if index is not None:
        cents = load_ivf_index(index) if isinstance(index, str) else np.asarray(
            index, dtype=np.float64
        )
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    else:
        # IVF is then a multi-pass algorithm (count+sample, refine × k,
        # score).  ``materialize="auto"``: a SOURCE dataset (plain
        # read_parquet / from_arrow, no transform lineage) is NOT pinned —
        # re-scans are cheap and pinning a 100-TB corpus in the object store
        # is exactly the wrong move at scale; a transform-bearing lineage IS
        # materialized once so the chain isn't re-executed per pass.  Pass
        # True/False to override.
        if materialize == "auto":
            ds = _ensure_multipass(ds)
        elif materialize:
            ds = ds.materialize()
        cents = _train_ivf_centroids(
            ds, vec_col, id_col, n_centroids, train_sample, refine_iters
        )

    # probe list per query: nprobe nearest centroids by cosine
    qc = qn @ cents.T  # (nq, C)
    np_eff = min(nprobe, cents.shape[0])
    probe_idx = np.argpartition(-qc, np_eff - 1, axis=1)[:, :np_eff]
    probe_mask = np.zeros((qn.shape[0], cents.shape[0]), dtype=bool)
    np.put_along_axis(probe_mask, probe_idx, True, axis=1)

    cref = ray.put(cents)
    qref = ray.put(qn)
    mref = ray.put(probe_mask)

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cref)
        q = ray.get(qref)
        mask = ray.get(mref)
        vecs = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True).clip(min=1e-12)
        assign = (vn @ c.T).argmax(1)  # (n,)
        sims = q @ vn.T  # (nq, n)
        sims = np.where(mask[:, assign], sims, -np.inf)
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        scores = np.take_along_axis(sims, idx, axis=1)
        ids = batch[id_col].to_numpy()[idx]
        nq = q.shape[0]
        out = pd.DataFrame(
            {
                "qi": np.repeat(np.arange(nq, dtype=np.int64), kk),
                "score": scores.ravel(),
                id_col: ids.ravel().astype(np.int64),
            }
        )
        return out[np.isfinite(out["score"].to_numpy())]

    cand_ds = ds.map_batches(per_batch, batch_format="pandas")
    # same reduction policy as brute-force ann_topk: the candidate shuffle
    # goes distributed from 256 queries up so the driver only ever holds the
    # final q × k frame
    if merge == "auto":
        merge = "distributed" if qn.shape[0] >= 256 else "driver"
    if merge == "distributed":
        return _merge_topk_distributed(cand_ds, k, id_col, query_ids)
    return _merge_topk(cand_ds.to_pandas(), k, id_col, query_ids)


# --------------------------------------------------------------------------
# IVF-PQ: compact-code ANN (the billion-vector path)
# --------------------------------------------------------------------------


def build_ivfpq_index(
    ds: ray.data.Dataset,
    path: str | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 32,
    m: int = 8,
    ksub: int = 256,
    train_sample: int = 4096,
    refine_iters: int = 0,
    normalize: bool = True,
    materialize: "str | bool" = "auto",
) -> tuple[np.ndarray, np.ndarray]:
    """Train an IVF-PQ index: coarse centroids (same trainer as IVF) plus
    per-subspace PQ codebooks, both from one unbiased hash-of-id sample.

    Codebooks quantize the (optionally normalized) vectors DIRECTLY, not
    coarse residuals — simpler, and exact on any corpus whose vectors sit on
    codebook points; classic residual/OPQ encoding recovers a few recall
    points at the cost of per-list codebooks and is intentionally out of
    scope.  ``normalize=True`` trains/encodes on unit vectors so ADC inner
    products rank by cosine; ``False`` ranks by raw inner product.

    With ``path``, the index persists as one parquet file (centroid +
    codebook rows, params in file metadata, atomic tmp+rename) for the
    train-once / query-many shape.  Returns ``(centroids, codebooks)``."""
    import json

    import pyarrow.parquet as pq

    from cassandra_data_migrator_ray.functions.similarity import pq_train

    if materialize == "auto":
        ds = _ensure_multipass(ds)
    elif materialize:
        ds = ds.materialize()
    # ONE sample drawn for both trainers — the coarse kmeans and the PQ
    # codebooks (a second draw would re-scan the whole corpus)
    sample = _hash_sample(ds, id_col, train_sample)
    cents = _train_ivf_centroids(
        ds, vec_col, id_col, n_centroids, train_sample, refine_iters,
        sample=sample,
    )
    sv = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
    if normalize:
        sv /= np.linalg.norm(sv, axis=1, keepdims=True).clip(min=1e-12)
    books = pq_train(sv, m=m, ksub=ksub)

    if path is not None:
        meta = {
            "n_centroids": int(cents.shape[0]),
            "dim": int(cents.shape[1]),
            "m": int(m),
            "ksub": int(ksub),
            "normalize": bool(normalize),
            "vec_col": vec_col,
            "metric": "cosine" if normalize else "ip",
        }
        dsub = cents.shape[1] // m
        rows = {
            "kind": ["centroid"] * len(cents)
            + ["codebook"] * (m * books.shape[1]),
            "i": list(range(len(cents)))
            + [j for j in range(m) for _ in range(books.shape[1])],
            "t": [0] * len(cents) + list(range(books.shape[1])) * m,
            "vector": list(cents) + [books[j][t] for j in range(m) for t in range(books.shape[1])],
        }
        tbl = pa.table(
            {
                "kind": pa.array(rows["kind"]),
                "i": pa.array(rows["i"], pa.int32()),
                "t": pa.array(rows["t"], pa.int32()),
                "vector": pa.array([list(v) for v in rows["vector"]], pa.list_(pa.float64())),
            }
        ).replace_schema_metadata({b"ivfpq_index_meta": json.dumps(meta).encode()})
        assert dsub == books.shape[2]
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return cents, books


def load_ivfpq_index(path: str) -> tuple[np.ndarray, np.ndarray, dict]:
    """(centroids, codebooks, meta) from a :func:`build_ivfpq_index` file."""
    import json

    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    meta = json.loads(tbl.schema.metadata[b"ivfpq_index_meta"].decode())
    df = tbl.to_pandas()
    cd = df[df["kind"] == "centroid"].sort_values("i")
    cents = np.vstack(cd["vector"].to_numpy()).astype(np.float64)
    m, ksub = meta["m"], meta["ksub"]
    books = np.empty((m, ksub, meta["dim"] // m), dtype=np.float64)
    cb = df[df["kind"] == "codebook"]
    for j in range(m):
        sub = cb[cb["i"] == j].sort_values("t")
        books[j] = np.vstack(sub["vector"].to_numpy())
    return cents, books, meta


def encode_ivfpq(
    ds: ray.data.Dataset,
    index: "str | tuple[np.ndarray, np.ndarray]",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    normalize: bool = True,
    out_dir: str | None = None,
) -> "ray.data.Dataset | str":
    """One corpus pass → the compact code table: ``(id, centroid_id,
    codes)`` with ``codes`` an m-byte binary — m bytes per vector instead of
    8·d, the table that replaces the raw vectors at query time (a 768-dim
    float64 corpus shrinks ~768×).  Index is broadcast once (ray.put).

    With ``out_dir`` the table is written as parquet and the path returned;
    a non-empty ``out_dir`` is REFUSED — a prior run's files would
    interleave with this write's uuid-named output and a later search would
    silently score two generations of codes (the same stale-file hazard the
    dedup CLI and export_sorted guard against)."""
    from cassandra_data_migrator_ray.functions.similarity import pq_encode

    if isinstance(index, str):
        cents, books, meta = load_ivfpq_index(index)
        normalize = meta["normalize"]
    else:
        cents, books = index
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    iref = ray.put((cn, books))

    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        c, b = ray.get(iref)
        vecs = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
        if normalize:
            vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True).clip(min=1e-12)
        assign = (vecs @ c.T).argmax(1).astype(np.int32)
        codes = pq_encode(vecs, b)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy().astype(np.int64),
                "centroid_id": assign,
                "codes": [r.tobytes() for r in codes],
            }
        )

    out = ds.map_batches(enc, batch_format="pandas")
    if out_dir is not None:
        if os.path.isdir(out_dir) and os.listdir(out_dir):
            raise ValueError(
                f"encode_ivfpq: out_dir {out_dir!r} is not empty — a prior "
                "write's files would interleave with this one and search "
                "would score two generations of codes; point at a fresh dir"
            )
        out.write_parquet(out_dir)
        return out_dir
    return out


def ann_topk_ivfpq(
    codes: "ray.data.Dataset | str",
    queries: np.ndarray,
    index: "str | tuple[np.ndarray, np.ndarray]",
    k: int = 10,
    id_col: str = "vec_id",
    query_ids: np.ndarray | None = None,
    nprobe: int = 8,
    normalize: bool = True,
    merge: str = "auto",
    rerank: "ray.data.Dataset | None" = None,
    shortlist: int = 100,
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """ADC top-k over a :func:`encode_ivfpq` code table: (query_id, rank,
    id, score).

    ``rerank``: the standard PQ deployment — pass the ORIGINAL vector
    dataset and the search returns the exact-scored top-k of the
    ``shortlist``-sized ADC candidate set per query.  The shortlist ids
    (bounded: q × shortlist) are gathered through the broadcast-membership
    point-lookup (:func:`_gather_column` — one column-pruned corpus pass,
    no shuffle), so quantization error decides only which candidates enter
    the shortlist, never their final order.

    Per batch the work is a table lookup + sum per coded row (adc_scores) —
    no float vector is read; the scan input is the m-bytes-per-vector code
    table (pass the parquet dir it was written to, or the Dataset).  The
    (q, m, ksub) ADC tables and the per-query probe mask are broadcast once;
    candidate reduction reuses the ann_topk merge policy (distributed
    groupby(qi) from 256 queries, driver sees q × k rows).  Recall follows
    PQ reconstruction quality: exact when vectors sit on codebook points,
    else tune m/ksub/nprobe.

    Query-set sizing: per batch the scorer loops over queries (each
    iteration vectorized over the batch), and the broadcast ADC tables are
    q·m·ksub float64 — fine to ~10^4 queries; shard larger query workloads
    into chunks of a few thousand and union the results (each chunk is an
    independent scan of the code table)."""
    from cassandra_data_migrator_ray.functions.similarity import (
        adc_scores,
        adc_tables,
    )

    if isinstance(index, str):
        cents, books, meta = load_ivfpq_index(index)
        normalize = meta["normalize"]
    else:
        cents, books = index
    if isinstance(codes, str):
        codes = ray.data.read_parquet(codes)
    queries = np.asarray(queries, dtype=np.float64)
    if queries.ndim == 1:
        queries = queries[None, :]
    qn = (
        queries / np.linalg.norm(queries, axis=1, keepdims=True).clip(min=1e-12)
        if normalize
        else queries
    )
    cn = cents / np.linalg.norm(cents, axis=1, keepdims=True).clip(min=1e-12)
    qc = qn @ cn.T
    np_eff = min(nprobe, cn.shape[0])
    probe_idx = np.argpartition(-qc, np_eff - 1, axis=1)[:, :np_eff]
    probe_mask = np.zeros((qn.shape[0], cn.shape[0]), dtype=bool)
    np.put_along_axis(probe_mask, probe_idx, True, axis=1)
    tables = adc_tables(qn, books)  # (q, m, ksub)
    bref = ray.put((tables, probe_mask))
    m = books.shape[0]
    k_adc = max(k, shortlist) if rerank is not None else k

    def per_batch(batch: pd.DataFrame) -> pd.DataFrame:
        T, mask = ray.get(bref)
        cds = np.frombuffer(
            b"".join(batch["codes"]), dtype=np.uint8
        ).reshape(len(batch), m)
        assign = batch["centroid_id"].to_numpy()
        ids = batch[id_col].to_numpy()
        frames = []
        for qi in range(T.shape[0]):
            keep = mask[qi, assign]
            if not keep.any():
                continue
            s = adc_scores(cds[keep], T[qi])
            kept_ids = ids[keep]
            kk = min(k_adc, len(s))
            # deterministic (score desc, id asc) cut — argpartition alone
            # truncates TIED boundary scores arbitrarily, which diverges
            # from the oracle's ORDER BY s DESC, id whenever scores repeat
            # (quantized ADC scores repeat constantly); bound the lexsort
            # to the boundary-tie candidate set, not the whole batch
            part = np.argpartition(-s, kk - 1)[:kk]
            cand = np.flatnonzero(s >= s[part].min())
            order = np.lexsort((kept_ids[cand], -s[cand]))[:kk]
            top = cand[order]
            frames.append(
                pd.DataFrame(
                    {
                        "qi": np.full(kk, qi, dtype=np.int64),
                        "score": s[top],
                        id_col: kept_ids[top].astype(np.int64),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "qi": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                    id_col: pd.Series([], dtype=np.int64),
                }
            )
        return pd.concat(frames, ignore_index=True)

    cand_ds = codes.map_batches(per_batch, batch_format="pandas")
    if merge == "auto":
        merge = "distributed" if qn.shape[0] >= 256 else "driver"
    if merge == "distributed":
        adc_top = _merge_topk_distributed(cand_ds, k_adc, id_col, query_ids)
    else:
        adc_top = _merge_topk(cand_ds.to_pandas(), k_adc, id_col, query_ids)
    if rerank is None:
        return adc_top

    # exact rescoring of the bounded shortlist (q × shortlist ids): one
    # broadcast-membership pass over the original vectors, then a driver
    # matmul on shortlist-sized matrices only
    want_ids = adc_top[id_col].unique()
    vec_by_id = _gather_column(rerank, id_col, vec_col, want_ids)
    missing = np.setdiff1d(
        np.asarray(want_ids, dtype=np.int64),
        vec_by_id.index.to_numpy(dtype=np.int64),
    )
    if missing.size:
        shown = ", ".join(str(i) for i in missing[:10])
        more = f" (+{missing.size - 10} more)" if missing.size > 10 else ""
        raise ValueError(
            f"rerank dataset is missing {missing.size} shortlist id(s) "
            f"present in the code table: {shown}{more} — the code table was "
            "likely encoded from a superset of the vectors supplied for "
            "rerank, or is stale; re-run encode_ivfpq over the same corpus "
            "you pass as rerank="
        )
    qid_of = (
        (lambda qi: int(query_ids[qi]))
        if query_ids is not None
        else (lambda qi: qi)
    )
    out_frames = []
    for qi in range(qn.shape[0]):
        sub = adc_top[adc_top["query_id"] == qid_of(qi)]
        if not len(sub):
            continue
        ids = sub[id_col].to_numpy()
        mat = np.vstack(vec_by_id.loc[ids].to_numpy()).astype(np.float64)
        if normalize:
            mat = mat / np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
        s = mat @ qn[qi]
        order = np.lexsort((ids, -s))[:k]  # score desc, id asc
        out_frames.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(order), qid_of(qi), dtype=np.int64),
                    "rank": np.arange(len(order), dtype=np.int64),
                    id_col: ids[order],
                    "score": s[order],
                }
            )
        )
    if not out_frames:
        return adc_top.head(0)
    return pd.concat(out_frames, ignore_index=True)


def embedding_neardup(
    ds: ray.data.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_bands: int = 8,
    bits_per_band: int | None = None,
    max_bucket: int = 512,
    verify: str = "driver",
    collect: str = "auto",
) -> ray.data.Dataset:
    """Cosine near-dup pairs via BANDED random-hyperplane LSH + exact verify.

    ``verify="distributed"`` routes the exact-cosine check through the same
    no-payload-on-driver union+groupby machinery as minhash (the driver holds
    only the (id_a, id_b) pair list, never a vector).
    ``collect="distributed"`` keeps even the pair list off the driver: pairs
    are deduped through a pair-proportional groupby and verified via
    :func:`_verify_pairs_ds` (Bloom-broadcast vector gather) — the result
    stays a Dataset end to end.  Implies distributed verification.

    Banding (n_bands independent sign-bit buckets of bits_per_band planes)
    replaces the old single-band 8-bit scheme whose 256 global buckets grew
    linearly with the dataset.  2^bits_per_band buckets per band keeps bucket
    population ~n/4096; recall for cosine>=0.95 is 1-(1-p^b)^B with
    p = 1 - arccos(0.95)/pi ~= 0.90 → ~93% at 8x12.  Only (band, bucket, id)
    crosses the shuffle; candidate vectors are gathered in a second
    broadcast-filter pass and verified exactly.  Oversized buckets chunk
    with a logged metric row — never a silent drop.

    ``bits_per_band=None`` (default) AUTO-SIZES from the corpus count so
    expected bucket occupancy stays ~4096 regardless of scale:
    ``max(12, ceil(log2(n/4096)))`` — 12 bits to ~16M vectors, 18 bits at
    10^9.  The count is one metadata-cheap pass for parquet-backed inputs;
    pass an explicit value to skip it.
    """
    from cassandra_data_migrator_ray.functions.similarity import random_hyperplanes

    collect = _resolve_collect(ds, collect)
    if bits_per_band is None:
        # near-dup is itself multi-pass (count, bucketize, verify gather):
        # pin transform lineages once so the count pass doesn't re-execute
        # the whole chain; plain source reads stay unpinned
        ds = _ensure_multipass(ds)
        n_total = max(1, ds.count())
        bits_per_band, n_bands = _auto_lsh_params(
            n_total, max_bucket, threshold, n_bands
        )
        _log.info(
            "embedding_neardup: auto bits_per_band=%d n_bands=%d for n=%d "
            "(expected bucket occupancy ~%d)",
            bits_per_band,
            n_bands,
            n_total,
            max(1, n_total >> bits_per_band),
        )

    if collect == "distributed":
        # the bucketize pass (via cand) AND verify's vector-gather pass both
        # consume ds — pin transform lineages ONCE, BEFORE cand captures the
        # unpinned handle (else the chain re-executes for the bucket pass)
        ds = _ensure_multipass(ds)

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        _require_nonneg_ids(batch[id_col].to_numpy(), id_col)
        vecs = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
        planes = random_hyperplanes(vecs.shape[1], n_bands * bits_per_band)
        bits = (vecs @ planes.T) > 0  # (n, n_bands*bits_per_band)
        weights = 1 << np.arange(bits_per_band, dtype=np.int64)
        frames = []
        ids = batch[id_col].to_numpy()
        for b in range(n_bands):
            seg = bits[:, b * bits_per_band : (b + 1) * bits_per_band]
            frames.append(
                pd.DataFrame(
                    {
                        "band": np.full(len(ids), b, dtype=np.int32),
                        "band_hash": seg.astype(np.int64) @ weights,
                        id_col: ids,
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    cand = _bucket_pairs_stage(
        ds.map_batches(bucketize, batch_format="pandas"), id_col, max_bucket
    )
    empty = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype=np.int64),
            "id_b": pd.Series([], dtype=np.int64),
            "cosine": pd.Series([], dtype=np.float64),
        }
    )

    def vec_payloads(picked: pa.Table) -> list:
        if len(picked) == 0:
            return []
        m = np.vstack(
            picked[vec_col].to_pandas().to_numpy()
        ).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True).clip(min=1e-12)
        return list(m)

    if collect == "distributed":
        return _collect_and_verify_distributed(
            ds,
            cand,
            "embedding_neardup",
            id_col,
            vec_payloads,
            pa.list_(pa.float64()),
            lambda a, b: float(np.dot(np.asarray(a), np.asarray(b))),
            threshold,
            "cosine",
            empty,
            score_vec=_cosine_score_vec,
        )
    pairs = _collect_candidates(cand, "embedding_neardup")
    if pairs.empty:
        return ray.data.from_pandas(empty)
    if verify == "distributed":
        return _verify_pairs_distributed(
            ds,
            pairs,
            id_col,
            vec_payloads,
            pa.list_(pa.float64()),
            lambda a, b: float(np.dot(np.asarray(a), np.asarray(b))),
            threshold,
            "cosine",
            empty,
            score_vec=_cosine_score_vec,
        )

    need = np.unique(np.concatenate([pairs["id_a"].to_numpy(), pairs["id_b"].to_numpy()]))
    vecs = _gather_column(ds, id_col, vec_col, need)
    mat = np.vstack(vecs.to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    pos = {int(i): j for j, i in enumerate(vecs.index)}
    ai = np.array([pos[int(i)] for i in pairs["id_a"]], dtype=np.int64)
    bi = np.array([pos[int(i)] for i in pairs["id_b"]], dtype=np.int64)
    cos = np.einsum("ij,ij->i", mat[ai], mat[bi])
    ok = cos >= threshold
    out = pd.DataFrame(
        {
            "id_a": pairs["id_a"].to_numpy()[ok],
            "id_b": pairs["id_b"].to_numpy()[ok],
            "cosine": cos[ok],
        }
    )
    return ray.data.from_pandas(out if len(out) else empty)


# --------------------------------------------------------------------------
# dedup clustering: pairs -> connected components -> corpus filter
# --------------------------------------------------------------------------
# The near-dup detectors above emit verified PAIRS (id_a, id_b, score).
# Deduplication keeps one document per transitive CLUSTER, not per pair
# (a~b, b~c must drop two of {a,b,c} even when a~c was never emitted).


def exact_dup_pairs(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """CHAIN pairs of exact duplicates: per distinct text, consecutive
    sorted-id pairs (a1,a2),(a2,a3),...  Exercises multi-hop transitivity in
    the clustering below while staying SQL-oracle-expressible (cluster id ==
    MIN(id) OVER (PARTITION BY text)).  Same shuffle shape as
    :func:`dedup_exact` carry_text: (hash, text, id) per batch, one groupby,
    collision-guarded by grouping on the actual text inside the fold."""
    from pandas.util import hash_array

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, text_col]].copy()
        _require_nonneg_ids(batch[id_col].to_numpy(), id_col)
        isnull = batch[text_col].isna().to_numpy()
        h = hash_array(
            batch[text_col].fillna("").to_numpy(dtype=object), categorize=False
        ).astype(np.int64)
        batch["text_hash"] = np.where(isnull, np.int64(-1), h)
        return batch

    def chain(group: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of text groups: sort by (hash, text, id), segment on
        # (hash, text) change (both-null text rows compare equal), and emit
        # consecutive-id pairs per segment — fully vectorized, no per-text
        # Python.  Sorting by text inside a hash keeps the collision guard.
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
            }
        )
        if len(group) < 2:
            return empty
        group = group.sort_values(
            ["text_hash", text_col, id_col], kind="mergesort", na_position="last"
        )
        sh = group["text_hash"].to_numpy(np.int64)
        stx = group[text_col].to_numpy(dtype=object)
        sid = group[id_col].to_numpy(np.int64)
        tnull = pd.isna(group[text_col]).to_numpy()
        tdiff = stx[1:] != stx[:-1]
        tdiff &= ~(tnull[1:] & tnull[:-1])
        same_seg = (sh[1:] == sh[:-1]) & ~tdiff
        if not same_seg.any():
            return empty
        return pd.DataFrame(
            {"id_a": sid[:-1][same_seg], "id_b": sid[1:][same_seg]}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(_tag_part_cols(["text_hash"]), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(chain, batch_format="pandas")
    )


def _cc_labels_numpy(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Connected components over an edge list, fully vectorized: hash-min
    edge relaxation + pointer jumping (label = label[label]) until fixpoint —
    O((E+V)·log V) numpy passes, no per-edge Python loop.  Returns
    (nodes, cluster_id) with cluster_id = min node id of the component."""
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    eu, ev = inv[: len(a)], inv[len(a) :]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = label.copy()
        m = np.minimum(label[eu], label[ev])
        np.minimum.at(label, eu, m)
        np.minimum.at(label, ev, m)
        while True:  # collapse chains: every node points at its root
            nl = label[label]
            if np.array_equal(nl, label):
                break
            label = nl
        if np.array_equal(before, label):
            break
    return nodes, nodes[label]


def cluster_pairs(
    pairs: ray.data.Dataset,
    id_a: str = "id_a",
    id_b: str = "id_b",
    mode: str = "driver",
    max_rounds: int = 64,
    auto_driver_max_pairs: int = 5_000_000,
) -> ray.data.Dataset:
    """(node_id, cluster_id) for every node in ``pairs``; cluster_id = the
    component's minimum node id (canonical, order-independent).

    - ``mode="driver"`` (default): the pair list is collected and clustered
      with the vectorized numpy kernel — right while the pair set (bounded by
      true near-dup density, NOT corpus size) fits one process, which is the
      same regime the detectors' pair outputs already assume.
    - ``mode="distributed"``: iterative hash-min label propagation on Ray
      Data — per round, labels ride a (node ∪ edge-endpoint) groupby and each
      node adopts the min label seen across its edges; converges in
      O(component diameter) rounds (near-dup components are shallow; chain
      graphs are the worst case).  Only (node, label) and (u, v) int rows
      shuffle; nothing but per-round label sums touch the driver.
    - ``mode="auto"``: driver kernel when the pair list is a plain in-memory
      /source dataset of ≤ ``auto_driver_max_pairs`` rows (metadata-cheap
      count); label propagation otherwise — including any transform-bearing
      lineage (detector ``collect="distributed"`` output), whose count would
      cost a full execution and whose existence already signals scale.
    """
    empty = pd.DataFrame(
        {
            "node_id": pd.Series([], dtype=np.int64),
            "cluster_id": pd.Series([], dtype=np.int64),
        }
    )
    if mode == "auto":
        n = pairs.count() if _is_plain_source(pairs) else None
        mode = (
            "driver"
            if n is not None and n <= auto_driver_max_pairs
            else "distributed"
        )
    if mode == "distributed":
        return _cluster_pairs_distributed(pairs, id_a, id_b, max_rounds, empty)
    df = pairs.select_columns([id_a, id_b]).to_pandas()
    if df.empty:
        return ray.data.from_pandas(empty)
    nodes, comp = _cc_labels_numpy(
        df[id_a].to_numpy(np.int64), df[id_b].to_numpy(np.int64)
    )
    return ray.data.from_pandas(pd.DataFrame({"node_id": nodes, "cluster_id": comp}))


def _cluster_pairs_distributed(
    pairs: ray.data.Dataset,
    id_a: str,
    id_b: str,
    max_rounds: int,
    empty: pd.DataFrame,
) -> ray.data.Dataset:
    def symmetrize(t: pa.Table) -> pa.Table:
        u = pc.cast(t[id_a], pa.int64()).combine_chunks()
        v = pc.cast(t[id_b], pa.int64()).combine_chunks()
        return pa.table(
            {
                "u": pa.concat_arrays([u, v]),
                "v": pa.concat_arrays([v, u]),
            }
        )

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_pandas(empty)
    # Scale rule learned by measurement: at 10^6 nodes BOTH a per-node
    # groupby().map_groups round (one interpreter call per node) AND Ray
    # Data's native per-key aggregate (groupby("node").min — per-group
    # Python aggregation states inside the blocks) take MINUTES per pass.
    # Every step here therefore exchanges on a BOUNDED partition id
    # (≤ nparts groups) and runs numpy sort/reduceat kernels inside each
    # partition — the same partition-level-groups-only shape as the staged
    # exchange and join_by_key.
    nparts = int(max(8, min(256, n_edges // 250_000 or 8)))
    from cassandra_data_migrator_ray.stages.staging import _hash64 as _mix64

    def _tag_part(col: str):
        def tag(t: pa.Table) -> pa.Table:
            k = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
            p = (_mix64(k) % np.uint64(nparts)).astype(np.int64)
            return t.append_column("__p", pa.array(p))

        return tag

    def _fold_min(key_in: str, val_in: str, group: pd.DataFrame) -> pd.DataFrame:
        node = group[key_in].to_numpy(np.int64)
        lab = group[val_in].to_numpy(np.int64)
        order = np.lexsort((lab, node))
        sn, sl = node[order], lab[order]
        starts = np.flatnonzero(np.r_[True, sn[1:] != sn[:-1]])
        return pd.DataFrame(
            {"node": sn[starts], "label": np.minimum.reduceat(sl, starts)}
        )

    # init: label(u) = min(u, min over neighbors) — one bounded exchange
    def init_fold(group: pd.DataFrame) -> pd.DataFrame:
        out = _fold_min("u", "v", group)
        out["label"] = np.minimum(out["node"].to_numpy(), out["label"].to_numpy())
        return out

    # repartition BEFORE each materialize: the sort-shuffle's output block
    # count tracks its INPUT block count, and the per-round union feeds the
    # previous round's blocks back in — without the bound, blocks double
    # every round (measured 96 → 2016 in 5 rounds at constant 810k rows)
    # and per-block fixed costs turn the loop exponential.
    labels = (
        edges.map_batches(_tag_part("u"), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(init_fold, batch_format="pandas")
        .repartition(nparts)
        .materialize()
    )

    def as_u(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": pc.cast(t["node"], pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
            }
        )

    def proposals(t: pa.Table) -> pa.Table:
        # edge (u, v) carrying label(u): neighbor v receives the proposal
        return pa.table(
            {
                "node": pc.cast(t["v"], pa.int64()),
                "label": pc.cast(t["label"], pa.int64()),
            }
        )

    prev_sum = None
    for _ in range(max_rounds):
        # per round: one co-partitioned vectorized join (edges ⨝ labels on
        # u, partition-level pandas merge inside join_by_key) emits each
        # node's label to every neighbor, then one bounded exchange folds
        # proposals ∪ own labels with a numpy reduceat min per partition
        prop = join_by_key(
            edges,
            labels.map_batches(as_u, batch_format="pyarrow"),
            on="u",
            how="inner",
            num_partitions=nparts,
        ).map_batches(proposals, batch_format="pyarrow")
        labels = (
            labels.union(prop)
            .map_batches(_tag_part("node"), batch_format="pyarrow")
            .groupby("__p")
            .map_groups(
                partial(_fold_min, "node", "label"), batch_format="pandas"
            )
            .repartition(nparts)
            .materialize()
        )
        # labels are nonnegative and only ever DECREASE: an unchanged sum is
        # an exact convergence proof, one scalar on the driver per round
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node_id": pc.cast(t["node"], pa.int64()),
                "cluster_id": pc.cast(t["label"], pa.int64()),
            }
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def dedup_apply(
    ds: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    mode: str = "auto",
    num_partitions: int | None = None,
    auto_broadcast_max_drop: int = 10_000_000,
    auto_driver_max_pairs: int = 5_000_000,
) -> ray.data.Dataset:
    """The corpus with every non-keeper duplicate dropped: cluster the
    verified pairs, keep the min-id document of each cluster (plus every
    unpaired document), and filter the corpus.

    - ``mode="driver"``: drop ids are collected once and broadcast
      (``ray.put`` once, ``np.isin`` per batch) — the corpus never
      shuffles.  Right while the drop set (bounded by duplicate count, not
      corpus size) fits one process.
    - ``mode="distributed"``: END-TO-END distributed — clustering runs the
      label-propagation path and the apply is a hash-partitioned ANTI-JOIN
      (:func:`join_by_key` ``how="left"`` + null-marker filter, the same
      co-partitioned machinery as the reference's DiffData existence join,
      `DiffJobSession.java:134-161`): the drop ids stay a Dataset start to
      finish and the driver never holds a member or drop array.  Cost: the
      corpus shuffles once on ``id_col`` — the right trade when a
      30 %-duplicate web crawl puts billions of int64 drop ids (tens of GB)
      beyond one process.  ``num_partitions`` forwards to the join's
      exchange sizing.
    - ``mode="auto"`` (default): size-gated composition of the two.  Small
      plain pair lists take the driver route outright; otherwise clustering
      runs distributed and the apply route is picked from the DROP COUNT
      (one scalar on the driver): ≤ ``auto_broadcast_max_drop`` ids are
      gathered and broadcast (the corpus still never shuffles — 10M int64
      ids is 80 MB, trivially broadcastable), more switches to the
      anti-join.  The default is therefore safe at every scale without a
      knob: tiny jobs never pay exchange overhead, huge drop sets never
      land on the driver.
    """
    if mode == "driver":
        members = cluster_pairs(pairs, mode="driver").to_pandas()
        if members.empty:  # no pairs → nothing to drop
            return ds
        drop = members.loc[
            members["node_id"] != members["cluster_id"], "node_id"
        ].to_numpy(np.int64)
        LAST_RUN_STATS["dedup_apply"] = {
            "route": "driver_broadcast", "n_drop": int(len(drop)),
        }
        return _broadcast_drop(ds, id_col, drop)
    if mode not in ("distributed", "auto"):
        raise ValueError(f"unknown dedup_apply mode: {mode!r}")
    if mode == "auto":
        # pin the pair list once (object-store resident, spillable, bounded
        # by duplicate density — NOT driver memory) so the routing count is
        # metadata-cheap even for detector lineages, and the cluster pass
        # below never re-executes the detector chain
        if not _is_plain_source(pairs):
            pairs = pairs.materialize()
        if pairs.count() <= auto_driver_max_pairs:
            return dedup_apply(ds, pairs, id_col=id_col, mode="driver")
    drop_ds = _drop_ids_distributed(pairs, id_col)
    n_drop = drop_ds.count()
    if n_drop == 0:
        LAST_RUN_STATS["dedup_apply"] = {"route": "noop", "n_drop": 0}
        return ds
    if mode == "auto" and n_drop <= auto_broadcast_max_drop:
        drop = (
            drop_ds.select_columns([id_col])
            .to_pandas()[id_col]
            .to_numpy(np.int64)
        )
        LAST_RUN_STATS["dedup_apply"] = {
            "route": "distributed_cluster_broadcast_apply",
            "n_drop": int(n_drop),
        }
        return _broadcast_drop(ds, id_col, drop)
    LAST_RUN_STATS["dedup_apply"] = {
        "route": "distributed_anti_join", "n_drop": int(n_drop),
    }
    return _anti_join_drop(ds, drop_ds, id_col, num_partitions)


def _broadcast_drop(
    ds: ray.data.Dataset, id_col: str, drop: np.ndarray
) -> ray.data.Dataset:
    """Membership-filter apply: ``ray.put`` the sorted drop ids once, filter
    every corpus batch with ``np.isin`` — the corpus never shuffles."""
    if len(drop) == 0:
        return ds
    ref = ray.put(np.sort(drop))

    def keep(t: pa.Table) -> pa.Table:
        gone = ray.get(ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(~np.isin(ids, gone, assume_unique=False)))

    return ds.map_batches(keep, batch_format="pyarrow")


_DROP_MARKER = "__dedup_drop"


def _drop_ids_distributed(
    pairs: ray.data.Dataset, id_col: str
) -> ray.data.Dataset:
    """Non-keeper ids as a materialized Dataset (id, marker) — clustering via
    distributed label propagation; nothing but per-round label sums touch
    the driver."""

    def non_keepers(t: pa.Table) -> pa.Table:
        gone = t.filter(pc.not_equal(t["node_id"], t["cluster_id"]))
        return pa.table(
            {
                id_col: pc.cast(gone["node_id"], pa.int64()),
                _DROP_MARKER: pa.array(
                    np.ones(len(gone), dtype=np.int8), pa.int8()
                ),
            }
        )

    return (
        cluster_pairs(pairs, mode="distributed")
        .map_batches(non_keepers, batch_format="pyarrow")
        .materialize()  # bounded by duplicate count; object-store resident
    )


def _anti_join_drop(
    ds: ray.data.Dataset,
    drop_ds: ray.data.Dataset,
    id_col: str,
    num_partitions: int | None,
) -> ray.data.Dataset:
    """Anti-join apply: corpus LEFT-joins the (Dataset-resident) drop ids on
    ``id_col`` and keeps the rows whose marker came back null.  Only int
    (id, marker) rows ride the small side of the exchange; the driver sees
    no ids."""
    if _DROP_MARKER in ds.schema().names:
        raise ValueError(f"corpus already has a {_DROP_MARKER!r} column")
    orig_cols = list(ds.schema().names)
    joined = join_by_key(
        ds, drop_ds, on=id_col, how="left", num_partitions=num_partitions
    )

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t[_DROP_MARKER])).select(orig_cols)

    return joined.map_batches(keep, batch_format="pyarrow")


def dedup_near(
    ds: ray.data.Dataset,
    method: str = "minhash",
    text_col: str = "text",
    id_col: str = "doc_id",
    cluster_mode: str = "auto",
    **detector_kwargs,
) -> ray.data.Dataset:
    """Detect → cluster → apply in one call: the corpus with near-duplicates
    collapsed to one min-id survivor per transitive cluster.

    ``method``: "exact" (identical text), "minhash" (Jaccard, the default
    for text), "simhash" (Hamming), or "embedding" (cosine; then
    ``text_col``/``id_col`` default to the embeddings schema unless given).
    Detector knobs (threshold, num_perm, max_hamming, n_bands, verify, ...)
    pass through; ``cluster_mode``: ``"driver"`` (union-find + broadcast
    filter), ``"distributed"`` (label propagation + anti-join apply — no
    member/drop array ever on the driver), or ``"auto"`` (the default:
    size-gated, see :func:`dedup_apply`).  Each stage keeps its own scale
    shape: detection shuffles ids+hashes only, clustering shuffles int rows
    only, and the final filter is one broadcast membership pass or one
    corpus co-partition, picked by drop count.
    """
    if method == "exact":
        # exact pairs are born distributed (one hash groupby, no collect step)
        detector_kwargs.pop("collect", None)
        pairs = exact_dup_pairs(ds, text_col=text_col, id_col=id_col)
    elif method == "minhash":
        pairs = dedup_minhash_lsh(
            ds, text_col=text_col, id_col=id_col, **detector_kwargs
        )
    elif method == "simhash":
        pairs = dedup_simhash(ds, text_col=text_col, id_col=id_col, **detector_kwargs)
    elif method == "embedding":
        pairs = embedding_neardup(ds, id_col=id_col, **detector_kwargs)
    else:
        raise ValueError(f"unknown dedup method: {method!r}")
    return dedup_apply(ds, pairs, id_col=id_col, mode=cluster_mode)


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------


def decontaminate(
    ds: ray.data.Dataset,
    bench_texts,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "flag",
) -> ray.data.Dataset:
    """Flag (or drop) every document sharing an ``n``-token gram with any
    benchmark text — the test-set contamination scrub every training-corpus
    pipeline runs before release.

    Scale shape: benchmark sets are small by nature (they are evaluation
    suites), so the driver tokenizes them once and broadcasts (sorted gram
    hashes, gram-string set) via ``ray.put``; the corpus streams through ONE
    ``map_batches`` pass — per batch a single rolling-hash kernel
    (functions/dedup.gram_hashes_strict) + ``np.isin`` against the broadcast
    hashes.  The corpus never shuffles and never lands on the driver.  Hash
    hits are then verified by gram-STRING equality (Python loop over flagged
    docs only — bounded by contamination density), so the operator is exact,
    not probabilistic.  Docs with fewer than ``n`` tokens have no grams and
    are never flagged.

    ``mode="flag"``: Dataset of (id_col, n_matched_grams) for contaminated
    docs.  ``mode="drop"``: the corpus with contaminated docs removed (one
    broadcast membership pass, same shape as :func:`dedup_apply`)."""
    from cassandra_data_migrator_ray.functions.dedup import gram_hashes_strict

    if mode not in ("flag", "drop"):
        raise ValueError(f"mode must be 'flag' or 'drop', got {mode!r}")
    bench = pd.Series(list(bench_texts), dtype=object)
    bh, boff, bwords, bcounts = gram_hashes_strict(bench, n)
    bwoff = np.r_[np.int64(0), np.cumsum(bcounts)]
    grams: set[str] = set()
    for d in range(len(bench)):  # benchmark side: small by design
        for g in range(boff[d], boff[d + 1]):
            start = bwoff[d] + (g - boff[d])
            grams.add(" ".join(bwords[start : start + n]))
    ref = ray.put((np.unique(bh), frozenset(grams)))
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "n_matched_grams": pa.array([], pa.int64()),
        }
    )

    def flag(t: pa.Table) -> pa.Table:
        hashes, gram_set = ray.get(ref)
        texts = t[text_col].to_pandas()
        h, off, words, counts = gram_hashes_strict(texts, n)
        hit = np.isin(h, hashes)
        if not hit.any():
            return empty
        doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), np.diff(off))
        woff = np.r_[np.int64(0), np.cumsum(counts)]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        out_ids, out_counts = [], []
        for d in np.unique(doc_of[hit]):
            matched: set[str] = set()
            for g in np.flatnonzero(hit[off[d] : off[d + 1]]) + off[d]:
                start = woff[d] + (g - off[d])
                gram = " ".join(words[start : start + n])
                if gram in gram_set:  # reject ~2^-64 hash collisions
                    matched.add(gram)
            if matched:
                out_ids.append(int(ids[d]))
                out_counts.append(len(matched))
        return pa.table(
            {
                id_col: pa.array(out_ids, pa.int64()),
                "n_matched_grams": pa.array(out_counts, pa.int64()),
            }
        )

    flags = ds.map_batches(flag, batch_format="pyarrow")
    if mode == "flag":
        return flags
    bad = flags.to_pandas()  # bounded by contamination density
    if bad.empty:
        return ds
    drop_ref = ray.put(np.sort(bad[id_col].to_numpy(np.int64)))

    def keep(t: pa.Table) -> pa.Table:
        gone = ray.get(drop_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(~np.isin(ids, gone)))

    return ds.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------
# deterministic stratified sampling (training-mix construction)
# --------------------------------------------------------------------------

_SAMPLE_MULT = 2654435761  # Knuth multiplicative constant (odd → bijective mod 2^32)
_SAMPLE_MOD = 1 << 32


def sample_threshold(fraction: float) -> int:
    """Integer keep-threshold for :func:`sample_stratified` — computed once in
    exact integer arithmetic so an external oracle (SQL) using the same
    literal selects the identical row set (no float-rounding drift)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return min(_SAMPLE_MOD, int(fraction * _SAMPLE_MOD))


def sample_stratified(
    ds: ray.data.Dataset,
    fractions: dict,
    by: str = "lang",
    id_col: str = "doc_id",
    default: float = 0.0,
    seed_mult: int = _SAMPLE_MULT,
) -> ray.data.Dataset:
    """Deterministic per-stratum subsampling — the mixture-weights step of a
    training-data pipeline ("keep 50% of en, 10% of fr, drop the rest").

    Keep rule: ``(id * seed_mult) mod 2^32 < threshold(fraction[stratum])``.
    A multiplicative Weyl map, not a PRNG: the choice is a pure function of
    the row id, so reruns, retries and resumed jobs select byte-identical
    samples, and the rule is exactly expressible in SQL (HUGEINT arithmetic)
    for oracle verification.  numpy uint64 wraparound is exact here because
    (x mod 2^64) mod 2^32 == x mod 2^32.  One streaming map_batches pass:
    no shuffle, no driver materialization; the per-stratum thresholds are
    closure-captured (dict is tiny).  ``seed_mult`` must be odd (bijective
    mod 2^32) — vary it to draw an independent sample."""
    if seed_mult % 2 == 0:
        raise ValueError("seed_mult must be odd")
    thresholds = {k: sample_threshold(v) for k, v in fractions.items()}
    dflt = sample_threshold(default)
    mult = np.uint64(seed_mult % (1 << 64))

    def keep(t: pa.Table) -> pa.Table:
        raw = t[id_col].to_numpy(zero_copy_only=False)
        if len(raw) and raw.min() < 0:
            # a negative id would wrap differently in uint64 vs SQL HUGEINT
            raise ValueError(f"{id_col} must be non-negative for sampling")
        ids = raw.astype(np.uint64)
        ticket = (ids * mult) % np.uint64(_SAMPLE_MOD)
        strata = t[by].to_pandas()
        thr = strata.map(thresholds).fillna(dflt).to_numpy(dtype=np.uint64)
        return t.filter(pa.array(ticket < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


# --------------------------------------------------------------------------
# generic distributed aggregate with map-side combining
# --------------------------------------------------------------------------


def _tag_part_any(keys: list, nparts: int = 128):
    """Pandas twin of :func:`_tag_part_cols` for arbitrary-dtype group keys
    (strings included): bounded partition id via pandas hash_array."""
    from pandas.util import hash_array

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(len(df), dtype=np.uint64)
        for i, c in enumerate(keys):
            # distinct 16-char key per column (review finding: a 32-digit
            # zero-pad truncated to 16 chars was all-zeros for EVERY i, so
            # equal values in two key columns XOR-cancelled to partition 0)
            acc ^= hash_array(
                df[c].to_numpy(), hash_key=f"{2 * i + 1:016d}", categorize=False
            )
        df = df.copy()
        df["__p"] = (acc % np.uint64(nparts)).astype(np.int64)
        return df

    return tag


def agg_by_key(
    ds: ray.data.Dataset,
    keys,
    aggs: dict,
) -> ray.data.Dataset:
    """Generic distributed GROUP BY with MAP-SIDE PARTIAL COMBINING — the
    aggregation shape the bespoke queries in pipelines/queries.py use,
    lifted into one reusable operator.  ``aggs`` maps output column ->
    (input column, fn) with fn in {"sum", "count", "min", "max", "mean"};
    ``(None, "count")`` counts rows (COUNT(*)).

    Per-batch pandas groupby first reduces each batch to one row per key,
    so the shuffle carries ~distinct-keys-per-batch rows independent of
    input row count; one groupby exchange over those partials; a final
    combine per key.  Integer sums are exact and order-independent; float
    sums/means are subject to float addition order like any distributed
    engine — use scaled-integer columns (cents) where bit-stable results
    matter (the discipline queries.revenue_by_nation documents).  Rows with
    a null key are dropped (pandas groupby semantics), unlike SQL's
    NULL-is-a-group."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    ok = {"sum", "count", "min", "max", "mean"}
    for out, (col, fn) in aggs.items():
        if fn not in ok:
            raise ValueError(f"unsupported agg fn {fn!r} for {out!r}")
        if col is None and fn != "count":
            raise ValueError(f"{out!r}: only 'count' accepts column=None")

    def partial_agg(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(keys, sort=False)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                cols[f"{out}__n"] = g[col].count() if col else g.size()
            elif fn == "mean":
                cols[f"{out}__s"] = g[col].sum()
                cols[f"{out}__n"] = g[col].count()
            elif fn == "sum":
                cols[f"{out}__s"] = g[col].sum()
            else:
                cols[f"{out}__m"] = g[col].agg(fn)
        return pd.DataFrame(cols).reset_index()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of keys (co-located by key hash): a single C-level
        # groupby-agg folds every key's partials, then means derive
        spec = {}
        for out, (col, fn) in aggs.items():
            if fn in ("sum",):
                spec[f"{out}__s"] = "sum"
            elif fn == "count":
                spec[f"{out}__n"] = "sum"
            elif fn == "mean":
                spec[f"{out}__s"] = "sum"
                spec[f"{out}__n"] = "sum"
            elif fn == "min":
                spec[f"{out}__m"] = "min"
            else:
                spec[f"{out}__m"] = "max"
        folded = g.groupby(keys, sort=False, as_index=False).agg(spec)
        cols = {}
        for out, (col, fn) in aggs.items():
            if fn == "sum":
                cols[out] = folded[f"{out}__s"]
            elif fn == "count":
                cols[out] = folded[f"{out}__n"].astype(np.int64)
            elif fn == "mean":
                n = folded[f"{out}__n"]
                cols[out] = folded[f"{out}__s"] / n.where(n != 0)
            else:
                cols[out] = folded[f"{out}__m"]
        res = folded[keys].copy()
        for out in aggs:
            res[out] = cols[out]
        return res

    return (
        ds.map_batches(partial_agg, batch_format="pandas")
        .map_batches(_tag_part_any(keys), batch_format="pandas")
        .groupby("__p")
        .map_groups(combine, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# grouped top-k (window rank)
# --------------------------------------------------------------------------


def topk_by_key(
    ds: ray.data.Dataset,
    keys,
    order_col: str,
    k: int,
    descending: bool = True,
    tiebreak: str | None = None,
    rank_col: str = "rk",
) -> ray.data.Dataset:
    """The k extreme rows per key with a dense 1-based rank — the
    window-rank operator Ray Data lacks, generalized from
    queries.topk_orders_per_customer.

    Per-batch partial top-k BEFORE the shuffle (the combiner cuts shuffle
    volume to ≤ k rows per (batch, key)), then a hash-partitioned final
    top-k; both passes are one sort + groupby.head, no per-group Python
    loop.  ``tiebreak`` (ascending) makes equal ``order_col`` values
    resolve deterministically — required for reproducible results."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    sort_cols = keys + [order_col] + ([tiebreak] if tiebreak else [])
    ascending = [True] * len(keys) + [not descending] + ([True] if tiebreak else [])

    def partial_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(
            sort_cols, ascending=ascending, kind="mergesort", ignore_index=True
        )
        return b.groupby(keys, sort=False).head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of keys: the sort + groupby.head/cumcount kernels
        # are already multi-key C-level — feeding a whole partition instead
        # of one key removes the per-key interpreter call
        g = g.sort_values(
            sort_cols, ascending=ascending, kind="mergesort", ignore_index=True
        )
        g = g.groupby(keys, sort=False).head(k).reset_index(drop=True)
        g[rank_col] = g.groupby(keys, sort=False).cumcount() + 1
        return g.drop(columns=["__p"])

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .map_batches(_tag_part_any(keys), batch_format="pandas")
        .groupby("__p")
        .map_groups(final_topk, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# broadcast (map-side) join
# --------------------------------------------------------------------------


def broadcast_join(
    ds: ray.data.Dataset,
    small: pd.DataFrame,
    on,
    how: str = "inner",
    suffix: str = "_r",
) -> ray.data.Dataset:
    """Join a streaming Dataset against a DRIVER-SIZED table with zero
    shuffle: the small side is ``ray.put`` once and every batch merges
    against it in place (the map-side join every star-schema query in
    pipelines/queries.py uses inline, as a reusable operator).  The big side
    streams; only dimension-table bytes replicate (once per node via the
    object store, not per batch).  ``how``: "inner" or "left".  Overlapping
    non-key columns from the small side get ``suffix``.

    This is deliberately NOT a general shuffle join: if the small side does
    not comfortably fit one process, co-partition both sides on the join key
    through one `groupby` exchange instead (the shape
    `queries.revenue_by_nation` uses for its two big sides)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = [on] if isinstance(on, str) else list(on)
    for c in on:
        if c not in small.columns:
            raise ValueError(f"join key {c!r} missing from small side")
    ref = ray.put(small.reset_index(drop=True))

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, on=on, how=how, suffixes=("", suffix))

    return ds.map_batches(join, batch_format="pandas")


# --------------------------------------------------------------------------
# co-partitioned shuffle join (big ⨝ big)
# --------------------------------------------------------------------------


def join_by_key(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on,
    how: str = "inner",
    suffix: str = "_r",
    num_partitions: int | None = None,
    salt: int = 1,
) -> ray.data.Dataset:
    """General equi-join of two Datasets co-partitioned on the join key —
    the big⨝big complement to :func:`broadcast_join` (Ray Data 2.49 has no
    native join).  ``how``: inner / left / right / outer, SQL semantics
    including null keys (a null key never matches; outer variants keep the
    row with the other side null-filled, exactly like the reference's
    DiffData outer comparison keeps origin-only and target-only rows,
    `DiffJobSession.java:134-161`).

    Shape: each side is tagged into ONE shared envelope schema (own columns
    + the other side's columns as all-null Arrow arrays — a validity bitmap
    on the wire, not data bytes) with a deterministic hash partition id, the
    two streams union and cross ONE groupby exchange, and each partition
    does a vectorized pandas hash-merge on Arrow-backed frames (ArrowDtype
    preserves int64/string types through outer joins — no NaN float
    corruption).  Both sides shuffle exactly once; the driver never sees row
    data; partitions scale with input size (``num_partitions=None`` sizes
    like queries._scaled_nparts).

    ``salt`` (skew handling, inner/left only): a single pathologically hot
    key normally lands all its rows in one partition (equal keys must
    co-locate).  ``salt=N`` splits the LEFT side's rows per key across N
    sub-buckets (round-robin, deterministic per batch) and replicates the
    RIGHT side N× so every (key, bucket) partition still sees the full
    right side for its keys; the per-partition merge keys on (key, bucket)
    so partition collisions between buckets cannot duplicate matches.
    Exact for inner/left; right/outer are rejected because a replicated
    right row cannot decide "unmatched" inside one bucket.  Cost: right
    shuffle volume × N — use when the right side is modest but the left is
    skewed; if the right side fits the driver, :func:`broadcast_join` is
    cheaper still.  Overlapping non-key right columns get ``suffix``."""
    if how not in ("inner", "left", "right", "outer"):
        raise ValueError("how must be inner/left/right/outer")
    salt = int(salt)
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if salt > 1 and how in ("right", "outer"):
        raise ValueError("salt only supports how='inner'/'left'")
    on = [on] if isinstance(on, str) else list(on)

    def _arrowize(ds):
        # pandas-block datasets (from_pandas) report numpy dtypes; route
        # them through a zero-copy arrow batch so schema().types are Arrow
        s = ds.schema()
        if all(isinstance(t, pa.DataType) for t in s.types):
            return ds, s
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow")
        return ds, ds.schema()

    left, ls = _arrowize(left)
    right, rs = _arrowize(right)
    l_fields = dict(zip(ls.names, ls.types))
    r_fields = dict(zip(rs.names, rs.types))
    for c in on:
        if c not in l_fields or c not in r_fields:
            raise ValueError(f"join key {c!r} missing from a side")
        if pa.types.is_nested(l_fields[c]):
            raise ValueError(f"nested join key {c!r} unsupported")
    key_types = {  # right keys cast to left types; dictionary keys decoded
        c: (
            l_fields[c].value_type
            if pa.types.is_dictionary(l_fields[c])
            else l_fields[c]
        )
        for c in on
    }
    l_pay = [c for c in ls.names if c not in on]
    r_pay_src = [c for c in rs.names if c not in on]
    ren = {c: (c + suffix if c in l_fields else c) for c in r_pay_src}
    r_pay = [ren[c] for c in r_pay_src]
    if len(set(on + l_pay + r_pay)) != len(on + l_pay + r_pay):
        raise ValueError("suffixed right columns still collide with left")
    out_types = dict(key_types)
    out_types.update({c: l_fields[c] for c in l_pay})
    out_types.update({ren[c]: r_fields[c] for c in r_pay_src})
    out_cols = on + l_pay + r_pay

    if num_partitions is None:
        # size from row counts ONLY when both sides are plain source reads
        # (count() is metadata-cheap there); a transform-bearing lineage
        # would fully execute once just to count and then re-execute for
        # the join itself — for those, take a fixed fan-out instead
        def _cheap_count(d):
            return d.count() if _is_plain_source(d) else None

        lc, rc = _cheap_count(left), _cheap_count(right)
        if lc is None or rc is None:
            num_partitions = 256
        else:
            num_partitions = max(16, min(1024, (lc + rc) // 65536))
    nparts = int(num_partitions)

    # splitmix64 finalizer — stateless, identical on every worker; one
    # shared implementation with the staged-exchange router
    from cassandra_data_migrator_ray.stages.staging import _hash64 as _mix64

    def _part_ids(t: pa.Table, salts: np.ndarray | None = None) -> np.ndarray:
        # canonical per-type hashing: the pandas dtype of an Arrow column
        # flips with batch null-presence (int64 → float64), so hashing a
        # to_pandas() frame would scatter equal keys across partitions.
        acc = np.zeros(t.num_rows, dtype=np.uint64)
        for c in on:
            col, typ = t[c], key_types[c]
            h = None
            if (
                pa.types.is_integer(typ)
                or pa.types.is_boolean(typ)
                or pa.types.is_temporal(typ)
            ):
                # 32-bit temporals (date32, time32) have no direct int64
                # cast — go through their int32 storage first
                v = None
                for path in ((pa.int64(),), (pa.int32(), pa.int64())):
                    try:
                        c_ = col
                        for ty in path:
                            c_ = pc.cast(c_, ty, safe=False)
                        v = c_
                        break
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                        continue
                if v is not None:
                    v = pc.fill_null(v, 0)
                    h = _mix64(v.to_numpy(zero_copy_only=False).view(np.uint64))
            elif pa.types.is_floating(typ):
                v = pc.fill_null(pc.cast(col, pa.float64()), 0.0)
                arr = v.to_numpy(zero_copy_only=False) + 0.0  # -0.0 → +0.0
                # one canonical NaN bit pattern: the per-partition pandas
                # merge factorizes all NaNs equal, so routing must too
                if np.isnan(arr).any():
                    arr = np.where(np.isnan(arr), np.float64("nan"), arr)
                h = _mix64(arr.view(np.uint64))
            if h is None:
                s = pd.Series(col.to_pandas(), dtype=object)
                h = pd.util.hash_pandas_object(s, index=False).to_numpy()
            acc = _mix64(acc ^ h)
        if salts is not None:
            acc = _mix64(acc ^ salts)
        return (acc % np.uint64(nparts)).astype(np.int32)

    def _tag(side_id: int, pay_map: dict):
        # pay_map: envelope payload name -> source column name (this side)
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {c: pc.cast(t[c], key_types[c]) for c in on}
            for env_name in l_pay + r_pay:
                src = pay_map.get(env_name)
                cols[env_name] = (
                    t[src] if src is not None else pa.nulls(n, out_types[env_name])
                )
            base = pa.table(cols)
            if salt > 1 and side_id == 1:
                # replicate the right side once per salt bucket
                base = pa.concat_tables([base] * salt)
                salts = np.repeat(np.arange(salt, dtype=np.uint64), n)
            elif salt > 1:
                salts = np.arange(n, dtype=np.uint64) % np.uint64(salt)
            else:
                salts = None
            m = base.num_rows
            keyed = base.select(on)
            base = base.append_column(
                "__salt",
                pa.array(
                    salts.astype(np.int16)
                    if salts is not None
                    else np.zeros(m, dtype=np.int16)
                ),
            )
            base = base.append_column(
                "__side", pa.array(np.full(m, side_id, dtype=np.int8))
            )
            return base.append_column("__part", pa.array(_part_ids(keyed, salts)))

        return fn

    tagged = left.map_batches(
        _tag(0, {c: c for c in l_pay}), batch_format="pyarrow"
    ).union(
        right.map_batches(
            _tag(1, {ren[c]: c for c in r_pay_src}), batch_format="pyarrow"
        )
    )

    merge_on = on + (["__salt"] if salt > 1 else [])

    def _merge(t: pa.Table) -> pa.Table:
        side = t["__side"]
        l = (
            t.filter(pc.equal(side, 0))
            .select(merge_on + l_pay)
            .to_pandas(types_mapper=pd.ArrowDtype)
        )
        r = (
            t.filter(pc.equal(side, 1))
            .select(merge_on + r_pay)
            .to_pandas(types_mapper=pd.ArrowDtype)
        )
        l_ok = ~l[on].isna().any(axis=1)
        r_ok = ~r[on].isna().any(axis=1)

        def _pad(df: pd.DataFrame) -> pd.DataFrame:
            # typed Arrow-NA fill for the absent side's columns (a plain
            # reindex would make object all-NA columns and unstable concat
            # dtypes)
            df = df.copy()
            for c in out_cols:
                if c not in df.columns:
                    df[c] = pd.Series(
                        [None] * len(df),
                        dtype=pd.ArrowDtype(out_types[c]),
                        index=df.index,
                    )
            return df[out_cols]

        pieces = [l[l_ok].merge(r[r_ok], on=merge_on, how=how)[out_cols]]
        if how in ("left", "outer") and (~l_ok).any():
            pieces.append(_pad(l[~l_ok]))
        if how in ("right", "outer") and (~r_ok).any():
            pieces.append(_pad(r[~r_ok]))
        m = pd.concat(pieces, ignore_index=True) if len(pieces) > 1 else pieces[0]
        return pa.table(
            {c: pa.array(m[c], type=out_types[c], from_pandas=True) for c in out_cols}
        )

    return tagged.groupby("__part").map_groups(_merge, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact distributed quantiles over high-cardinality float columns
# --------------------------------------------------------------------------


def quantile_exact(
    ds: ray.data.Dataset,
    col: str,
    qs=(0.5,),
    bins: int = 4096,
    distinct_cap: int = 65536,
    max_passes: int = 24,
) -> dict:
    """EXACT quantiles (DuckDB ``quantile_disc`` selection rule — an actual
    element of the column, no interpolation) over a column whose value domain
    is too large for the counts-table method of
    ``queries.quantile_quantity_by_flag``.

    Iterative histogram bisection: each pass is ONE streaming `map_batches`
    over the (column-pruned) dataset producing per-batch bucket counts for
    every still-active rank's value range; the driver reduces bins-sized
    arrays only and narrows each rank's range to the bucket containing it.
    When a rank's range holds ≤ ``distinct_cap`` rows, a final pass gathers
    the distinct (value, count) pairs in range and selects exactly.  Typical
    cost: 2-3 passes; the dataset never shuffles and the driver never holds
    row data.  Transform-bearing inputs are materialized once for the
    multi-pass scan (plain parquet reads re-scan, see
    :func:`_ensure_multipass`).  Nulls and NaNs are excluded (SQL
    semantics).  Returns {q: value}."""
    ds = _ensure_multipass(ds.select_columns([col]))

    def stats(t: pa.Table) -> pd.DataFrame:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pd.DataFrame({"n": [0], "lo": [np.inf], "hi": [-np.inf]})
        return pd.DataFrame(
            {"n": [len(v)], "lo": [float(v.min())], "hi": [float(v.max())]}
        )

    st = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    # a zero-block dataset yields a schema-less empty frame — treat as n=0
    n = int(st["n"].sum()) if "n" in st.columns else 0
    if n == 0:
        return {float(q): float("nan") for q in qs}
    glo, ghi = float(st["lo"].min()), float(st["hi"].max())

    def disc_rank(q: float) -> int:
        h = q * float(n)  # duckdb computes the position in float64 too
        idx = int(np.floor(h))
        if float(idx) == h:
            idx -= 1
        return max(idx, 0)

    # state per rank: [lo, hi] (hi inclusive only while it is the global max),
    # below = exact #{values < lo}, count = #{values in range}
    active = {
        disc_rank(float(q)): {"lo": glo, "hi": ghi, "below": 0, "count": n}
        for q in qs
    }
    results: dict[int, float] = {}

    def hist_pass(ranges: list, t: pa.Table) -> pd.DataFrame:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        out = {}
        for i, (lo, hi, edges) in enumerate(ranges):
            sel = v[(v >= lo) & (v <= hi)]
            # bucket j = [edges[j], edges[j+1]), last bucket closed at hi
            idx = np.clip(
                np.searchsorted(edges, sel, side="right") - 1, 0, len(edges) - 2
            )
            out[f"h{i}"] = np.bincount(idx, minlength=len(edges) - 1).astype(
                np.int64
            )
        return pd.DataFrame(out)

    def collect_pass(ranges: list, t: pa.Table) -> pd.DataFrame:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        frames = []
        for i, (lo, hi) in enumerate(ranges):
            u, c = np.unique(v[(v >= lo) & (v <= hi)], return_counts=True)
            frames.append(
                pd.DataFrame({"ri": np.int64(i), "val": u, "cnt": c.astype(np.int64)})
            )
        return pd.concat(frames, ignore_index=True)

    for _ in range(max_passes):
        # resolve ranks whose range collapsed or is small enough to gather
        gather = {
            r: s
            for r, s in active.items()
            if s["count"] <= distinct_cap or s["lo"] == s["hi"]
        }
        if gather:
            ranges = [(s["lo"], s["hi"]) for s in gather.values()]
            got = (
                ds.map_batches(partial(collect_pass, ranges), batch_format="pyarrow")
                .to_pandas()
                .groupby(["ri", "val"], sort=True)["cnt"]
                .sum()
                .reset_index()
            )
            for i, (r, s) in enumerate(gather.items()):
                g = got[got["ri"] == i]
                cum = np.cumsum(g["cnt"].to_numpy(np.int64))
                results[r] = float(
                    g["val"].to_numpy()[np.searchsorted(cum, r - s["below"] + 1)]
                )
                del active[r]
        if not active:
            break
        ranges = []
        for s in active.values():
            edges = np.linspace(s["lo"], s["hi"], bins + 1)
            ranges.append((s["lo"], s["hi"], edges))
        arr = (
            ds.map_batches(partial(hist_pass, ranges), batch_format="pyarrow")
            .to_pandas()
            .to_numpy()
        )  # (n_batches * bins, n_active) — each batch emits `bins` rows
        hist = arr.reshape(-1, bins, len(active)).sum(axis=0)  # (bins, n_active)
        for i, (r, s) in enumerate(list(active.items())):
            counts = hist[:, i]
            cum = np.cumsum(counts)
            j = int(np.searchsorted(cum, r - s["below"] + 1))
            edges = ranges[i][2]
            new_below = s["below"] + (int(cum[j - 1]) if j > 0 else 0)
            s["below"] = new_below
            s["lo"] = float(edges[j])
            # half-open bucket except the last (which owns the closed max)
            s["hi"] = float(edges[j + 1]) if j < bins - 1 else s["hi"]
            s["count"] = int(counts[j])
            if j < bins - 1:
                # exclude the open upper edge exactly: largest float < edge
                s["hi"] = float(np.nextafter(edges[j + 1], -np.inf))
    else:
        raise RuntimeError(
            f"quantile_exact did not converge in {max_passes} passes "
            f"(pathological value distribution in {col}?)"
        )
    return {float(q): results[disc_rank(float(q))] for q in qs}


def quantile_filter(
    ds: ray.data.Dataset,
    col: str,
    q: float,
    keep: str = "ge",
) -> tuple[float, ray.data.Dataset]:
    """(threshold, filtered dataset): keep rows whose ``col`` is >= (``keep=
    "ge"``, e.g. top-(1-q) quality gate) or <= ("le") the exact q-th
    quantile.  Threshold computation is :func:`quantile_exact`; the filter is
    one more streaming pass."""
    if keep not in ("ge", "le"):
        raise ValueError("keep must be 'ge' or 'le'")
    thr = quantile_exact(ds, col, (q,))[float(q)]

    def f(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        m = v >= thr if keep == "ge" else v <= thr
        return t.filter(pa.array(m & ~np.isnan(v)))

    return thr, ds.map_batches(f, batch_format="pyarrow")


# --------------------------------------------------------------------------
# composed corpus-preparation pipeline
# --------------------------------------------------------------------------


def prep_corpus(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.6,
    token_sep: str | None = None,
    concurrency: int | None = 2,
) -> ray.data.Dataset:
    """Flagship training-data prep: language-ID → quality gate → exact dedup
    → token counts composed into ONE streaming pipeline.

    Scale shape: all per-doc scoring (LangId, QualityScore, TokenCount — the
    same kernels as the standalone operators) runs inside a single actor-pool
    ``map_batches`` stage (regex state compiled once per actor); documents
    failing the language/quality gate are dropped BEFORE the exchange; the
    only shuffle ships a 128-bit content hash plus five small stat columns
    per surviving doc (corpus text never crosses the exchange), pre-collapsed
    by an in-batch combiner.  Returns one row per distinct surviving text:
    (id, pred_lang, quality_score, n_ws_tokens, n_chars, n_dups) where id is
    the min id of the duplicate group and n_dups its size.
    """
    from pandas.util import hash_array

    from cassandra_data_migrator_ray.functions.text import (
        LangId,
        QualityScore,
        TokenCount,
    )

    lang_set = tuple(langs)

    class _ScoreGateCombine:
        """Per-actor state: compiled regex kernels (T1 lazy-init pattern)."""

        def __init__(self):
            self.lang = LangId(text_col=text_col)
            self.qual = QualityScore(text_col=text_col)
            self.tok = TokenCount(text_col=text_col, sep=token_sep)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = self.tok(self.qual(self.lang(batch)))
            keep = batch["pred_lang"].isin(lang_set) & (
                batch["quality_score"] >= min_quality
            )
            batch = batch[keep]
            cols = [id_col, "pred_lang", "quality_score", "n_ws_tokens", "n_chars"]
            if batch.empty:
                out = batch[cols].copy()
                out["h1"] = pd.Series([], dtype=np.int64)
                out["h2"] = pd.Series([], dtype=np.int64)
                out["n_dups"] = pd.Series([], dtype=np.int64)
                return out
            # 128-bit content hash (two independent SipHash streams) — the
            # exchange key; null text is its own group (sentinel pair)
            isnull = batch[text_col].isna().to_numpy()
            txt = batch[text_col].fillna("").to_numpy(dtype=object)
            h1 = np.where(
                isnull,
                np.int64(-1),
                hash_array(txt, categorize=False).astype(np.int64),
            )
            part = batch[cols].copy()
            part["h1"] = h1
            part["h2"] = np.where(
                isnull,
                np.int64(-2),
                hash_array(
                    txt, hash_key="b8f327e51b7bce40", categorize=False
                ).astype(np.int64),
            )
            # in-batch combiner: collapse duplicate texts before the shuffle
            part = part.sort_values(id_col, kind="mergesort")
            g = part.groupby(["h1", "h2"], sort=False, as_index=False)
            out = g.first()
            out["n_dups"] = g.size()["size"].to_numpy().astype(np.int64)
            return out

    def final_fold(group: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of text groups: min-id first row + n_dups sum per
        # (h1, h2), all C-level
        group = group.sort_values(id_col, kind="mergesort")
        g = group.groupby(["h1", "h2"], sort=False, as_index=False)
        out = g.first()
        out["n_dups"] = g["n_dups"].sum()["n_dups"].to_numpy(np.int64)
        return out.drop(columns=["h1", "h2", "__p"])

    kwargs = {"batch_format": "pandas"}
    if concurrency:
        kwargs["concurrency"] = concurrency
    return (
        ds.map_batches(_ScoreGateCombine, **kwargs)
        .map_batches(_tag_part_cols(["h1", "h2"]), batch_format="pyarrow")
        .groupby("__p")
        .map_groups(final_fold, batch_format="pandas")
    )
