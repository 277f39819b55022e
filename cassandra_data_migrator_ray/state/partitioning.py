"""Deterministic hash routing of keys to lake partitions (+ hot-key salting).

Plays the role of the reference's token-range splitter
(/root/reference src/main/java/com/datastax/cdm/job/SplitPartitions.java:32-76):
the unit of parallel work is a partition id 0..num_parts-1.  Unlike uniform
token slicing (which lets a hot range run long), ``salt > 1`` additionally mixes
``turn_idx % salt`` into the route so a hot conversation's turns spread over up
to ``salt`` partitions — legal because the LWW merge only requires all events of
one (conv_id, turn_idx) key to co-locate, and the validator uses the identical
route.  The salt level is recorded in the lake manifest so every job run against
the lake routes identically.

Hashing is pandas.util.hash_array (64-bit SipHash with a fixed key) — stable
across processes, machines and runs; never Python's builtin hash().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pandas.util import hash_array


def hash_key(values) -> np.ndarray:
    """Stable uint64 hash of an array of keys (numpy, pandas, or Arrow).

    String-typed Arrow arrays take the dictionary fast path: encode, hash
    only the distinct values, gather — byte-identical to the element-wise
    hash (verified) and ~6× faster at bench key cardinality.  Everything
    else falls back to the element-wise object hash."""
    import pyarrow as pa

    if isinstance(values, pd.Series):
        values = values.to_numpy()
    if isinstance(values, pa.ChunkedArray):
        # hash per chunk and concatenate: combine_chunks on (non-large)
        # string data > 2 GiB raises ArrowCapacityError (32-bit offsets)
        if values.num_chunks != 1:
            if values.num_chunks == 0:
                return np.empty(0, dtype=np.uint64)
            return np.concatenate([hash_key(c) for c in values.chunks])
        values = values.chunk(0)
    if isinstance(values, pa.Array):
        is_dict = pa.types.is_dictionary(values.type)
        if values.null_count == 0 and (
            is_dict
            or pa.types.is_string(values.type)
            or pa.types.is_large_string(values.type)
        ):
            import pyarrow.compute as pc

            d = values if is_dict else pc.dictionary_encode(values)
            dic = d.dictionary.to_numpy(zero_copy_only=False)
            hu = hash_array(dic.astype(object), categorize=False)
            return hu[d.indices.to_numpy(zero_copy_only=False)]
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values)
    if arr.dtype != object:
        arr = arr.astype(object)
    if len(arr):
        # canonicalize null sentinels: pandas StringDtype yields pd.NA where
        # Arrow yields None — hash_array gives them DIFFERENT hashes, which
        # would route the same logical null key to different partitions
        mask = pd.isna(arr)
        if mask.any():
            arr = arr.copy()
            arr[mask] = None
    return hash_array(arr, categorize=False)


def assign_partition(
    conv_id: np.ndarray | pd.Series,
    turn_idx: np.ndarray | pd.Series,
    num_parts: int,
    salt: int = 1,
) -> np.ndarray:
    """Vectorized partition route: f(conv_id [, turn_idx % salt]) % num_parts."""
    h = hash_key(conv_id)
    if salt > 1:
        t = turn_idx.to_numpy() if isinstance(turn_idx, pd.Series) else np.asarray(turn_idx)
        h = h ^ ((t.astype(np.uint64) % np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_parts)).astype(np.int32)


def candidate_partitions(
    first_key_values: "np.ndarray | pd.Series | list",
    num_parts: int,
    salt: int = 1,
) -> dict[object, list[int]]:
    """Partitions that MAY hold rows of each first-key-component value — the
    read-side inverse of :func:`assign_partition_keys` (reference target point
    lookup, cql/statement/TargetSelectByPKStatement.java, re-expressed as
    partition pruning).  Without salt each value routes to exactly one
    partition; with ``salt > 1`` its rows spread over at most ``salt``
    distinct partitions (the mix term only takes values 0..salt-1), so a
    point lookup reads ≤ salt partition file sets instead of the whole lake.
    """
    vals = list(dict.fromkeys(
        first_key_values.tolist()
        if hasattr(first_key_values, "tolist")
        else first_key_values
    ))
    h = hash_key(np.array(vals, dtype=object))
    out: dict[object, list[int]] = {}
    mixes = [
        # wraparound multiply, matching the vectorized uint64 mix exactly
        np.uint64((m * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        for m in range(max(1, salt))
    ]
    for v, hv in zip(vals, h):
        parts = {int((np.uint64(hv) ^ mx) % np.uint64(num_parts)) for mx in mixes}
        out[v] = sorted(parts)
    return out


def assign_partition_keys(
    keys: "list[np.ndarray | pd.Series]",
    num_parts: int,
    salt: int = 1,
) -> np.ndarray:
    """Generalized route for an arbitrary PK column list: hash of the FIRST
    key component (any function of a key prefix co-locates the full key),
    with ``salt`` mixing the second component so a hot first-component value
    spreads over up to salt partitions.  For the canonical transcripts key
    this is byte-identical to :func:`assign_partition`."""
    import pyarrow as pa

    h = hash_key(keys[0])
    if salt > 1 and len(keys) > 1:
        t = keys[1]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if isinstance(t, pa.Array):
            arr = t.to_numpy(zero_copy_only=False)
        else:
            arr = t.to_numpy() if isinstance(t, pd.Series) else np.asarray(t)
        if np.issubdtype(arr.dtype, np.integer):
            mix = arr.astype(np.uint64) % np.uint64(salt)
        else:
            mix = hash_key(arr) % np.uint64(salt)
        h = h ^ (mix * np.uint64(0x9E3779B97F4A7C15))
    return (h % np.uint64(num_parts)).astype(np.int32)
