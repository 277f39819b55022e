"""Normalize + pre-fold stage: the stateless fan-in before the shuffle.

Per Arrow batch (zero-copy from the object store):
  1. additive schema alignment to the manifest schema (null backfill),
  2. null-PK defaulting (reference: schema/CqlTable.java:375-400 convertNull),
  3. per-partition high-watermark filter (already-merged events dropped →
     idempotent duplicate delivery / resume),
  4. LWW pre-fold per key (the combiner): output is one *partial state row*
     per key per batch, tagged with its partition route.

The pre-fold is the shuffle-minimization move: what crosses the all-to-all
exchange is bounded by distinct keys per batch, not raw event count, and a hot
key's events collapse before they concentrate on one reducer.

Used as a callable class in ``map_batches(Normalize(...), batch_format="pyarrow",
concurrency=N)`` — watermarks and schema are resolved once per actor in
``__init__`` (the broadcast pattern), not per batch.
"""

from __future__ import annotations

from collections.abc import Mapping

import numpy as np
import pandas as pd
import pyarrow as pa

from cassandra_data_migrator_ray.schema import (
    ENVELOPE_COLS,
    KEY_COLS,
    align_to_schema,
    payload_cols_of,
)
from cassandra_data_migrator_ray.state.partitioning import assign_partition_keys

PART_COL = "__part"

_PK_DEFAULTS: dict[str, object] = {"conv_id": "", "turn_idx": -1}


def _default_for(t: pa.DataType) -> object:
    """Type-based null-PK default (reference convertNull semantics)."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        return -1
    if pa.types.is_boolean(t):
        return False
    if pa.types.is_timestamp(t):
        # reference: configured epoch-millis default for timestamp PK parts
        # (properties/KnownProperties.java:197 spark.cdm.transform.replace.nullTs)
        return np.datetime64(0, t.unit)
    return None


class Normalize:
    """Stateless-per-batch, stateful-per-actor normalize (+ optional combiner).

    ``prefold=False`` (default): pure-Arrow path — align, default null PKs,
    watermark-filter, append the partition route, and ship the *raw* events
    (10 narrow columns) to the shuffle; the reducer folds.  Cheapest when most
    keys appear once per batch (bulk backfill / first replay).

    ``prefold=True``: fold per key inside every batch first and ship partial
    state rows instead.  What crosses the shuffle is bounded by distinct keys
    per batch — the right choice for update-heavy CDC tails and hot keys.
    The two paths are semantically identical (fold/merge associativity).
    """

    def __init__(
        self,
        payload_schema: pa.Schema,
        num_parts: int,
        salt: int = 1,
        watermarks: Mapping[int, int] | None = None,
        counter_cols: tuple[str, ...] = (),
        pk_defaults: Mapping[str, object] | None = None,
        prefold: bool = False,
        key_cols: tuple[str, ...] | None = None,
        ttl_enabled: bool = False,
        rate_limit_rows_per_s: float | None = None,
    ) -> None:
        self.prefold = prefold
        self.ttl_enabled = ttl_enabled
        # per-actor token bucket (reference per-executor RateLimiter,
        # job/AbstractJobSession.java:58-62) — built lazily so the limiter
        # state lives in the ACTOR process, not the serialized closure
        self._rate = rate_limit_rows_per_s
        self._bucket = None
        self.payload_schema = payload_schema
        self.key_cols = list(key_cols) if key_cols else list(KEY_COLS)
        self.payload_cols = payload_cols_of(payload_schema, self.key_cols)
        self.num_parts = num_parts
        self.salt = salt
        self.counter_cols = tuple(counter_cols)
        if pk_defaults is not None:
            self.pk_defaults = dict(pk_defaults)
        else:
            self.pk_defaults = {
                k: _default_for(payload_schema.field(k).type)
                if k in payload_schema.names
                else _PK_DEFAULTS.get(k)
                for k in self.key_cols
            }
        # dense watermark vector for O(1) vectorized lookup
        wm = np.full(num_parts, -1, dtype=np.int64)
        for k, v in (watermarks or {}).items():
            if 0 <= int(k) < num_parts:
                wm[int(k)] = v
        self.wm = wm

    def _event_schema(self) -> pa.Schema:
        fields = [pa.field("op", pa.string())]
        fields += [self.payload_schema.field(n) for n in self.payload_schema.names]
        fields += [pa.field("writetime", pa.int64()), pa.field("event_seq", pa.int64())]
        if self.ttl_enabled:
            fields.append(pa.field("ttl", pa.int64()))
        return pa.schema(fields)

    def _out_schema(self) -> pa.Schema:
        from cassandra_data_migrator_ray.schema import state_schema

        return state_schema(
            self.payload_schema, self.key_cols, ttl=self.ttl_enabled
        ).append(pa.field(PART_COL, pa.int32()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self._rate:
            if self._bucket is None:
                from cassandra_data_migrator_ray.functions.ratelimit import TokenBucket

                self._bucket = TokenBucket(self._rate)
            self._bucket.acquire(batch.num_rows)

        batch = align_to_schema(batch, self._event_schema())
        # null-PK defaulting (reference convertNull semantics) — Arrow kernels
        for k in self.key_cols:
            col = batch.column(k)
            if col.null_count:
                i = batch.column_names.index(k)
                batch = batch.set_column(i, k, pc.fill_null(col, self.pk_defaults.get(k)))
        # Arrow columns go straight to the router: string keys take the
        # dictionary-encode fast path (hash distinct values only, ~6× at
        # bench key cardinality, byte-identical route)
        part = assign_partition_keys(
            [batch.column(k) for k in self.key_cols],
            self.num_parts,
            self.salt,
        )
        # watermark filter: events at or below a partition's high-watermark were
        # already merged in a committed run — drop them (exactly-once replay)
        keep = batch.column("event_seq").to_numpy(zero_copy_only=False) > self.wm[part]
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            part = part[keep]
        if not self.prefold:
            return batch.append_column(PART_COL, pa.array(part, pa.int32()))

        # Arrow-native combiner: fold per key inside the batch without ever
        # materializing Python-object strings (fold_events_arrow gathers
        # payload bytes through nullable take kernels) — the pandas twin
        # fold_events stays as the reference kernel, equality-tested in pytest
        from cassandra_data_migrator_ray.functions.lww import fold_events_arrow

        folded = fold_events_arrow(
            batch, self.key_cols, self.payload_cols, self.counter_cols,
            ttl=self.ttl_enabled,
        )
        if folded.num_rows:
            fpart = assign_partition_keys(
                [folded.column(k) for k in self.key_cols],
                self.num_parts,
                self.salt,
            )
        else:
            fpart = np.array([], dtype=np.int32)
        folded = folded.append_column(PART_COL, pa.array(fpart, pa.int32()))
        # emit typed Arrow (consistent blocks through the shuffle)
        out_schema = self._out_schema()
        return folded.select(out_schema.names).cast(out_schema)


__all__ = ["Normalize", "PART_COL", "ENVELOPE_COLS"]
