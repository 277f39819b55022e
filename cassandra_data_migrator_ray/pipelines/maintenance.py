"""Lake maintenance: standalone compaction (the gc_grace analogue).

The reference delegates tombstone GC to Cassandra compaction
(gc_grace_seconds, noted in SIT/smoke/03_ttl_writetime/expected.cql); here it
is an explicit job: every partition is rewritten without tombstones older
than ``grace_wt`` (None = drop all — only safe once no event at or below the
dropped writetimes can ever be redelivered), and multi-file partitions are
merged to one file.  Runs through the same receipt + 2-phase commit protocol
as replay, so a crashed compaction never loses or duplicates state.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from functools import partial

import pandas as pd

import ray.data

from cassandra_data_migrator_ray.stages.merge import (
    MergeConfig,
    read_partition_state,
    write_partition_state,
)
from cassandra_data_migrator_ray.state.manifest import Manifest, schema_to_json


@dataclass
class CompactResult:
    run_id: str
    metrics: pd.DataFrame
    seconds: float


def _compact_part(cfg: MergeConfig, ttl_as_of: int | None, batch: pd.DataFrame) -> pd.DataFrame:
    import time

    import pyarrow as pa

    from cassandra_data_migrator_ray.functions.lww import compact_tombstones
    from cassandra_data_migrator_ray.schema import DELETED
    from cassandra_data_migrator_ray.state.manifest import atomic_write_json

    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out = []
    for part in batch["part"]:
        t0 = time.perf_counter()
        part = int(part)
        state = read_partition_state(cfg, part)
        if state is None:
            continue
        if cfg.ttl_enabled and ttl_as_of is not None:
            from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

            state = apply_ttl_expiry(state, ttl_as_of, cfg.payload_cols, harden=True)
        state = compact_tombstones(state, cfg.grace_wt)
        state = state.sort_values(list(cfg.key_cols), kind="mergesort", ignore_index=True)
        rel = write_partition_state(cfg, part, state)
        tombstones = int(state[DELETED].sum())
        receipt = {
            "part": part,
            "run_id": cfg.run_id,
            "files": [rel],
            "watermark": int(cfg.prior_watermarks.get(part, -1)),
            "rows": int(len(state) - tombstones),
            "tombstones": tombstones,
            "status": "PASS",
            "metrics": {"compacted": True},
        }
        atomic_write_json(
            f"{cfg.lake_dir}/_staging/{cfg.run_id}/part-{part:05d}.json", receipt
        )
        out.append(
            {
                "part": part,
                "rows": receipt["rows"],
                "tombstones": tombstones,
                "keys_in": 0,
                "watermark": receipt["watermark"],
                "status": "PASS",
                "file": rel,
                "seconds": round(time.perf_counter() - t0, 3),
            }
        )
    return pd.DataFrame(out)


def compact_lake(
    lake_dir: str, grace_wt: int | None = None, ttl_as_of: int | None = None
) -> CompactResult:
    """Rewrite every partition dropping eligible tombstones (2-phase commit)."""
    import time

    t0 = time.perf_counter()
    manifest = Manifest.load(lake_dir)
    if manifest is None:
        raise FileNotFoundError(f"no manifest at {lake_dir}")
    run_id = "compact-" + uuid.uuid4().hex[:8]
    cfg = MergeConfig(
        lake_dir=lake_dir,
        run_id=run_id,
        payload_cols=manifest.payload_cols(),
        payload_schema_json=schema_to_json(manifest.schema),
        counter_cols=tuple(manifest.counter_cols),
        key_cols=tuple(manifest.key_cols),
        ttl_enabled=manifest.ttl_enabled,
        grace_wt=grace_wt,
        prior_files={k: v.files for k, v in manifest.partitions.items()},
        prior_watermarks=manifest.watermarks(),
    )
    parts = sorted(manifest.partitions)
    if not parts:
        return CompactResult(run_id, pd.DataFrame(), time.perf_counter() - t0)
    ds = ray.data.from_items(
        [{"part": int(k)} for k in parts], override_num_blocks=len(parts)
    )
    metrics = ds.map_batches(
        partial(_compact_part, cfg, ttl_as_of), batch_format="pandas", batch_size=None
    ).to_pandas()
    manifest.commit_run(run_id, extra={"type": "compact", "grace_wt": grace_wt})
    return CompactResult(run_id, metrics, time.perf_counter() - t0)
