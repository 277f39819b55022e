"""Reader-vs-writer soak (round-4 verdict #6): a tail-replay loop with
CONCURRENT readers and periodic maintenance on one lake.

Writer: incremental replay cycles; every other cycle runs compact + ANALYZE
and a retention-window vacuum (keep_last=2 — the Delta-style contract: a
reader re-resolving the manifest per read can race at most the commits
inside the retention window).

Readers (driver threads, running the whole time): full-state reads, pruned
point lookups, and streaming counts.  Every observation lands in a ledger;
after the loop the test asserts
  (1) ZERO reader errors — no reader ever saw an uncommitted or GC'd file;
  (2) every full-state read equals the committed-prefix oracle of SOME
      version that was live during that read (window-matched: a commit may
      land mid-read);
  (3) every lookup equals that conversation's rows under some live version;
  (4) fsck is clean at the end and old snapshots really were pruned.

Scale knobs (env): CDM_SOAK_CYCLES (default 6), CDM_SOAK_EVENTS per cycle
(default 4000) — the default runs in ~0.5-1 min; the bench-scale soak is
the same test with the knobs raised.
"""

import os
import threading

import numpy as np
import pandas as pd
import pytest

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


def _key_frame(df: pd.DataFrame) -> pd.DataFrame:
    out = df.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    return out[["conv_id", "turn_idx", "role", "text", "tool"]].astype(
        {"turn_idx": "int64"}
    )


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> bool:
    a, b = _key_frame(a), _key_frame(b)
    if len(a) != len(b):
        return False
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        return True
    except AssertionError:
        return False


@pytest.mark.usefixtures("ray_session")
class TestReaderWriterSoak:
    def test_tail_replay_concurrent_readers_vacuum(self, tmp_path):
        cycles = int(os.environ.get("CDM_SOAK_CYCLES", "6"))
        per = int(os.environ.get("CDM_SOAK_EVENTS", "4000"))
        lake = str(tmp_path / "lake")
        rng = np.random.default_rng(99)

        full = gen_change_stream(
            n_convs=120,
            n_events=cycles * per,
            seed=88,
            hot_frac=0.3,
            p_delete=0.1,
            p_duplicate=0.1,
        ).to_pandas()
        conv_pool = full["conv_id"].unique()

        # committed-prefix oracles.  PROTOCOL: the writer appends commit
        # c's oracle BEFORE starting replay c, so at any instant the lake's
        # visible state is one of the LAST TWO oracles in the list (the
        # in-flight commit may or may not have landed); a reader spanning
        # appends widens the window accordingly.  Appending after the
        # commit would race the manifest swap: a reader could observe the
        # new state before the oracle exists.
        oracle_lock = threading.Lock()
        oracles: list[pd.DataFrame] = []

        stop = threading.Event()
        errors: list[str] = []
        ledger: list[dict] = []

        def snap_count() -> int:
            with oracle_lock:
                return len(oracles)

        def reader(kind: str):
            while not stop.is_set():
                lo = snap_count()
                if lo == 0:
                    continue
                try:
                    if kind == "full":
                        got = read_lake_pandas(lake)
                        hi = snap_count()
                        with oracle_lock:
                            window = oracles[max(0, lo - 2) : hi]
                        ok = any(_frames_equal(got, o) for o in window)
                        ledger.append(
                            {"kind": kind, "rows": len(got), "ok": ok,
                             "window": (lo, hi)}
                        )
                        if not ok:
                            errors.append(
                                f"full read matched no live version in "
                                f"window {(lo, hi)} (rows={len(got)})"
                            )
                    elif kind == "lookup":
                        conv = str(rng.choice(conv_pool))
                        got = lookup(lake, [conv])
                        hi = snap_count()
                        with oracle_lock:
                            window = oracles[max(0, lo - 2) : hi]
                        ok = any(
                            _frames_equal(got, o[o["conv_id"] == conv])
                            for o in window
                        )
                        ledger.append(
                            {"kind": kind, "rows": len(got), "ok": ok,
                             "window": (lo, hi)}
                        )
                        if not ok:
                            errors.append(
                                f"lookup({conv!r}) matched no live version "
                                f"in window {(lo, hi)}"
                            )
                    else:  # count: streaming pruned read must simply not error
                        n = read_lake(lake, columns=["conv_id"]).count()
                        ledger.append({"kind": kind, "rows": n, "ok": True})
                except Exception as e:  # the core assertion: NO reader error
                    errors.append(f"{kind} reader raised: {type(e).__name__}: {e}")
                    return

        threads = [
            threading.Thread(target=reader, args=(k,), daemon=True)
            for k in ("full", "lookup", "count")
        ]

        # first commit before readers start (an empty dir is not a lake)
        b0 = full[full["event_seq"] < per].reset_index(drop=True)
        with oracle_lock:
            oracles.append(oracle_final_state(full[full["event_seq"] < per]))
        replay(b0, lake, num_parts=8, salt=2)
        for t in threads:
            t.start()

        try:
            for c in range(1, cycles):
                lo, hi = c * per, (c + 1) * per
                batch = full[
                    (full["event_seq"] >= lo) & (full["event_seq"] < hi)
                ].reset_index(drop=True)
                with oracle_lock:
                    oracles.append(
                        oracle_final_state(full[full["event_seq"] < hi])
                    )
                replay(batch, lake, num_parts=8, salt=2)
                if c % 2 == 0:
                    # mid-stream tombstone GC needs a grace watermark: a
                    # tombstone younger than any writetime still in flight
                    # must survive, or a late out-of-order upsert would
                    # resurrect the deleted row (test_compact_grace_
                    # midstream pins the semantics; without grace this soak
                    # catches the resurrection within 2 cycles)
                    future = full[full["event_seq"] >= hi]
                    grace = int(future["writetime"].min()) if len(future) else None
                    compact_lake(lake, grace_wt=grace)  # public view unchanged
                    analyze_lake(lake)
                    m = Manifest.load(lake)
                    m.vacuum(keep_last=2)
        finally:
            stop.set()
            for t in threads:
                t.join(timeout=60)

        assert not errors, errors[:5]
        by_kind = {k: sum(1 for r in ledger if r["kind"] == k) for k in
                   ("full", "lookup", "count")}
        # every reader really ran, repeatedly
        assert all(v >= 2 for v in by_kind.values()), by_kind
        assert all(r.get("ok") for r in ledger), [
            r for r in ledger if not r.get("ok")
        ][:3]

        # final state is the full oracle; fsck clean; snapshots were pruned
        pd.testing.assert_frame_equal(
            read_lake_pandas(lake), oracle_final_state(full), check_dtype=False
        )
        report = fsck_lake(lake)
        assert report.get("ok", False) or not report.get("errors"), report
        m = Manifest.load(lake)
        snaps = [
            f for f in os.listdir(os.path.join(lake, "_snapshots"))
            if f.startswith("v") and f.endswith(".json")
        ] if os.path.isdir(os.path.join(lake, "_snapshots")) else []
        assert len(snaps) <= 3, snaps  # keep_last=2 + current
