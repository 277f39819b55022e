"""Randomized equivalence of the Arrow incremental-merge kernels against
their pandas references — the steady-state CDC path (COVERAGE.md cites this
file).  Pure-kernel tests: no Ray session needed.

merge_state_tables_arrow must equal merge_state_frames (per-cell LWW argmax,
merged-tombstone suppression, additive counters with identical-cell dedup,
TTL carry) on arbitrary folded states; _compute_changes_arrow must emit the
same classified change rows as _compute_changes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.functions.lww import (
    fold_events,
    fold_events_arrow,
    merge_state_frames,
    merge_state_tables_arrow,
)
from cassandra_data_migrator_ray.stages.merge import (
    CHANGE_COL,
    MergeConfig,
    _compute_changes,
    _compute_changes_arrow,
)
from cassandra_data_migrator_ray.state.manifest import schema_to_json

KEYS = ["conv_id", "turn_idx"]


def _events(rng, n, seq0, with_counter=False, with_ttl=False):
    df = pd.DataFrame(
        {
            "conv_id": rng.choice([f"c{i}" for i in range(30)], n),
            "turn_idx": rng.integers(0, 5, n).astype("int32"),
            "op": np.where(rng.random(n) < 0.15, "DELETE", "UPSERT"),
            "text": np.where(
                rng.random(n) < 0.2, None, rng.choice(["a", "b", "cc"], n)
            ),
            "role": rng.choice(["user", "asst"], n),
            "writetime": rng.integers(0, 50, n).astype("int64"),
            "event_seq": np.arange(seq0, seq0 + n, dtype="int64"),
        }
    )
    if with_counter:
        df["cnt"] = rng.integers(-5, 10, n).astype("int64")
    if with_ttl:
        df["ttl"] = np.where(
            rng.random(n) < 0.3, rng.integers(1, 100, n), 0
        ).astype("float64")
    return df


def _assert_frames_equal(ref: pd.DataFrame, got: pd.DataFrame):
    ref = ref.sort_values(KEYS, ignore_index=True)[sorted(ref.columns)]
    got = got.sort_values(KEYS, ignore_index=True)[sorted(got.columns)]
    assert list(ref.columns) == list(got.columns)
    assert len(ref) == len(got)
    for c in ref.columns:
        r, g = ref[c], got[c]
        if r.dtype == object or g.dtype == object:
            ok = (r.fillna("\0") == g.fillna("\0")).all()
        elif str(r.dtype).startswith(("Int", "int")) or str(g.dtype).startswith(
            ("Int", "int")
        ):
            ok = (
                pd.Series(r).astype("Int64").fillna(-(2**60))
                == pd.Series(g).astype("Int64").fillna(-(2**60))
            ).all()
        else:
            ok = r.equals(g.astype(r.dtype))
        assert ok, (c, pd.concat([r, g], axis=1).head(20))


class TestMergeStateTablesArrow:
    @pytest.mark.parametrize("with_counter", [False, True])
    @pytest.mark.parametrize("with_ttl", [False, True])
    def test_randomized_equivalence(self, with_counter, with_ttl):
        payload = ["text", "role"] + (["cnt"] if with_counter else [])
        counters = ("cnt",) if with_counter else ()
        for trial in range(8):
            rng = np.random.default_rng(100 + trial)
            e1 = _events(rng, 400, 1, with_counter, with_ttl)
            e2 = _events(rng, 300, 401, with_counter, with_ttl)
            s1 = fold_events(e1, KEYS, payload, counters, ttl=with_ttl)
            s2 = fold_events(e2, KEYS, payload, counters, ttl=with_ttl)
            ref = merge_state_frames([s1, s2], KEYS, payload, counters, ttl=with_ttl)
            t1 = fold_events_arrow(
                pa.Table.from_pandas(e1, preserve_index=False),
                KEYS, payload, counters, ttl=with_ttl,
            )
            t2 = fold_events_arrow(
                pa.Table.from_pandas(e2, preserve_index=False),
                KEYS, payload, counters, ttl=with_ttl,
            )
            got = merge_state_tables_arrow(
                [t1, t2], KEYS, payload, counters, ttl=with_ttl
            ).to_pandas()
            if with_counter:
                ref["cnt"] = ref["cnt"].astype("Int64")
                got["cnt"] = got["cnt"].astype("Int64")
            _assert_frames_equal(ref, got)

    def test_counter_identical_cell_dedup(self):
        """The same partial merged twice counts each delta once (exactly-once
        under retried staged writes) — both kernels."""
        rng = np.random.default_rng(7)
        ev = _events(rng, 200, 1, with_counter=True)
        s = fold_events(ev, KEYS, ["cnt"], ("cnt",))
        t = fold_events_arrow(
            pa.Table.from_pandas(ev, preserve_index=False), KEYS, ["cnt"], ("cnt",)
        )
        ref = merge_state_frames([s, s.copy()], KEYS, ["cnt"], ("cnt",))
        got = merge_state_tables_arrow([t, t], KEYS, ["cnt"], ("cnt",)).to_pandas()
        ref["cnt"] = ref["cnt"].astype("Int64")
        got["cnt"] = got["cnt"].astype("Int64")
        _assert_frames_equal(ref, got)
        # and equals the single copy (idempotent)
        single = merge_state_tables_arrow([t], KEYS, ["cnt"], ("cnt",)).to_pandas()
        single["cnt"] = single["cnt"].astype("Int64")
        _assert_frames_equal(single, got)


class TestComputeChangesArrow:
    def _cfg(self):
        pub = pa.schema(
            [
                pa.field("conv_id", pa.string()),
                pa.field("turn_idx", pa.int32()),
                pa.field("text", pa.string()),
                pa.field("role", pa.string()),
            ]
        )
        return MergeConfig(
            lake_dir="/tmp/x",
            run_id="r",
            payload_cols=["text", "role"],
            payload_schema_json=schema_to_json(pub),
            key_cols=tuple(KEYS),
        )

    def test_randomized_equivalence(self):
        cfg = self._cfg()
        payload = ["text", "role"]
        for trial in range(8):
            rng = np.random.default_rng(200 + trial)
            e_old = _events(rng, 300, 1)
            e_new = _events(rng, 120, 301)
            old_pd = fold_events(e_old, KEYS, payload)
            new_pd = fold_events(e_new, KEYS, payload)
            merged_pd = merge_state_frames([new_pd, old_pd], KEYS, payload)
            touched = new_pd[KEYS].drop_duplicates(ignore_index=True)
            ref = _compute_changes(cfg, old_pd, merged_pd, touched).reset_index(
                drop=True
            )

            old_t = fold_events_arrow(
                pa.Table.from_pandas(e_old, preserve_index=False), KEYS, payload
            )
            new_t = fold_events_arrow(
                pa.Table.from_pandas(e_new, preserve_index=False), KEYS, payload
            )
            merged_t = merge_state_tables_arrow([new_t, old_t], KEYS, payload)
            got = _compute_changes_arrow(cfg, old_t, merged_t, new_t).to_pandas()
            assert len(ref) == len(got)
            cols = [*KEYS, CHANGE_COL]
            ref_s = ref.sort_values(cols, ignore_index=True)[got.columns.tolist()]
            got_s = got.sort_values(cols, ignore_index=True)
            for c in got.columns:
                a, b = ref_s[c], got_s[c]
                if a.dtype == object or b.dtype == object:
                    assert (a.fillna("\0") == b.fillna("\0")).all(), c
                else:
                    assert (
                        pd.Series(a).astype("Int64").fillna(-9)
                        == pd.Series(b).astype("Int64").fillna(-9)
                    ).all(), c

    def test_fresh_path_inserts_only(self):
        cfg = self._cfg()
        payload = ["text", "role"]
        rng = np.random.default_rng(9)
        ev = _events(rng, 150, 1)
        st = fold_events_arrow(
            pa.Table.from_pandas(ev, preserve_index=False), KEYS, payload
        )
        out = _compute_changes_arrow(cfg, None, st, st).to_pandas()
        assert set(out[CHANGE_COL]) <= {"insert"}
        live = (~pd.Series(st["__deleted"].to_pylist())).sum()
        assert len(out) == live

    def test_many_key_columns_no_overflow(self):
        """Composite-key id folding must stay exact however many key columns
        / distinct values exist (re-compaction after each column)."""
        rng = np.random.default_rng(3)
        n = 2000
        keys = [f"k{i}" for i in range(6)]
        pub = pa.schema(
            [pa.field(k, pa.int64()) for k in keys] + [pa.field("v", pa.string())]
        )
        cfg = MergeConfig(
            lake_dir="/tmp/x",
            run_id="r",
            payload_cols=["v"],
            payload_schema_json=schema_to_json(pub),
            key_cols=tuple(keys),
        )
        df = pd.DataFrame(
            {k: rng.integers(0, 10**9, n).astype("int64") for k in keys}
        )
        df["v"] = rng.choice(["x", "y"], n)
        df["op"] = "UPSERT"
        df["writetime"] = np.int64(1)
        df["event_seq"] = np.arange(1, n + 1, dtype="int64")
        old = fold_events_arrow(
            pa.Table.from_pandas(df.iloc[: n // 2], preserve_index=False), keys, ["v"]
        )
        new = fold_events_arrow(
            pa.Table.from_pandas(df.iloc[n // 2 :], preserve_index=False), keys, ["v"]
        )
        merged = merge_state_tables_arrow([new, old], keys, ["v"])
        out = _compute_changes_arrow(cfg, old, merged, new).to_pandas()
        # random 6×10^9 keyspace → all new keys distinct from old: all inserts
        assert set(out[CHANGE_COL]) == {"insert"}
        assert len(out) == new.num_rows
