"""Unit tests for the cell-level LWW fold/merge kernel (no Ray needed).

Mirrors the reference's WritetimeTTL / SIT ttl_writetime semantics tests
(/root/reference SIT/smoke/03_ttl_writetime, feature/WritetimeTTLTest.java):
max-writetime wins, deterministic tiebreak, unset-null, tombstones.
"""

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.functions.lww import (
    compact_tombstones,
    fold_events,
    merge_state_frames,
    state_to_public,
)
from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
from cassandra_data_migrator_ray.schema import DELETED, KEY_COLS, PAYLOAD_COLS


def ev(op, conv, turn, wt, seq, role=None, text=None, tool=None, ts=None):
    return {
        "op": op,
        "conv_id": conv,
        "turn_idx": np.int32(turn),
        "role": role,
        "text": text,
        "tool": tool,
        "ts": pd.Timestamp(ts) if ts else None,
        "writetime": wt,
        "event_seq": seq,
    }


def fold(events):
    return fold_events(pd.DataFrame(events), KEY_COLS, PAYLOAD_COLS)


def public(state):
    return state_to_public(state, KEY_COLS, PAYLOAD_COLS)


class TestFold:
    def test_last_writetime_wins(self):
        st = fold(
            [
                ev("INSERT", "c1", 0, wt=10, seq=0, text="old"),
                ev("UPSERT", "c1", 0, wt=20, seq=1, text="new"),
                ev("UPSERT", "c1", 0, wt=15, seq=2, text="middle-late"),  # late, older
            ]
        )
        out = public(st)
        assert out["text"].tolist() == ["new"]

    def test_equal_writetime_seq_tiebreak(self):
        st = fold(
            [
                ev("UPSERT", "c1", 0, wt=10, seq=5, text="a"),
                ev("UPSERT", "c1", 0, wt=10, seq=9, text="b"),
                ev("UPSERT", "c1", 0, wt=10, seq=7, text="c"),
            ]
        )
        assert public(st)["text"].tolist() == ["b"]

    def test_unset_null_keeps_existing_cell(self):
        st = fold(
            [
                ev("INSERT", "c1", 0, wt=10, seq=0, text="keep-me", role="user"),
                ev("UPSERT", "c1", 0, wt=20, seq=1, text=None, role="assistant"),
            ]
        )
        out = public(st)
        assert out["text"].tolist() == ["keep-me"]
        assert out["role"].tolist() == ["assistant"]

    def test_delete_tombstone(self):
        st = fold(
            [
                ev("INSERT", "c1", 0, wt=10, seq=0, text="x"),
                ev("DELETE", "c1", 0, wt=20, seq=1),
            ]
        )
        assert len(public(st)) == 0
        assert st[DELETED].tolist() == [True]

    def test_late_old_upsert_does_not_resurrect(self):
        st = fold(
            [
                ev("INSERT", "c1", 0, wt=10, seq=0, text="x"),
                ev("DELETE", "c1", 0, wt=30, seq=1),
                ev("UPSERT", "c1", 0, wt=20, seq=2, text="late-old"),  # arrives after
            ]
        )
        assert len(public(st)) == 0

    def test_newer_upsert_after_delete_recreates_from_scratch(self):
        st = fold(
            [
                ev("INSERT", "c1", 0, wt=10, seq=0, text="x", tool="search"),
                ev("DELETE", "c1", 0, wt=20, seq=1),
                ev("UPSERT", "c1", 0, wt=30, seq=2, text="fresh"),
            ]
        )
        out = public(st)
        assert out["text"].tolist() == ["fresh"]
        assert out["tool"].isna().all()  # pre-delete cell must NOT leak through

    def test_compact_tombstones(self):
        st = fold(
            [
                ev("INSERT", "c1", 0, wt=10, seq=0, text="x"),
                ev("DELETE", "c1", 0, wt=20, seq=1),
                ev("INSERT", "c2", 0, wt=10, seq=2, text="y"),
            ]
        )
        assert len(st) == 2
        assert len(compact_tombstones(st)) == 1
        # grace: tombstone newer than the low-watermark must be kept
        assert len(compact_tombstones(st, grace_wt=15)) == 2
        assert len(compact_tombstones(st, grace_wt=25)) == 1

    def test_duplicate_delivery_idempotent(self):
        e = ev("INSERT", "c1", 0, wt=10, seq=0, text="x")
        st = fold([e, dict(e)])
        assert public(st)["text"].tolist() == ["x"]


class TestMergeAssociativity:
    @pytest.mark.parametrize("nchunks", [2, 5, 13])
    def test_chunked_equals_oracle(self, nchunks):
        evd = gen_change_stream(n_convs=30, n_events=2500, seed=101).to_pandas()
        oracle = oracle_final_state(evd)
        chunks = np.array_split(np.arange(len(evd)), nchunks)
        partials = [fold_events(evd.iloc[c], KEY_COLS, PAYLOAD_COLS) for c in chunks]
        merged = merge_state_frames(partials, KEY_COLS, PAYLOAD_COLS)
        got = public(merged).sort_values(KEY_COLS, ignore_index=True)
        pd.testing.assert_frame_equal(got, oracle, check_dtype=False)

    def test_merge_order_invariance(self):
        evd = gen_change_stream(n_convs=10, n_events=600, seed=3).to_pandas()
        chunks = np.array_split(np.arange(len(evd)), 4)
        partials = [fold_events(evd.iloc[c], KEY_COLS, PAYLOAD_COLS) for c in chunks]
        a = public(merge_state_frames(partials, KEY_COLS, PAYLOAD_COLS))
        b = public(merge_state_frames(partials[::-1], KEY_COLS, PAYLOAD_COLS))
        a = a.sort_values(KEY_COLS, ignore_index=True)
        b = b.sort_values(KEY_COLS, ignore_index=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestCounters:
    def test_additive_counters(self):
        events = pd.DataFrame(
            [
                {**ev("INSERT", "c1", 0, wt=10, seq=0), "tool_calls": 3.0},
                {**ev("UPSERT", "c1", 0, wt=20, seq=1), "tool_calls": 4.0},
                {**ev("UPSERT", "c1", 0, wt=5, seq=2), "tool_calls": 2.0},  # late, still adds
            ]
        )
        st = fold_events(events, KEY_COLS, ["tool_calls"], counter_cols=["tool_calls"])
        out = state_to_public(st, KEY_COLS, ["tool_calls"])
        assert out["tool_calls"].tolist() == [9.0]

    def test_counter_merge_adds_across_partials(self):
        events = pd.DataFrame(
            [
                {**ev("INSERT", "c1", 0, wt=10, seq=0), "n": 1.0},
                {**ev("UPSERT", "c1", 0, wt=20, seq=1), "n": 10.0},
                {**ev("UPSERT", "c1", 0, wt=30, seq=2), "n": 100.0},
            ]
        )
        p1 = fold_events(events.iloc[:1], KEY_COLS, ["n"], counter_cols=["n"])
        p2 = fold_events(events.iloc[1:], KEY_COLS, ["n"], counter_cols=["n"])
        merged = merge_state_frames([p1, p2], KEY_COLS, ["n"], counter_cols=["n"])
        assert state_to_public(merged, KEY_COLS, ["n"])["n"].tolist() == [111.0]
