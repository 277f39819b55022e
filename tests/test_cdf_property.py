"""Property test of the change-data-feed invariant, driver-side (no Ray):
for ANY split of ANY event stream, applying the incremental merge's feed to
the prior public state reproduces the new public state exactly — inserts for
newly-live keys, pre+post pairs for net payload changes, deletes for
newly-tombstoned keys, and silence for LWW losers.

This is the pure-function core of what tests/test_lake_features.py pins
end-to-end through replay(): _compute_changes sits between fold_events /
merge_state_frames (the engine's merge) and apply_changes (the downstream
replica primitive)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cassandra_data_migrator_ray.functions.lww import fold_events, merge_state_frames
from cassandra_data_migrator_ray.schema import DELETED
from cassandra_data_migrator_ray.sources.lake import apply_changes
from cassandra_data_migrator_ray.stages.merge import (
    CHANGE_COL,
    MergeConfig,
    _compute_changes,
)

KEY = ["conv_id", "turn_idx"]
PAYLOAD = ["text", "score"]


def _cfg() -> MergeConfig:
    return MergeConfig(
        lake_dir="/nonexistent",
        run_id="prop",
        payload_cols=PAYLOAD,
        payload_schema_json=[
            ["conv_id", "string"],
            ["turn_idx", "int64"],
            ["text", "string"],
            ["score", "int64"],
        ],
        key_cols=tuple(KEY),
    )


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),              # conv_id
        st.integers(min_value=0, max_value=2),          # turn_idx
        st.sampled_from(["UPSERT", "DELETE"]),          # op
        st.integers(min_value=0, max_value=8),          # writetime (ties!)
        st.sampled_from(["x", "y", None]),              # text (None = unset)
        st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),  # score
    ),
    min_size=0,
    max_size=40,
)


def _frame(rows, seq0=0):
    return pd.DataFrame(
        {
            "conv_id": [r[0] for r in rows],
            "turn_idx": np.array([r[1] for r in rows], dtype=np.int64),
            "op": [r[2] for r in rows],
            "writetime": np.array([r[3] for r in rows], dtype=np.int64),
            "event_seq": np.arange(seq0, seq0 + len(rows), dtype=np.int64),
            "text": pd.array([r[4] for r in rows], dtype="object"),
            "score": pd.array([r[5] for r in rows], dtype="Int64"),
        }
    )


def _public(state: pd.DataFrame) -> pd.DataFrame:
    live = state[~state[DELETED].to_numpy(dtype=bool)]
    return (
        live[KEY + PAYLOAD]
        .sort_values(KEY, kind="mergesort", ignore_index=True)
        .astype({"score": "Int64"})
    )


@settings(max_examples=120, deadline=None)
@given(ev=events_strategy, split=st.integers(min_value=0, max_value=40))
def test_feed_applied_to_prior_public_state_is_next_state(ev, split):
    split = min(split, len(ev))
    first, second = ev[:split], ev[split:]
    cfg = _cfg()
    old = fold_events(_frame(first), KEY, PAYLOAD)
    partials = fold_events(_frame(second, seq0=1000), KEY, PAYLOAD)
    frames = [f for f in (partials, old) if len(f)]
    state = (
        merge_state_frames(frames, KEY, PAYLOAD) if frames else old
    )
    touched = partials[KEY].drop_duplicates(ignore_index=True)
    changes = _compute_changes(cfg, old, state, touched)

    got = apply_changes(_public(old), changes, KEY)
    want = _public(state)
    pd.testing.assert_frame_equal(
        got.astype({"score": "Int64"}), want, check_dtype=False
    )

    # classification sanity: pre/post pairs are 1:1 on the same keys, and no
    # feed row references an untouched key
    pre = changes[changes[CHANGE_COL] == "update_preimage"]
    post = changes[changes[CHANGE_COL] == "update_postimage"]
    assert len(pre) == len(post)
    pd.testing.assert_frame_equal(
        pre[KEY].reset_index(drop=True), post[KEY].reset_index(drop=True)
    )
    if len(changes):
        tk = set(map(tuple, touched.to_numpy()))
        assert set(map(tuple, changes[KEY].to_numpy())) <= tk


@settings(max_examples=60, deadline=None)
@given(ev=events_strategy)
def test_empty_increment_emits_nothing(ev):
    cfg = _cfg()
    old = fold_events(_frame(ev), KEY, PAYLOAD)
    partials = fold_events(_frame([], seq0=1000), KEY, PAYLOAD)
    state = merge_state_frames([old], KEY, PAYLOAD) if len(old) else old
    changes = _compute_changes(
        cfg, old, state, partials[KEY].drop_duplicates(ignore_index=True)
    )
    assert len(changes) == 0


# ---- routing properties (no Ray) -------------------------------------------

route_keys = st.lists(
    st.tuples(
        st.text(alphabet="abcxyz0123456789-", min_size=0, max_size=12),
        st.integers(min_value=-5, max_value=500),
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(
    keys=route_keys,
    num_parts=st.sampled_from([1, 2, 7, 64, 256, 100_000]),
    salt=st.sampled_from([1, 2, 4, 32]),
)
def test_candidate_partitions_always_cover_the_write_route(keys, num_parts, salt):
    """For ANY key set / partition count / salt, the read-side candidate set
    contains the partition the write side routes to, and is at most ``salt``
    wide — the invariant lookup()'s pruning correctness rests on."""
    from cassandra_data_migrator_ray.state.partitioning import (
        assign_partition_keys,
        candidate_partitions,
    )

    convs = np.array([k[0] for k in keys], dtype=object)
    turns = np.array([k[1] for k in keys], dtype=np.int64)
    actual = assign_partition_keys([convs, turns], num_parts, salt)
    cand = candidate_partitions(convs, num_parts, salt)
    for v, p in zip(convs, actual):
        assert int(p) in cand[v]
        assert 1 <= len(cand[v]) <= max(1, salt)
