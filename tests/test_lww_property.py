"""Property-based tests: the vectorized folds vs the row-wise oracle on
arbitrary event streams (hypothesis), including the pandas/Arrow fold
equivalence and merge associativity under random chunkings."""

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from cassandra_data_migrator_ray.functions.lww import (
    fold_events,
    fold_events_arrow,
    merge_state_frames,
    state_to_public,
)
from cassandra_data_migrator_ray.gen import oracle_final_state
from cassandra_data_migrator_ray.schema import EVENTS_SCHEMA, KEY_COLS, PAYLOAD_COLS


@st.composite
def event_streams(draw):
    n = draw(st.integers(1, 120))
    convs = ["a", "b", "c"]
    rows = []
    for seq in range(n):
        op = draw(st.sampled_from(["INSERT", "UPSERT", "DELETE"]))
        is_del = op == "DELETE"
        rows.append(
            {
                "op": op,
                "conv_id": draw(st.sampled_from(convs)),
                "turn_idx": np.int32(draw(st.integers(0, 3))),
                "role": None if is_del else draw(st.sampled_from([None, "user", "assistant"])),
                "text": None if is_del else draw(st.sampled_from([None, "x", "y", "z"])),
                "tool": None if is_del else draw(st.sampled_from([None, "t1"])),
                "ts": None,
                # small writetime domain → many ties, exercising the seq tiebreak
                "writetime": draw(st.integers(0, 6)),
                "event_seq": seq,
            }
        )
    return pd.DataFrame(rows)


def to_arrow(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False).cast(EVENTS_SCHEMA)


@settings(max_examples=150, deadline=None)
@given(event_streams())
def test_fold_matches_oracle(df):
    oracle = oracle_final_state(df)
    got = (
        state_to_public(fold_events(df, KEY_COLS, PAYLOAD_COLS), KEY_COLS, PAYLOAD_COLS)
        .sort_values(KEY_COLS, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, oracle, check_dtype=False)


@settings(max_examples=100, deadline=None)
@given(event_streams())
def test_arrow_fold_equals_pandas_fold(df):
    a = (
        fold_events_arrow(to_arrow(df), KEY_COLS, PAYLOAD_COLS)
        .to_pandas()
        .sort_values(KEY_COLS, ignore_index=True)
    )
    b = fold_events(df, KEY_COLS, PAYLOAD_COLS).sort_values(KEY_COLS, ignore_index=True)
    cols = sorted(b.columns)
    pd.testing.assert_frame_equal(a[cols], b[cols], check_dtype=False)


@settings(max_examples=75, deadline=None)
@given(event_streams(), st.integers(1, 5), st.randoms(use_true_random=False))
def test_chunked_merge_equals_oracle(df, nchunks, rnd):
    """Any partition of the stream into chunks, folded independently and
    merged in any order, converges to the oracle (associativity+commutativity)."""
    idx = list(range(len(df)))
    rnd.shuffle(idx)
    chunks = np.array_split(np.array(idx), min(nchunks, len(df)))
    partials = [
        fold_events(df.iloc[c].reset_index(drop=True), KEY_COLS, PAYLOAD_COLS)
        for c in chunks
        if len(c)
    ]
    rnd.shuffle(partials)
    merged = merge_state_frames(partials, KEY_COLS, PAYLOAD_COLS)
    got = (
        state_to_public(merged, KEY_COLS, PAYLOAD_COLS)
        .sort_values(KEY_COLS, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, oracle_final_state(df), check_dtype=False)


@st.composite
def ttl_event_streams(draw):
    """Streams carrying a ttl column with the full value domain:
    null (no expiry), 0 (CQL: explicitly NO expiry), and positive seconds."""
    df = draw(event_streams())
    df["ttl"] = [
        draw(st.sampled_from([None, 0, 1, 5, 100])) for _ in range(len(df))
    ]
    df.loc[df["op"] == "DELETE", "ttl"] = None
    return df


def _ttl_arrow(df: pd.DataFrame) -> pa.Table:
    t = pa.Table.from_pandas(df, preserve_index=False)
    i = t.column_names.index("ttl")
    return t.set_column(i, "ttl", t["ttl"].cast(pa.int64()))


@settings(max_examples=75, deadline=None)
@given(ttl_event_streams())
def test_ttl_arrow_fold_equals_pandas_fold(df):
    a = (
        fold_events_arrow(_ttl_arrow(df), KEY_COLS, PAYLOAD_COLS, ttl=True)
        .to_pandas()
        .sort_values(KEY_COLS, ignore_index=True)
    )
    b = fold_events(df, KEY_COLS, PAYLOAD_COLS, ttl=True).sort_values(
        KEY_COLS, ignore_index=True
    )
    cols = sorted(b.columns)
    pd.testing.assert_frame_equal(a[cols], b[cols], check_dtype=False)


@settings(max_examples=50, deadline=None)
@given(event_streams(), st.sampled_from([None, 0]))
def test_ttl_null_and_zero_never_expire(df, ttlv):
    """null and 0 ttl are both 'no expiry' (CQL USING TTL 0 removes the TTL):
    state read arbitrarily far in the future equals the no-TTL fold."""
    from cassandra_data_migrator_ray.functions.lww import apply_ttl_expiry

    dft = df.copy()
    dft["ttl"] = ttlv
    st_ttl = fold_events(dft, KEY_COLS, PAYLOAD_COLS, ttl=True)
    far = apply_ttl_expiry(st_ttl, as_of=10**18, payload_cols=PAYLOAD_COLS)
    got = state_to_public(far, KEY_COLS, PAYLOAD_COLS).sort_values(
        KEY_COLS, ignore_index=True
    )
    pd.testing.assert_frame_equal(got, oracle_final_state(df), check_dtype=False)
