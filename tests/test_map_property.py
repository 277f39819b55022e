"""Property tests for the Arrow offsets machinery in map transforms.

ExplodeMap / MapScrubNulls rebuild MapArrays via raw offsets arithmetic
(pc.list_parent_indices aborts on MapArray in this pyarrow build) — exactly
the code shape where null-row and empty-row handling slips.  Each transform is
checked against an obviously-correct Python reference over random maps
including nulls, empty maps and null values.
"""

import hypothesis.strategies as st
import pyarrow as pa
from hypothesis import given, settings

from cassandra_data_migrator_ray.functions.transforms import ExplodeMap, MapScrubNulls

keys = st.text(alphabet="abcdef", min_size=1, max_size=3)
maps = st.one_of(
    st.none(),
    st.dictionaries(keys, st.one_of(st.none(), st.integers(-100, 100)), max_size=5),
)


def table_of(ms):
    return pa.table(
        {
            "rid": pa.array(range(len(ms)), pa.int64()),
            "m": pa.array(
                [None if v is None else list(v.items()) for v in ms],
                pa.map_(pa.string(), pa.int64()),
            ),
        }
    )


class TestExplodeMapProperty:
    @settings(max_examples=50, deadline=None)
    @given(st.lists(maps, min_size=1, max_size=8))
    def test_matches_python_reference(self, ms):
        out = ExplodeMap("m", "k", "v")(table_of(ms)).to_pylist()
        expected = [
            {"rid": i, "k": k, "v": v}
            for i, m in enumerate(ms)
            if m
            for k, v in m.items()
        ]
        assert out == expected

    @settings(max_examples=25, deadline=None)
    @given(st.lists(maps, min_size=1, max_size=8))
    def test_keep_map_retains_column(self, ms):
        out = ExplodeMap("m", "k", "v", keep_map=True)(table_of(ms))
        assert set(out.column_names) == {"rid", "m", "k", "v"}
        n_entries = sum(len(m) for m in ms if m)
        assert len(out) == n_entries


class TestMapScrubNullsProperty:
    @settings(max_examples=50, deadline=None)
    @given(st.lists(maps, min_size=1, max_size=8))
    def test_matches_python_reference(self, ms):
        out = MapScrubNulls("m")(table_of(ms))["m"].to_pylist()
        expected = [
            None
            if m is None
            else [(k, v) for k, v in m.items() if v is not None]
            for m in ms
        ]
        assert out == expected, f"input={ms}"


class TestWritetimeMaxListProperty:
    """Collection writetimes (list columns) reduce to per-row max first
    (reference WritetimeTTL.java:247-258 flatten+max)."""

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 10**6)),  # scalar wt col
                st.one_of(  # list wt col
                    st.none(),
                    st.lists(st.one_of(st.none(), st.integers(0, 10**6)), max_size=4),
                ),
            ),
            min_size=1,
            max_size=8,
        )
    )
    def test_scalar_plus_list_max(self, rows):
        from cassandra_data_migrator_ray.functions.transforms import WritetimeMax

        t = pa.table(
            {
                "w1": pa.array([r[0] for r in rows], pa.int64()),
                "w2": pa.array([r[1] for r in rows], pa.list_(pa.int64())),
            }
        )
        out = WritetimeMax(["w1", "w2"], out_col="wt")(t)["wt"].to_pylist()
        expected = []
        for s, lst in rows:
            cand = [] if s is None else [s]
            if lst:
                cand += [x for x in lst if x is not None]
            expected.append(max(cand) if cand else None)
        assert out == expected, rows


class TestSignatureBatchInvariance:
    """Per-doc signatures must not depend on batch composition — the Ray
    pipeline splits docs into arbitrary batches.  (Regression: add.reduceat
    with clipped starts corrupted the last nonempty doc's simhash when the
    batch ended in empty docs.)"""

    texts = st.lists(
        st.one_of(st.just(""), st.text(alphabet="ab cd", max_size=30)),
        min_size=1,
        max_size=6,
    )

    @settings(max_examples=40, deadline=None)
    @given(texts)
    def test_simhash_minhash_fingerprint(self, docs):
        import pandas as pd

        from cassandra_data_migrator_ray.functions.dedup import (
            minhash_signatures,
            simhash64,
        )
        from cassandra_data_migrator_ray.functions.text import Fingerprint

        import numpy as np

        whole_s = simhash64(pd.Series(docs))
        whole_m = minhash_signatures(pd.Series(docs), num_perm=8)
        whole_f = Fingerprint()(pd.DataFrame({"text": docs}))["min_shingle_hash"]
        for i, d in enumerate(docs):
            one = pd.Series([d])
            assert simhash64(one)[0] == whole_s[i], ("simhash", i, docs)
            assert np.array_equal(
                minhash_signatures(one, num_perm=8)[0], whole_m[i]
            ), ("minhash", i, docs)
            assert (
                Fingerprint()(pd.DataFrame({"text": [d]}))["min_shingle_hash"][0]
                == whole_f[i]
            ), ("fingerprint", i, docs)


class TestTextOpsBatchInvariance:
    """LangId / QualityScore per-doc outputs must not depend on which other
    docs share the batch (factorize/bincount are batch-level internally)."""

    texts = st.lists(
        st.one_of(
            st.just(""),
            st.text(alphabet="the and der die le la el los x ", max_size=60),
        ),
        min_size=1,
        max_size=5,
    )

    @settings(max_examples=30, deadline=None)
    @given(texts)
    def test_langid_quality(self, docs):
        import pandas as pd

        from cassandra_data_migrator_ray.functions.text import LangId, QualityScore

        df = pd.DataFrame({"text": docs})
        whole_l = LangId()(df.copy())["pred_lang"].tolist()
        whole_q = QualityScore()(df.copy())["quality_score"].tolist()
        for i, d in enumerate(docs):
            one = pd.DataFrame({"text": [d]})
            assert LangId()(one.copy())["pred_lang"][0] == whole_l[i], (i, docs)
            assert QualityScore()(one.copy())["quality_score"][0] == whole_q[i]
