"""Property tests for the round-4-continuation surfaces: the y4m video
codec, the PQ encode/decode kernels, and the CQL CREATE TABLE parser —
hypothesis-driven round-trips and invariants, no Ray needed."""

import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from cassandra_data_migrator_ray.config_builder import parse_cql_schema
from cassandra_data_migrator_ray.functions.multimodal import (
    decode_y4m,
    encode_y4m,
)
from cassandra_data_migrator_ray.functions.similarity import (
    adc_scores,
    adc_tables,
    pq_decode,
    pq_encode,
)


class TestY4mProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 6),
        h=st.integers(1, 8).map(lambda x: x * 2),
        w=st.integers(1, 8).map(lambda x: x * 2),
        seed=st.integers(0, 2**31 - 1),
        fps=st.integers(1, 120),
    )
    def test_roundtrip_any_shape(self, n, h, w, seed, fps):
        frames = np.random.default_rng(seed).integers(
            0, 256, size=(n, h, w), dtype=np.uint8
        )
        out = decode_y4m(encode_y4m(frames, fps=fps))
        assert out.shape == (n, h, w)
        np.testing.assert_array_equal(out, frames)

    @settings(max_examples=20, deadline=None)
    @given(n=st.integers(1, 4), cut=st.integers(1, 40))
    def test_truncation_never_returns_wrong_frames(self, n, cut):
        """Any truncated payload either raises ValueError or (when the cut
        lands exactly on a frame boundary) returns only complete frames."""
        frames = np.arange(n * 4 * 4, dtype=np.uint8).reshape(n, 4, 4)
        payload = encode_y4m(frames)
        clipped = payload[: len(payload) - cut]
        try:
            got = decode_y4m(clipped)
        except ValueError:
            return
        assert got.shape[0] < n or cut == 0
        np.testing.assert_array_equal(got, frames[: got.shape[0]])


class TestPqProperty:
    @settings(max_examples=30, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        m=st.sampled_from([2, 4, 8]),
        ksub=st.sampled_from([4, 16, 64]),
        n=st.integers(1, 50),
    )
    def test_codebook_points_roundtrip_and_adc_is_exact_ip(self, seed, m, ksub, n):
        """Vectors on codebook points: encode/decode is the identity and the
        ADC score equals the exact inner product for any query."""
        rng = np.random.default_rng(seed)
        dsub = 2
        books = rng.standard_normal((m, ksub, dsub))
        codes = rng.integers(0, ksub, size=(n, m))
        vecs = np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)
        got = pq_encode(vecs, books)
        np.testing.assert_array_equal(pq_decode(got, books), vecs)
        q = rng.standard_normal(m * dsub)
        T = adc_tables(q[None, :], books)
        np.testing.assert_allclose(adc_scores(got, T[0]), vecs @ q)

    @settings(max_examples=30, deadline=None)
    @given(seed=st.integers(0, 2**31 - 1))
    def test_encode_picks_nearest_centroid(self, seed):
        """Reconstruction error per subvector is minimal over the codebook
        (the defining property of the encoder)."""
        rng = np.random.default_rng(seed)
        books = rng.standard_normal((3, 8, 2))
        vecs = rng.standard_normal((20, 6))
        codes = pq_encode(vecs, books)
        for j in range(3):
            sub = vecs[:, 2 * j : 2 * j + 2]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(-1)
            np.testing.assert_allclose(
                d2[np.arange(20), codes[:, j]], d2.min(axis=1)
            )


_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
_type = st.sampled_from(
    ["int", "bigint", "text", "uuid", "timestamp", "blob",
     "list<text>", "map<text, int>", "frozen<addr_udt>", "decimal"]
)


class TestCqlParserProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        ks=_ident,
        tbl=_ident,
        cols=st.dictionaries(_ident, _type, min_size=2, max_size=8),
        n_part=st.integers(1, 2),
        n_clust=st.integers(0, 2),
    )
    def test_generated_tables_parse_exactly(self, ks, tbl, cols, n_part, n_clust):
        names = list(cols)
        n_part = min(n_part, len(names))
        n_clust = min(n_clust, len(names) - n_part)
        pk = names[:n_part]
        ck = names[n_part : n_part + n_clust]
        pk_spec = (
            f"(({', '.join(pk)})" + (", " + ", ".join(ck) if ck else "") + ")"
            if len(pk) > 1
            else f"({', '.join(pk + ck)})"
        )
        cql = (
            f"CREATE TABLE {ks}.{tbl} (\n"
            + ",\n".join(f"  {n} {t}" for n, t in cols.items())
            + f",\n  PRIMARY KEY {pk_spec}\n)"
        )
        s = parse_cql_schema(cql)
        assert s.keyspace == ks and s.table == tbl
        assert s.partition_keys == pk
        assert s.clustering_keys == ck
        assert dict(s.columns) == cols
        assert s.is_partition_key_only == (not ck)
