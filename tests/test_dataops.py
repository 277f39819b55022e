"""Tests for training-data ops: dedup, similarity, text analysis."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from cassandra_data_migrator_ray.functions.dedup import (
    hamming64,
    minhash_signatures,
    ngram_jaccard,
    simhash64,
)
from cassandra_data_migrator_ray.functions.text import (
    Fingerprint,
    LangId,
    QualityScore,
    TokenCount,
)

SF = "/root/testdata/sf0.001"


def docs_df(n=30):
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about ray data pipelines and arrow",
        "der schnelle braune fuchs springt über den faulen hund und die katze",
    ]
    rows = []
    for i in range(n):
        t = base[i % 3]
        if i >= 27:  # 3 near-dups of doc 0 (one word changed)
            t = base[0].replace("dog", f"cat{i}")
        rows.append({"doc_id": i, "text": t})
    return pd.DataFrame(rows)


class TestKernels:
    def test_minhash_identical_texts_equal_sigs(self):
        s = pd.Series(["a b c d e f g", "a b c d e f g", "x y z w v u t"])
        sig = minhash_signatures(s, num_perm=32)
        assert (sig[0] == sig[1]).all()
        assert (sig[0] != sig[2]).any()

    def test_minhash_similarity_tracks_jaccard(self):
        a = "w" + " w".join(str(i) for i in range(100))
        b = a.replace("w50", "x50")  # tiny edit
        c = " ".join(f"z{i}" for i in range(100))
        sig = minhash_signatures(pd.Series([a, b, c]), num_perm=128)
        sim_ab = (sig[0] == sig[1]).mean()
        sim_ac = (sig[0] == sig[2]).mean()
        assert sim_ab > 0.8
        assert sim_ac < 0.2

    def test_simhash_near_texts_low_hamming(self):
        s = pd.Series(
            [
                " ".join(f"tok{i}" for i in range(200)),
                " ".join(f"tok{i}" for i in range(199)) + " xdiff",
                " ".join(f"other{i}" for i in range(200)),
            ]
        )
        sh = simhash64(s)
        near = hamming64(sh[[0]], sh[[1]])[0]
        far = hamming64(sh[[0]], sh[[2]])[0]
        assert near < 8
        assert far > 16

    def test_ngram_jaccard(self):
        assert ngram_jaccard("a b c d", "a b c d") == 1.0
        assert ngram_jaccard("a b c d", "x y z w") == 0.0
        assert ngram_jaccard("", "") == 1.0

    def test_empty_and_short_texts(self):
        s = pd.Series(["", "one", "two words here and more padding"])
        sig = minhash_signatures(s, num_perm=16)
        sh = simhash64(s)
        assert sig.shape == (3, 16)
        assert sh.shape == (3,)


class TestTextOps:
    def test_token_count(self):
        df = pd.DataFrame({"text": ["hello world", "a, b! c?", "", None]})
        out = TokenCount()(df)
        assert out["n_ws_tokens"].tolist() == [2, 3, 0, 0]
        assert out["n_bpe_tokens"].tolist() == [2, 6, 0, 0]

    def test_quality_score_bounds(self):
        df = pd.DataFrame(
            {
                "text": [
                    "the quick brown fox jumps over the lazy dog and keeps running far",
                    "!!!",
                    "",
                ]
            }
        )
        out = QualityScore(min_chars=10)(df)
        assert 0 <= out["quality_score"].min() <= out["quality_score"].max() <= 1
        assert out["quality_score"].iloc[0] > out["quality_score"].iloc[1]

    def test_langid(self):
        df = pd.DataFrame(
            {
                "text": [
                    "the cat and the dog sat in a corner of the room for a while",
                    "der hund und die katze sind nicht mit dem mann zu hause",
                    "le chat et le chien sont pour une promenade est que",
                    "这是一个中文句子 的 测试",
                ]
            }
        )
        out = LangId()(df)
        assert out["pred_lang"].tolist() == ["en", "de", "fr", "zh"]

    def test_fingerprint_deterministic(self):
        df1 = Fingerprint()(pd.DataFrame({"text": ["a b c d e", "x y z"]}))
        df2 = Fingerprint()(pd.DataFrame({"text": ["a b c d e", "x y z"]}))
        assert df1["text_hash"].tolist() == df2["text_hash"].tolist()
        assert df1["min_shingle_hash"].tolist() == df2["min_shingle_hash"].tolist()


@pytest.mark.usefixtures("ray_session")
class TestDedupPipelines:
    def test_dedup_exact(self):
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_exact

        df = pd.DataFrame(
            {"doc_id": [5, 3, 9, 1, 7], "text": ["A", "A", "B", "B", "C"]}
        )
        out = (
            dedup_exact(ray.data.from_pandas(df))
            .to_pandas()
            .sort_values("text", ignore_index=True)
        )
        assert out["doc_id"].tolist() == [3, 1, 7]
        assert out["n_dups"].tolist() == [2, 2, 1]

    def test_dedup_exact_hash_only_matches(self):
        """carry_text=False (128-bit hash only through the shuffle) must agree
        with the collision-proof text-carrying fold on survivors and counts."""
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_exact

        df = docs_df()
        a = (
            dedup_exact(ray.data.from_pandas(df))
            .to_pandas()[["doc_id", "n_dups"]]
            .sort_values("doc_id", ignore_index=True)
        )
        b = (
            dedup_exact(ray.data.from_pandas(df), carry_text=False)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_dedup_minhash_lsh_finds_neardups(self):
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_minhash_lsh

        ds = ray.data.from_pandas(docs_df())
        pairs = dedup_minhash_lsh(ds, threshold=0.5).to_pandas()
        # docs 0,3,6,...,27,28,29 are exact or near dups of base[0]
        assert len(pairs) > 10
        assert (pairs["jaccard"] >= 0.5).all()
        assert (pairs["id_a"] < pairs["id_b"]).all()
        # every exact-dup pair of base[1] family shares jaccard 1.0
        fam1 = {1, 4, 7, 10, 13, 16, 19, 22, 25}
        exact = pairs[(pairs["id_a"].isin(fam1)) & (pairs["id_b"].isin(fam1))]
        assert (exact["jaccard"] == 1.0).all() and len(exact) == 36

    def test_minhash_distributed_verify_matches_driver(self):
        """verify='distributed' (no text/set ever on the driver; two
        candidate-proportional groupby exchanges) must produce exactly the
        driver-verified pair set and scores."""
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_minhash_lsh

        ds = ray.data.from_pandas(docs_df())
        a = (
            dedup_minhash_lsh(ds, threshold=0.5, verify="driver")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        b = (
            dedup_minhash_lsh(ds, threshold=0.5, verify="distributed")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 10

    def test_minhash_distributed_collect_matches_driver(self):
        """collect='distributed' (pair list never lands on the driver: pair
        dedup groupby + Bloom-broadcast payload gather) must produce exactly
        the driver-collected pair set and scores."""
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_minhash_lsh

        ds = ray.data.from_pandas(docs_df())
        a = (
            dedup_minhash_lsh(ds, threshold=0.5, verify="driver")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        b = (
            dedup_minhash_lsh(ds, threshold=0.5, collect="distributed")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 10

    def test_minhash_collect_auto_picks_by_scale(self):
        """collect='auto': a small plain-source corpus takes the driver-
        collect route (the distributed exchanges are fixed overhead at this
        scale); forcing the threshold to 0 escalates to the distributed
        route — both must equal the explicit-mode results."""
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_minhash_lsh

        ds = ray.data.from_pandas(docs_df())
        want = (
            dedup_minhash_lsh(ds, threshold=0.5, collect="driver")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        auto_small = (
            dedup_minhash_lsh(ds, threshold=0.5, collect="auto")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(auto_small, want)
        auto_big = (
            dedup_minhash_lsh(
                ds, threshold=0.5, collect="auto", auto_driver_max_docs=0
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(auto_big, want)

    def test_dedup_simhash(self):
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_simhash

        ds = ray.data.from_pandas(docs_df())
        pairs = dedup_simhash(ds, max_hamming=0).to_pandas()
        assert len(pairs) >= 3 * 36  # three exact families of 9/10 docs
        assert (pairs["hamming"] == 0).all()

    def test_dedup_simhash_distributed_collect_matches_driver(self):
        """collect='distributed' (pair dedup via groupby, metric via dataset
        sum — no pair list on the driver) must produce exactly the driver
        pair set, including the truncation count from oversized buckets."""
        from cassandra_data_migrator_ray.pipelines import dataops

        df = docs_df()
        ds = ray.data.from_pandas(df)
        a = (
            dataops.dedup_simhash(ds, max_hamming=0, collect="driver")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        stats_a = dict(dataops.LAST_RUN_STATS["simhash"])
        b = (
            dataops.dedup_simhash(ds, max_hamming=0, collect="distributed")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        stats_b = dict(dataops.LAST_RUN_STATS["simhash"])
        pd.testing.assert_frame_equal(a, b)
        assert stats_a == stats_b
        # oversized bucket: identical docs flood one bucket past max_bucket;
        # the distributed metric reduction must count the same drops
        flood = pd.DataFrame(
            {
                "doc_id": np.arange(10, dtype=np.int64),
                "text": ["the same exact document text here"] * 10,
            }
        )
        fds = ray.data.from_pandas(flood)
        da = dataops.dedup_simhash(fds, max_bucket=4, collect="driver").to_pandas()
        drop_a = dataops.LAST_RUN_STATS["simhash"]["pairs_dropped"]
        db = dataops.dedup_simhash(
            fds, max_bucket=4, collect="distributed"
        ).to_pandas()
        drop_b = dataops.LAST_RUN_STATS["simhash"]["pairs_dropped"]
        assert drop_a == drop_b > 0
        pd.testing.assert_frame_equal(
            da.sort_values(["id_a", "id_b"], ignore_index=True),
            db.sort_values(["id_a", "id_b"], ignore_index=True),
        )


@pytest.mark.usefixtures("ray_session")
class TestSimilarity:
    def test_ann_topk_exact_vs_numpy(self):
        from cassandra_data_migrator_ray.pipelines.dataops import ann_topk

        emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        pdf = emb.to_pandas()
        vecs = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        q = vecs[0]
        got = ann_topk(emb, q, k=5)
        # numpy reference
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q)
        sims = vn @ qn
        order = np.lexsort((pdf["vec_id"].to_numpy(), -sims))[:5]
        assert got["vec_id"].tolist() == pdf["vec_id"].to_numpy()[order].tolist()
        assert got["rank"].tolist() == [0, 1, 2, 3, 4]

    def test_ann_topk_distributed_merge_matches_driver(self):
        """The groupby(qi) distributed merge (large-query-set path, driver
        sees only q×k rows) must match the driver heap merge exactly."""
        from cassandra_data_migrator_ray.pipelines.dataops import ann_topk

        emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        pdf = emb.to_pandas()
        vecs = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
        q = vecs[:6]
        qids = np.array([100, 200, 300, 400, 500, 600], dtype=np.int64)
        a = ann_topk(emb, q, k=5, query_ids=qids, merge="driver")
        b = ann_topk(emb, q, k=5, query_ids=qids, merge="distributed")
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
        assert set(a["query_id"]) == set(qids)

    def test_ivf_refined_centroids_match_bruteforce_at_full_probe(self):
        """Distributed Lloyd refinement (per-block partial sums, driver sees
        only C×d reductions) keeps exact rank parity at full probe, and the
        refined centroids are valid unit vectors that cover the corpus."""
        from cassandra_data_migrator_ray.functions.similarity import (
            kmeans_refine_distributed,
        )
        from cassandra_data_migrator_ray.pipelines.dataops import ann_topk, ann_topk_ivf

        emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
        pdf = emb.to_pandas()
        q = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)[3]
        bf = ann_topk(emb, q, k=5)
        ivf = ann_topk_ivf(emb, q, k=5, n_centroids=8, nprobe=8, refine_iters=2)
        assert ivf["vec_id"].tolist() == bf["vec_id"].tolist()

        cents = kmeans_refine_distributed(
            emb, np.vstack(pdf["embedding"].to_numpy())[:8].astype(np.float64), iters=2
        )
        np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, atol=1e-9)

    def test_embedding_neardup_self_similarity(self):
        from cassandra_data_migrator_ray.pipelines.dataops import embedding_neardup

        rng = np.random.default_rng(3)
        base = rng.standard_normal((20, 16)).astype(np.float32)
        dup = base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01
        df = pd.DataFrame(
            {
                "vec_id": np.arange(25, dtype=np.int64),
                "embedding": list(np.vstack([base, dup])),
            }
        )
        pairs = embedding_neardup(ray.data.from_pandas(df), threshold=0.99).to_pandas()
        found = set(zip(pairs["id_a"], pairs["id_b"]))
        assert {(i, 20 + i) for i in range(5)} <= found

        # the distributed exact-cosine verify (no vector ever on the driver)
        # must find the identical pair set with identical scores
        dist = (
            embedding_neardup(
                ray.data.from_pandas(df), threshold=0.99, verify="distributed"
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            pairs.sort_values(["id_a", "id_b"], ignore_index=True), dist
        )

        # collect='distributed': the pair list itself stays a Dataset
        # (Bloom-filter gather); identical pair set and scores again
        full = (
            embedding_neardup(
                ray.data.from_pandas(df), threshold=0.99, collect="distributed"
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            pairs.sort_values(["id_a", "id_b"], ignore_index=True), full
        )


@pytest.mark.usefixtures("ray_session")
class TestNoSilentTruncation:
    def test_minhash_truncation_is_counted(self):
        """Identical docs flood one bucket past max_bucket: dropped cross-
        chunk pairs must surface in LAST_RUN_STATS, never silently."""
        from cassandra_data_migrator_ray.pipelines import dataops

        df = pd.DataFrame(
            {
                "doc_id": np.arange(10, dtype=np.int64),
                "text": ["the same exact document text here"] * 10,
            }
        )
        ds = ray.data.from_pandas(df)
        pairs = dataops.dedup_minhash_lsh(
            ds, threshold=0.5, max_bucket=4
        ).to_pandas()
        stats = dataops.LAST_RUN_STATS["minhash_lsh"]
        assert stats["pairs_dropped"] > 0
        # chunked pairs still found (within-chunk)
        assert len(pairs) > 0 and (pairs["jaccard"] == 1.0).all()

    def test_minhash_no_truncation_small_bucket(self):
        from cassandra_data_migrator_ray.pipelines import dataops

        df = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                "text": [
                    "alpha beta gamma delta epsilon zeta",
                    "alpha beta gamma delta epsilon eta",
                    "one two three four five six",
                    "seven eight nine ten eleven twelve",
                    "completely different text goes right here",
                    "yet another unrelated document body text",
                ],
            }
        )
        ds = ray.data.from_pandas(df)
        pairs = dataops.dedup_minhash_lsh(ds, threshold=0.5).to_pandas()
        assert dataops.LAST_RUN_STATS["minhash_lsh"]["pairs_dropped"] == 0
        assert {(0, 1)} <= set(zip(pairs["id_a"], pairs["id_b"]))


@pytest.mark.usefixtures("ray_session")
class TestIvfAnn:
    def test_ivf_full_probe_equals_brute_force(self):
        from cassandra_data_migrator_ray.pipelines.dataops import ann_topk, ann_topk_ivf

        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((300, 16))
        df = pd.DataFrame(
            {"vec_id": np.arange(300, dtype=np.int64), "embedding": list(vecs)}
        )
        ds = ray.data.from_pandas(df)
        q = vecs[7]
        bf = ann_topk(ds, q, k=5)
        ivf = ann_topk_ivf(ds, q, k=5, n_centroids=8, nprobe=8)
        assert list(bf["vec_id"]) == list(ivf["vec_id"])

    def test_ivf_parquet_source_not_pinned_and_distributed_merge(
        self, tmp_path, monkeypatch
    ):
        """materialize="auto" must NOT pin a plain parquet read (re-scans are
        cheap; pinning a 100-TB corpus is the anti-pattern), and the
        distributed candidate merge must equal the driver merge exactly."""
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.pipelines.dataops import ann_topk_ivf

        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((400, 12))
        path = str(tmp_path / "emb.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(400, dtype=np.int64)),
                    "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
                }
            ),
            path,
        )
        pinned = []
        orig = ray.data.Dataset.materialize

        def spy(self, **kw):
            pinned.append(1)
            return orig(self, **kw)

        monkeypatch.setattr(ray.data.Dataset, "materialize", spy)
        q = vecs[[3, 11]]
        a = ann_topk_ivf(
            ray.data.read_parquet(path), q, k=5, n_centroids=4, nprobe=4,
            merge="driver",
        )
        assert not pinned, "source read must not be materialized"
        b = ann_topk_ivf(
            ray.data.read_parquet(path), q, k=5, n_centroids=4, nprobe=4,
            merge="distributed",
        )
        pd.testing.assert_frame_equal(
            a.reset_index(drop=True), b.reset_index(drop=True)
        )
        # transform-bearing lineage IS pinned under auto
        ds2 = ray.data.read_parquet(path).map_batches(lambda t: t, batch_format="pyarrow")
        ann_topk_ivf(ds2, q, k=5, n_centroids=4, nprobe=4)
        assert pinned, "transform lineage must be materialized once"


class TestCcKernel:
    """Driver connected-components kernel vs a brute-force BFS truth."""

    @staticmethod
    def _bfs_truth(a, b):
        adj = {}
        for u, v in zip(a, b):
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        out = {}
        for start in sorted(adj):
            if start in out:
                continue
            seen, stack = {start}, [start]
            while stack:
                x = stack.pop()
                for y in adj[x]:
                    if y not in seen:
                        seen.add(y)
                        stack.append(y)
            root = min(seen)
            for x in seen:
                out[x] = root
        return out

    def test_chain_star_and_random(self):
        from cassandra_data_migrator_ray.pipelines.dataops import _cc_labels_numpy

        rng = np.random.default_rng(7)
        cases = [
            # 1000-node chain: worst-case diameter for min propagation
            (np.arange(999), np.arange(1, 1000)),
            # star + separate triangle
            (np.array([5, 5, 5, 10, 11]), np.array([1, 2, 3, 11, 12])),
        ]
        for _ in range(5):
            n_edges = int(rng.integers(1, 400))
            cases.append(
                (
                    rng.integers(0, 200, n_edges),
                    rng.integers(0, 200, n_edges),
                )
            )
        for a, b in cases:
            a = a.astype(np.int64)
            b = b.astype(np.int64)
            nodes, comp = _cc_labels_numpy(a, b)
            truth = self._bfs_truth(a.tolist(), b.tolist())
            got = dict(zip(nodes.tolist(), comp.tolist()))
            assert got == truth


@pytest.mark.usefixtures("ray_session")
class TestClusterPairs:
    def _pairs_ds(self, a, b):
        return ray.data.from_pandas(
            pd.DataFrame(
                {"id_a": np.asarray(a, np.int64), "id_b": np.asarray(b, np.int64)}
            )
        )

    def test_driver_mode_chain(self):
        from cassandra_data_migrator_ray.pipelines.dataops import cluster_pairs

        got = (
            cluster_pairs(self._pairs_ds([1, 2, 7], [2, 3, 8]))
            .to_pandas()
            .sort_values("node_id", ignore_index=True)
        )
        assert got["node_id"].tolist() == [1, 2, 3, 7, 8]
        assert got["cluster_id"].tolist() == [1, 1, 1, 7, 7]

    def test_distributed_equals_driver(self):
        from cassandra_data_migrator_ray.pipelines.dataops import cluster_pairs

        rng = np.random.default_rng(13)
        a = rng.integers(0, 300, 500)
        b = rng.integers(0, 300, 500)
        ds = self._pairs_ds(a, b)
        drv = (
            cluster_pairs(ds, mode="driver")
            .to_pandas()
            .sort_values("node_id", ignore_index=True)
        )
        dist = (
            cluster_pairs(ds, mode="distributed")
            .to_pandas()
            .sort_values("node_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(drv, dist, check_dtype=False)

    def test_empty_pairs(self):
        from cassandra_data_migrator_ray.pipelines.dataops import cluster_pairs

        for mode in ("driver", "distributed"):
            got = cluster_pairs(self._pairs_ds([], []), mode=mode).to_pandas()
            # Ray drops the schema of a fully-empty block on to_pandas (same
            # for every pairs pipeline here) — emptiness is the contract
            assert len(got) == 0


@pytest.mark.usefixtures("ray_session")
class TestDedupApply:
    def test_exact_chain_pairs_and_apply(self):
        from cassandra_data_migrator_ray.pipelines.dataops import (
            cluster_pairs,
            dedup_apply,
            exact_dup_pairs,
        )

        df = pd.DataFrame(
            {
                "doc_id": np.arange(10, dtype=np.int64),
                "text": ["x", "y", "x", "z", "x", "y", None, None, "w", "z"],
            }
        )
        ds = ray.data.from_pandas(df)
        pairs = exact_dup_pairs(ds)
        got_pairs = pairs.to_pandas().sort_values(["id_a", "id_b"], ignore_index=True)
        # chains per text group: x:{0,2,4} y:{1,5} z:{3,9} null:{6,7}
        assert got_pairs.values.tolist() == [
            [0, 2],
            [1, 5],
            [2, 4],
            [3, 9],
            [6, 7],
        ]
        members = (
            cluster_pairs(pairs).to_pandas().sort_values("node_id", ignore_index=True)
        )
        assert members["cluster_id"].tolist() == [0, 1, 0, 3, 0, 1, 6, 6, 3]
        kept = dedup_apply(ds, pairs).to_pandas().sort_values("doc_id")
        # keepers: 0 (x), 1 (y), 3 (z), 6 (null) plus unpaired 8 (w)
        assert kept["doc_id"].tolist() == [0, 1, 3, 6, 8]

    def test_apply_no_pairs_is_identity(self):
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_apply

        df = pd.DataFrame(
            {"doc_id": np.arange(5, dtype=np.int64), "text": list("abcde")}
        )
        ds = ray.data.from_pandas(df)
        empty = ray.data.from_pandas(
            pd.DataFrame(
                {
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                }
            )
        )
        assert dedup_apply(ds, empty).to_pandas()["doc_id"].tolist() == list(range(5))
        # distributed path: same identity
        assert dedup_apply(ds, empty, mode="distributed").to_pandas()[
            "doc_id"
        ].tolist() == list(range(5))

    def test_distributed_apply_equals_driver_multiblock(self):
        """The round-4 `weak` fix: mode="distributed" must keep the drop
        ids a Dataset end to end (anti-join apply, no driver drop array)
        and agree byte-for-byte with the broadcast driver path at a
        forced-multi-block scale with chained dup families."""
        from cassandra_data_migrator_ray.pipelines.dataops import (
            dedup_apply,
            exact_dup_pairs,
        )

        rng = np.random.default_rng(11)
        n = 5000
        # ~40% duplicates: text drawn from a pool of 3000 values, so many
        # families of size 2..5 chain through exact_dup_pairs
        pool = [f"text-{i}" for i in range(3000)]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [pool[i] for i in rng.integers(0, 3000, n)],
                "extra": rng.standard_normal(n),  # non-key payload survives
            }
        )
        ds = ray.data.from_pandas(df).repartition(16)
        pairs = exact_dup_pairs(ds)
        drv = (
            dedup_apply(ds, pairs, mode="driver")
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        dist = (
            dedup_apply(ds, pairs, mode="distributed", num_partitions=8)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert list(dist.columns) == list(df.columns)  # schema order kept
        pd.testing.assert_frame_equal(
            dist, drv.astype(dist.dtypes.to_dict()), check_dtype=False
        )
        assert len(drv) < n  # the dedup actually dropped rows


@pytest.mark.usefixtures("ray_session")
class TestNearDedupEndToEnd:
    def test_minhash_pairs_cluster_apply(self):
        """The full near-dedup flow a training-data pipeline runs: detect
        (MinHash-LSH pairs) → cluster (connected components) → apply (drop
        non-keepers).  Each dup family must collapse to its min-id doc;
        unrelated docs survive untouched."""
        from cassandra_data_migrator_ray.pipelines.dataops import (
            cluster_pairs,
            dedup_apply,
            dedup_minhash_lsh,
        )

        ds = ray.data.from_pandas(docs_df())
        pairs = dedup_minhash_lsh(ds, threshold=0.9)
        members = cluster_pairs(pairs).to_pandas()
        # exact families (jaccard 1.0): {1,4,...,25} and {2,5,...,26} chain
        # through shared band buckets into single components rooted at min id
        fam1 = {1, 4, 7, 10, 13, 16, 19, 22, 25}
        got1 = set(
            members.loc[members["cluster_id"] == 1, "node_id"].astype(int)
        )
        assert fam1 <= got1
        kept = dedup_apply(ds, pairs).to_pandas()
        kept_ids = set(kept["doc_id"].astype(int))
        assert 1 in kept_ids and not (fam1 - {1}) & kept_ids
        # total kept = corpus minus dropped members
        dropped = (members["node_id"] != members["cluster_id"]).sum()
        assert len(kept) == 30 - dropped


@pytest.mark.usefixtures("ray_session")
class TestDedupNear:
    def test_exact_and_minhash_methods(self):
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_near

        ds = ray.data.from_pandas(docs_df())
        kept_exact = dedup_near(ds, method="exact").to_pandas()
        # 3 exact families of 10/10/7 + 3 near-dup variants (27,28,29 unique)
        assert set(kept_exact["doc_id"]) == {0, 1, 2, 27, 28, 29}
        kept_nd = dedup_near(ds, method="minhash", threshold=0.9).to_pandas()
        # near threshold 0.9 the one-word variants still cluster with doc 0
        assert len(kept_nd) <= len(kept_exact)
        assert {1, 2} <= set(kept_nd["doc_id"])

    def test_fully_distributed_path_matches_driver(self):
        """dedup_near with collect='distributed' + cluster_mode='distributed'
        (detect → dedup pairs → Bloom verify → label-prop clustering, no
        pair list on the driver at any stage) must keep exactly the same
        survivor set as the all-driver path."""
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_near

        ds = ray.data.from_pandas(docs_df())
        a = (
            dedup_near(ds, method="minhash", threshold=0.5)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        b = (
            dedup_near(
                ds,
                method="minhash",
                threshold=0.5,
                collect="distributed",
                cluster_mode="distributed",
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_unknown_method_raises(self):
        from cassandra_data_migrator_ray.pipelines.dataops import dedup_near

        with pytest.raises(ValueError):
            dedup_near(ray.data.from_pandas(docs_df()), method="nope")


@pytest.mark.usefixtures("ray_session")
class TestPrepCorpus:
    def test_prep_corpus_gates_dedups_and_counts(self):
        """Composed prep pipeline: known lang/quality/dup structure in, the
        gated + deduped survivor stats out."""
        from cassandra_data_migrator_ray.pipelines.dataops import prep_corpus

        good = (
            "the cat sat on the mat and it was a good day for everyone "
            "involved in that little story about the cat and the mat"
        )
        other = (
            "der hund lief durch den park und das wetter war nicht gut "
            "aber die leute waren mit dem tag zufrieden und das ist gut"
        )
        short = "too short"
        df = pd.DataFrame(
            {
                "doc_id": np.arange(6, dtype=np.int64),
                # 0,2 duplicate English; 1 unique English; 3 German; 4 short;
                # 5 another unique English
                "text": [
                    good,
                    good + " with a different unique ending sentence here",
                    good,
                    other,
                    short,
                    "a completely different english document that talks about "
                    "the weather and the sea and it is long enough to pass",
                ],
            }
        )
        out = (
            prep_corpus(ray.data.from_pandas(df), token_sep=" ")
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert out["doc_id"].tolist() == [0, 1, 5]
        assert out["n_dups"].tolist() == [2, 1, 1]
        assert (out["pred_lang"] == "en").all()
        assert (out["quality_score"] >= 0.6).all()
        row0 = out.iloc[0]
        assert row0["n_chars"] == len(good)
        assert row0["n_ws_tokens"] == good.count(" ") + 1


@pytest.mark.usefixtures("ray_session")
class TestIvfIndexPersistence:
    def test_build_load_query_parity(self, tmp_path):
        """Train-once/query-many: a persisted index reproduces the inline-
        trained result exactly (refine=0 → identical centroids), and the
        indexed query path touches the corpus in a single pass (no count/
        sample/materialize)."""
        import pyarrow.parquet as pq

        import ray as _ray

        from cassandra_data_migrator_ray.pipelines.dataops import (
            ann_topk_ivf,
            build_ivf_index,
            load_ivf_index,
        )

        rng = np.random.default_rng(9)
        centers = rng.standard_normal((6, 16)) * 4
        vecs = np.vstack([c + rng.standard_normal((60, 16)) * 0.1 for c in centers])
        path = str(tmp_path / "emb.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                    "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
                }
            ),
            path,
        )
        idx_path = str(tmp_path / "ivf.index.parquet")
        ds = _ray.data.read_parquet(path)
        cents = build_ivf_index(ds, idx_path, n_centroids=6, refine_iters=0)
        loaded = load_ivf_index(idx_path)
        np.testing.assert_allclose(loaded, cents, rtol=0, atol=0)

        q = vecs[5]
        inline = ann_topk_ivf(
            _ray.data.read_parquet(path), q, k=5, n_centroids=6, nprobe=3,
            refine_iters=0,
        )
        # fresh dataset each time — the index path must not need multipass
        indexed = ann_topk_ivf(
            _ray.data.read_parquet(path), q, k=5, nprobe=3, index=idx_path
        )
        pd.testing.assert_frame_equal(inline, indexed)

        # no count/materialize on the indexed path: it works on a dataset
        # whose count would execute a transform chain exactly once
        calls = {"n": 0}

        def counting(batch):
            calls["n"] += 1
            return batch

        chained = _ray.data.read_parquet(path).map_batches(
            counting, batch_format="pandas"
        )
        out = ann_topk_ivf(chained, q, k=5, nprobe=3, index=idx_path)
        assert list(out["vec_id"]) == list(indexed["vec_id"])

    def test_refined_index_keeps_recall(self, tmp_path):
        """A refined persisted index still finds the planted nearest set
        (recall@k == 1.0 vs brute force on well-separated clusters)."""
        import pyarrow.parquet as pq

        import ray as _ray

        from cassandra_data_migrator_ray.pipelines.dataops import (
            ann_topk,
            ann_topk_ivf,
            build_ivf_index,
        )

        rng = np.random.default_rng(31)
        centers = rng.standard_normal((8, 12)) * 5
        vecs = np.vstack([c + rng.standard_normal((50, 12)) * 0.1 for c in centers])
        path = str(tmp_path / "emb.parquet")
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
                    "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
                }
            ),
            path,
        )
        idx_path = str(tmp_path / "ivf.idx")
        build_ivf_index(
            _ray.data.read_parquet(path), idx_path, n_centroids=8, refine_iters=2
        )
        q = vecs[125]
        bf = set(ann_topk(_ray.data.read_parquet(path), q, k=10)["vec_id"])
        got = set(
            ann_topk_ivf(_ray.data.read_parquet(path), q, k=10, nprobe=2, index=idx_path)[
                "vec_id"
            ]
        )
        assert got == bf


@pytest.mark.usefixtures("ray_session")
class TestDecontaminate:
    """Benchmark decontamination: exact n-gram contamination flag/drop."""

    def _corpus(self):
        bench = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
        clean = "one two three four five six seven eight nine ten eleven twelve"
        rows = [
            # doc 0 embeds the full benchmark sentence mid-text → contaminated
            {"doc_id": 0, "text": f"prefix words here {bench} suffix tail"},
            # doc 1 shares only 9 of the 10 benchmark tokens → clean at n=10
            {"doc_id": 1, "text": "alpha bravo charlie delta echo foxtrot golf hotel india kilo"},
            {"doc_id": 2, "text": clean},
            # doc 3: shorter than n tokens → never flagged even if identical prefix
            {"doc_id": 3, "text": "alpha bravo charlie"},
            # doc 4 contains the benchmark twice (two distinct positions, one gram)
            {"doc_id": 4, "text": f"{bench} and again {bench}"},
        ]
        return pd.DataFrame(rows), [bench]

    def test_flag_exact_semantics(self):
        from cassandra_data_migrator_ray.pipelines.dataops import decontaminate

        df, bench = self._corpus()
        got = (
            decontaminate(ray.data.from_pandas(df), bench, n=10)
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert got["doc_id"].tolist() == [0, 4]
        # the 10-token benchmark has exactly one 10-gram
        assert got["n_matched_grams"].tolist() == [1, 1]

    def test_drop_mode_filters_corpus(self):
        from cassandra_data_migrator_ray.pipelines.dataops import decontaminate

        df, bench = self._corpus()
        kept = (
            decontaminate(ray.data.from_pandas(df), bench, n=10, mode="drop")
            .to_pandas()["doc_id"]
            .sort_values()
            .tolist()
        )
        assert kept == [1, 2, 3]

    def test_empty_benchmark_and_no_hits(self):
        from cassandra_data_migrator_ray.pipelines.dataops import decontaminate

        df, _ = self._corpus()
        got = decontaminate(ray.data.from_pandas(df), [], n=10).to_pandas()
        assert len(got) == 0
        got2 = decontaminate(
            ray.data.from_pandas(df), ["totally unrelated benchmark text here ok"], n=5
        ).to_pandas()
        assert len(got2) == 0

    def test_strict_gram_kernel_short_docs(self):
        from cassandra_data_migrator_ray.functions.dedup import gram_hashes_strict

        h, off, words, counts = gram_hashes_strict(
            pd.Series(["a b c", "", "a b c d e"]), 4
        )
        assert np.diff(off).tolist() == [0, 0, 2]
        # same window → same hash regardless of batch composition
        h2, off2, _, _ = gram_hashes_strict(pd.Series(["x a b c d e"]), 4)
        assert h[0] == h2[1] and h[1] == h2[2]

    def test_whitespace_normalization_parity(self):
        """Tabs/newlines/multi-space tokenize identically to single spaces."""
        from cassandra_data_migrator_ray.pipelines.dataops import decontaminate

        bench = ["alpha bravo charlie delta echo"]
        df = pd.DataFrame(
            {"doc_id": [0], "text": ["pre  alpha\tbravo \n charlie  delta\techo post"]}
        )
        got = decontaminate(ray.data.from_pandas(df), bench, n=5).to_pandas()
        assert got["doc_id"].tolist() == [0]


@pytest.mark.usefixtures("ray_session")
class TestSampleStratified:
    def _ds(self, n=4000):
        rng = np.random.default_rng(5)
        return pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "lang": rng.choice(["en", "fr", "de"], size=n),
            }
        )

    def test_fractions_and_determinism(self):
        from cassandra_data_migrator_ray.pipelines.dataops import sample_stratified

        df = self._ds()
        fr = {"en": 0.5, "fr": 0.1}
        a = sample_stratified(ray.data.from_pandas(df), fr).to_pandas()
        b = sample_stratified(ray.data.from_pandas(df), fr).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id", ignore_index=True),
            b.sort_values("doc_id", ignore_index=True),
        )
        got = a.lang.value_counts()
        n = df.lang.value_counts()
        assert abs(got.get("en", 0) / n["en"] - 0.5) < 0.05
        assert abs(got.get("fr", 0) / n["fr"] - 0.1) < 0.05
        assert got.get("de", 0) == 0  # default fraction drops unlisted strata

    def test_batch_composition_invariance(self):
        """The keep decision is per-row: repartitioning cannot change it."""
        from cassandra_data_migrator_ray.pipelines.dataops import sample_stratified

        df = self._ds(1000)
        fr = {"en": 0.3, "fr": 0.7, "de": 1.0}
        a = sample_stratified(
            ray.data.from_pandas(df).repartition(1), fr
        ).to_pandas()
        b = sample_stratified(
            ray.data.from_pandas(df).repartition(13), fr
        ).to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("doc_id", ignore_index=True),
            b.sort_values("doc_id", ignore_index=True),
        )

    def test_seed_mult_draws_different_sample(self):
        from cassandra_data_migrator_ray.pipelines.dataops import sample_stratified

        df = self._ds(2000)
        a = sample_stratified(ray.data.from_pandas(df), {"en": 0.5}).to_pandas()
        b = sample_stratified(
            ray.data.from_pandas(df), {"en": 0.5}, seed_mult=2654435761 * 3
        ).to_pandas()
        assert set(a.doc_id) != set(b.doc_id)

    def test_validation(self):
        from cassandra_data_migrator_ray.pipelines.dataops import (
            sample_stratified,
            sample_threshold,
        )

        with pytest.raises(ValueError, match="odd"):
            sample_stratified(
                ray.data.from_pandas(self._ds(10)), {"en": 0.5}, seed_mult=4
            )
        with pytest.raises(ValueError, match="fraction"):
            sample_threshold(1.5)
        neg = pd.DataFrame({"doc_id": [-1, 2], "lang": ["en", "en"]})
        with pytest.raises(Exception, match="non-negative"):
            sample_stratified(
                ray.data.from_pandas(neg), {"en": 1.0}
            ).to_pandas()


@pytest.mark.usefixtures("ray_session")
class TestQuantileExact:
    def _duck_disc(self, vals, q):
        import duckdb

        con = duckdb.connect()
        con.register("t", pd.DataFrame({"v": vals}))
        return con.execute(
            f"SELECT quantile_disc(v, {q}) FROM t WHERE v IS NOT NULL"
        ).fetchone()[0]

    def test_high_cardinality_matches_duckdb(self):
        from cassandra_data_migrator_ray.pipelines.dataops import quantile_exact

        rng = np.random.default_rng(11)
        vals = rng.standard_normal(50_000) * 1000.0  # ~every value distinct
        ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(8)
        got = quantile_exact(ds, "v", (0.01, 0.25, 0.5, 0.9, 0.999),
                             distinct_cap=512)
        for q, v in got.items():
            assert v == self._duck_disc(vals, q), q

    def test_heavy_duplicates_and_nulls(self):
        from cassandra_data_migrator_ray.pipelines.dataops import quantile_exact

        rng = np.random.default_rng(13)
        vals = np.concatenate(
            [np.full(10_000, 7.5), rng.integers(0, 20, 5000).astype(float)]
        )
        with_nulls = pd.Series(vals)
        with_nulls.iloc[::97] = np.nan
        ds = ray.data.from_pandas(pd.DataFrame({"v": with_nulls})).repartition(5)
        got = quantile_exact(ds, "v", (0.5, 0.9), distinct_cap=64)
        clean = with_nulls.dropna().to_numpy()
        for q, v in got.items():
            assert v == self._duck_disc(clean, q), q

    def test_small_input_single_pass(self):
        from cassandra_data_migrator_ray.pipelines.dataops import quantile_exact

        vals = [3.0, 1.0, 2.0, 5.0, 4.0]
        ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
        got = quantile_exact(ds, "v", (0.5,))
        assert got[0.5] == self._duck_disc(vals, 0.5) == 3.0

    def test_empty_returns_nan(self):
        from cassandra_data_migrator_ray.pipelines.dataops import quantile_exact

        ds = ray.data.from_pandas(pd.DataFrame({"v": pd.Series([], dtype=float)}))
        got = quantile_exact(ds, "v", (0.5,))
        assert np.isnan(got[0.5])

    def test_quantile_filter(self):
        from cassandra_data_migrator_ray.pipelines.dataops import quantile_filter

        rng = np.random.default_rng(17)
        vals = rng.standard_normal(10_000)
        ds = ray.data.from_pandas(pd.DataFrame({"v": vals})).repartition(4)
        thr, kept = quantile_filter(ds, "v", 0.7, keep="ge")
        got = kept.to_pandas()["v"].to_numpy()
        assert thr == self._duck_disc(vals, 0.7)
        assert (got >= thr).all()
        assert len(got) == int((vals >= thr).sum())


@pytest.mark.usefixtures("ray_session")
class TestBroadcastJoin:
    def test_inner_and_left(self):
        from cassandra_data_migrator_ray.pipelines.dataops import broadcast_join

        big = pd.DataFrame({"k": [1, 2, 3, 2, 9], "v": list("abcde")})
        dim = pd.DataFrame({"k": [1, 2, 3], "name": ["x", "y", "z"]})
        inner = (
            broadcast_join(ray.data.from_pandas(big).repartition(3), dim, on="k")
            .to_pandas()
            .sort_values(["k", "v"], ignore_index=True)
        )
        assert inner["name"].tolist() == ["x", "y", "y", "z"]
        left = (
            broadcast_join(
                ray.data.from_pandas(big), dim, on="k", how="left"
            )
            .to_pandas()
            .sort_values(["k", "v"], ignore_index=True)
        )
        assert len(left) == 5 and left["name"].isna().sum() == 1

    def test_suffix_and_validation(self):
        from cassandra_data_migrator_ray.pipelines.dataops import broadcast_join

        big = pd.DataFrame({"k": [1], "v": [10]})
        dim = pd.DataFrame({"k": [1], "v": [20]})
        out = broadcast_join(ray.data.from_pandas(big), dim, on="k").to_pandas()
        assert out["v"].tolist() == [10] and out["v_r"].tolist() == [20]
        with pytest.raises(ValueError, match="how"):
            broadcast_join(ray.data.from_pandas(big), dim, on="k", how="outer")
        with pytest.raises(ValueError, match="missing"):
            broadcast_join(ray.data.from_pandas(big), dim, on="zz")


@pytest.mark.usefixtures("ray_session")
class TestAggByKey:
    def test_all_fns_match_pandas(self):
        from cassandra_data_migrator_ray.pipelines.dataops import agg_by_key

        rng = np.random.default_rng(7)
        df = pd.DataFrame(
            {
                "k": rng.choice(list("abcd"), 5000),
                "v": rng.integers(-100, 100, 5000),
            }
        )
        got = (
            agg_by_key(
                ray.data.from_pandas(df).repartition(7),
                "k",
                {
                    "s": ("v", "sum"),
                    "n": (None, "count"),
                    "mn": ("v", "min"),
                    "mx": ("v", "max"),
                    "avg": ("v", "mean"),
                },
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        want = (
            df.groupby("k")
            .agg(s=("v", "sum"), n=("v", "size"), mn=("v", "min"),
                 mx=("v", "max"), avg=("v", "mean"))
            .reset_index()
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_count_skips_nulls_with_column(self):
        from cassandra_data_migrator_ray.pipelines.dataops import agg_by_key

        df = pd.DataFrame({"k": ["a"] * 4, "v": [1.0, None, 3.0, None]})
        got = agg_by_key(
            ray.data.from_pandas(df), "k",
            {"n_rows": (None, "count"), "n_vals": ("v", "count")},
        ).to_pandas()
        assert int(got["n_rows"].iloc[0]) == 4 and int(got["n_vals"].iloc[0]) == 2

    def test_validation(self):
        from cassandra_data_migrator_ray.pipelines.dataops import agg_by_key

        ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "v": [1]}))
        with pytest.raises(ValueError, match="unsupported"):
            agg_by_key(ds, "k", {"x": ("v", "median")})
        with pytest.raises(ValueError, match="count"):
            agg_by_key(ds, "k", {"x": (None, "sum")})


@pytest.mark.usefixtures("ray_session")
class TestTopkByKey:
    def test_matches_pandas_window_rank(self):
        from cassandra_data_migrator_ray.pipelines.dataops import topk_by_key

        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {
                "k": rng.choice(list("abcdef"), 3000),
                "id": np.arange(3000, dtype=np.int64),
                "v": rng.integers(0, 50, 3000),  # heavy ties → tiebreak matters
            }
        )
        got = (
            topk_by_key(
                ray.data.from_pandas(df).repartition(9),
                "k", "v", k=4, tiebreak="id",
            )
            .to_pandas()
            .sort_values(["k", "rk"], ignore_index=True)
        )
        want = (
            df.sort_values(["k", "v", "id"], ascending=[True, False, True],
                           kind="mergesort", ignore_index=True)
            .groupby("k", sort=False).head(4).reset_index(drop=True)
        )
        want["rk"] = want.groupby("k", sort=False).cumcount() + 1
        pd.testing.assert_frame_equal(
            got, want.sort_values(["k", "rk"], ignore_index=True),
            check_dtype=False, check_like=True,
        )

    def test_ascending_smallest(self):
        from cassandra_data_migrator_ray.pipelines.dataops import topk_by_key

        df = pd.DataFrame({"k": ["a"] * 5, "id": range(5), "v": [5, 3, 1, 4, 2]})
        got = topk_by_key(
            ray.data.from_pandas(df), "k", "v", k=2, descending=False,
            tiebreak="id",
        ).to_pandas().sort_values("rk")
        assert got["v"].tolist() == [1, 2]


@pytest.mark.usefixtures("ray_session")
class TestCollectAutoOtherDetectors:
    def test_simhash_and_embedding_collect_auto(self):
        """collect='auto' on the simhash and embedding detectors matches the
        explicit driver route on a small corpus and the distributed route
        when forced (plain-source count gate, same rule as minhash)."""
        from cassandra_data_migrator_ray.pipelines.dataops import (
            dedup_simhash,
            embedding_neardup,
        )

        ds = ray.data.from_pandas(docs_df())
        want = (
            dedup_simhash(ds, max_hamming=0, collect="driver")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        got = (
            dedup_simhash(ds, max_hamming=0, collect="auto")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(got, want)
        assert len(got) > 0

        rng = np.random.default_rng(13)
        vecs = rng.standard_normal((60, 16))
        vecs[30:] = vecs[:30]  # 30 exact twins
        eds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(60, dtype=np.int64), "embedding": list(vecs)}
            )
        )
        w2 = (
            embedding_neardup(eds, threshold=0.99, collect="driver")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        g2 = (
            embedding_neardup(eds, threshold=0.99, collect="auto")
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(g2, w2)
        assert len(g2) >= 30


@pytest.mark.usefixtures("ray_session")
class TestDedupApplyAuto:
    def test_auto_routes_all_equal(self):
        """mode="auto" (the new default): small plain pair lists take the
        driver route; a transform-bearing pair lineage forces distributed
        clustering and then picks broadcast vs anti-join by DROP COUNT.
        All three resolutions must produce the identical corpus."""
        from cassandra_data_migrator_ray.pipelines.dataops import (
            dedup_apply,
            exact_dup_pairs,
        )

        rng = np.random.default_rng(23)
        n = 2000
        pool = [f"t{i}" for i in range(1200)]
        df = pd.DataFrame(
            {
                "doc_id": np.arange(n, dtype=np.int64),
                "text": [pool[i] for i in rng.integers(0, 1200, n)],
            }
        )
        ds = ray.data.from_pandas(df).repartition(8)
        pairs = exact_dup_pairs(ds)

        def frame(d):
            return d.to_pandas().sort_values("doc_id", ignore_index=True)

        want = frame(dedup_apply(ds, pairs, mode="driver"))
        assert len(want) < n
        from cassandra_data_migrator_ray.pipelines.dataops import LAST_RUN_STATS

        # default auto on a small plain pair list → driver route
        got_auto = frame(dedup_apply(ds, pairs))
        pd.testing.assert_frame_equal(got_auto, want, check_dtype=False)
        assert LAST_RUN_STATS["dedup_apply"]["route"] == "driver_broadcast"
        # detector lineages are pinned + counted, so small ones STILL take
        # the driver route
        lazy_pairs = pairs.map_batches(lambda t: t, batch_format="pyarrow")
        got_lazy = frame(dedup_apply(ds, lazy_pairs, mode="auto"))
        pd.testing.assert_frame_equal(got_lazy, want, check_dtype=False)
        assert LAST_RUN_STATS["dedup_apply"]["route"] == "driver_broadcast"
        # forced-zero pair budget → distributed clustering; drop count small
        # → broadcast apply (corpus unshuffled)
        got_bcast = frame(
            dedup_apply(ds, lazy_pairs, mode="auto", auto_driver_max_pairs=0)
        )
        pd.testing.assert_frame_equal(got_bcast, want, check_dtype=False)
        assert (
            LAST_RUN_STATS["dedup_apply"]["route"]
            == "distributed_cluster_broadcast_apply"
        )
        # forced-zero broadcast budget → anti-join apply
        got_join = frame(
            dedup_apply(
                ds, lazy_pairs, mode="auto", auto_driver_max_pairs=0,
                auto_broadcast_max_drop=0, num_partitions=4,
            )
        )
        pd.testing.assert_frame_equal(got_join, want, check_dtype=False)
        assert LAST_RUN_STATS["dedup_apply"]["route"] == "distributed_anti_join"


class TestJaccardVectorizedProperty:
    def test_matches_per_pair_reference(self):
        """The one-lexsort Jaccard kernel must agree with a per-pair
        set-arithmetic reference across random shapes: empty sets, missing
        docs (-1 rows), duplicate pairs, single-element and disjoint sets."""
        from hypothesis import given, settings, strategies as st

        from cassandra_data_migrator_ray.pipelines.dataops import (
            _jaccard_vectorized,
        )

        @settings(max_examples=80, deadline=None)
        @given(
            docs=st.lists(
                st.lists(st.integers(0, 50), min_size=0, max_size=12),
                min_size=1,
                max_size=10,
            ),
            pair_picks=st.lists(
                st.tuples(st.integers(-1, 9), st.integers(-1, 9)),
                min_size=1,
                max_size=20,
            ),
        )
        def run(docs, pair_picks):
            sets = [np.unique(np.array(d, dtype=np.int64)) for d in docs]
            sizes = np.array([len(s) for s in sets], dtype=np.int64)
            uoff = np.r_[np.int64(0), np.cumsum(sizes)]
            uhashes = (
                np.concatenate(sets) if sets else np.empty(0, np.int64)
            )
            nd = len(docs)
            ra = np.array(
                [a if -1 <= a < nd else -1 for a, _ in pair_picks], dtype=np.int64
            )
            rb = np.array(
                [b if -1 <= b < nd else -1 for _, b in pair_picks], dtype=np.int64
            )
            ra = np.where(ra < nd, ra, -1)
            rb = np.where(rb < nd, rb, -1)
            got = _jaccard_vectorized(uhashes, uoff, sizes, ra, rb)
            for j in range(len(ra)):
                if ra[j] < 0 or rb[j] < 0:
                    want = 0.0
                else:
                    sa, sb = set(sets[ra[j]]), set(sets[rb[j]])
                    if not sa and not sb:
                        want = 1.0
                    else:
                        want = len(sa & sb) / max(1, len(sa | sb))
                assert abs(got[j] - want) < 1e-12, (j, got[j], want)

        run()


class TestBucketPairsPartitionKernel:
    def test_matches_per_bucket_kernel(self):
        """The partition-level vectorized bucket kernel must produce exactly
        the per-bucket kernel's pair multiset and aggregate dropped-pairs
        metric across random bucket shapes (dup ids, oversized buckets,
        singletons, many tiny buckets)."""
        from hypothesis import given, settings, strategies as st

        from cassandra_data_migrator_ray.pipelines.dataops import (
            _bucket_candidate_pairs,
            _bucket_pairs_partition,
        )

        @settings(max_examples=60, deadline=None)
        @given(
            rows=st.lists(
                st.tuples(
                    st.integers(0, 3),      # band
                    st.integers(0, 5),      # band_hash
                    st.integers(0, 40),     # id
                ),
                min_size=0,
                max_size=200,
            ),
            max_bucket=st.sampled_from([2, 3, 8, 64]),
        )
        def run(rows, max_bucket):
            df = pd.DataFrame(rows, columns=["band", "band_hash", "doc_id"])
            got = _bucket_pairs_partition(df, "doc_id", max_bucket)
            wants = []
            for _, g in df.groupby(["band", "band_hash"]):
                wants.append(_bucket_candidate_pairs(g, "doc_id", max_bucket))
            want = (
                pd.concat(wants, ignore_index=True)
                if wants
                else got.head(0)
            )

            def norm(d):
                pairs = d[d["id_a"] >= 0].sort_values(
                    ["id_a", "id_b"], ignore_index=True
                )
                dropped = int(d.loc[d["id_a"] < 0, "id_b"].sum())
                return pairs, dropped

            gp, gd = norm(got)
            wp, wd = norm(want)
            pd.testing.assert_frame_equal(
                gp, wp.astype(gp.dtypes.to_dict()), check_dtype=False
            )
            assert gd == wd

        run()


@pytest.mark.usefixtures("ray_session")
class TestAggTopkFuzz:
    def test_agg_by_key_random_vs_pandas(self):
        """Randomized agg_by_key vs a pandas oracle: mixed dtypes, string
        and multi-column keys, skewed key distributions, all five agg fns —
        the partition-level combine must be exact for integer sums/counts
        and min/max, and float-mean-close elsewhere."""
        from hypothesis import given, settings, strategies as st

        from cassandra_data_migrator_ray.pipelines.dataops import agg_by_key

        @settings(max_examples=12, deadline=None)
        @given(
            n=st.integers(50, 2000),
            nkeys=st.integers(1, 200),
            seed=st.integers(0, 10_000),
            two_keys=st.booleans(),
        )
        def run(n, nkeys, seed, two_keys):
            rng = np.random.default_rng(seed)
            df = pd.DataFrame(
                {
                    "k": rng.choice([f"k{i}" for i in range(nkeys)], n),
                    "k2": rng.integers(0, 3, n).astype(np.int64),
                    "v": rng.integers(-1000, 1000, n).astype(np.int64),
                }
            )
            keys = ["k", "k2"] if two_keys else ["k"]
            ds = ray.data.from_pandas(df).repartition(4)
            got = (
                agg_by_key(
                    ds,
                    keys,
                    {
                        "s": ("v", "sum"),
                        "c": (None, "count"),
                        "lo": ("v", "min"),
                        "hi": ("v", "max"),
                        "m": ("v", "mean"),
                    },
                )
                .to_pandas()
                .sort_values(keys, ignore_index=True)
            )
            want = (
                df.groupby(keys, as_index=False)
                .agg(
                    s=("v", "sum"),
                    c=("v", "size"),
                    lo=("v", "min"),
                    hi=("v", "max"),
                    m=("v", "mean"),
                )
                .sort_values(keys, ignore_index=True)
            )
            pd.testing.assert_frame_equal(
                got.astype(want.dtypes.to_dict()), want, check_dtype=False
            )

        run()

    def test_topk_by_key_random_vs_pandas(self):
        from hypothesis import given, settings, strategies as st

        from cassandra_data_migrator_ray.pipelines.dataops import topk_by_key

        @settings(max_examples=10, deadline=None)
        @given(
            n=st.integers(50, 1500),
            nkeys=st.integers(1, 100),
            k=st.integers(1, 5),
            seed=st.integers(0, 10_000),
            descending=st.booleans(),
        )
        def run(n, nkeys, k, seed, descending):
            rng = np.random.default_rng(seed)
            df = pd.DataFrame(
                {
                    "g": rng.integers(0, nkeys, n).astype(np.int64),
                    "v": rng.integers(-50, 50, n).astype(np.int64),
                    "tb": np.arange(n, dtype=np.int64),
                }
            )
            ds = ray.data.from_pandas(df).repartition(4)
            got = (
                topk_by_key(ds, "g", "v", k=k, descending=descending, tiebreak="tb")
                .to_pandas()
                .sort_values(["g", "rk"], ignore_index=True)
            )
            want = df.sort_values(
                ["g", "v", "tb"], ascending=[True, not descending, True],
                kind="mergesort",
            ).groupby("g").head(k).reset_index(drop=True)
            want["rk"] = want.groupby("g").cumcount() + 1
            want = want.sort_values(["g", "rk"], ignore_index=True)
            pd.testing.assert_frame_equal(
                got[["g", "v", "tb", "rk"]].astype(
                    want[["g", "v", "tb", "rk"]].dtypes.to_dict()
                ),
                want[["g", "v", "tb", "rk"]],
                check_dtype=False,
            )

        run()


class TestAutoLshParams:
    def test_sizing_rules(self):
        """Joint (bits, bands) auto-sizing: small corpora keep the pinned
        (12, default) behavior exactly; large corpora keep expected bucket
        occupancy within one all-pairs chunk AND predicted recall >= 0.9 by
        raising the band count as bits rise."""
        from cassandra_data_migrator_ray.pipelines.dataops import _auto_lsh_params

        # small corpora: unchanged floor, default bands
        for n in (100, 10_000, 1_000_000):
            bits, bands = _auto_lsh_params(n, 512, 0.95)
            assert bits == 12 and bands == 8, (n, bits, bands)

        for n in (4_000_000, 16_000_000, 1_000_000_000):
            bits, bands = _auto_lsh_params(n, 512, 0.95)
            # occupancy fits one chunk: no within-bucket pair drops
            assert n / (1 << bits) <= 512, (n, bits)
            # predicted recall at the threshold stays >= 0.9 (or the band
            # cap was hit)
            p = 1.0 - np.arccos(0.95) / np.pi
            recall = 1.0 - (1.0 - p**bits) ** bands
            assert recall >= 0.9 or bands == 32, (n, bits, bands, recall)
            assert bands <= 32

        # tighter thresholds need fewer bands (higher per-band match prob)
        _, bands_99 = _auto_lsh_params(16_000_000, 512, 0.99)
        _, bands_95 = _auto_lsh_params(16_000_000, 512, 0.95)
        assert bands_99 <= bands_95
