"""Regression tests for the round-4 self-review findings: CLI as-of
autocorrect semantics, join_by_key sizing without pre-execution, the
embedding near-dup distributed path's single chain execution, and
driver/distributed stats-key parity."""

import glob
import json
import os
import subprocess
import sys
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

BASE = 1_000_000_000_000  # µs


def _ev(rows, seq0=0):
    """rows: (conv_id, turn_idx, text, writetime, ttl_seconds_or_None)."""
    n = len(rows)
    return pa.table(
        {
            "op": pa.array(["UPSERT"] * n),
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([None] * n, pa.string()),
            "text": pa.array([r[2] for r in rows]),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array([None] * n, pa.timestamp("us")),
            "writetime": pa.array([r[3] for r in rows], pa.int64()),
            "event_seq": pa.array(range(seq0, seq0 + n), pa.int64()),
            "ttl": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestCliAsOfAutocorrect:
    def test_revalidate_keeps_as_of(self, tmp_path):
        """`validate --as-of T --autocorrect` on a TTL lake: the
        post-correction re-validate must use the SAME as_of, else rows whose
        cells are expired at T but still stored compare as spurious EXTRA
        and the CLI reports corrected=false despite a successful fix."""
        from cassandra_data_migrator_ray.pipelines.replay import replay

        lake = str(tmp_path / "lake")
        replay(
            _ev(
                [
                    ("a", 0, "expires-in-10s", BASE, 10),
                    ("b", 0, "stale-text", BASE, None),
                ]
            ),
            lake,
            num_parts=2,
        )
        at = BASE + 11_000_000  # row a fully expired here, but still STORED
        expected = pd.DataFrame(
            {
                "conv_id": ["b"],
                "turn_idx": np.array([0], dtype=np.int32),
                "role": pd.Series([None], dtype=object),
                "text": ["fixed-text"],  # drift vs the lake's stale-text
                "tool": pd.Series([None], dtype=object),
                "ts": pd.Series([pd.NaT], dtype="datetime64[us]"),
            }
        )
        exp = str(tmp_path / "expected.parquet")
        pq.write_table(pa.Table.from_pandas(expected, preserve_index=False), exp)

        r = subprocess.run(
            [
                sys.executable, "-m", "cassandra_data_migrator_ray",
                "--num-cpus", "2",
                "validate", "--expected", exp, "--lake", lake,
                "--as-of", str(at), "--autocorrect",
            ],
            capture_output=True, text=True, cwd="/root/repo", timeout=300,
        )
        assert r.returncode == 0, r.stdout[-1000:] + r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["corrected"] is True, out
        assert out["after_correction"]["MISMATCH"] == 0
        assert out["after_correction"]["EXTRA"] == 0


@pytest.mark.usefixtures("ray_session")
class TestJoinSizingNoPreexecution:
    def test_default_partitions_skip_count_on_transform_lineage(
        self, monkeypatch
    ):
        """join_by_key(num_partitions=None) must not call Dataset.count()
        on a transform-bearing side — that fully executes the pipeline once
        before the join re-executes it."""
        import ray

        from cassandra_data_migrator_ray.pipelines.dataops import join_by_key

        left = ray.data.from_items(
            [{"k": i, "a": i * 2} for i in range(100)]
        ).map_batches(lambda t: t, batch_format="pyarrow")
        right = ray.data.from_items(
            [{"k": i, "b": i * 3} for i in range(100)]
        ).map_batches(lambda t: t, batch_format="pyarrow")

        def _boom(self):
            raise AssertionError("count() called on a transform lineage")

        monkeypatch.setattr(ray.data.Dataset, "count", _boom)
        joined = join_by_key(left, right, on=["k"])
        monkeypatch.undo()
        got = joined.to_pandas().sort_values("k", ignore_index=True)
        assert len(got) == 100
        assert (got["b"] == got["k"] * 3).all()


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingDistributedSingleExecution:
    def test_transform_chain_runs_once(self, tmp_path):
        """embedding_neardup(collect='distributed') on a transform-bearing
        lineage: the chain must execute exactly as often as one materialize
        (the bucketize pass must consume the PINNED handle, not re-run the
        chain from source)."""
        import ray

        from cassandra_data_migrator_ray.pipelines.dataops import (
            embedding_neardup,
        )

        rng = np.random.default_rng(7)
        base = rng.normal(size=(40, 16))
        vecs = base / np.linalg.norm(base, axis=1, keepdims=True)
        rows = [
            {"doc_id": int(i), "embedding": vecs[i].tolist()} for i in range(40)
        ]

        def make_ds(marker_dir):
            os.makedirs(marker_dir, exist_ok=True)

            def mark(batch):
                with open(
                    os.path.join(marker_dir, uuid.uuid4().hex), "w"
                ) as f:
                    f.write(str(len(batch)))
                return batch

            return ray.data.from_items(rows).map_batches(
                mark, batch_format="pandas"
            )

        d0 = str(tmp_path / "baseline")
        make_ds(d0).materialize()
        baseline = len(glob.glob(os.path.join(d0, "*")))
        assert baseline > 0

        d1 = str(tmp_path / "neardup")
        embedding_neardup(
            make_ds(d1),
            id_col="doc_id",
            vec_col="embedding",
            bits_per_band=8,
            collect="distributed",
        ).materialize()
        ran = len(glob.glob(os.path.join(d1, "*")))
        assert ran == baseline, f"chain executed {ran}x vs baseline {baseline}"


@pytest.mark.usefixtures("ray_session")
class TestStatsKeyParity:
    def test_minhash_stats_key_same_on_both_paths(self):
        """LAST_RUN_STATS['minhash_lsh'] must expose pairs_candidate on the
        driver AND distributed collect paths (the distributed dedup runs
        pre-verify, so its count is a candidate count, not pairs_found)."""
        import ray

        from cassandra_data_migrator_ray.pipelines import dataops

        docs = pd.DataFrame(
            {
                "doc_id": np.arange(12, dtype=np.int64),
                "text": [
                    f"the quick brown fox jumps over dog {i % 3}" for i in range(12)
                ],
            }
        )
        ds = ray.data.from_pandas(docs)
        dataops.dedup_minhash_lsh(ds, threshold=0.5).materialize()
        driver_keys = set(dataops.LAST_RUN_STATS["minhash_lsh"])
        dataops.dedup_minhash_lsh(
            ds, threshold=0.5, collect="distributed"
        ).materialize()
        dist_keys = set(dataops.LAST_RUN_STATS["minhash_lsh"])
        assert "pairs_candidate" in driver_keys
        assert "pairs_candidate" in dist_keys
        assert "pairs_found" not in dist_keys
