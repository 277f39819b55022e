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


class TestStagedFingerprintCodecIndependent:
    def test_same_name_across_codecs(self, tmp_path):
        """The bytes-fingerprint content address (reshard / prefolded /
        validate slices) must not depend on the staged-slice codec: a task
        retried under a different CDM_STAGED_COMPRESSION resolution must
        OVERWRITE the first attempt's slice, never add a second one."""
        import pyarrow as pa

        from cassandra_data_migrator_ray.stages.normalize import PART_COL
        from cassandra_data_migrator_ray.stages.staging import StageWriter

        batch = pa.table(
            {
                "conv_id": pa.array(["a", "b", "c"]),
                "turn_idx": pa.array([0, 1, 2], pa.int32()),
                "text": pa.array(["x" * 64, "y" * 64, "z" * 64]),
                PART_COL: pa.array([0, 0, 0], pa.int32()),
            }
        )
        names = {}
        for codec in ("lz4", None, "zstd"):
            d = str(tmp_path / f"stage_{codec}")
            StageWriter(d, compression=codec, bytes_fingerprint=True)(batch)
            files = sorted(
                f
                for f in os.listdir(os.path.join(d, "part=00000"))
                if f.startswith("blk-")
            )
            names[codec] = files
        assert names["lz4"] == names[None] == names["zstd"], names

    def test_retry_overwrites_across_codec_change(self, tmp_path):
        """Same slice staged twice (lz4 then uncompressed) into ONE staging
        dir: exactly one blk file remains and it parses."""
        import pyarrow as pa

        from cassandra_data_migrator_ray.stages.normalize import PART_COL
        from cassandra_data_migrator_ray.stages.staging import StageWriter

        batch = pa.table(
            {
                "v": pa.array([1, 2, 3], pa.int64()),
                PART_COL: pa.array([0, 0, 0], pa.int32()),
            }
        )
        d = str(tmp_path / "stage")
        StageWriter(d, compression="lz4", bytes_fingerprint=True)(batch)
        StageWriter(d, compression=None, bytes_fingerprint=True)(batch)
        pdir = os.path.join(d, "part=00000")
        files = [f for f in os.listdir(pdir) if f.startswith("blk-")]
        assert len(files) == 1, files
        tbl = pa.ipc.open_file(os.path.join(pdir, files[0])).read_all()
        assert tbl["v"].to_pylist() == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
class TestDeclaredDtypeStability:
    def test_lookup_dtype_stable_across_partitions(self, tmp_path):
        """On a widened lake, lookup() must return the DECLARED dtype whether
        the touched partitions hold narrow or wide physical files."""
        import ray

        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.sources.lake import lookup

        lake = str(tmp_path / "lake")
        replay(
            _ev([(f"c{i}", 0, "narrow", BASE + i, None) for i in range(8)]),
            lake,
            num_parts=4,
        )
        wide = _ev([("w", 0, "wide", BASE + 100, None)])
        wide = wide.set_column(
            wide.column_names.index("turn_idx"),
            "turn_idx",
            wide["turn_idx"].cast(pa.int64()),
        )
        replay(wide, lake, num_parts=4, widen_types=True)

        narrow_hit = lookup(lake, [("c0",)])
        wide_hit = lookup(lake, [("w",)])
        assert narrow_hit["turn_idx"].dtype == wide_hit["turn_idx"].dtype
        assert str(narrow_hit["turn_idx"].dtype) == "int64"
