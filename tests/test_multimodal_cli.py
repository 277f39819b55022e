"""Multimodal stage plumbing + CLI entry points + change-batch sources."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from cassandra_data_migrator_ray.functions.multimodal import (
    MEDIA_SCHEMA,
    DecodeImage,
    FrameSampler,
    ImageFeatures,
)


def media_table(n=8):
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "media_type": pa.array(["image/png"] * n),
            "payload": pa.array([bytes([i]) * (100 + i) for i in range(n)], pa.binary()),
            "width": pa.array([32] * n, pa.int32()),
            "height": pa.array([32] * n, pa.int32()),
            "duration_ms": pa.array([0] * n, pa.int32()),
        },
        schema=MEDIA_SCHEMA,
    )


@pytest.mark.usefixtures("ray_session")
class TestMultimodal:
    def test_decode_features_actor_pool(self):
        """binary → decode (fake, deterministic) → feature-extract as an
        actor-pool map_batches chain with small batches."""
        ds = ray.data.from_arrow(media_table())
        out = (
            ds.map_batches(
                DecodeImage, batch_format="pandas", batch_size=4, concurrency=2
            )
            .map_batches(ImageFeatures, batch_format="pandas", batch_size=4, concurrency=2)
            .to_pandas()
        )
        assert len(out) == 8
        feats = np.vstack(out["features"].to_numpy())
        assert feats.shape == (8, 3 + 8)
        # deterministic: same payload → same features
        out2 = (
            ray.data.from_arrow(media_table())
            .map_batches(DecodeImage, batch_format="pandas", batch_size=4, concurrency=2)
            .map_batches(ImageFeatures, batch_format="pandas", batch_size=4, concurrency=2)
            .to_pandas()
        )
        f2 = np.vstack(out2.sort_values("media_id")["features"].to_numpy())
        f1 = np.vstack(out.sort_values("media_id")["features"].to_numpy())
        np.testing.assert_array_equal(f1, f2)

    def test_frame_sampler_flatmap_shape(self):
        ds = ray.data.from_arrow(media_table(3))
        out = ds.map_batches(
            FrameSampler, batch_format="pandas", batch_size=2, concurrency=2
        ).to_pandas()
        assert len(out) == 12  # 3 videos × 4 frames
        assert set(out.columns) == {"media_id", "frame_idx", "frame_bytes"}

    def test_real_decoder_stub_raises(self):
        with pytest.raises(NotImplementedError):
            DecodeImage(decoder="pil")


@pytest.mark.usefixtures("ray_session")
class TestSources:
    def test_read_change_batches_projection_and_filter(self, tmp_path):
        import pyarrow.compute as pc

        from cassandra_data_migrator_ray.sources.events import read_change_batches

        p = str(tmp_path / "e.parquet")
        pq.write_table(
            pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.1, 0.2, 0.3]}), p
        )
        ds = read_change_batches(p, columns=["a", "b"], filter_expr=pc.field("a") > 1)
        out = ds.to_pandas()
        assert list(out.columns) == ["a", "b"]
        assert out["a"].tolist() == [2, 3]

    def test_partition_range_filter(self):
        from cassandra_data_migrator_ray.sources.events import PartitionRangeFilter
        from cassandra_data_migrator_ray.state.partitioning import assign_partition

        t = pa.table(
            {
                "conv_id": [f"c{i}" for i in range(100)],
                "turn_idx": pa.array(range(100), pa.int32()),
            }
        )
        f = PartitionRangeFilter(num_parts=8, lo=0, hi=3)
        out = f(t)
        parts = assign_partition(
            out["conv_id"].to_pandas(), out["turn_idx"].to_pandas(), 8
        )
        assert len(out) > 0 and (parts <= 3).all()


class TestCli:
    def test_cli_migrate_validate_guardrail(self, tmp_path):
        """Drive the three job mains as subprocesses (own Ray sessions)."""
        sys_path = "/root/repo"
        from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state

        events = gen_change_stream(n_convs=20, n_events=800, seed=3)
        ev_path = str(tmp_path / "events.parquet")
        pq.write_table(events, ev_path)
        exp_path = str(tmp_path / "expected.parquet")
        oracle = oracle_final_state(events.to_pandas())
        pq.write_table(pa.Table.from_pandas(oracle, preserve_index=False), exp_path)
        lake = str(tmp_path / "lake")

        def run(*args):
            return subprocess.run(
                [sys.executable, "-m", "cassandra_data_migrator_ray", "--num-cpus", "2", *args],
                capture_output=True,
                text=True,
                cwd=sys_path,
                timeout=180,
            )

        r = run("migrate", "--events", ev_path, "--lake", lake, "--num-parts", "4")
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["partitions"] == 4

        r = run("validate", "--expected", exp_path, "--lake", lake)
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["ok"] and out["counts"]["VALID"] > 0

        r = run("guardrail", "--input", ev_path, "--max-kb", "0.001")
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["counters"]["LARGE"] > 0 and r.returncode == 1

    def test_cli_lookup_changes_snapshots_vacuum(self, tmp_path):
        """The lakehouse read-side commands: lookup, change feed, snapshot
        listing and vacuum, driven as subprocesses over a two-run lake."""
        from cassandra_data_migrator_ray.gen import gen_change_stream

        events = gen_change_stream(n_convs=20, n_events=800, seed=5)
        df = events.to_pandas()
        half = len(df) // 2
        ev1, ev2 = str(tmp_path / "e1.parquet"), str(tmp_path / "e2.parquet")
        pq.write_table(
            pa.Table.from_pandas(df[df.event_seq < half], preserve_index=False), ev1
        )
        pq.write_table(
            pa.Table.from_pandas(df[df.event_seq >= half], preserve_index=False), ev2
        )
        lake = str(tmp_path / "lake")

        def run(*args):
            return subprocess.run(
                [sys.executable, "-m", "cassandra_data_migrator_ray", "--num-cpus", "2", *args],
                capture_output=True, text=True, cwd="/root/repo", timeout=180,
            )

        for ev in (ev1, ev2):
            r = run("migrate", "--events", ev, "--lake", lake,
                    "--num-parts", "4", "--emit-changes")
            assert r.returncode == 0, r.stderr[-2000:]

        r = run("snapshots", "--lake", lake)
        assert json.loads(r.stdout.strip().splitlines()[-1])["versions"] == [1, 2]

        conv = df["conv_id"].iloc[0]
        r = run("lookup", "--lake", lake, "--keys", conv)
        rows = json.loads(r.stdout.strip().splitlines()[-1])
        assert rows and all(x["conv_id"] == conv for x in rows)

        feed_out = str(tmp_path / "feed.parquet")
        r = run("changes", "--lake", lake, "--version", "2", "--out", feed_out)
        assert json.loads(r.stdout.strip().splitlines()[-1])["rows"] > 0
        feed = pq.read_table(feed_out)
        assert "_change_type" in feed.column_names

        r = run("vacuum", "--lake", lake, "--keep-last", "1")
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["pruned_versions"] == [1] and out["kept"] == [2]


@pytest.mark.usefixtures("ray_session")
class TestSourceFormats:
    def test_csv_jsonl_arrow_replay_to_oracle(self, tmp_path):
        """Change batches in CSV, JSON-lines and Arrow IPC (file_format auto-
        sniffed, schema-coerced — CSV/JSON carry no types) replay to the same
        final state as the parquet path.  CSV convention: unquoted empty =
        NULL (unset), so LWW semantics survive the typeless format."""
        import os

        from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
        from cassandra_data_migrator_ray.pipelines.replay import replay
        from cassandra_data_migrator_ray.schema import EVENTS_SCHEMA
        from cassandra_data_migrator_ray.sources.events import read_change_batches
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        ev = gen_change_stream(n_convs=15, n_events=600, seed=4)
        df = ev.to_pandas()
        exp = oracle_final_state(df)

        csv_path = str(tmp_path / "c.csv")
        dfx = df.copy()
        dfx["ts"] = dfx["ts"].astype(str).replace("NaT", "")
        dfx.to_csv(csv_path, index=False)

        jl_path = str(tmp_path / "j.jsonl")
        dfj = df.copy()
        dfj["ts"] = dfj["ts"].astype(str).replace("NaT", None)
        dfj.to_json(jl_path, orient="records", lines=True)

        ipc_path = str(tmp_path / "a.arrow")
        with pa.OSFile(ipc_path, "wb") as sink:
            with pa.ipc.new_file(sink, ev.schema) as w:
                w.write_table(ev)

        for i, p in enumerate((csv_path, jl_path, ipc_path)):
            ds = read_change_batches(p, schema=EVENTS_SCHEMA)  # format sniffed
            lake = str(tmp_path / f"lake{i}")
            replay(ds, lake, num_parts=4)
            got = read_lake_pandas(lake)
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_unknown_extension_needs_explicit_format(self, tmp_path):
        from cassandra_data_migrator_ray.sources.events import read_change_batches

        p = str(tmp_path / "data.xyz")
        open(p, "w").write("x")
        with pytest.raises(ValueError, match="sniff"):
            read_change_batches(p)


class TestCliDedup:
    def test_cli_dedup_exact_and_distributed(self, tmp_path):
        """`dedup` subcommand: corpus in, deduplicated parquet out; the
        --distributed flag routes the no-pairs-on-driver pipeline and must
        keep the identical survivor set."""
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(30, dtype=np.int64),
                "text": [f"the quick brown fox number {i % 6}" for i in range(30)],
            }
        )
        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), src)

        def run(*args):
            return subprocess.run(
                [sys.executable, "-m", "cassandra_data_migrator_ray",
                 "--num-cpus", "2", *args],
                capture_output=True, text=True, cwd="/root/repo", timeout=300,
            )

        out_a = str(tmp_path / "kept_exact")
        r = run("dedup", "--input", src, "--output", out_a, "--method", "exact")
        assert r.returncode == 0, r.stderr[-2000:]
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert res["docs_in"] == 30 and res["docs_kept"] == 6

        out_b = str(tmp_path / "kept_dist")
        r = run("dedup", "--input", src, "--output", out_b,
                "--method", "minhash", "--threshold", "0.9", "--distributed")
        assert r.returncode == 0, r.stderr[-2000:]
        res = json.loads(r.stdout.strip().splitlines()[-1])
        assert res["docs_kept"] == 6 and res["docs_dropped"] == 24

        # a non-empty output dir must be refused: stale files from a prior
        # run would interleave with this run's output and inflate the corpus
        r = run("dedup", "--input", src, "--output", out_a, "--method", "exact")
        assert r.returncode == 2
        assert "not empty" in r.stderr
