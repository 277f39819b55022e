"""cdm.properties compatibility layer: reference property names drive the
same engine pipeline (reference src/resources/cdm.properties,
properties/KnownProperties.java:60-210)."""

import numpy as np
import pandas as pd
import pytest

from cassandra_data_migrator_ray.compat import (
    Plan,
    load_properties,
    plan_from_properties,
    replay_from_properties,
)


PROPS = """
# comment line
spark.cdm.connect.origin.host                     localhost
spark.cdm.connect.origin.port                     9042
spark.cdm.schema.origin.keyspaceTable             ks.tbl
spark.cdm.schema.origin.column.names.to.target    msg:text,who:role
spark.cdm.feature.constantColumns.names           tenant,flag
spark.cdm.feature.constantColumns.values          'acme',42
spark.cdm.filter.java.writetime.min               1000
spark.cdm.filter.java.writetime.max               2000
spark.cdm.filter.java.column.name                 role
spark.cdm.filter.java.column.value                spam
spark.cdm.trackRun                                true
spark.cdm.trackRun.autoRerun                      true
spark.cdm.trackRun.rerunMultiplier                4
spark.cdm.perfops.numParts                        64
spark.cdm.perfops.ratelimit.origin                20000
spark.cdm.perfops.ratelimit.target                20000
spark.cdm.autocorrect.missing                     true
spark.cdm.autocorrect.mismatch                    false
spark.cdm.feature.guardrail.colSizeInKB           10
spark.cdm.made.up.key                             zzz
"""


def write_props(tmp_path):
    f = tmp_path / "cdm.properties"
    f.write_text(PROPS)
    return str(f)


class TestPlanFromProperties:
    def test_full_plan(self, tmp_path):
        plan = plan_from_properties(write_props(tmp_path))
        from cassandra_data_migrator_ray.functions.transforms import (
            Constant,
            Rename,
            ValueSkipFilter,
            WritetimeWindow,
        )

        kinds = [type(t) for t in plan.transforms]
        assert kinds == [Rename, Constant, WritetimeWindow, ValueSkipFilter]
        assert plan.transforms[0].mapping == {"msg": "text", "who": "role"}
        assert plan.transforms[1].values == {"tenant": "acme", "flag": 42}
        assert plan.transforms[2].lo == 1000 and plan.transforms[2].hi == 2000
        assert plan.replay_kwargs["num_parts"] == 64
        assert plan.replay_kwargs["run_id"] == "auto"
        assert plan.replay_kwargs["rerun_multiplier"] == 4
        assert plan.replay_kwargs["rate_limit_rows_per_s"] == 20000.0
        # reference ratelimit is a job TOTAL: with no explicit pool size the
        # normalize pool defaults to 1 actor so total == per-actor rate
        assert plan.replay_kwargs["normalize_concurrency"] == 1
        assert plan.autocorrect_missing and not plan.autocorrect_mismatch
        assert plan.guardrail_kb == 10.0
        # transport keys ignored WITH reasons; unknown keys flagged
        assert "spark.cdm.connect.origin.host" in plan.ignored
        assert "no Parquet analogue" in plan.ignored["spark.cdm.connect.origin.host"]
        assert "spark.cdm.made.up.key" in plan.ignored
        assert "unrecognized" in plan.ignored["spark.cdm.made.up.key"]

    def test_explode_extract_custom_writetime(self):
        plan = plan_from_properties(
            {
                "spark.cdm.feature.explodeMap.origin.name": "attrs",
                "spark.cdm.feature.explodeMap.target.name.key": "k",
                "spark.cdm.feature.explodeMap.target.name.value": "v",
                "spark.cdm.feature.extractJson.originColumn": "blob",
                "spark.cdm.feature.extractJson.propertyMapping": "age:age_col",
                "spark.cdm.feature.extractJson.overwrite": "true",
                "spark.cdm.transform.custom.writetime": "5000",
                "spark.cdm.transform.custom.writetime.incrementBy": "1",
            }
        )
        from cassandra_data_migrator_ray.compat import CustomWritetime
        from cassandra_data_migrator_ray.functions.transforms import (
            ExplodeMap,
            ExtractJson,
        )

        em = next(t for t in plan.transforms if isinstance(t, ExplodeMap))
        assert (em.map_col, em.key_col, em.value_col) == ("attrs", "k", "v")
        ej = next(t for t in plan.transforms if isinstance(t, ExtractJson))
        assert (ej.src_col, ej.field, ej.dst_col, ej.overwrite) == (
            "blob", "age", "age_col", True,
        )
        cw = next(t for t in plan.transforms if isinstance(t, CustomWritetime))
        assert (cw.value, cw.inc) == (5000, 1)

    def test_constant_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="constantColumns"):
            plan_from_properties(
                {
                    "spark.cdm.feature.constantColumns.names": "a,b",
                    "spark.cdm.feature.constantColumns.values": "'x'",
                }
            )


@pytest.mark.usefixtures("ray_session")
class TestReplayFromProperties:
    def test_properties_driven_replay(self, tmp_path):
        """A properties file drives a real replay: writetime-window filter +
        constant column applied, lake state matches the filtered oracle."""
        from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        ev = gen_change_stream(n_convs=30, n_events=2000, seed=44)
        df = ev.to_pandas()
        cut = int(df["writetime"].quantile(0.3))
        props = tmp_path / "cdm.properties"
        props.write_text(
            f"spark.cdm.filter.java.writetime.min  {cut}\n"
            "spark.cdm.feature.constantColumns.names   source\n"
            "spark.cdm.feature.constantColumns.values  'cdm'\n"
            "spark.cdm.perfops.numParts  8\n"
        )
        lake = str(tmp_path / "lake")
        replay_from_properties(ev, lake, str(props))
        got = read_lake_pandas(lake)
        assert (got["source"] == "cdm").all()
        oracle = oracle_final_state(df[df["writetime"] >= cut])
        oracle["source"] = "cdm"
        pd.testing.assert_frame_equal(
            got.sort_values(["conv_id", "turn_idx"], ignore_index=True),
            oracle.sort_values(["conv_id", "turn_idx"], ignore_index=True)[got.columns],
            check_dtype=False,
        )


@pytest.mark.usefixtures("ray_session")
class TestValidateFromProperties:
    def test_skip_columns_and_autocorrect(self, tmp_path):
        """The diff-side properties: column skip-list hides a divergent
        column; autocorrect.mismatch=true replays corrective events and a
        re-validate comes back clean."""
        from cassandra_data_migrator_ray.compat import validate_from_properties
        from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
        from cassandra_data_migrator_ray.pipelines.replay import replay

        ev = gen_change_stream(n_convs=20, n_events=1200, seed=66)
        lake = str(tmp_path / "lake")
        replay(ev, lake, num_parts=4)
        exp = oracle_final_state(ev.to_pandas())
        exp = exp.copy()
        exp.loc[exp.index[:3], "text"] = "divergent-expectation"

        # 1. skip-list: hiding `text` makes the divergence invisible
        res, fixed = validate_from_properties(
            exp, lake, {"spark.cdm.schema.origin.column.skip": "text"}
        )
        assert res.ok and fixed is None

        # 2. no skip, no autocorrect: mismatches reported, nothing replayed
        res, fixed = validate_from_properties(exp, lake, {})
        assert not res.ok and res.counts["MISMATCH"] == 3 and fixed is None

        # 3. autocorrect.mismatch: corrective replay, then clean re-validate
        res, fixed = validate_from_properties(
            exp, lake, {"spark.cdm.autocorrect.mismatch": "true"}
        )
        assert not res.ok and fixed is not None
        res2, _ = validate_from_properties(exp, lake, {})
        assert res2.ok, res2.counts


@pytest.mark.usefixtures("ray_session")
class TestCliProperties:
    def test_migrate_with_properties_file(self, tmp_path, capsys):
        """CLI: --properties applies the transform chain and perf knobs from
        a reference cdm.properties file (transport keys reported on stderr)."""
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.cli import main
        from cassandra_data_migrator_ray.gen import gen_change_stream, oracle_final_state
        from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

        ev = gen_change_stream(n_convs=15, n_events=800, seed=88)
        src = str(tmp_path / "ev.parquet")
        pq.write_table(ev, src)
        props = tmp_path / "cdm.properties"
        props.write_text(
            "spark.cdm.connect.origin.host localhost\n"
            "spark.cdm.feature.constantColumns.names   origin_dc\n"
            "spark.cdm.feature.constantColumns.values  'dc1'\n"
            "spark.cdm.perfops.numParts 8\n"
        )
        lake = str(tmp_path / "lake")
        rc = main(
            ["migrate", "--events", src, "--lake", lake, "--properties", str(props)]
        )
        assert rc in (0, None)
        captured = capsys.readouterr()
        assert json.loads(captured.out.strip().splitlines()[-1])["partitions"] > 0
        assert "spark.cdm.connect.origin.host" in captured.err
        got = read_lake_pandas(lake)
        assert (got["origin_dc"] == "dc1").all()
        oracle = oracle_final_state(ev.to_pandas())
        oracle["origin_dc"] = "dc1"
        pd.testing.assert_frame_equal(
            got.sort_values(["conv_id", "turn_idx"], ignore_index=True),
            oracle.sort_values(["conv_id", "turn_idx"], ignore_index=True)[got.columns],
            check_dtype=False,
        )
        from cassandra_data_migrator_ray.state.manifest import Manifest

        assert Manifest.load(lake).num_parts == 8


class TestRatelimitPoolSplit:
    def test_total_rate_splits_across_explicit_pool(self):
        from cassandra_data_migrator_ray.compat import plan_from_properties

        plan = plan_from_properties(
            {
                "spark.cdm.perfops.ratelimit.target": "20000",
                "spark.cdm.perfops.normalizeConcurrency": "4",
            }
        )
        assert plan.replay_kwargs["normalize_concurrency"] == 4
        assert plan.replay_kwargs["rate_limit_rows_per_s"] == 5000.0
        assert not any("unrecognized" in r for r in plan.ignored.values())


@pytest.mark.usefixtures("ray_session")
class TestRunNotStarted:
    def test_explicit_rerun_of_unknown_run_warns_and_runs_fresh(self, tmp_path):
        """Reference RunNotStartedException parity (BasePartitionJob.scala:
        50-55): previousRunId naming a run the lake never saw WARNS and
        falls back to a fresh run — the statement layer throws, the job
        catches.  Strict abort stays available as an engine extension
        (require_existing_run="abort")."""
        from cassandra_data_migrator_ray.compat import plan_from_properties
        from cassandra_data_migrator_ray.gen import gen_change_stream
        from cassandra_data_migrator_ray.pipelines.replay import (
            RunNotStartedError,
            replay,
        )

        plan = plan_from_properties(
            {
                "spark.cdm.trackRun": "true",
                "spark.cdm.trackRun.previousRunId": "nope123",
            }
        )
        assert plan.replay_kwargs == {
            "run_id": "nope123", "require_existing_run": True,
        }
        ev = gen_change_stream(n_convs=10, n_events=300, seed=9)
        lake = str(tmp_path / "lake")
        with pytest.warns(UserWarning, match="never started"):
            r0 = replay(ev, lake, num_parts=2, **plan.replay_kwargs)
        # fresh run under a NEW id, fully committed — not the typo'd id
        assert r0.run_id != "nope123"
        assert len(r0.metrics) > 0

        # engine extension: "abort" restores the hard failure
        with pytest.raises(RunNotStartedError, match="never started"):
            replay(
                ev, str(tmp_path / "lake2"), num_parts=2,
                run_id="nope123", require_existing_run="abort",
            )

        # a committed run CAN be rerun by explicit id
        r2 = replay(
            ev, lake, num_parts=2, run_id=r0.run_id, require_existing_run=True
        )
        assert len(r2.metrics) == 0  # watermark skips the redelivery

        # prevRunId=0 means "not a rerun" (reference): discarded without
        # autoRerun; auto-discovery only when autoRerun=true
        plan0 = plan_from_properties(
            {
                "spark.cdm.trackRun": "true",
                "spark.cdm.trackRun.previousRunId": "0",
            }
        )
        assert plan0.replay_kwargs == {}
        plan0a = plan_from_properties(
            {
                "spark.cdm.trackRun": "true",
                "spark.cdm.trackRun.previousRunId": "0",
                "spark.cdm.trackRun.autoRerun": "true",
            }
        )
        assert plan0a.replay_kwargs == {"run_id": "auto"}


class TestCliPropertiesForwarding:
    def test_prev_run_guard_and_ratelimit_pool_reach_replay(self, tmp_path):
        """The CLI migrate --properties path must forward the plan's
        require_existing_run (typo'd previousRunId aborts, review finding)
        and its normalize pool size (total rate stays the configured cap,
        not pool× it)."""
        import json as _json
        import subprocess
        import sys

        import pyarrow.parquet as pq

        from cassandra_data_migrator_ray.gen import gen_change_stream

        ev = gen_change_stream(n_convs=10, n_events=400, seed=3)
        events = str(tmp_path / "events.parquet")
        pq.write_table(ev, events)

        props = tmp_path / "cdm.properties"
        props.write_text(
            "spark.cdm.trackRun true\n"
            "spark.cdm.trackRun.previousRunId typo999\n"
        )
        r = subprocess.run(
            [sys.executable, "-m", "cassandra_data_migrator_ray",
             "--num-cpus", "4", "migrate", "--events", events,
             "--lake", str(tmp_path / "lake"), "--num-parts", "2",
             "--properties", str(props)],
            capture_output=True, text=True, timeout=300,
        )
        # reference BasePartitionJob.scala:50-55: unknown prevRunId WARNS
        # and runs fresh — the job succeeds, the warning is visible
        assert r.returncode == 0, r.stderr
        assert "never started" in (r.stderr + r.stdout)
        out1 = _json.loads(r.stdout.strip().splitlines()[-1])
        assert out1["rows"] > 0 and out1["run_id"] != "typo999"

        props2 = tmp_path / "cdm2.properties"
        props2.write_text(
            "spark.cdm.perfops.ratelimit.target 20000\n"
            "spark.cdm.perfops.normalizeConcurrency 4\n"
        )
        r2 = subprocess.run(
            [sys.executable, "-m", "cassandra_data_migrator_ray",
             "--num-cpus", "4", "migrate", "--events", events,
             "--lake", str(tmp_path / "lake2"), "--num-parts", "2",
             "--properties", str(props2)],
            capture_output=True, text=True, timeout=300,
        )
        assert r2.returncode == 0, r2.stderr
        assert "4 normalize actor(s) × 5000 rows/s (total ≈ 20000)" in r2.stderr
        out = _json.loads(r2.stdout.strip().splitlines()[-1])
        assert out["rows"] > 0
