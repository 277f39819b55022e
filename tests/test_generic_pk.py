"""Configurable lake primary key (reference PKFactory analogue,
data/PKFactory.java:106-133,241-322): a second table shape with a different
key runs through the same replay/validate/autocorrect pipeline, including a
PK composed from a constant column and an exploded map key (regression SIT
02_ColumnRenameWithConstantsAndExplode)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cassandra_data_migrator_ray.functions.transforms import Constant, ExplodeMap
from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
from cassandra_data_migrator_ray.pipelines.replay import replay
from cassandra_data_migrator_ray.sources.lake import read_lake_pandas
from cassandra_data_migrator_ray.state.manifest import Manifest


@pytest.mark.usefixtures("ray_session")
class TestSecondTableShape:
    def test_orders_like_key(self, tmp_path):
        """Key (order_id: int64, line_no: int64) — neither column name nor
        type matches the default transcripts key."""
        schema = pa.schema(
            [
                ("order_id", pa.int64()),
                ("line_no", pa.int64()),
                ("sku", pa.string()),
                ("qty", pa.int64()),
            ]
        )
        n = 400
        rng = np.random.default_rng(11)
        ev = pa.table(
            {
                "op": pa.array(
                    np.where(rng.random(n) < 0.1, "DELETE", "UPSERT")
                ),
                "order_id": pa.array(rng.integers(0, 40, n), pa.int64()),
                "line_no": pa.array(rng.integers(0, 5, n), pa.int64()),
                "sku": pa.array([f"sku{i % 17}" for i in range(n)]),
                "qty": pa.array(rng.integers(1, 9, n), pa.int64()),
                "writetime": pa.array(np.arange(n) + 100, pa.int64()),
                "event_seq": pa.array(np.arange(n), pa.int64()),
            }
        )
        # null payloads on deletes (engine convention)
        df = ev.to_pandas()
        dels = df["op"] == "DELETE"
        df.loc[dels, ["sku"]] = None
        df.loc[dels, "qty"] = np.nan
        ev = pa.Table.from_pandas(df, preserve_index=False).cast(ev.schema)

        lake = str(tmp_path / "lake")
        replay(
            ev,
            lake,
            num_parts=4,
            payload_schema=schema,
            key_cols=("order_id", "line_no"),
        )
        m = Manifest.load(lake)
        assert m.key_cols == ["order_id", "line_no"]

        # independent oracle: sequential LWW apply
        state: dict[tuple, dict] = {}
        for r in df.sort_values(["writetime", "event_seq"]).itertuples():
            k = (r.order_id, r.line_no)
            if r.op == "DELETE":
                state.pop(k, None)
                continue
            cur = state.setdefault(k, {"sku": None, "qty": None})
            if r.sku is not None and not (isinstance(r.sku, float) and np.isnan(r.sku)):
                cur["sku"] = r.sku
            if not np.isnan(r.qty):
                cur["qty"] = int(r.qty)
        want = (
            pd.DataFrame(
                [
                    {"order_id": k[0], "line_no": k[1], **v}
                    for k, v in state.items()
                ]
            )
            .sort_values(["order_id", "line_no"], ignore_index=True)
        )
        got = read_lake_pandas(lake)
        assert len(got) == len(want)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

        # validate + corrupt + autocorrect through the same generic-key path
        res = validate(want, lake)
        assert res.ok, res.counts
        bad = want.copy()
        bad.loc[0, "sku"] = "CORRUPTED"
        res2 = validate(bad, lake)
        assert res2.counts["MISMATCH"] == 1
        autocorrect(res2, lake)
        assert validate(bad, lake).ok

    def test_constant_and_exploded_map_join_pk(self, tmp_path):
        """PKFactory composition: env comes from a Constant transform, attr_key
        from an ExplodeMap — both join the PK (reference
        PKFactory.java:241-322, SIT 02_ColumnRenameWithConstantsAndExplode)."""
        schema = pa.schema(
            [
                ("env", pa.string()),
                ("doc_id", pa.int64()),
                ("attr_key", pa.string()),
                ("attr_val", pa.string()),
            ]
        )
        ev = pa.table(
            {
                "op": pa.array(["UPSERT", "UPSERT", "UPSERT"]),
                "doc_id": pa.array([1, 1, 2], pa.int64()),
                "attrs": pa.array(
                    [
                        [("color", "red"), ("size", "xl")],
                        [("color", "blue")],
                        [("size", "s")],
                    ],
                    pa.map_(pa.string(), pa.string()),
                ),
                "writetime": pa.array([10, 20, 30], pa.int64()),
                "event_seq": pa.array([0, 1, 2], pa.int64()),
            }
        )
        lake = str(tmp_path / "lake")
        replay(
            ev,
            lake,
            num_parts=2,
            payload_schema=schema,
            key_cols=("env", "doc_id", "attr_key"),
            transforms=[
                ExplodeMap("attrs", "attr_key", "attr_val"),
                Constant({"env": "prod"}, {"env": "string"}),
            ],
        )
        got = read_lake_pandas(lake).set_index(["env", "doc_id", "attr_key"])
        # the later event (wt=20) wins color for doc 1
        assert got.loc[("prod", 1, "color"), "attr_val"] == "blue"
        assert got.loc[("prod", 1, "size"), "attr_val"] == "xl"
        assert got.loc[("prod", 2, "size"), "attr_val"] == "s"
        assert len(got) == 3
