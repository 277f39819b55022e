"""cdm-config-builder analogue: CQL parse → best-practices → properties text
→ round-trip through plan_from_properties (the reference builder's semantic
core, cdm-config-builder/src/utils/{parseCqlSchema,bestPracticesRules,
generateProperties}.js — no Ray needed anywhere here)."""

import json
import subprocess
import sys

import pytest

from cassandra_data_migrator_ray.compat import plan_from_properties
from cassandra_data_migrator_ray.config_builder import (
    build_properties,
    lint_properties,
    parse_cql_schema,
    recommend,
)

CQL = """
CREATE TABLE IF NOT EXISTS shop."orders" (
  tenant_id uuid,
  order_id timeuuid,
  line_no int,
  items map<text, frozen<line_item>>,
  note text,
  total decimal,
  created timestamp,
  attachment blob,
  PRIMARY KEY ((tenant_id, order_id), line_no)
) WITH CLUSTERING ORDER BY (line_no DESC);
"""


class TestParseCql:
    def test_composite_pk_and_flags(self):
        s = parse_cql_schema(CQL)
        assert s.keyspace_table == "shop.orders"
        assert s.partition_keys == ["tenant_id", "order_id"]
        assert s.clustering_keys == ["line_no"]
        assert not s.is_partition_key_only
        assert s.has_collections and s.has_udts and s.has_frozen
        assert s.has_blobs and s.has_timestamps and s.has_numerics
        assert not s.has_counters
        assert dict(s.columns)["items"] == "map<text, frozen<line_item>>"

    def test_inline_pk(self):
        s = parse_cql_schema("CREATE TABLE ks.t (id uuid PRIMARY KEY, v text)")
        assert s.partition_keys == ["id"]
        assert s.is_partition_key_only

    def test_counter_table(self):
        s = parse_cql_schema(
            "CREATE TABLE ks.c (k text, hits counter, PRIMARY KEY (k))"
        )
        assert s.has_counters and s.has_numerics

    def test_errors(self):
        with pytest.raises(ValueError, match="CREATE TABLE"):
            parse_cql_schema("SELECT 1")
        with pytest.raises(ValueError, match="no PRIMARY KEY"):
            parse_cql_schema("CREATE TABLE ks.t (id uuid, v text)")
        with pytest.raises(ValueError, match="undefined columns"):
            parse_cql_schema("CREATE TABLE ks.t (id uuid, PRIMARY KEY (nope))")


class TestRecommend:
    def test_pk_only_batches_one(self):
        s = parse_cql_schema("CREATE TABLE ks.t (id uuid PRIMARY KEY, v text)")
        rec = recommend(s)
        assert rec.props["spark.cdm.perfops.batchSize"] == 1

    def test_lobs_drive_batch_fetch_rate(self):
        rec = recommend(None, data_types=("lobs",))
        assert rec.props["spark.cdm.perfops.batchSize"] == 1
        assert rec.props["spark.cdm.perfops.fetchSizeInRows"] == 100
        assert rec.props["spark.cdm.perfops.ratelimit.origin"] == 5000

    def test_tiny_rows_batch_20(self):
        s = parse_cql_schema(
            "CREATE TABLE ks.t (id uuid, seq int, v text, PRIMARY KEY (id, seq))"
        )
        # 10 GB / 100M rows ~ 0.1 KB/row
        rec = recommend(s, row_count=100_000_000, table_size_gb=10)
        assert rec.props["spark.cdm.perfops.batchSize"] == 20

    def test_large_table_parts_and_trackrun(self):
        rec = recommend(None, row_count=2_000_000_000, table_size_gb=2000)
        assert rec.props["spark.cdm.perfops.numParts"] >= 50_000
        assert rec.props["spark.cdm.trackRun"] is True
        assert rec.props["spark.cdm.perfops.ratelimit.origin"] == 40_000
        assert any("multi-node" in n for n in rec.notes)

    def test_counter_autocorrect_off(self):
        s = parse_cql_schema(
            "CREATE TABLE ks.c (k text, hits counter, PRIMARY KEY (k))"
        )
        rec = recommend(s)
        assert rec.props["spark.cdm.autocorrect.missing.counter"] is False

    def test_collection_only_payload_enables_usecollections(self):
        s = parse_cql_schema(
            "CREATE TABLE ks.t (id uuid, tags set<text>, PRIMARY KEY (id))"
        )
        rec = recommend(s)
        assert rec.props["spark.cdm.schema.ttlwritetime.calc.useCollections"] is True


class TestBuildRoundTrip:
    def _load(self, text: str) -> dict:
        # same parser the engine uses on real files
        import re

        out = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line[0] in "#!":
                continue
            m = re.match(r"^(\S+)\s*[=:\s]\s*(.*)$", line)
            if m:
                out[m.group(1)] = m.group(2).strip()
        return out

    def test_zero_unrecognized_keys(self):
        text = build_properties(
            CQL,
            row_count=500_000_000,
            table_size_gb=400,
            explode_map=("items", "item_key", "item_value"),
            constant_columns={"region": "'emea'"},
            extract_json=("note", "sku:sku_col"),
            autocorrect_missing=True,
        )
        plan = plan_from_properties(self._load(text))
        unknown = {
            k: r for k, r in plan.ignored.items() if "unrecognized" in r
        }
        assert not unknown, unknown
        names = [type(t).__name__ for t in plan.transforms]
        assert "Constant" in names and "ExplodeMap" in names and "ExtractJson" in names
        assert plan.replay_kwargs["num_parts"] >= 1000
        assert plan.replay_kwargs["run_id"] == "auto"  # trackRun+autoRerun
        assert plan.autocorrect_missing and not plan.autocorrect_mismatch

    def test_rename_from_positional_target_schema(self):
        target = CQL.replace("note text", "comment text")
        text = build_properties(CQL, target)
        plan = plan_from_properties(self._load(text))
        renames = [t for t in plan.transforms if type(t).__name__ == "Rename"]
        assert renames and renames[0].mapping == {"note": "comment"}


class TestLint:
    def test_typo_flagged(self):
        rep = lint_properties(
            {
                "spark.cdm.perfops.numPartz": "64",
                "spark.cdm.perfops.numParts": "64",
            }
        )
        assert not rep.ok
        assert "spark.cdm.perfops.numPartz" in rep.unknown

    def test_perfops_warnings(self):
        rep = lint_properties(
            {"spark.cdm.perfops.numParts": "100"},
            row_count=500_000_000,
            table_size_gb=500,
        )
        assert rep.ok
        assert any("numParts" in w for w in rep.warnings)
        assert any("trackRun" in w for w in rep.warnings)


class TestCli:
    def test_build_then_validate(self, tmp_path):
        cql = tmp_path / "t.cql"
        cql.write_text(CQL)
        props = tmp_path / "cdm.properties"
        r = subprocess.run(
            [
                sys.executable, "-m", "cassandra_data_migrator_ray",
                "config-build", "--origin-cql", str(cql),
                "--rows", "200000000", "--size-gb", "150",
                "-o", str(props),
            ],
            capture_output=True, text=True, timeout=120,
        )
        assert r.returncode == 0, r.stderr
        assert "trackRun" in props.read_text()
        r2 = subprocess.run(
            [
                sys.executable, "-m", "cassandra_data_migrator_ray",
                "config-validate", str(props),
            ],
            capture_output=True, text=True, timeout=120,
        )
        assert r2.returncode == 0, r2.stderr
        rep = json.loads(r2.stdout)
        assert rep["ok"] and not rep["unknown_keys"]


class TestReviewFindings:
    def test_reordered_target_schema_emits_no_swap(self):
        """Declaration order is not semantic: identical columns in a
        different order must not produce a rename mapping (a positional zip
        would emit a data-swapping a:b,b:a)."""
        origin = "CREATE TABLE ks.t (id uuid, a text, b text, PRIMARY KEY (id))"
        target = "CREATE TABLE ks.t (id uuid, b text, a text, PRIMARY KEY (id))"
        text = build_properties(origin, target)
        assert "names.to.target" not in text

    def test_genuine_rename_still_inferred(self):
        origin = "CREATE TABLE ks.t (id uuid, note text, PRIMARY KEY (id))"
        target = "CREATE TABLE ks.t (id uuid, comment text, PRIMARY KEY (id))"
        plan = plan_from_properties(
            TestBuildRoundTrip._load(TestBuildRoundTrip(), build_properties(origin, target))
        )
        renames = [t for t in plan.transforms if type(t).__name__ == "Rename"]
        assert renames and renames[0].mapping == {"note": "comment"}

    def test_long_keys_keep_a_separator(self):
        from cassandra_data_migrator_ray.compat import load_properties
        import tempfile, os

        long_key = "spark.cdm.feature.constantColumns.names" + ".x" * 10
        text = build_properties(
            "CREATE TABLE ks.t (id uuid PRIMARY KEY, v text)",
            extra_props={long_key: "val1"},
        )
        f = tempfile.NamedTemporaryFile("w", suffix=".properties", delete=False)
        f.write(text); f.close()
        try:
            props = load_properties(f.name)
        finally:
            os.unlink(f.name)
        assert props[long_key] == "val1"


class TestBuildRoundTripFuzz:
    """Round-4 verdict #8: random CQL DDL (types × PK shapes × collections)
    → build_properties → plan_from_properties must parse with ZERO
    unrecognized keys and yield a runnable plan — the builder's output
    contract holds across the whole DDL space, not just the curated CQL."""

    PRIMITIVES = [
        "text", "ascii", "int", "bigint", "smallint", "tinyint", "varint",
        "float", "double", "decimal", "boolean", "timestamp", "date",
        "time", "uuid", "timeuuid", "inet", "blob", "duration",
    ]
    COLLECTIONS = [
        "list<text>", "set<int>", "map<text, bigint>",
        "frozen<list<uuid>>", "map<int, frozen<set<text>>>",
        "frozen<addr_t>", "list<frozen<addr_t>>", "tuple<int, text>",
        "vector<float, 16>",
    ]

    @staticmethod
    def _load(text: str) -> dict:
        import re

        out = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line[0] in "#!":
                continue
            m = re.match(r"^(\S+)\s*[=:\s]\s*(.*)$", line)
            if m:
                out[m.group(1)] = m.group(2).strip()
        return out

    def _fuzz_one(
        self, n_pk, n_ck, n_payload, type_picks, counter_table, quote_some,
        rows, size_gb,
    ):
        cols = []
        names = [f"c{i}" for i in range(n_pk + n_ck + n_payload)]
        pk_names = names[:n_pk]
        ck_names = names[n_pk : n_pk + n_ck]
        pay_names = names[n_pk + n_ck :]
        pk_types = ["uuid", "text", "bigint"]
        for i, n in enumerate(pk_names + ck_names):
            cols.append((n, pk_types[i % len(pk_types)]))
        pool = self.PRIMITIVES + self.COLLECTIONS
        for i, n in enumerate(pay_names):
            t = "counter" if counter_table else pool[type_picks[i] % len(pool)]
            cols.append((n, t))
        body = ",\n  ".join(
            (f'"{n}" {t}' if quote_some and i % 3 == 0 else f"{n} {t}")
            for i, (n, t) in enumerate(cols)
        )
        if n_pk == 1 and n_ck == 0:
            pk = f"PRIMARY KEY ({pk_names[0]})"
        else:
            inner = (
                f"({', '.join(pk_names)})" if n_pk > 1 else pk_names[0]
            )
            pk = f"PRIMARY KEY ({', '.join([inner] + ck_names)})"
        cql = f"CREATE TABLE ks1.t_fuzz (\n  {body},\n  {pk}\n);"

        schema = parse_cql_schema(cql)
        assert schema.partition_keys == pk_names
        assert schema.clustering_keys == ck_names
        assert len(schema.columns) == len(cols)

        text = build_properties(cql, row_count=rows, table_size_gb=size_gb)
        plan = plan_from_properties(self._load(text))
        unknown = {k: r for k, r in plan.ignored.items() if "unrecognized" in r}
        assert not unknown, unknown
        assert plan.replay_kwargs.get("num_parts", 1) >= 1
        return plan

    def test_fuzz_ddl_space(self):
        from hypothesis import given, settings, strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            n_pk=st.integers(1, 3),
            n_ck=st.integers(0, 2),
            n_payload=st.integers(1, 8),
            type_picks=st.lists(st.integers(0, 10_000), min_size=8, max_size=8),
            counter_table=st.booleans(),
            quote_some=st.booleans(),
            rows=st.sampled_from([0, 1000, 5_000_000, 2_000_000_000]),
            size_gb=st.sampled_from([0, 0.5, 40, 4000]),
        )
        def run(n_pk, n_ck, n_payload, type_picks, counter_table, quote_some,
                rows, size_gb):
            self._fuzz_one(
                n_pk, n_ck, n_payload, type_picks, counter_table, quote_some,
                rows or None, size_gb or None,
            )

        run()
