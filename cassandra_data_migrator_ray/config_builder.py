"""cdm.properties builder: CQL-schema-aware config generation + lint.

The reference ships a Vite/React app (``cdm-config-builder/``) whose semantic
core is three utilities: a CQL ``CREATE TABLE`` parser
(``src/utils/parseCqlSchema.js``), a best-practices rules engine that derives
perfops/feature settings from table shape and size estimates
(``src/utils/bestPracticesRules.js``), and a properties renderer with inline
explanatory comments (``src/utils/generateProperties.js``).  This module is
the engine-side analogue of those semantics — no UI, same decisions:

- :func:`parse_cql_schema` — CREATE TABLE → keys, columns, type flags
- :func:`recommend` — table shape + size estimates → recommended properties,
  each with a WHY comment
- :func:`build_properties` — render a commented ``cdm.properties`` that
  round-trips through :func:`compat.plan_from_properties` with zero
  unrecognized keys
- :func:`lint_properties` — validate an existing file: resolve the plan,
  surface unknown keys, and diff perfops against the recommendations

Everything here is pure computation (no Ray); the output feeds
``compat.replay_from_properties`` / the CLI ``migrate --properties`` path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

# CQL type buckets (reference parseCqlSchema.js:150-200 detects the same
# families to drive the rules engine)
_NUMERIC_TYPES = {
    "int", "bigint", "smallint", "tinyint", "varint",
    "float", "double", "decimal", "counter",
}
_TIMESTAMP_TYPES = {"timestamp", "date", "time", "timeuuid"}
_LOB_TYPES = {"blob"}
_COLLECTION_RE = re.compile(r"^(list|set|map)\s*<", re.IGNORECASE)
_FROZEN_RE = re.compile(r"^frozen\s*<", re.IGNORECASE)
_PRIMITIVES = _NUMERIC_TYPES | _TIMESTAMP_TYPES | _LOB_TYPES | {
    "ascii", "text", "varchar", "uuid", "boolean", "inet", "duration", "vector",
}


@dataclass
class CqlSchema:
    keyspace: str = ""
    table: str = ""
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, type)
    partition_keys: list[str] = field(default_factory=list)
    clustering_keys: list[str] = field(default_factory=list)
    has_collections: bool = False
    has_udts: bool = False
    has_counters: bool = False
    has_blobs: bool = False
    has_timestamps: bool = False
    has_numerics: bool = False
    has_frozen: bool = False

    @property
    def keyspace_table(self) -> str:
        return f"{self.keyspace}.{self.table}"

    @property
    def all_primary_keys(self) -> list[str]:
        return self.partition_keys + self.clustering_keys

    @property
    def is_partition_key_only(self) -> bool:
        return bool(self.partition_keys) and not self.clustering_keys


def _split_top_level(body: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside any (), <> nesting."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _unquote(ident: str) -> str:
    return ident.strip().strip('"').strip("`")


def parse_cql_schema(cql: str) -> CqlSchema:
    """Parse a CQL ``CREATE TABLE`` statement into :class:`CqlSchema`.

    Supports quoted identifiers, ``IF NOT EXISTS``, composite partition keys
    (``PRIMARY KEY ((a, b), c)``), inline per-column ``PRIMARY KEY``, nested
    collection/frozen types, and trailing ``WITH ...`` options.  Raises
    ``ValueError`` with a pointed message on anything unparseable."""
    norm = re.sub(r"\s+", " ", cql or "").strip().rstrip(";")
    m = re.search(
        r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
        r'("?[\w]+"?)\s*\.\s*("?[\w]+"?)\s*\(',
        norm,
        re.IGNORECASE,
    )
    if not m:
        raise ValueError(
            "could not find CREATE TABLE <keyspace>.<table> ( ... ) pattern"
        )
    schema = CqlSchema(keyspace=_unquote(m.group(1)), table=_unquote(m.group(2)))

    # body = outermost parens after the table name
    start = norm.index("(", m.end() - 1)
    depth, end = 0, -1
    for i in range(start, len(norm)):
        if norm[i] == "(":
            depth += 1
        elif norm[i] == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    if end < 0:
        raise ValueError("unbalanced parentheses in table body")
    body = norm[start + 1 : end]

    pk_clause = None
    for clause in _split_top_level(body):
        pk = re.match(r"PRIMARY\s+KEY\s*\((?P<spec>.*)\)\s*$", clause, re.IGNORECASE)
        if pk:
            pk_clause = pk.group("spec")
            continue
        cm = re.match(
            r'(?P<name>"?[\w]+"?)\s+(?P<type>.+?)(?P<inline_pk>\s+PRIMARY\s+KEY)?\s*$',
            clause,
            re.IGNORECASE,
        )
        if not cm:
            raise ValueError(f"could not parse column definition: {clause!r}")
        name = _unquote(cm.group("name"))
        ctype = cm.group("type").strip().lower()
        ctype = re.sub(r"\s+static\s*$", "", ctype)
        schema.columns.append((name, ctype))
        if cm.group("inline_pk"):
            schema.partition_keys = [name]

    if pk_clause:
        groups = _split_top_level(pk_clause)
        first = groups[0] if groups else ""
        if first.startswith("("):
            schema.partition_keys = [
                _unquote(c) for c in _split_top_level(first.strip("() "))
            ]
        elif first:
            schema.partition_keys = [_unquote(first)]
        schema.clustering_keys = [_unquote(c) for c in groups[1:] if c]

    if not schema.partition_keys:
        raise ValueError("no PRIMARY KEY found (inline or clause)")
    known = {n for n, _ in schema.columns}
    missing = [k for k in schema.all_primary_keys if k not in known]
    if missing:
        raise ValueError(f"PRIMARY KEY references undefined columns: {missing}")

    for _, t in schema.columns:
        base = t.split("<", 1)[0].strip()
        # scan the whole type expression: flags apply to nested types too
        # (map<text, frozen<udt>> is a collection AND frozen AND a UDT)
        if "frozen" in re.findall(r"[a-z_]\w*", t):
            schema.has_frozen = True
        if _COLLECTION_RE.match(t):
            schema.has_collections = True
        words = set(re.findall(r"[a-z_]\w*", t))
        if base == "counter":
            schema.has_counters = True
        if words & _LOB_TYPES:
            schema.has_blobs = True
        if words & _TIMESTAMP_TYPES:
            schema.has_timestamps = True
        if words & _NUMERIC_TYPES:
            schema.has_numerics = True
        if words - _PRIMITIVES - {"list", "set", "map", "frozen", "tuple"}:
            schema.has_udts = True  # an identifier that is no known type
    return schema


@dataclass
class Recommendation:
    props: dict[str, object] = field(default_factory=dict)
    comments: dict[str, str] = field(default_factory=dict)
    notes: list[str] = field(default_factory=list)


def _has_plain_non_pk_column(schema: CqlSchema) -> bool:
    pk = set(schema.all_primary_keys)
    return any(
        name not in pk
        and not _COLLECTION_RE.match(t)
        and not _FROZEN_RE.match(t)
        for name, t in schema.columns
    )


def recommend(
    schema: CqlSchema | None = None,
    *,
    row_count: int | None = None,
    table_size_gb: float | None = None,
    data_types: tuple[str, ...] = (),
) -> Recommendation:
    """Best-practices engine: table shape + size estimates → recommended
    ``spark.cdm.*`` values, each with a WHY comment.

    Decision parity with the reference's rules engine
    (``cdm-config-builder/src/utils/bestPracticesRules.js``): ~10 MB per
    token-range part, batch 1 for PK-only/LOB/large rows and 20 for tiny
    rows, fetch size scaled down for large rows, rate limits scaled to
    LOB-ness and table size, collection-aware TTL/writetime, counter
    autocorrect left off, trackRun for anything big."""
    rec = Recommendation()
    has_lobs = "lobs" in data_types or bool(schema and schema.has_blobs)
    has_collections = "collections" in data_types or bool(
        schema and schema.has_collections
    )
    has_udts = "udts" in data_types or bool(schema and schema.has_udts)
    has_counters = "counters" in data_types or bool(schema and schema.has_counters)
    has_timestamps = "timestamps" in data_types or bool(
        schema and schema.has_timestamps
    )
    has_numerics = "numerics" in data_types or bool(schema and schema.has_numerics)
    pk_only = bool(schema and schema.is_partition_key_only)
    size_gb = table_size_gb or 0
    rows = row_count or 0

    # numParts: ~10 MB per part
    if size_gb > 0:
        num_parts = max(1000, -(-int(size_gb * 1024) // 10))
        why = (
            f"from estimated size ({size_gb} GB / 10MB per part); "
            "aim for ~10MB per token-range part"
        )
    elif rows > 0:
        est_gb = rows / 1_000_000  # ~1GB per 1M rows of average width
        num_parts = max(1000, -(-int(est_gb * 1024) // 10))
        why = f"estimated from row count ({rows:,} rows ~= {est_gb:.1f} GB)"
    else:
        num_parts = 5000
        why = "default: assumes ~50GB table (5000 parts x 10MB)"
    if rows > 100_000_000:
        num_parts = max(num_parts, 50_000)
        why += "; raised to >=50,000 for >100M rows"
    rec.props["spark.cdm.perfops.numParts"] = num_parts
    rec.comments["spark.cdm.perfops.numParts"] = why

    # batchSize
    batch, why = 5, "default write batch"
    avg_row_kb = (size_gb * 1024 * 1024 / rows) if (size_gb and rows) else None
    if pk_only:
        batch, why = 1, "PK = partition key (no clustering): batches would span partitions"
    elif has_lobs:
        batch, why = 1, "LOB columns present: rows likely >20KB, batching hurts"
    elif avg_row_kb is not None and avg_row_kb > 20:
        batch, why = 1, f"avg row ~{avg_row_kb:.1f}KB > 20KB: large rows don't batch"
    elif avg_row_kb is not None and avg_row_kb < 1:
        batch, why = 20, f"avg row ~{avg_row_kb:.2f}KB: tiny rows amortize batch overhead"
    rec.props["spark.cdm.perfops.batchSize"] = batch
    rec.comments["spark.cdm.perfops.batchSize"] = why

    # fetchSizeInRows
    fetch, why = 1000, "default origin fetch size"
    if has_lobs:
        fetch, why = 100, "LOB columns: smaller fetches bound reader memory"
    elif avg_row_kb is not None and avg_row_kb > 100:
        fetch, why = 200, f"avg row ~{avg_row_kb:.0f}KB: bound read memory"
    if fetch != 1000:
        rec.props["spark.cdm.perfops.fetchSizeInRows"] = fetch
        rec.comments["spark.cdm.perfops.fetchSizeInRows"] = why

    # rate limits
    rate, why = 20_000, "default 20k ops/s per runner; raise after validating capacity"
    if has_lobs:
        rate, why = 5_000, "LOB reads/writes are slow; higher rates risk timeouts"
    elif rows > 500_000_000 or size_gb > 500:
        rate, why = 40_000, "large table: 40k ops/s, watch for timeouts"
    rec.props["spark.cdm.perfops.ratelimit.origin"] = rate
    rec.comments["spark.cdm.perfops.ratelimit.origin"] = why
    rec.props["spark.cdm.perfops.ratelimit.target"] = rate
    rec.comments["spark.cdm.perfops.ratelimit.target"] = (
        why + "; raise if ExplodeMap multiplies target writes"
    )

    # TTL/writetime from collections
    if (has_collections and schema is not None and not _has_plain_non_pk_column(schema)) or has_udts:
        rec.props["spark.cdm.schema.ttlwritetime.calc.useCollections"] = True
        rec.comments["spark.cdm.schema.ttlwritetime.calc.useCollections"] = (
            "non-key columns are collections/UDTs; without this TTL/WRITETIME "
            "cannot be derived and target rows lose them"
        )

    # counters
    if has_counters:
        rec.props["spark.cdm.autocorrect.missing.counter"] = False
        rec.comments["spark.cdm.autocorrect.missing.counter"] = (
            "re-inserting a deleted counter row double-counts; enable only "
            "after reviewing counter semantics"
        )

    # advisory notes (no property emitted)
    if has_timestamps:
        rec.notes.append(
            "timestamps as TEXT? enable a TIMESTAMP_STRING_* codec "
            "(transform.codecs) and set the string format if needed"
        )
    if has_numerics:
        rec.notes.append(
            "numerics stored as TEXT? enable INT/DOUBLE/BIGINT/DECIMAL_STRING codecs"
        )
    if size_gb > 1000 or rows > 1_000_000_000:
        rec.notes.append(
            ">1TB or >1B rows: run on a multi-node cluster, not a single runner"
        )
    if size_gb > 100 or rows > 100_000_000:
        rec.props["spark.cdm.trackRun"] = True
        rec.props["spark.cdm.trackRun.autoRerun"] = True
        rec.comments["spark.cdm.trackRun"] = (
            "large table: track the run so an interrupted migration resumes "
            "instead of restarting"
        )
    return rec


_BOOL = {True: "true", False: "false"}


def build_properties(
    origin_schema: CqlSchema | str,
    target_schema: CqlSchema | str | None = None,
    *,
    row_count: int | None = None,
    table_size_gb: float | None = None,
    data_types: tuple[str, ...] = (),
    explode_map: tuple[str, str, str] | None = None,  # origin, key, value
    constant_columns: dict[str, str] | None = None,  # name -> CQL literal
    extract_json: tuple[str, str] | None = None,  # origin col, prop mapping
    autocorrect_missing: bool = False,
    autocorrect_mismatch: bool = False,
    extra_props: dict[str, object] | None = None,
) -> str:
    """Render a commented ``cdm.properties``.  Accepts parsed schemas or raw
    CQL.  The output round-trips through ``plan_from_properties`` with zero
    unrecognized keys (pinned by tests/test_config_builder.py)."""
    if isinstance(origin_schema, str):
        origin_schema = parse_cql_schema(origin_schema)
    if isinstance(target_schema, str):
        target_schema = parse_cql_schema(target_schema)
    target_schema = target_schema or origin_schema
    rec = recommend(
        origin_schema,
        row_count=row_count,
        table_size_gb=table_size_gb,
        data_types=data_types,
    )

    lines: list[str] = []

    def prop(key: str, value: object, comment: str | None = None) -> None:
        if comment:
            lines.append(f"# {comment}")
        v = _BOOL[value] if isinstance(value, bool) else value
        # explicit separator: a 52+-char key would otherwise concatenate
        # into its value and parse back as a single valueless key
        lines.append(f"{key:<51} {v}")

    def section(title: str) -> None:
        lines.append("")
        lines.append("#" + "=" * 78)
        lines.append(f"# {title}")
        lines.append("#" + "-" * 78)

    lines.append("# Generated by cassandra_data_migrator_ray config-build")
    lines.append("# Engine docs: README.md; property semantics: compat.py")

    section("Schema")
    prop(
        "spark.cdm.schema.origin.keyspaceTable",
        origin_schema.keyspace_table,
        f"partition keys: {', '.join(origin_schema.partition_keys)}"
        + (
            f"; clustering: {', '.join(origin_schema.clustering_keys)}"
            if origin_schema.clustering_keys
            else " (partition-key-only table)"
        ),
    )
    prop("spark.cdm.schema.target.keyspaceTable", target_schema.keyspace_table)
    # rename inference: positional pairing is the only signal two CREATE
    # TABLEs carry, but declaration order is not semantic — a pair counts as
    # a rename only when NEITHER side's name exists in the other schema
    # (reordered or truncated column lists must not emit swap mappings)
    origin_names = [n for n, _ in origin_schema.columns]
    target_names = [n for n, _ in target_schema.columns]
    renames = {}
    if target_schema is not origin_schema and len(origin_names) == len(target_names):
        oset, tset = set(origin_names), set(target_names)
        renames = {
            o: t
            for o, t in zip(origin_names, target_names)
            if o != t and o not in tset and t not in oset
        }
    if renames:
        prop(
            "spark.cdm.schema.origin.column.names.to.target",
            ",".join(f"{o}:{t}" for o, t in renames.items()),
            "positionally-paired columns whose names exist in only one schema",
        )

    section("Performance")
    for key in (
        "spark.cdm.perfops.numParts",
        "spark.cdm.perfops.batchSize",
        "spark.cdm.perfops.fetchSizeInRows",
        "spark.cdm.perfops.ratelimit.origin",
        "spark.cdm.perfops.ratelimit.target",
    ):
        if key in rec.props:
            prop(key, rec.props[key], rec.comments.get(key))

    feature_keys = [
        k
        for k in rec.props
        if k
        not in (
            "spark.cdm.perfops.numParts",
            "spark.cdm.perfops.batchSize",
            "spark.cdm.perfops.fetchSizeInRows",
            "spark.cdm.perfops.ratelimit.origin",
            "spark.cdm.perfops.ratelimit.target",
        )
    ]
    if feature_keys or explode_map or constant_columns or extract_json or (
        autocorrect_missing or autocorrect_mismatch
    ):
        section("Features")
        for key in feature_keys:
            prop(key, rec.props[key], rec.comments.get(key))
        if explode_map:
            ocol, kcol, vcol = explode_map
            prop("spark.cdm.feature.explodeMap.origin.name", ocol)
            prop("spark.cdm.feature.explodeMap.target.name.key", kcol)
            prop("spark.cdm.feature.explodeMap.target.name.value", vcol)
        if constant_columns:
            prop(
                "spark.cdm.feature.constantColumns.names",
                ",".join(constant_columns),
            )
            prop(
                "spark.cdm.feature.constantColumns.values",
                ",".join(constant_columns.values()),
            )
        if extract_json:
            prop("spark.cdm.feature.extractJson.originColumn", extract_json[0])
            prop("spark.cdm.feature.extractJson.propertyMapping", extract_json[1])
        if autocorrect_missing:
            prop("spark.cdm.autocorrect.missing", True)
        if autocorrect_mismatch:
            prop("spark.cdm.autocorrect.mismatch", True)

    if rec.notes:
        section("Review notes (no property emitted)")
        for n in rec.notes:
            lines.append(f"# - {n}")

    if extra_props:
        section("Extra")
        for k, v in extra_props.items():
            prop(k, v)
    return "\n".join(lines) + "\n"


@dataclass
class LintReport:
    transforms: list[str] = field(default_factory=list)
    replay_kwargs: dict = field(default_factory=dict)
    unknown: dict[str, str] = field(default_factory=dict)  # key -> reason
    transport: dict[str, str] = field(default_factory=dict)
    warnings: list[str] = field(default_factory=list)
    notes: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.unknown


def lint_properties(
    props_or_path: dict[str, str] | str,
    *,
    row_count: int | None = None,
    table_size_gb: float | None = None,
) -> LintReport:
    """Validate an existing properties file: resolve it to a plan (typo'd
    keys surface as ``unknown``), and when size estimates are given, diff the
    file's perfops against what :func:`recommend` would pick."""
    from cassandra_data_migrator_ray.compat import load_properties, plan_from_properties

    props = (
        load_properties(props_or_path)
        if isinstance(props_or_path, str)
        else dict(props_or_path)
    )
    plan = plan_from_properties(props)
    rep = LintReport(
        transforms=[type(t).__name__ for t in plan.transforms],
        replay_kwargs=dict(plan.replay_kwargs),
        notes=list(plan.notes),
    )
    for k, reason in plan.ignored.items():
        (rep.transport if "transport" in reason else rep.unknown)[k] = reason

    if row_count or table_size_gb:
        rec = recommend(None, row_count=row_count, table_size_gb=table_size_gb)
        want = rec.props.get("spark.cdm.perfops.numParts")
        have = props.get("spark.cdm.perfops.numParts")
        if have is not None and want and int(have) < int(want) // 4:
            rep.warnings.append(
                f"numParts={have} is far below the ~10MB-per-part guide "
                f"({want}); token ranges will be large and retries expensive"
            )
        if (
            (row_count or 0) > 100_000_000 or (table_size_gb or 0) > 100
        ) and (props.get("spark.cdm.trackRun", "false").lower() != "true"):
            rep.warnings.append(
                "large table without trackRun=true: an interrupted run restarts "
                "from zero instead of resuming"
            )
    return rep
