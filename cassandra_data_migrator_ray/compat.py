"""Reference-properties compatibility: drive this engine from a CDM
``cdm.properties`` file.

A user of datastax/cassandra-data-migrator configures jobs with
``spark.cdm.*`` properties (reference src/resources/cdm.properties,
properties/KnownProperties.java:60-210).  ``load_properties`` +
``plan_from_properties`` map the ENGINE-RELEVANT subset onto this engine's
API — the feature chain (constants, explode-map, extract-json, renames,
codecs, filters), run tracking (runId / autoRerun / rerunMultiplier),
perfops (numParts, ratelimit), TTL handling, the diff column skip-list and
autocorrect flags — so an existing properties file runs the same pipeline
over Parquet change streams.

Cassandra-transport keys (connect.*, TLS, consistency, fetch size, SCB) have
no analogue over Parquet; they are collected in ``plan.ignored`` with a
reason, never silently dropped.  Unknown ``spark.cdm.*`` keys land there
too, so a typo'd property is visible.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pyarrow as pa

from cassandra_data_migrator_ray.functions.transforms import (
    CastColumns,
    Constant,
    CoverageSample,
    ExplodeMap,
    ExtractJson,
    Rename,
    ValueSkipFilter,
    WritetimeWindow,
)

_P = "spark.cdm."


def load_properties(path: str) -> dict[str, str]:
    """Java-style .properties parser (the subset CDM files use): one
    ``key  value`` or ``key=value`` per line, ``#``/``!`` comments, blank
    lines skipped.  Values keep internal whitespace."""
    out: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line[0] in "#!":
                continue
            m = re.match(r"^(\S+)\s*[=:\s]\s*(.*)$", line)
            if m:
                out[m.group(1)] = m.group(2).strip()
    return out


class CustomWritetime:
    """spark.cdm.transform.custom.writetime[.incrementBy]: force a fixed
    writetime on every event (reference feature/WritetimeTTL.java custom
    writetime), optionally incremented per row within a batch so exploded
    rows keep distinct orderings."""

    def __init__(self, value: int, increment_by: int = 0):
        self.value, self.inc = int(value), int(increment_by)

    def __call__(self, t: pa.Table) -> pa.Table:
        import numpy as np

        n = len(t)
        wt = np.full(n, self.value, dtype=np.int64)
        if self.inc:
            wt += np.arange(n, dtype=np.int64) * self.inc
        i = t.column_names.index("writetime")
        return t.set_column(i, "writetime", pa.array(wt, pa.int64()))


@dataclass
class Plan:
    """What a properties file resolves to: pass ``transforms`` +
    ``replay_kwargs`` to :func:`pipelines.replay.replay`, and
    ``validate_kwargs`` / ``autocorrect_*`` to the diff path."""

    transforms: list = field(default_factory=list)
    replay_kwargs: dict = field(default_factory=dict)
    validate_kwargs: dict = field(default_factory=dict)
    autocorrect_missing: bool = False
    autocorrect_mismatch: bool = False
    guardrail_kb: float | None = None
    ignored: dict[str, str] = field(default_factory=dict)
    notes: list[str] = field(default_factory=list)


_TRANSPORT = (
    "connect.",
    "perfops.consistency.",
    "perfops.fetchSizeInRows",
    "perfops.batchSize",
    "perfops.printStatsAfter",
    "perfops.printStatsPerPart",
    "perfops.errorLimit",
    "schema.origin.keyspaceTable",
    "schema.target.keyspaceTable",
    "filter.cassandra.",
    "tokenrange.",
)


def _parse_constant_value(v: str):
    """CQL literal → Python: quoted string, true/false, int, else float/str."""
    v = v.strip()
    if len(v) >= 2 and v[0] == "'" and v[-1] == "'":
        return v[1:-1]
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def plan_from_properties(props: dict[str, str] | str) -> Plan:
    """Resolve a CDM properties map (or file path) into a :class:`Plan`.

    Feature-chain ordering mirrors the reference's application order:
    renames → codecs → constants → explode-map → extract-json → filters.
    """
    if isinstance(props, str):
        props = load_properties(props)
    plan = Plan()
    p = {k[len(_P):]: v for k, v in props.items() if k.startswith(_P)}
    handled: set[str] = set()

    def take(key: str, default: str | None = None) -> str | None:
        handled.add(key)
        return p.get(key, default)

    # --- schema / renames / skip list -------------------------------------
    ren = take("schema.origin.column.names.to.target")
    if ren:
        mapping = dict(pair.split(":", 1) for pair in ren.split(",") if ":" in pair)
        if mapping:
            plan.transforms.append(Rename(mapping))
    skip = take("schema.origin.column.skip")
    if skip:
        skip_cols = [c.strip() for c in skip.split(",") if c.strip()]
        plan.notes.append(
            f"column skip-list {skip_cols}: pass validate(columns=<payload "
            "minus these>) — the engine's diff-side F6 analogue"
        )
        plan.validate_kwargs["skip_columns"] = skip_cols

    # --- codecs ------------------------------------------------------------
    codecs = take("transform.codecs")
    if codecs:
        plan.notes.append(
            f"transform.codecs={codecs}: reference codecs are type-pair "
            "registrations; map each affected column explicitly via "
            "CastColumns({'col': 'codec'}) (timestamp string format: "
            + (take("transform.codecs.timestamp.string.format") or "default")
            + ")"
        )

    # --- constants ----------------------------------------------------------
    names = take("feature.constantColumns.names")
    values = take("feature.constantColumns.values")
    split = take("feature.constantColumns.splitRegex", ",")
    if names and values:
        cols = [c.strip() for c in names.split(",")]
        vals = [_parse_constant_value(v) for v in re.split(split, values)]
        if len(cols) != len(vals):
            raise ValueError(
                f"constantColumns: {len(cols)} names but {len(vals)} values "
                f"(splitRegex={split!r})"
            )
        plan.transforms.append(Constant(dict(zip(cols, vals))))

    # --- explode map ----------------------------------------------------------
    emap = take("feature.explodeMap.origin.name")
    if emap:
        plan.transforms.append(
            ExplodeMap(
                emap,
                take("feature.explodeMap.target.name.key", f"{emap}_key"),
                take("feature.explodeMap.target.name.value", f"{emap}_value"),
            )
        )

    # --- extract json -----------------------------------------------------------
    ejcol = take("feature.extractJson.originColumn")
    if ejcol:
        mapping = take("feature.extractJson.propertyMapping", "")
        overwrite = (take("feature.extractJson.overwrite", "false") or "").lower() == "true"
        if mapping:
            prop, _, dst = mapping.partition(":")
            plan.transforms.append(
                ExtractJson(ejcol, prop.strip(), (dst or prop).strip(), overwrite=overwrite)
            )
        if (take("feature.extractJson.exclusive", "false") or "").lower() == "true":
            plan.notes.append(
                "extractJson.exclusive: reference migrates ONLY the extracted "
                "field; follow with Select([keys..., dst]) to reproduce"
            )

    # --- custom writetime / ttl ----------------------------------------------
    cw = take("transform.custom.writetime")
    if cw and int(cw) > 0:
        plan.transforms.append(
            CustomWritetime(int(cw), int(take("transform.custom.writetime.incrementBy", "0") or 0))
        )
    ct = take("transform.custom.ttl")
    if ct and int(ct) > 0:
        plan.notes.append(
            f"custom.ttl={ct}: add a Constant({{'ttl': {ct}}}) transform and "
            "replay(ttl=True) to attach a fixed per-cell TTL"
        )
    ttl_auto = take("schema.origin.column.ttl.automatic")
    if ttl_auto is not None:
        plan.replay_kwargs["ttl"] = None if ttl_auto.lower() == "true" else False
    take("schema.origin.column.ttl.names")
    take("schema.origin.column.writetime.automatic")
    wt_names = take("schema.origin.column.writetime.names")
    if wt_names:
        plan.notes.append(
            f"writetime.names={wt_names}: the event stream's `writetime` "
            "column should carry max() over these origin columns "
            "(functions.transforms.WritetimeMax)"
        )
    take("schema.ttlwritetime.calc.useCollections")
    nullts = take("transform.missing.key.ts.replace.value")
    if nullts:
        plan.notes.append(
            f"missing.key.ts.replace.value={nullts}: the engine defaults "
            "null timestamp PK parts type-generically (stages/normalize.py)"
        )

    # --- filters -------------------------------------------------------------
    lo, hi = take("filter.java.writetime.min"), take("filter.java.writetime.max")
    if lo or hi:
        plan.transforms.append(
            WritetimeWindow(int(lo) if lo else None, int(hi) if hi else None)
        )
    fcol, fval = take("filter.java.column.name"), take("filter.java.column.value")
    if fcol and fval is not None:
        plan.transforms.append(ValueSkipFilter(fcol, fval))
    pct = take("filter.java.token.percent")
    if pct:
        plan.transforms.append(CoverageSample(float(pct)))

    # --- run tracking ----------------------------------------------------------
    if (take("trackRun", "false") or "").lower() == "true":
        run_id = take("trackRun.runId")
        prev = take("trackRun.previousRunId")
        auto_rerun = (take("trackRun.autoRerun", "false") or "").lower() == "true"
        if prev and prev != "0":
            # reference prevRunId semantics (BasePartitionJob.scala:42-57):
            # an explicit non-zero prevRunId asks to resume that run's
            # pending partitions; if the run was never started the job
            # WARNS and falls back to a fresh full run (the statement layer
            # raises RunNotStartedException, the job catches it) — see
            # replay(require_existing_run=True)
            plan.replay_kwargs["run_id"] = prev
            plan.replay_kwargs["require_existing_run"] = True
        elif run_id:
            plan.replay_kwargs["run_id"] = run_id
        elif auto_rerun:
            # prevRunId=0 means "not a rerun" in the reference; auto-
            # discovery of the latest incomplete run happens ONLY when
            # autoRerun=true (BasePartitionJob.scala:42-46: getPreviousRunId
            # is called iff prevRunId==0 && autoRerun).  An explicit "0"
            # without autoRerun is simply discarded — the shipped
            # cdm-detailed.properties template carries `previousRunId 0`
            # uncommented, and template-derived configs must start fresh.
            plan.replay_kwargs["run_id"] = "auto"
        rm = take("trackRun.rerunMultiplier")
        if rm and int(rm) > 1:
            plan.replay_kwargs["rerun_multiplier"] = int(rm)
    else:
        for k in ("trackRun.runId", "trackRun.autoRerun", "trackRun.previousRunId",
                  "trackRun.rerunMultiplier"):
            take(k)

    # --- perfops ---------------------------------------------------------------
    np_ = take("perfops.numParts")
    if np_:
        plan.replay_kwargs["num_parts"] = int(np_)
    rate = take("perfops.ratelimit.target")
    take("perfops.ratelimit.origin")
    # engine extension: size the normalize actor pool explicitly (no CDM
    # analogue — the reference's limiter is per Spark executor)
    nc = take("perfops.normalizeConcurrency")
    if nc and int(nc) > 0:
        plan.replay_kwargs["normalize_concurrency"] = int(nc)
    if rate and float(rate) > 0:
        # reference semantics: ratelimit.target is the TOTAL ops/s for the
        # job (per CDM VM).  The engine limiter is per-actor, so split the
        # total across the normalize pool; default the pool to 1 actor so a
        # properties-driven run works out of the box (a rate-limited job is
        # throughput-capped anyway — one actor sustains any sane limit).
        n_actors = plan.replay_kwargs.setdefault("normalize_concurrency", 1)
        plan.replay_kwargs["rate_limit_rows_per_s"] = float(rate) / n_actors
        plan.notes.append(
            f"ratelimit.target={rate} total, split across "
            f"{n_actors} normalize actor(s) "
            "(set spark.cdm.perfops.normalizeConcurrency to resize the pool)"
        )

    # --- autocorrect / guardrail -------------------------------------------------
    plan.autocorrect_missing = (take("autocorrect.missing", "false") or "").lower() == "true"
    plan.autocorrect_mismatch = (take("autocorrect.mismatch", "false") or "").lower() == "true"
    take("autocorrect.missing.counter")
    gr = take("feature.guardrail.colSizeInKB")
    if gr and float(gr) > 0:
        plan.guardrail_kb = float(gr)

    # --- everything else: transport (expected) or unknown (flagged) -----------
    for k, v in p.items():
        if k in handled:
            continue
        if any(k.startswith(t) or k == t.rstrip(".") for t in _TRANSPORT):
            plan.ignored[_P + k] = "Cassandra-transport setting; no Parquet analogue"
        else:
            plan.ignored[_P + k] = "unrecognized property (check spelling)"
    return plan


def replay_from_properties(events, lake_dir: str, props, **overrides):
    """One-call convenience: resolve the plan and run the replay with it.
    ``overrides`` win over properties-derived kwargs."""
    from cassandra_data_migrator_ray.pipelines.replay import replay

    plan = plan_from_properties(props)
    kwargs = {**plan.replay_kwargs, **overrides}
    return replay(events, lake_dir, transforms=plan.transforms or None, **kwargs)


def validate_from_properties(expected, lake_dir: str, props, **overrides):
    """Properties-driven DiffData analogue: applies the column skip-list
    (validate(columns = payload minus skipped)) and, when
    ``autocorrect.missing`` / ``autocorrect.mismatch`` are set, replays
    corrective events for the enabled categories (reference
    job/DiffJobSession.java autocorrect branches).  Returns
    (ValidateResult, corrected_result_or_None)."""
    from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
    from cassandra_data_migrator_ray.state.manifest import Manifest

    plan = plan_from_properties(props)
    kwargs = dict(plan.validate_kwargs)
    skip = kwargs.pop("skip_columns", None)
    if skip:
        payload = Manifest.load(lake_dir).payload_cols()
        kwargs["columns"] = [c for c in payload if c not in set(skip)]
    kwargs.update(overrides)
    result = validate(expected, lake_dir, **kwargs)
    fixed = None
    if not result.ok and (plan.autocorrect_missing or plan.autocorrect_mismatch):
        rep = result.report
        want = []
        if plan.autocorrect_missing:
            want += ["MISSING", "EXTRA"]
        if plan.autocorrect_mismatch:
            want += ["MISMATCH"]
        sub = rep[rep["status"].isin(want)]
        if len(sub):
            import copy

            partial = copy.copy(result)
            partial.report = sub
            fixed = autocorrect(partial, lake_dir)
    return result, fixed
