"""CLI entry points — the reference's three job mains, `ray job submit`-able.

Reference: com.datastax.cdm.job.{Migrate, DiffData, GuardrailCheck} Scala Apps
(/root/reference src/main/scala/com/datastax/cdm/job/).  Usage:

    python -m cassandra_data_migrator_ray migrate   --events E.parquet --lake L [--num-parts 64] [--salt 1] [--compact]
    python -m cassandra_data_migrator_ray validate  --expected X.parquet --lake L [--autocorrect] [--report R.parquet]
    python -m cassandra_data_migrator_ray guardrail --input D.parquet --max-kb 1.0
    python -m cassandra_data_migrator_ray tail      --source WAL_DIR --lake L [--stop-after-idle 3]
    python -m cassandra_data_migrator_ray metrics   --lake L [--scan]
    python -m cassandra_data_migrator_ray lookup    --lake L --keys conv42 conv7,3
    python -m cassandra_data_migrator_ray changes   --lake L [--run-id R | --version N] [--out F.parquet]
    python -m cassandra_data_migrator_ray snapshots --lake L
    python -m cassandra_data_migrator_ray vacuum    --lake L --keep-last 1

The CLI owns the Ray session (library code never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cassandra_data_migrator_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    m = sub.add_parser("migrate", help="replay a change stream into the lake")
    m.add_argument("--events", required=True, nargs="+")
    m.add_argument("--lake", required=True)
    m.add_argument("--num-parts", default=64,
                   type=lambda v: v if v == "auto" else int(v))
    m.add_argument("--salt", default=1,
                   type=lambda v: v if v == "auto" else int(v))
    m.add_argument("--run-id", default=None)
    m.add_argument("--resume", action="store_true",
                   help="resume the latest incomplete run (auto-detects its "
                        "run id from _staging/; requires the same --events)")
    m.add_argument("--compact", action="store_true")
    m.add_argument("--format", default="auto", dest="file_format",
                   choices=["auto", "parquet", "csv", "json", "arrow"],
                   help="change-batch file format (csv/json coerce to the transcripts event schema)")
    m.add_argument("--emit-changes", action="store_true",
                   help="write a per-run change-data-feed (readable with `changes`)")
    m.add_argument("--widen-types", action="store_true",
                   help="allow lossless numeric schema widening (int -> wider "
                        "int, float32 -> float64) when the stream's types "
                        "outgrow the lake's declared schema")
    m.add_argument("--analyze", action="store_true",
                   help="refresh scan-pruning column stats after the commit "
                        "(incremental: re-reads only partitions this run touched)")
    m.add_argument("--properties", default=None,
                   help="reference cdm.properties file: spark.cdm.* keys drive "
                        "the transform chain and run/perf knobs (explicit CLI "
                        "flags win; transport-only keys reported as ignored)")

    v = sub.add_parser("validate", help="diff the lake against an expected table")
    v.add_argument("--expected", required=True)
    v.add_argument("--lake", required=True)
    v.add_argument("--autocorrect", action="store_true")
    v.add_argument("--report", default=None)
    v.add_argument("--columns", nargs="*", default=None,
                   help="restrict the diff to these payload columns (skip-list)")
    v.add_argument("--since-version", type=int, default=None,
                   help="incremental: compare only partitions touched by runs after this manifest version")
    v.add_argument("--as-of", type=int, default=None,
                   help="TTL lakes: evaluate per-cell expiry at this instant (us)")

    dl = sub.add_parser(
        "diff-lakes",
        help="compare two lakes' final states (origin vs target DiffData); "
        "zero-exchange when layouts match",
    )
    dl.add_argument("--lake-a", required=True, help="the expected side")
    dl.add_argument("--lake-b", required=True, help="the actual side")
    dl.add_argument("--report", default=None)
    dl.add_argument("--columns", nargs="*", default=None,
                    help="restrict the diff to these payload columns (skip-list)")
    dl.add_argument("--version-a", type=int, default=None,
                    help="time-travel: pin side A to this committed snapshot")
    dl.add_argument("--version-b", type=int, default=None,
                    help="time-travel: pin side B to this committed snapshot")
    dl.add_argument("--as-of", type=int, default=None,
                    help="TTL lakes: evaluate per-cell expiry at this instant (us)")

    g = sub.add_parser("guardrail", help="pre-flight column-size scan")
    g.add_argument("--input", required=True, nargs="+")
    g.add_argument("--max-kb", type=float, default=1.0)
    g.add_argument("--columns", nargs="*", default=None)

    dd = sub.add_parser(
        "dedup", help="deduplicate a document corpus (detect → cluster → apply)"
    )
    dd.add_argument("--input", required=True, nargs="+",
                    help="corpus parquet file(s)/dir(s)")
    dd.add_argument("--output", required=True,
                    help="output directory for the deduplicated parquet")
    dd.add_argument("--method", default="minhash",
                    choices=["exact", "minhash", "simhash", "embedding"])
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--vec-col", default="embedding",
                    help="vector column (method=embedding)")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--threshold", type=float, default=0.8,
                    help="jaccard (minhash) / cosine (embedding) threshold")
    dd.add_argument("--max-hamming", type=int, default=3,
                    help="simhash bit distance")
    dd.add_argument("--distributed", action="store_true",
                    help="FORCE the no-pairs-on-driver path (Bloom-broadcast "
                         "verify + label-propagation clustering + anti-join "
                         "apply); default is size-gated auto routing")

    c = sub.add_parser("compact", help="rewrite partitions dropping tombstones")
    c.add_argument("--lake", required=True)
    c.add_argument("--grace-wt", type=int, default=None)
    c.add_argument("--only-tombstoned", action="store_true",
                   help="rewrite only partitions recording tombstones (cost ∝ deletes)")
    c.add_argument("--cluster-by", nargs="+", default=None,
                   help="sort rewritten partitions by these columns (physical "
                        "layout: tight row-group stats for range scans)")

    an = sub.add_parser("analyze", help="compute per-partition column stats for scan pruning")
    an.add_argument("--lake", required=True)
    an.add_argument("--columns", nargs="*", default=None)
    an.add_argument("--full", action="store_true",
                    help="force a full rescan (default reuses stats for "
                         "partitions whose file list is unchanged)")

    fs = sub.add_parser("fsck", help="integrity audit: files vs manifest, recomputed counts")
    fs.add_argument("--lake", required=True)
    fs.add_argument("--shallow", action="store_true",
                    help="skip the parallel partition re-read (file existence only)")

    rs = sub.add_parser("reshard", help="re-key a committed lake to a new (num_parts, salt) layout")
    rs.add_argument("--lake", required=True)
    rs.add_argument("--num-parts", type=int, required=True)
    rs.add_argument("--salt", type=int, default=None)

    al = sub.add_parser("alter", help="rename / drop payload columns (schema evolution)")
    al.add_argument("--lake", required=True)
    al.add_argument("--rename", nargs="*", default=[], metavar="OLD=NEW",
                    help="rename payload columns (rewrites partitions copy-on-write)")
    al.add_argument("--drop", nargs="*", default=[],
                    help="drop payload columns (metadata-only; bytes purged "
                         "by the next full compact/rename/reshard)")

    t = sub.add_parser("tail", help="WAL-tail loop: ingest new change files as they appear")
    t.add_argument("--source", required=True, help="directory of change-batch parquet files")
    t.add_argument("--lake", required=True)
    t.add_argument("--pattern", default="*.parquet")
    t.add_argument("--format", default="parquet", dest="file_format",
                   choices=["parquet", "csv", "json", "arrow"])
    t.add_argument("--num-parts", default=64,
                   type=lambda v: v if v == "auto" else int(v))
    t.add_argument("--salt", type=int, default=1)
    t.add_argument("--poll-interval", type=float, default=2.0)
    t.add_argument("--min-age-s", type=float, default=0.0)
    t.add_argument("--max-cycles", type=int, default=None)
    t.add_argument("--stop-after-idle", type=int, default=None,
                   help="exit after this many consecutive empty polls (drain mode)")
    t.add_argument("--analyze", action="store_true",
                   help="refresh scan-pruning stats after every ingested cycle "
                        "(incremental; cost ∝ the cycle's touched partitions)")

    s = sub.add_parser("metrics", help="per-partition throughput/lag report")
    s.add_argument("--lake", required=True)
    s.add_argument("--scan", action="store_true",
                   help="also scan the lake for event-time lag (max __row_wt)")

    lk = sub.add_parser("lookup", help="point lookup by PK / key prefix (partition-pruned)")
    lk.add_argument("--lake", required=True)
    lk.add_argument("--keys", required=True, nargs="+",
                    help="first-key values, or full keys as comma-joined tuples (conv,turn)")
    lk.add_argument("--columns", nargs="*", default=None)
    lk.add_argument("--out", default=None, help="write result parquet here instead of stdout JSON")

    ch = sub.add_parser("changes", help="read a committed run's change-data-feed")
    ch.add_argument("--lake", required=True)
    ch.add_argument("--run-id", default=None)
    ch.add_argument("--version", type=int, default=None)
    ch.add_argument("--out", default=None, help="write feed parquet here instead of a stdout summary")

    vc = sub.add_parser("vacuum", help="prune time-travel snapshots + their files and old change feeds")
    vc.add_argument("--lake", required=True)
    vc.add_argument("--keep-last", type=int, default=1)

    sn = sub.add_parser("snapshots", help="list committed versions available for time travel")
    sn.add_argument("--lake", required=True)

    lg = sub.add_parser("lineage", help="file-level lineage: which run wrote each partition file")
    lg.add_argument("--lake", required=True)

    ann = sub.add_parser(
        "ann", help="IVF-PQ similarity search: build/encode an index, search it"
    )
    ann_sub = ann.add_subparsers(dest="ann_cmd", required=True)
    ai = ann_sub.add_parser("index", help="train + persist index, encode corpus to a code table")
    ai.add_argument("--input", required=True, help="parquet with id + vector columns")
    ai.add_argument("--index", required=True, help="index parquet file to write")
    ai.add_argument("--codes", required=True, help="fresh dir for the code table")
    ai.add_argument("--vec-col", default="embedding")
    ai.add_argument("--id-col", default="vec_id")
    ai.add_argument("--n-centroids", type=int, default=64)
    ai.add_argument("-m", type=int, default=8, help="PQ subspaces (bytes per vector)")
    ai.add_argument("--ksub", type=int, default=256)
    ai.add_argument("--train-sample", type=int, default=20000)
    ai.add_argument("--metric", choices=["cosine", "ip"], default="cosine")
    asr = ann_sub.add_parser("search", help="ADC top-k over an encoded code table")
    asr.add_argument("--codes", required=True)
    asr.add_argument("--index", required=True)
    asr.add_argument("--queries", required=True,
                     help="parquet with id + vector columns holding the queries")
    asr.add_argument("--vec-col", default="embedding")
    asr.add_argument("--id-col", default="vec_id")
    asr.add_argument("-k", type=int, default=10)
    asr.add_argument("--nprobe", type=int, default=8)
    asr.add_argument(
        "--rerank", metavar="VECTORS",
        help="parquet with the ORIGINAL id + vector columns: exact-rescore "
        "the ADC shortlist so quantization decides only candidate entry, "
        "never final order (the standard PQ deployment)",
    )
    asr.add_argument(
        "--shortlist", type=int, default=100,
        help="ADC candidates per query fed to --rerank (default 100)",
    )

    cb = sub.add_parser(
        "config-build",
        help="generate a commented cdm.properties from CQL schema + size hints",
    )
    cb.add_argument("--origin-cql", required=True, help="file with CREATE TABLE, or '-' for stdin")
    cb.add_argument("--target-cql", help="target CREATE TABLE file (defaults to origin)")
    cb.add_argument("--rows", type=int, help="estimated row count")
    cb.add_argument("--size-gb", type=float, help="estimated table size in GB")
    cb.add_argument(
        "--data-types",
        default="",
        help="comma list of flags: lobs,collections,udts,counters,timestamps,numerics",
    )
    cb.add_argument("--autocorrect-missing", action="store_true")
    cb.add_argument("--autocorrect-mismatch", action="store_true")
    cb.add_argument("-o", "--output", help="write here instead of stdout")

    cv = sub.add_parser(
        "config-validate",
        help="lint a cdm.properties: resolve the plan, flag unknown keys",
    )
    cv.add_argument("properties")
    cv.add_argument("--rows", type=int, help="row estimate for perfops lint")
    cv.add_argument("--size-gb", type=float, help="size estimate for perfops lint")

    args = p.parse_args(argv)
    # the read-side metadata commands (lookup/changes/snapshots/vacuum) are
    # driver-side pyarrow/os work — skip the multi-second Ray startup
    needs_ray = args.cmd in {
        "migrate", "validate", "diff-lakes", "guardrail", "compact", "reshard",
        "analyze", "fsck", "tail", "metrics", "dedup", "alter", "ann",
    }  # lineage/lookup/changes/snapshots/vacuum are driver-side metadata
    ray = _init_ray(args.num_cpus) if needs_ray else None
    try:
        if args.cmd == "migrate":
            from cassandra_data_migrator_ray.pipelines.replay import replay

            from cassandra_data_migrator_ray.sources.events import (
                _sniff_format,
                read_change_batches,
            )

            fmt = args.file_format
            if fmt == "auto":
                fmt = _sniff_format(args.events)
            if fmt == "parquet":
                events_in = args.events  # metadata-count fast path
            else:
                from cassandra_data_migrator_ray.schema import EVENTS_SCHEMA

                events_in = read_change_batches(
                    args.events, file_format=fmt, schema=EVENTS_SCHEMA
                )
            kwargs = dict(
                num_parts=args.num_parts,
                salt=args.salt,
                run_id="auto" if args.resume else args.run_id,
                compact=args.compact,
                emit_changes=args.emit_changes,
                widen_types=args.widen_types,
                analyze=args.analyze,
            )
            transforms = None
            if args.properties:
                import sys as _sys

                from cassandra_data_migrator_ray.compat import plan_from_properties

                plan = plan_from_properties(args.properties)
                transforms = plan.transforms or None
                # properties fill gaps; explicit CLI flags keep their values
                # (argparse defaults count as "not explicitly set" only for
                # the knobs properties can own)
                if args.num_parts == 64 and "num_parts" in plan.replay_kwargs:
                    kwargs["num_parts"] = plan.replay_kwargs["num_parts"]
                if args.run_id is None and not args.resume:
                    kwargs["run_id"] = plan.replay_kwargs.get("run_id")
                for k in (
                    "rerun_multiplier",
                    "rate_limit_rows_per_s",
                    "ttl",
                    "normalize_concurrency",
                    "require_existing_run",
                ):
                    if k in plan.replay_kwargs:
                        kwargs[k] = plan.replay_kwargs[k]
                if kwargs.get("rate_limit_rows_per_s"):
                    # compat already split ratelimit.target (the job TOTAL)
                    # across the normalize pool it recorded — forward that
                    # pool size verbatim; overriding it here would multiply
                    # the configured cap (the limiter is per-actor)
                    nc = kwargs.get("normalize_concurrency") or 1
                    print(
                        f"note: ratelimit → {nc} normalize actor(s) × "
                        f"{kwargs['rate_limit_rows_per_s']:.0f} rows/s "
                        f"(total ≈ {nc * kwargs['rate_limit_rows_per_s']:.0f})",
                        file=_sys.stderr,
                    )
                for key, why in plan.ignored.items():
                    print(f"ignored {key}: {why}", file=_sys.stderr)
                for note in plan.notes:
                    print(f"note: {note}", file=_sys.stderr)
            res = replay(events_in, args.lake, transforms=transforms, **kwargs)
            print(
                json.dumps(
                    {
                        "run_id": res.run_id,
                        "partitions": int(len(res.metrics)),
                        "rows": int(res.metrics["rows"].sum()) if len(res.metrics) else 0,
                        "keys_merged": res.events_merged_keys,
                        "seconds": round(res.seconds, 3),
                    }
                )
            )
        elif args.cmd == "validate":
            import ray.data as rd

            from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate

            res = validate(
                rd.read_parquet(args.expected),
                args.lake,
                report_path=args.report,
                columns=args.columns,
                since_version=args.since_version,
                as_of=args.as_of,
            )
            out = {"counts": res.counts, "ok": res.ok, "seconds": round(res.seconds, 3)}
            if args.autocorrect and not res.ok:
                autocorrect(res, args.lake)
                # same comparison semantics as the first pass: a TTL lake
                # re-validated without as_of would compare stored state
                # against the as-of expected view and spuriously fail
                res2 = validate(
                    rd.read_parquet(args.expected),
                    args.lake,
                    columns=args.columns,
                    as_of=args.as_of,
                )
                out["after_correction"] = res2.counts
                out["corrected"] = res2.ok
            print(json.dumps(out))
            return 0 if out.get("corrected", res.ok) else 1
        elif args.cmd == "diff-lakes":
            from cassandra_data_migrator_ray.pipelines.diff import diff_lakes

            res = diff_lakes(
                args.lake_a,
                args.lake_b,
                columns=args.columns,
                report_path=args.report,
                version_a=args.version_a,
                version_b=args.version_b,
                as_of=args.as_of,
            )
            print(json.dumps(
                {"counts": res.counts, "ok": res.ok, "seconds": round(res.seconds, 3)}
            ))
            return 0 if res.ok else 1
        elif args.cmd == "compact":
            from cassandra_data_migrator_ray.pipelines.maintenance import compact_lake

            res = compact_lake(
                args.lake,
                args.grace_wt,
                only_tombstoned=args.only_tombstoned,
                cluster_by=args.cluster_by,
            )
            print(
                json.dumps(
                    {
                        "run_id": res.run_id,
                        "partitions": int(len(res.metrics)),
                        "tombstones_left": int(res.metrics["tombstones"].sum())
                        if len(res.metrics)
                        else 0,
                        "seconds": round(res.seconds, 3),
                    }
                )
            )
        elif args.cmd == "analyze":
            from cassandra_data_migrator_ray.pipelines.maintenance import analyze_lake

            st = analyze_lake(
                args.lake, args.columns, incremental=not args.full
            )
            print(
                json.dumps(
                    {
                        "version": st["version"],
                        "partitions": len(st["partitions"]),
                        "columns": st["columns"],
                        "reused_parts": st["reused_parts"],
                        "recomputed_parts": st["recomputed_parts"],
                        "seconds": st["seconds"],
                    }
                )
            )
        elif args.cmd == "fsck":
            from cassandra_data_migrator_ray.pipelines.maintenance import fsck_lake

            res = fsck_lake(args.lake, deep=not args.shallow)
            bad = (
                res["partitions"][~res["partitions"]["ok"]]
                if len(res["partitions"])
                else res["partitions"]
            )
            print(
                json.dumps(
                    {
                        "ok": res["ok"],
                        "missing": res["missing"],
                        "orphans": len(res["orphans"]),
                        "bad_partitions": {
                            int(r["part"]): r["issues"]
                            for _, r in bad.iterrows()
                        },
                        "seconds": res["seconds"],
                    }
                )
            )
            return 0 if res["ok"] else 1
        elif args.cmd == "reshard":
            from cassandra_data_migrator_ray.pipelines.maintenance import reshard_lake

            res = reshard_lake(args.lake, args.num_parts, args.salt)
            print(
                json.dumps(
                    {
                        "run_id": res.run_id,
                        "num_parts": args.num_parts,
                        "partitions_written": int(len(res.metrics)),
                        "rows": int(res.metrics["rows"].sum())
                        if len(res.metrics)
                        else 0,
                        "seconds": round(res.seconds, 3),
                    }
                )
            )
        elif args.cmd == "alter":
            from cassandra_data_migrator_ray.pipelines.maintenance import alter_lake

            rename: dict[str, str] = {}
            for spec in args.rename:
                if "=" not in spec:
                    p.error(f"--rename expects OLD=NEW, got {spec!r}")
                old, _, new = spec.partition("=")
                rename[old] = new
            res = alter_lake(args.lake, rename=rename, drop=args.drop)
            print(
                json.dumps(
                    {
                        "run_id": res.run_id,
                        "rename": rename,
                        "drop": list(args.drop),
                        "partitions_rewritten": int(len(res.metrics)),
                        "seconds": round(res.seconds, 3),
                    }
                )
            )
        elif args.cmd == "tail":
            from cassandra_data_migrator_ray.pipelines.tail import tail_replay

            res = tail_replay(
                args.source,
                args.lake,
                pattern=args.pattern,
                poll_interval=args.poll_interval,
                min_age_s=args.min_age_s,
                max_cycles=args.max_cycles,
                stop_after_idle_cycles=args.stop_after_idle,
                file_format=args.file_format,
                num_parts=args.num_parts,
                salt=args.salt,
                analyze=args.analyze,
            )
            print(
                json.dumps(
                    {
                        "cycles": res.cycles,
                        "files_ingested": len(res.files_ingested),
                        "keys_merged": res.keys_merged,
                    }
                )
            )
        elif args.cmd == "metrics":
            from cassandra_data_migrator_ray.pipelines.tail import lag_report, run_throughput

            rep = lag_report(args.lake, scan=args.scan)
            tp = run_throughput(args.lake)
            print(
                json.dumps(
                    {
                        "partitions": rep.to_dict(orient="records"),
                        "runs": tp.to_dict(orient="records"),
                    }
                )
            )
        elif args.cmd == "lookup":
            from cassandra_data_migrator_ray.sources.lake import lookup

            # components stay strings; lookup() casts them to the lake's
            # declared key types (a digit-like string key column must NOT be
            # coerced to int)
            keys = [
                tuple(k.split(",")) if "," in k else k for k in args.keys
            ]
            df = lookup(args.lake, keys, columns=args.columns)
            if args.out:
                df.to_parquet(args.out)
                print(json.dumps({"rows": int(len(df)), "out": args.out}))
            else:
                print(df.to_json(orient="records", date_format="iso"))
        elif args.cmd == "changes":
            from cassandra_data_migrator_ray.sources.lake import read_changes_pandas

            df = read_changes_pandas(
                args.lake, run_id=args.run_id, version=args.version
            )
            if args.out:
                df.to_parquet(args.out)
                print(json.dumps({"rows": int(len(df)), "out": args.out}))
            else:
                counts = (
                    df["_change_type"].value_counts().to_dict() if len(df) else {}
                )
                print(json.dumps({"rows": int(len(df)), "by_type": counts}))
        elif args.cmd == "vacuum":
            from cassandra_data_migrator_ray.state.manifest import Manifest

            man = Manifest.load(args.lake)
            if man is None:
                raise FileNotFoundError(f"no manifest at {args.lake}")
            pruned = man.vacuum(keep_last=args.keep_last)
            print(
                json.dumps(
                    {"pruned_versions": pruned, "kept": man.list_snapshots()}
                )
            )
        elif args.cmd == "snapshots":
            from cassandra_data_migrator_ray.state.manifest import Manifest

            man = Manifest.load(args.lake)
            if man is None:
                raise FileNotFoundError(f"no manifest at {args.lake}")
            print(
                json.dumps(
                    {"versions": man.list_snapshots(), "current": man.version}
                )
            )
        elif args.cmd == "lineage":
            from cassandra_data_migrator_ray.pipelines.tail import lineage_report

            print(
                lineage_report(args.lake).to_json(orient="records")
            )
        elif args.cmd == "guardrail":
            import ray.data as rd

            from cassandra_data_migrator_ray.pipelines.guardrail import guardrail_scan

            res = guardrail_scan(rd.read_parquet(args.input), args.max_kb, args.columns)
            print(json.dumps({"counters": res.counters}))
            return 0 if res.counters["LARGE"] == 0 else 1
        elif args.cmd == "dedup":
            import time as _time

            import ray.data as rd

            from cassandra_data_migrator_ray.pipelines.dataops import dedup_near

            t0 = _time.perf_counter()
            # a prior or crashed run's files would interleave with this
            # run's uuid-named output and silently inflate the kept corpus
            # (same stale-file hazard export_sorted guards against)
            if os.path.isdir(args.output) and os.listdir(args.output):
                print(
                    f"error: output dir {args.output} is not empty — "
                    "remove it or point at a fresh directory",
                    file=sys.stderr,
                )
                return 2
            ds = rd.read_parquet(args.input)
            n_in = ds.count()
            kwargs: dict = {}
            if args.method == "minhash":
                kwargs["threshold"] = args.threshold
            elif args.method == "embedding":
                kwargs["threshold"] = args.threshold
                kwargs["vec_col"] = args.vec_col
            elif args.method == "simhash":
                kwargs["max_hamming"] = args.max_hamming
            if args.distributed and args.method in (
                "minhash", "embedding", "simhash"
            ):
                kwargs["collect"] = "distributed"
            # default: the library's size-gated auto routing (driver kernels
            # below the thresholds, no-pairs-on-driver above); --distributed
            # forces the scale path end to end
            kept = dedup_near(
                ds,
                method=args.method,
                text_col=args.text_col,
                id_col=args.id_col,
                cluster_mode="distributed" if args.distributed else "auto",
                **kwargs,
            )
            kept.write_parquet(args.output)
            n_out = rd.read_parquet(args.output).count()
            print(
                json.dumps(
                    {
                        "docs_in": int(n_in),
                        "docs_kept": int(n_out),
                        "docs_dropped": int(n_in - n_out),
                        "seconds": round(_time.perf_counter() - t0, 3),
                    }
                )
            )
        elif args.cmd == "ann":
            import numpy as np

            import ray.data as rd

            from cassandra_data_migrator_ray.pipelines.dataops import (
                ann_topk_ivfpq,
                build_ivfpq_index,
                encode_ivfpq,
            )

            if args.ann_cmd == "index":
                ds = rd.read_parquet(args.input, columns=[args.id_col, args.vec_col])
                cents, books = build_ivfpq_index(
                    ds,
                    args.index,
                    vec_col=args.vec_col,
                    id_col=args.id_col,
                    n_centroids=args.n_centroids,
                    m=args.m,
                    ksub=args.ksub,
                    train_sample=args.train_sample,
                    normalize=args.metric == "cosine",
                )
                encode_ivfpq(
                    ds, args.index, vec_col=args.vec_col, id_col=args.id_col,
                    out_dir=args.codes,
                )
                print(
                    json.dumps(
                        {
                            "index": args.index,
                            "codes": args.codes,
                            "n_centroids": int(cents.shape[0]),
                            "bytes_per_vector": int(books.shape[0]),
                        }
                    )
                )
            else:  # search
                qdf = rd.read_parquet(
                    args.queries, columns=[args.id_col, args.vec_col]
                ).to_pandas()
                qmat = np.vstack(qdf[args.vec_col].to_numpy()).astype(np.float64)
                rerank_ds = (
                    rd.read_parquet(
                        args.rerank, columns=[args.id_col, args.vec_col]
                    )
                    if args.rerank
                    else None
                )
                res = ann_topk_ivfpq(
                    args.codes,
                    qmat,
                    args.index,
                    k=args.k,
                    id_col=args.id_col,
                    query_ids=qdf[args.id_col].to_numpy().astype(np.int64),
                    nprobe=args.nprobe,
                    rerank=rerank_ds,
                    shortlist=args.shortlist,
                    vec_col=args.vec_col,
                )
                print(res.to_json(orient="records"))
        elif args.cmd == "config-build":
            from cassandra_data_migrator_ray.config_builder import build_properties

            cql = (
                sys.stdin.read()
                if args.origin_cql == "-"
                else open(args.origin_cql).read()
            )
            target = open(args.target_cql).read() if args.target_cql else None
            text = build_properties(
                cql,
                target,
                row_count=args.rows,
                table_size_gb=args.size_gb,
                data_types=tuple(
                    t.strip() for t in args.data_types.split(",") if t.strip()
                ),
                autocorrect_missing=args.autocorrect_missing,
                autocorrect_mismatch=args.autocorrect_mismatch,
            )
            if args.output:
                with open(args.output, "w") as f:
                    f.write(text)
            else:
                print(text, end="")
        elif args.cmd == "config-validate":
            from cassandra_data_migrator_ray.config_builder import lint_properties

            rep = lint_properties(
                args.properties, row_count=args.rows, table_size_gb=args.size_gb
            )
            print(
                json.dumps(
                    {
                        "ok": rep.ok,
                        "transforms": rep.transforms,
                        "replay_kwargs": {
                            k: str(v) for k, v in rep.replay_kwargs.items()
                        },
                        "unknown_keys": rep.unknown,
                        "transport_keys": sorted(rep.transport),
                        "warnings": rep.warnings,
                        "notes": rep.notes,
                    },
                    indent=2,
                )
            )
            return 0 if rep.ok else 1
        return 0
    finally:
        if ray is not None:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
