"""Driver-contract query implementations over the shared testdata tables.

Each function takes ``sf_dir`` (e.g. /root/testdata/sf0.01) and returns a
Dataset / DataFrame / Arrow table whose columns match the paired oracle SQL in
``__ray_entry__.oracle_sql`` exactly (names AND types) — the driver compares
row-count + schema + order-insensitive value hash.

Operator coverage tags reference SURVEY.md §2 (which cites the reference
implementation file:line for each).
"""

from __future__ import annotations

import os
import tempfile
from functools import partial

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from cassandra_data_migrator_ray.functions.lww import (
    fold_events,
    merge_state_frames,
)
from cassandra_data_migrator_ray.functions.transforms import (
    CastColumns,
    Constant,
    ExtractJson,
    FillNulls,
    Rename,
    ValueSkipFilter,
    WritetimeMax,
    WritetimeWindow,
)
from cassandra_data_migrator_ray.schema import DELETED, ROW_WT
from cassandra_data_migrator_ray.state.partitioning import assign_partition

NUM_PARTS = 32


def _pairs_or_empty(pairs: "pd.DataFrame", score_col: str) -> "pd.DataFrame":
    """Empty pair results lose their schema through to_pandas — restore it."""
    if "id_a" not in pairs.columns:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                score_col: pd.Series([], dtype="float64"),
            }
        )
    return pairs.sort_values(["id_a", "id_b"], ignore_index=True)


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _scaled_nparts(ds: ray.data.Dataset, rows_per_part: int = 65536) -> int:
    """Join/group parallelism scaled to data size (never a fixed cap): one
    group per ~64k input rows, floor 16 so small inputs still spread over the
    worker pool, ceiling 1024 to bound tiny-task overhead."""
    try:
        est = ds.count()
    except Exception:
        est = 0
    return max(16, min(1024, est // rows_per_part))


def _mod_part(keys: np.ndarray, nparts: int) -> np.ndarray:
    """Partition id for integer keys: uint64 view modulo nparts (negative
    keys wrap deterministically), int32 for a compact shuffle column."""
    return (np.asarray(keys).astype(np.uint64) % np.uint64(nparts)).astype(np.int32)


def _typed_empty(out: pd.DataFrame, dtypes: dict[str, str]) -> pd.DataFrame:
    """map_groups over a fully-filtered dataset loses its schema, so
    to_pandas() yields a column-less frame; rebuild the typed empty frame so
    downstream sorts/selects behave like the oracle's empty result set."""
    if len(out) == 0 and not set(dtypes) <= set(out.columns):
        return pd.DataFrame({c: pd.Series([], dtype=d) for c, d in dtypes.items()})
    return out


# ---------------------------------------------------------------------------
# generic distributed LWW fold (reused by the flagship query)
# ---------------------------------------------------------------------------


def lww_fold_dataset(
    ds: ray.data.Dataset,
    key_cols: list[str],
    payload_cols: list[str],
    num_parts: int = NUM_PARTS,
) -> ray.data.Dataset:
    """events → one state row per key: per-batch pre-fold (combiner) →
    hash-partition shuffle → per-partition multi-way merge (A3 semantics)."""

    def prefold(batch: pd.DataFrame) -> pd.DataFrame:
        st = fold_events(batch, key_cols, payload_cols)
        h = assign_partition(st[key_cols[0]], 0, num_parts, salt=1)
        st["__part"] = h
        return st

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=["__part"])
        return merge_state_frames(g, key_cols, payload_cols)

    return (
        ds.map_batches(prefold, batch_format="pandas")
        .groupby("__part")
        .map_groups(final, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# A. CDC core — flagship LWW fold over the shared `events` table (A3/M6/F4)
# ---------------------------------------------------------------------------


def lww_latest_state(sf_dir: str) -> pd.DataFrame:
    """Full LWW replay semantics on the `events` table, keyed by user_id.

    Derivation (identical in the oracle SQL): event_type 'error' ⇒ row DELETE;
    'click' carries no value (unset-null); 'view' carries no props; writetime =
    epoch_us(ts); event_seq = event_id.  Output = live final state per user
    with the winning row writetime (SURVEY §2.6 A3, §2.10)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value", "props", "ts", "event_id"])

    def derive(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        op = pc.if_else(pc.equal(et, "error"), pa.scalar("DELETE"), pa.scalar("UPSERT"))
        value_n = pc.if_else(pc.equal(et, "click"), pa.scalar(None, pa.float64()), t["value"])
        props_n = pc.if_else(pc.equal(et, "view"), pa.scalar(None, pa.string()), t["props"])
        wt = pc.cast(t["ts"], pa.int64())
        return pa.table(
            {
                "user_id": t["user_id"],
                "op": op,
                "value": value_n,
                "props": props_n,
                "writetime": wt,
                "event_seq": t["event_id"],
            }
        )

    state = lww_fold_dataset(ds.map_batches(derive, batch_format="pyarrow"), ["user_id"], ["value", "props"])
    out = state.to_pandas()
    out = out[~out[DELETED].to_numpy(dtype=bool)]
    out = out.rename(columns={ROW_WT: "writetime"})
    return (
        out[["user_id", "value", "props", "writetime"]]
        .sort_values("user_id", ignore_index=True)
    )


# ---------------------------------------------------------------------------
# B. transforms / filters over events (M1-M7, F2-F5, A2, S5/J2)
# ---------------------------------------------------------------------------

_DAY5_US = 1_704_067_200_000_000 + 4 * 86_400_000_000  # 2024-01-05 UTC in µs
_DAY10_US = 1_704_067_200_000_000 + 9 * 86_400_000_000


def writetime_window(sf_dir: str) -> ray.data.Dataset:
    """F4: incremental-window filter on the event timestamp."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value", "ts"])

    def f(t: pa.Table) -> pa.Table:
        t = t.append_column("writetime", pc.cast(t["ts"], pa.int64()))
        t = WritetimeWindow(_DAY5_US, _DAY10_US - 1)(t)
        return t.select(["event_id", "user_id", "event_type", "value"])

    return ds.map_batches(f, batch_format="pyarrow")


def value_skip_filter(sf_dir: str) -> pd.DataFrame:
    """F5 + A1: drop rows where trim(lower(event_type)) == 'error', then count
    per type via per-batch partial aggregation + a tiny groupby (combiner)."""
    ds = _read(sf_dir, "events", ["event_type"])

    def partial_counts(t: pa.Table) -> pd.DataFrame:
        t = ValueSkipFilter("event_type", "error")(t)
        df = t.to_pandas()
        g = df.groupby("event_type", sort=False).size().reset_index(name="n")
        return g

    parts = ds.map_batches(partial_counts, batch_format="pyarrow")
    out = (
        parts.groupby("event_type")
        .map_groups(
            lambda g: pd.DataFrame(
                {"event_type": [g["event_type"].iloc[0]], "n": [np.int64(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    return out.sort_values("event_type", ignore_index=True)


def rename_cast_constant(sf_dir: str) -> ray.data.Dataset:
    """M1+M2+M3: rename, codec casts (bigint→string, timestamp→millis-string),
    constant column."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    chain = [
        Rename({"event_id": "id"}),
        CastColumns({"user_id": "string", "ts": "timestamp_string_millis"}),
        Rename({"user_id": "user_str", "ts": "ts_millis"}),
        Constant({"env": "prod"}, {"env": "string"}),
    ]

    def f(t: pa.Table) -> pa.Table:
        for tr in chain:
            t = tr(t)
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def extract_json_props(sf_dir: str) -> ray.data.Dataset:
    """M5: JSON field extraction from the props column."""
    ds = _read(sf_dir, "events", ["event_id", "props"])
    ex = ExtractJson("props", "k", "k")

    def f(t: pa.Table) -> pa.Table:
        return ex(t).select(["event_id", "k"])

    return ds.map_batches(f, batch_format="pyarrow")


def null_default(sf_dir: str) -> ray.data.Dataset:
    """M7: null defaulting (nulls derived deterministically, then filled)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "props"])

    def f(t: pa.Table) -> pa.Table:
        props_n = pc.if_else(
            pc.equal(t["event_type"], "view"), pa.scalar(None, pa.string()), t["props"]
        )
        t2 = pa.table({"event_id": t["event_id"], "props_f": props_n})
        return FillNulls({"props_f": "{}"})(t2)

    return ds.map_batches(f, batch_format="pyarrow")


def max_element_wise(sf_dir: str) -> ray.data.Dataset:
    """A2/M6: per-row max across columns (the writetime-max kernel)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        t = t.append_column("text_len", pc.cast(pc.utf8_length(t["text"]), pa.int64()))
        t = WritetimeMax(["n_chars", "text_len"], "max_sz")(t)
        return t.select(["doc_id", "max_sz"])

    return ds.map_batches(f, batch_format="pyarrow")


def coverage_sample(sf_dir: str) -> ray.data.Dataset:
    """F2: deterministic coverage sampling — first 10% of the event_id range."""
    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    n = ds.count()
    threshold = int(np.ceil(n * 0.10))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["event_id"], threshold))

    return ds.map_batches(f, batch_format="pyarrow")


def counter_rollup(sf_dir: str) -> pd.DataFrame:
    """S5/J2/A1: additive counter semantics — per-key grouped sum of deltas
    with per-batch partial pre-aggregation before the shuffle.

    Sums are computed in integer cents so the result is bit-exact regardless
    of reduction order (float sums are order-dependent)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial_sum(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        df = t.to_pandas()
        df["cents"] = np.round(df["value"].to_numpy() * 100).astype(np.int64)
        g = df.groupby("user_id", sort=False)["cents"].agg(["sum", "size"]).reset_index()
        return g.rename(columns={"sum": "total_cents", "size": "n"})

    nparts = _scaled_nparts(ds)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of users — C-level groupby, no per-user Python
        out = g.groupby("user_id", sort=False, as_index=False)[
            ["total_cents", "n"]
        ].sum()
        out["total_cents"] = out["total_cents"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    out = (
        ds.map_batches(partial_sum, batch_format="pyarrow")
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("user_id", ignore_index=True)


def diff_missing_customers(sf_dir: str) -> pd.DataFrame:
    """J1: the validation anti-join at scale — customers with no orders.

    Both sides are co-partitioned on the customer key in ONE shuffle and
    each partition anti-joins locally (``np.isin`` over int64 arrays).  The
    big side's keys are pre-deduped per batch before the exchange, so the
    shuffle carries at most one (key, part) row per distinct key per batch —
    no driver-side key-set materialization, no row-multiplicity
    amplification.  (Replaces the round-2 variant that looped
    ``to_pylist()`` over the whole orders table on the driver.)"""
    n_parts = 32

    def tag(col: str, side: int):
        def f(t: pa.Table) -> pa.Table:
            k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            if side == 1:
                k = np.unique(k)  # combiner: orders repeat custkeys heavily
            part = (
                (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                >> np.uint64(40)
            ) % np.uint64(n_parts)
            return pa.table(
                {
                    "key": pa.array(k),
                    "side": pa.array(np.full(len(k), side, dtype=np.int8)),
                    "__part": pa.array(part.astype(np.int32)),
                }
            )

        return f

    cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
        tag("c_custkey", 0), batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        tag("o_custkey", 1), batch_format="pyarrow"
    )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        k = g["key"].to_numpy()
        s = g["side"].to_numpy()
        missing = np.setdiff1d(k[s == 0], k[s == 1])
        return pd.DataFrame({"c_custkey": missing.astype(np.int64)})

    out = (
        cust.union(orders)
        .groupby("__part")
        .map_groups(anti, batch_format="pandas")
        .to_pandas()
    )
    if "c_custkey" not in out.columns:  # empty result drops schema via to_pandas
        out = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64")})
    return out.sort_values("c_custkey", ignore_index=True)


def guardrail_large(sf_dir: str) -> ray.data.Dataset:
    """Guardrail: rows whose text exceeds the size threshold (bytes)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from cassandra_data_migrator_ray.functions.transforms import ByteSizeGuard

    guard = ByteSizeGuard(max_kb=0.25, cols=["text"])  # 256 bytes

    def f(t: pa.Table) -> pa.Table:
        t = guard(t)
        t = t.filter(t["oversize"])
        t = t.append_column("text_bytes", t["max_col_bytes"])
        return t.select(["doc_id", "text_bytes"])

    return ds.map_batches(f, batch_format="pyarrow")


def explode_words(sf_dir: str) -> ray.data.Dataset:
    """M4 (flat_map shape): one row per word of each document."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        words = batch["text"].fillna("").str.split(" ", regex=False)
        counts = words.map(len).to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.repeat(batch["doc_id"].to_numpy(), counts),
                "word": np.concatenate(words.to_numpy()),
            }
        )

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# C. training-data ops (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------


def dedup_exact_docs(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.pipelines.dataops import dedup_exact

    out = dedup_exact(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    out["n_dups"] = out["n_dups"].astype(np.int64)
    return out[["doc_id", "text", "n_dups"]].sort_values("doc_id", ignore_index=True)


def neardup_cluster_docs(sf_dir: str) -> pd.DataFrame:
    """Connected-components clustering of duplicate pairs, DISTRIBUTED
    label-propagation path (driver kernel is equality-tested in pytest).
    Pairs are exact-dup CHAINS — (a1,a2),(a2,a3) per identical-text group —
    so multi-hop transitivity is what's being graded; cluster_id == the
    group's min doc_id, which SQL can state directly."""
    from cassandra_data_migrator_ray.pipelines.dataops import (
        cluster_pairs,
        exact_dup_pairs,
    )

    pairs = exact_dup_pairs(_read(sf_dir, "documents", ["doc_id", "text"]))
    out = cluster_pairs(pairs, mode="distributed").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "cluster_id": pd.Series([], dtype=np.int64),
            }
        )
    out = out.rename(columns={"node_id": "doc_id"})
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["cluster_id"] = out["cluster_id"].astype(np.int64)
    return out.sort_values("doc_id", ignore_index=True)


def dedup_apply_docs(sf_dir: str) -> pd.DataFrame:
    """The deduplicated corpus: cluster exact-dup chain pairs, keep the
    min-id doc per cluster plus every unpaired doc, drop the rest.  Runs
    END-TO-END distributed: label-propagation clustering AND the anti-join
    apply (corpus co-partitioned on doc_id, drop ids stay a Dataset, the
    driver never holds a member/drop array — the round-4 `weak` finding).
    The driver union-find + broadcast-filter kernel is equality-tested
    against this path in pytest."""
    from cassandra_data_migrator_ray.pipelines.dataops import (
        dedup_apply,
        exact_dup_pairs,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    kept = dedup_apply(ds, exact_dup_pairs(ds), mode="distributed").to_pandas()
    kept["doc_id"] = kept["doc_id"].astype(np.int64)
    return kept[["doc_id", "text"]].sort_values("doc_id", ignore_index=True)


def corpus_prep_docs(sf_dir: str) -> pd.DataFrame:
    """Composed training-data prep gate: language-ID → quality gate → exact
    dedup → token counts in one streaming pipeline (pipelines.dataops.
    prep_corpus); every stage's kernel is individually oracle-gated and the
    composition is checked here against one composed DuckDB query."""
    from cassandra_data_migrator_ray.pipelines.dataops import prep_corpus

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = prep_corpus(ds, langs=("en",), min_quality=0.6, token_sep=" ").to_pandas()
    out["doc_id"] = out["doc_id"].astype(np.int64)
    cols = ["doc_id", "pred_lang", "quality_score", "n_ws_tokens", "n_chars", "n_dups"]
    for c in ("n_ws_tokens", "n_chars", "n_dups"):
        out[c] = out[c].astype(np.int64)
    return out[cols].sort_values("doc_id", ignore_index=True)


def token_count_docs(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.functions.text import TokenCount

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    tc = TokenCount(sep=" ")  # single-space tokens, matching the SQL oracle

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        batch = tc(batch)
        batch["n_chars"] = batch["text"].str.len().astype(np.int64)
        return batch[["doc_id", "n_ws_tokens", "n_chars"]]

    return ds.map_batches(f, batch_format="pandas").to_pandas().sort_values(
        "doc_id", ignore_index=True
    )


def pii_scrub_docs(sf_dir: str) -> pd.DataFrame:
    """PII redaction over documents: plant a deterministic email+phone per
    doc (so the gate exercises real redaction on synthetic text), then scrub
    with vectorized RE2 kernels.  The oracle plants the identical suffix in
    SQL and scrubs with regexp_replace — same RE2 engine both sides."""
    from cassandra_data_migrator_ray.functions.text import pii_scrub

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        did = pc.cast(t["doc_id"], pa.string())
        planted = pc.binary_join_element_wise(
            t["text"],
            " contact: doc", did, "@example.com or +1-555-",
            pc.utf8_lpad(
                pa.array(
                    (t["doc_id"].to_numpy(zero_copy_only=False) % 10_000),
                    pa.int64(),
                ).cast(pa.string()),
                4,
                "0",
            ),
            "",
        )
        scrubbed, n_emails, n_phones = pii_scrub(planted)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "scrubbed": scrubbed,
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
            }
        )

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def text_normalize_docs(sf_dir: str) -> pd.DataFrame:
    """Canonical text form (lowercase, digit runs → <num>, whitespace
    collapsed, trimmed) — the cleanup stage every training-data pipeline
    runs before dedup/tokenization.  One RE2 pass per rule, zero Python
    rows; oracle = the same rules in DuckDB regexp_replace."""
    from cassandra_data_migrator_ray.functions.text import normalize_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        norm = normalize_text(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": norm,
                "n_chars": pc.cast(pc.utf8_length(norm), pa.int64()),
            }
        )

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def decontaminate_docs(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination gate: treat every 100th document's text as a
    held-out evaluation set and flag each corpus document sharing any
    13-token gram with it (the pre-release contamination scrub; exact, not
    probabilistic — hash prefilter + gram-string verify).  The oracle
    enumerates token windows in SQL and joins on the gram string, so counts
    match bit-for-bit."""
    import pyarrow.parquet as pq

    from cassandra_data_migrator_ray.pipelines.dataops import decontaminate

    bench = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = bench["doc_id"].to_numpy(zero_copy_only=False)
    bench_texts = bench.filter(pa.array(ids % 100 == 0))["text"].to_pylist()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return (
        decontaminate(ds, bench_texts, n=13)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )


def stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic training-mix sampling gate: keep 50% of en, 25% of fr,
    100% of zh, 0% of everything else — the mixture-weights step of corpus
    construction.  The keep rule is a pure integer function of doc_id
    (multiplicative Weyl map), so the SQL oracle selects the byte-identical
    row set with HUGEINT arithmetic."""
    from cassandra_data_migrator_ray.pipelines.dataops import sample_stratified

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = sample_stratified(
        ds, {"en": 0.5, "fr": 0.25, "zh": 1.0}, by="lang", id_col="doc_id"
    )
    return out.to_pandas().sort_values("doc_id", ignore_index=True)


def ann_topk_embeddings(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 for query vec_id=0 (ranks only — float scores
    are excluded from the comparison surface)."""
    from cassandra_data_migrator_ray.pipelines.dataops import ann_topk

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = None
    for b in emb.iter_batches(batch_size=4096, batch_format="pandas"):
        hit = b[b["vec_id"] == 0]
        if len(hit):
            q = np.asarray(hit["embedding"].iloc[0], dtype=np.float64)
            break
    out = ann_topk(emb, q, k=10)
    out["query_id"] = np.int64(0)
    return out[["query_id", "rank", "vec_id"]]


def ann_topk_ivf_embeddings(sf_dir: str) -> pd.DataFrame:
    """IVF cosine top-10 over a deterministically CLUSTERED input: the
    embeddings table plus 9 exact copies of query vec 0 (ids 2_000_000+i) —
    the structure IVF exists for.  At nprobe=4 of 16 centroids (25% scan,
    genuinely bucketed) recall@10 must be 1.0 because identical vectors share
    the query's own best centroid; the DuckDB oracle reproduces the planted
    construction and brute-force truth.  The result is the top-10 id SET
    (sorted) — robust to ε-level float tie ordering among the exact copies.
    Also exercises the distributed Lloyd refinement pass (refine_iters=1)."""
    from cassandra_data_migrator_ray.pipelines.dataops import ann_topk_ivf

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = None
    for b in emb.iter_batches(batch_size=4096, batch_format="pandas"):
        hit = b[b["vec_id"] == 0]
        if len(hit):
            q = np.asarray(hit["embedding"].iloc[0], dtype=np.float64)
            break

    def plant(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.equal(t["vec_id"], 0))
        if len(hit) == 0:
            return t
        copies = pa.concat_tables([hit] * 9)
        copies = copies.set_column(
            copies.column_names.index("vec_id"),
            "vec_id",
            pa.array(2_000_000 + np.arange(9, dtype=np.int64)),
        )
        return pa.concat_tables([t, copies])

    planted = emb.map_batches(plant, batch_format="pyarrow")
    out = ann_topk_ivf(
        planted, q, k=10, n_centroids=16, nprobe=4, refine_iters=1
    )
    return pd.DataFrame(
        {"vec_id": np.sort(out["vec_id"].to_numpy()).astype(np.int64)}
    )


def langid_docs(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.functions.text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(LangId(), batch_format="pandas", concurrency=2).to_pandas()
    return out[["doc_id", "pred_lang"]].sort_values("doc_id", ignore_index=True)


def fingerprint_docs(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.functions.text import Fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(Fingerprint(), batch_format="pandas", concurrency=2).to_pandas()
    return out[["doc_id", "text_hash", "min_shingle_hash"]].sort_values(
        "doc_id", ignore_index=True
    )


def simhash_docs(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.pipelines.dataops import simhash_fingerprints

    out = simhash_fingerprints(_read(sf_dir, "documents", ["doc_id", "text"])).to_pandas()
    return out.sort_values("doc_id", ignore_index=True)


def minhash_neardup_docs(sf_dir: str) -> pd.DataFrame:
    """collect='auto' is the production route: driver-collect below the
    corpus-size threshold (at gate sf the distributed route's extra
    exchanges are pure fixed overhead — 3× the wall time for the same 256
    pairs), escalating to the full no-pairs-on-driver pipeline (pair-dedup
    groupby + Bloom-broadcast verify) above it.  The distributed twin is
    equality-tested in pytest (test_minhash_distributed_collect_matches_
    driver) and in the auto-escalation test."""
    from cassandra_data_migrator_ray.pipelines.dataops import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=0.5,
        collect="auto",
    ).to_pandas()
    return _pairs_or_empty(pairs, "jaccard")


def embedding_neardup_q(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.pipelines.dataops import embedding_neardup

    pairs = embedding_neardup(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.95
    ).to_pandas()
    return _pairs_or_empty(pairs, "cosine")



def _plant_copies(
    ds: "ray.data.Dataset", id_col: str, every: int, offset: int
) -> "ray.data.Dataset":
    """Deterministically append exact copies of every ``every``-th row with
    ``id + offset`` — the shared planted-duplicates construction the
    near-dup/recall gates and their DuckDB oracles both reproduce."""

    def plant(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        dup = t.filter(pa.array(ids % every == 0))
        if len(dup) == 0:
            return t
        dup = dup.set_column(
            dup.column_names.index(id_col), id_col, pc.add(dup[id_col], offset)
        )
        return pa.concat_tables([t, dup])

    return ds.map_batches(plant, batch_format="pyarrow")


def embedding_neardup_planted(sf_dir: str) -> pd.DataFrame:
    """Exercised embedding near-dup gate: the input is the embeddings table
    UNION exact copies of every 50th vector (vec_id + 1_000_000) — a
    deterministic construction the DuckDB oracle reproduces, so the LSH
    pipeline's found pair set is checked against brute-force ground truth
    (testdata's random gaussians have no natural pairs at cosine 0.95)."""
    from cassandra_data_migrator_ray.pipelines.dataops import embedding_neardup

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    planted = _plant_copies(emb, "vec_id", every=50, offset=1_000_000)
    pairs = embedding_neardup(planted, threshold=0.95).to_pandas()
    out = _pairs_or_empty(pairs, "cosine")
    return out[["id_a", "id_b"]]


def quality_docs(sf_dir: str) -> pd.DataFrame:
    from cassandra_data_migrator_ray.functions.text import QualityScore

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(QualityScore(), batch_format="pandas", concurrency=2).to_pandas()
    return out[["doc_id", "quality_score", "n_chars", "n_words"]].sort_values(
        "doc_id", ignore_index=True
    )


def simhash_planted_twins(sf_dir: str) -> pd.DataFrame:
    """SimHash recall gate with a SQL oracle: exact copies of every 25th doc
    (doc_id + 1_000_000) MUST pair with their original at Hamming distance 0
    (identical text → identical simhash → same bands).  The output keeps only
    the planted twin relation (id_b == id_a + 1e6), which the oracle
    reproduces arithmetically — banding/bucketing recall is checked, not
    self-attested."""
    from cassandra_data_migrator_ray.pipelines.dataops import dedup_simhash

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup_simhash(
        _plant_copies(docs, "doc_id", every=25, offset=1_000_000), max_hamming=0
    ).to_pandas()
    twins = pairs[pairs["id_b"] - pairs["id_a"] == 1_000_000]
    return (
        twins[["id_a", "id_b"]]
        .astype(np.int64)
        .sort_values("id_a", ignore_index=True)
    )


def fingerprint_dup_join(sf_dir: str) -> pd.DataFrame:
    """Fingerprints as exact-duplicate join keys, with a SQL oracle: over the
    documents table plus exact copies of every 25th doc (doc_id + 1_000_000),
    a self-join on (text_hash, min_shingle_hash) must yield exactly the pairs
    whose texts are equal (64+64-bit collision odds ~1e-15 at this scale).
    This oracle-checks the fingerprint kernel's determinism AND that equal
    texts fingerprint equally."""
    from cassandra_data_migrator_ray.functions.text import Fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    planted = _plant_copies(ds, "doc_id", every=25, offset=1_000_000)
    fp_ds = planted.map_batches(
        Fingerprint(), batch_format="pandas", concurrency=2
    ).select_columns(["doc_id", "text_hash", "min_shingle_hash"])

    # pair emission rides the vectorized bucket stage (dataops._bucket_pairs
    # _stage: one bounded 128-way exchange keyed by fingerprint hash, all of
    # a partition's fingerprint groups expanded in numpy — no interpreter
    # call per fingerprint).  Only (doc_id, 128-bit key) rows cross the
    # shuffle and the driver sees only the pair list — never the corpus.
    from cassandra_data_migrator_ray.pipelines.dataops import _bucket_pairs_stage

    def as_bucket_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "band": pc.cast(t["text_hash"], pa.int64()),
                "band_hash": pc.cast(t["min_shingle_hash"], pa.int64()),
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
            }
        )

    out = _bucket_pairs_stage(
        fp_ds.map_batches(as_bucket_rows, batch_format="pyarrow"),
        "doc_id",
        max_bucket=1 << 30,  # exact join: never chunk a fingerprint group
    ).to_pandas()
    if "id_a" not in out.columns:
        out = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype=np.int64),
                "id_b": pd.Series([], dtype=np.int64),
            }
        )
    return out[["id_a", "id_b"]].sort_values(["id_a", "id_b"], ignore_index=True)


def dedup_exact_hash_only(sf_dir: str) -> pd.DataFrame:
    """The 100-TB exact-dedup shape (128-bit hash through the exchange, text
    never shuffles) against the same GROUP BY text oracle truth."""
    from cassandra_data_migrator_ray.pipelines.dataops import dedup_exact

    out = dedup_exact(
        _read(sf_dir, "documents", ["doc_id", "text"]), carry_text=False
    ).to_pandas()
    return out[["doc_id", "n_dups"]].sort_values("doc_id", ignore_index=True)


def multimodal_bmp_features(sf_dir: str) -> pd.DataFrame:
    """Real image-decode gate: deterministic solid-color 24-bit BMPs are
    ENCODED from doc_id (r=id%256, g=id*7%256, b=id*13%256), shipped as a
    binary payload column, DECODED by the real numpy BMP codec inside the
    actor-pool stage, and reduced to mean-RGB features.  The DuckDB oracle
    reproduces the expected means arithmetically — decode correctness is
    oracle-checked, not self-attested."""
    from cassandra_data_migrator_ray.functions.multimodal import (
        DecodeImage,
        ImageFeatures,
        encode_bmp,
    )

    ds = _read(sf_dir, "documents", ["doc_id"])

    def make_payload(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        batch["payload"] = [
            encode_bmp(
                np.full(
                    (8, 8, 3),
                    (int(i) % 256, (int(i) * 7) % 256, (int(i) * 13) % 256),
                    dtype=np.uint8,
                )
            )
            for i in ids
        ]
        return batch

    out = (
        ds.map_batches(make_payload, batch_format="pandas")
        .map_batches(
            DecodeImage(decoder="auto", target_hw=(8, 8)),
            batch_format="pandas",
            batch_size=256,
            concurrency=2,
        )
        .map_batches(ImageFeatures, batch_format="pandas", batch_size=256, concurrency=2)
        .to_pandas()
    )
    feats = np.vstack(out["features"].to_numpy()).astype(np.float64)
    res = pd.DataFrame(
        {
            "doc_id": out["doc_id"].astype(np.int64),
            "mean_r": feats[:, 0],
            "mean_g": feats[:, 1],
            "mean_b": feats[:, 2],
        }
    )
    return res.sort_values("doc_id", ignore_index=True)


def video_frame_luma(sf_dir: str) -> pd.DataFrame:
    """Real video-container gate: deterministic grayscale YUV4MPEG2 clips are
    ENCODED from doc_id (6 frames of 8x8, luma[y, x] = base + x with
    base = (doc_id*31 + frame*17) % 200 — gradient mean is exactly
    base + 3.5, never wrapping), shipped as a binary payload column, DECODED
    by the real y4m parser inside an actor-pool stage, and frame-sampled at
    stride 2.  The DuckDB oracle reproduces the expected per-frame mean
    arithmetically, so frame-boundary parsing and plane layout are
    oracle-checked, not self-attested.  Reference analogue: the explode /
    flat_map transform family over an opaque media column
    (`CqlConversion.java` transform chain shape)."""
    from cassandra_data_migrator_ray.functions.multimodal import (
        VideoFrameSample,
        encode_y4m,
    )

    ds = _read(sf_dir, "documents", ["doc_id"])
    n_frames, h, w = 6, 8, 8
    grad = np.arange(w, dtype=np.int64)[None, None, :]

    def make_clip(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        payloads = []
        for i in ids:
            base = (int(i) * 31 + np.arange(n_frames, dtype=np.int64) * 17) % 200
            frames = (base[:, None, None] + np.zeros((1, h, 1), np.int64) + grad).astype(
                np.uint8
            )
            payloads.append(encode_y4m(frames))
        return pd.DataFrame({"media_id": ids.astype(np.int64), "payload": payloads})

    out = (
        ds.map_batches(make_clip, batch_format="pandas")
        .map_batches(
            VideoFrameSample(stride=2),
            batch_format="pandas",
            batch_size=256,
            concurrency=2,
        )
        .to_pandas()
    )
    res = pd.DataFrame(
        {
            "doc_id": out["media_id"].astype(np.int64),
            "frame_idx": out["frame_idx"].astype(np.int32),
            "mean_luma": out["mean_luma"].astype(np.float64),
        }
    )
    return res.sort_values(["doc_id", "frame_idx"], ignore_index=True)


def ann_topk_ivfpq_planted(sf_dir: str) -> pd.DataFrame:
    """IVF-PQ (product-quantization) gate with an exact-integer oracle.

    Corpus vectors are planted as exact PQ codebook points with integer
    coordinates — subspace j's code is t_j = (vec_id * P_j) % M_j with
    pairwise-coprime moduli M = (13, 16, 9, 11), codebook point
    (t * B_j, t^2 % M_j) with B = (1, 100, 10^4, 10^6) — so PQ encoding is
    lossless and, against query (1,0,1,0,1,0,1,0), the inner-product score is
    t_0 + 100·t_1 + 10^4·t_2 + 10^6·t_3: an integer, CRT-unique per vec_id
    below lcm(M) = 20592 (no ties anywhere).  The distributed
    encode→ADC-table-lookup→merge path must reproduce DuckDB's brute-force
    list_inner_product ordering exactly.  Scale posture: the searched input
    is the m-bytes-per-vector code table, not the float vectors."""
    from cassandra_data_migrator_ray.pipelines.dataops import (
        ann_topk_ivfpq,
        encode_ivfpq,
    )

    M = np.array([13, 16, 9, 11])
    P = np.array([3, 5, 7, 2])
    B = np.array([1, 100, 10_000, 1_000_000])
    books = np.zeros((4, 16, 2))
    for j in range(4):
        t = np.arange(16)
        books[j, :, 0] = t * B[j]
        books[j, :, 1] = (t * t) % M[j]

    def plant(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["vec_id"].to_numpy().astype(np.int64)
        t = (ids[:, None] * P[None, :]) % M[None, :]  # (n, 4)
        v = np.empty((len(ids), 8))
        for j in range(4):
            v[:, 2 * j] = t[:, j] * B[j]
            v[:, 2 * j + 1] = (t[:, j] * t[:, j]) % M[j]
        return pd.DataFrame({"vec_id": ids, "embedding": list(v)})

    ds = _read(sf_dir, "embeddings", ["vec_id"]).map_batches(
        plant, batch_format="pandas"
    )
    # coarse centroids: the planted vectors of ids 0..3 (any 4 points work —
    # nprobe covers every list, so coarse routing cannot lose recall)
    t0 = (np.arange(4)[:, None] * P[None, :]) % M[None, :]
    cents = np.empty((4, 8))
    for j in range(4):
        cents[:, 2 * j] = t0[:, j] * B[j]
        cents[:, 2 * j + 1] = (t0[:, j] * t0[:, j]) % M[j]
    q = np.array([[1.0, 0, 1, 0, 1, 0, 1, 0]])
    got = ann_topk_ivfpq(
        encode_ivfpq(ds, (cents, books), normalize=False),
        q,
        (cents, books),
        k=10,
        nprobe=4,
        normalize=False,
    )
    return got[["query_id", "rank", "vec_id"]].astype(np.int64)


# ---------------------------------------------------------------------------
# D. full-engine CDC replay + validate over generated transcripts (rows-only)
# ---------------------------------------------------------------------------


def _sf_value(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.01


def _gen_cached_events(sf_dir: str) -> str:
    """Deterministic transcripts change stream sized by sf, cached as parquet."""
    from cassandra_data_migrator_ray.gen import gen_change_stream

    sf = _sf_value(sf_dir)
    n_events = int(os.environ.get("GRAFT_BENCH_EVENTS", "0")) or max(
        2000, int(10_000_000 * sf)
    )
    # cap conversation cardinality: beyond ~800k distinct convs the per-batch
    # dictionary/hash cost turns superlinear without adding semantic coverage
    n_convs = min(800_000, max(50, n_events // 50))
    # a DIRECTORY of shards: Ray parallelizes parquet reads per file — a single
    # big file is decoded by one read task (measured: a serial 13 s for 700 MB)
    cache = f"/tmp/cdm_ray_cache/events_sf{sf}_n{n_events}"
    done = cache + ".done"  # marker outside the dir so readers only see parquet
    if not os.path.exists(done):
        import shutil

        import pyarrow.parquet as pq

        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        n_shards = min(64, max(1, n_events // 50_000))
        step = (n_events + n_shards - 1) // n_shards

        def _write_shard(i: int) -> None:
            from cassandra_data_migrator_ray.gen import gen_change_stream as g

            rows = min(step, n_events - i * step)
            if rows <= 0:
                return
            shard = g(
                n_convs=n_convs,
                n_events=rows,
                seed=42 + i,
                hot_frac=0.05,
                seq_start=i * step,
            )
            pq.write_table(
                shard, os.path.join(cache, f"part-{i:04d}.parquet"),
                row_group_size=131072,
            )

        if ray.is_initialized() and n_events >= 5_000_000:
            # deterministic per-shard seeds → parallel generation via Ray tasks
            w = ray.remote(num_cpus=1)(_write_shard)
            ray.get([w.remote(i) for i in range(n_shards)])
        else:
            for i in range(n_shards):
                _write_shard(i)
        with open(done, "w") as f:
            f.write("ok")
    return cache


def _gen_cached_oracle(sf_dir: str) -> str:
    """Cached independent-oracle final state for the cached change stream."""
    from cassandra_data_migrator_ray.gen import oracle_final_state

    import pyarrow.parquet as pq

    cache = _gen_cached_events(sf_dir)
    opath = cache.replace("events_", "oracle_")
    if not os.path.exists(opath):
        oracle = oracle_final_state(pq.read_table(cache).to_pandas())
        tmp = opath + ".tmp"
        pq.write_table(pa.Table.from_pandas(oracle, preserve_index=False), tmp)
        os.replace(tmp, opath)
    return opath


def cdc_replay(sf_dir: str) -> pd.DataFrame:
    """Flagship: full engine replay of the generated transcripts change stream
    into a fresh lake; returns the final public table (north-rule pipeline)."""
    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

    import shutil

    cache = _gen_cached_events(sf_dir)
    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(cache, lake, num_parts=NUM_PARTS, salt=2)
        return read_lake_pandas(lake)
    finally:
        # temp lakes are multi-GB at bench scale; leaking them degrades disk
        # state for every later run on this host
        shutil.rmtree(lake, ignore_errors=True)


def where_range_scan(sf_dir: str) -> pd.DataFrame:
    """Pruned exact range scan: replay the change stream with post-commit
    incremental ANALYZE, then read the lake through ``where=`` — one knob
    stacking partition pruning (fresh stats), parquet row-group pruning and
    the exact row filter.  Oracle: the LWW fold restricted to the range."""
    import shutil

    from cassandra_data_migrator_ray.pipelines.maintenance import load_stats
    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_lake

    cache = _gen_cached_events(sf_dir)
    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(cache, lake, num_parts=NUM_PARTS, salt=2, analyze=True)
        assert load_stats(lake) is not None, "post-replay stats must be fresh"
        df = read_lake(lake, where={"turn_idx": (1, 5)}).to_pandas()
        return df.sort_values(["conv_id", "turn_idx"], ignore_index=True)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def vector_lake_roundtrip(sf_dir: str) -> pd.DataFrame:
    """VECTOR payload gate (reference data/CqlData.java:36-38, SIT
    smoke/06_vector; SURVEY §1.3 maps CQL VECTOR → fixed_size_list<float32>):
    replay the embeddings table as a fixed_size_list payload column through
    the full engine (fold → sanitize-to-parquet → read restore), assert the
    public Dataset surfaces the DECLARED fixed_size_list type, and return
    each vector's first element — exact under float32→float64 widening, so
    the DuckDB oracle (embedding[1]) hash-matches bit-for-bit."""
    import shutil

    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_lake

    emb = pa.parquet.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    dim = len(emb["embedding"][0])
    vec_t = pa.list_(pa.float32(), dim)
    n = emb.num_rows
    ev = pa.table(
        {
            "op": pa.array(["UPSERT"] * n, pa.string()),
            "vec_id": emb["vec_id"],
            "embedding": emb["embedding"].combine_chunks().cast(vec_t),
            "writetime": pa.array(np.full(n, 1, dtype=np.int64)),
            "event_seq": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        }
    )
    schema = pa.schema([("vec_id", pa.int64()), ("embedding", vec_t)])
    lake = tempfile.mkdtemp(prefix="cdm_ray_veclake_")
    try:
        replay(ev, lake, num_parts=8, payload_schema=schema, key_cols=("vec_id",))
        ds = read_lake(lake)
        assert ds.schema().base_schema.field("embedding").type == vec_t, (
            "lake must surface the declared fixed_size_list type"
        )

        def first_elem(t: pa.Table) -> pa.Table:
            v = t["embedding"].combine_chunks()
            e0 = v.values.to_numpy(zero_copy_only=False).reshape(-1, dim)[:, 0]
            return pa.table(
                {"vec_id": t["vec_id"], "e0": pa.array(e0.astype(np.float64))}
            )

        out = ds.map_batches(first_elem, batch_format="pyarrow").to_pandas()
        return out.sort_values("vec_id", ignore_index=True)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def _cache_event_count(cache: str) -> int:
    """Row count of the cached change stream from parquet metadata only —
    shared by the engine query and the SQL oracle so both split the stream at
    the identical event_seq threshold."""
    import glob as _glob

    import pyarrow.parquet as pq

    return sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _glob.glob(os.path.join(cache, "*.parquet"))
    )


def cdc_changes(sf_dir: str) -> pd.DataFrame:
    """Change-data-feed gate: replay the first half of the change stream into
    a fresh lake, then the second half with emit_changes=True, and return the
    second run's feed (net inserts, update pre/post image pairs, deletes —
    LWW losers emit nothing).  The SQL oracle derives the same feed from the
    prefix-fold vs full-fold states per touched key."""
    import shutil

    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_changes_pandas

    cache = _gen_cached_events(sf_dir)
    h = _cache_event_count(cache) // 2

    def first_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["event_seq"], h))

    def second_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["event_seq"], h))

    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(
            ray.data.read_parquet(cache).map_batches(
                first_half, batch_format="pyarrow"
            ),
            lake,
            num_parts=NUM_PARTS,
            salt=2,
        )
        r2 = replay(
            ray.data.read_parquet(cache).map_batches(
                second_half, batch_format="pyarrow"
            ),
            lake,
            num_parts=NUM_PARTS,
            salt=2,
            emit_changes=True,
        )
        return read_changes_pandas(lake, run_id=r2.run_id)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def cdc_reshard(sf_dir: str) -> pd.DataFrame:
    """Reshard gate: replay the first half of the change stream into a COARSE
    lake (num_parts/4), re-key it to the standard layout with
    ``reshard_lake`` (the reference fixes numParts at job submit,
    job/SplitPartitions.java:32-76 — this is the growth path it lacks), then
    replay the second half against the new layout.  The final public table
    must equal cdc_replay's oracle exactly: resharding changes placement,
    never content, and incremental replay keeps working across it."""
    import shutil

    from cassandra_data_migrator_ray.pipelines.maintenance import reshard_lake
    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

    cache = _gen_cached_events(sf_dir)
    h = _cache_event_count(cache) // 2

    def first_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["event_seq"], h))

    def second_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["event_seq"], h))

    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(
            ray.data.read_parquet(cache).map_batches(
                first_half, batch_format="pyarrow"
            ),
            lake,
            num_parts=max(4, NUM_PARTS // 4),
        )
        reshard_lake(lake, NUM_PARTS, salt=2)
        replay(
            ray.data.read_parquet(cache).map_batches(
                second_half, batch_format="pyarrow"
            ),
            lake,
        )
        return read_lake_pandas(lake)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def sorted_export_transcripts(sf_dir: str) -> pd.DataFrame:
    """Global ORDER BY export gate: replay into a lake, export through the
    distributed range-partitioned sort (sources/lake.export_sorted), read
    the output files back IN FILENAME ORDER and assert the concatenation is
    globally key-ordered — the ordering proof lives in this assert (the
    driver's hash compare is order-insensitive); content must equal the
    cdc_replay oracle."""
    import shutil

    import pyarrow.parquet as pq_

    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import export_sorted

    cache = _gen_cached_events(sf_dir)
    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    out = tempfile.mkdtemp(prefix="cdm_ray_sorted_")
    try:
        replay(cache, lake, num_parts=NUM_PARTS, salt=2)
        files = export_sorted(lake, out, by=["conv_id", "turn_idx"])
        df = pd.concat(
            [pq_.read_table(f).to_pandas() for f in files], ignore_index=True
        )
        key = pd.MultiIndex.from_frame(df[["conv_id", "turn_idx"]])
        assert key.is_monotonic_increasing, "export is not globally sorted"
        return df
    finally:
        shutil.rmtree(lake, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


def cdf_conv_stats_maintained(sf_dir: str) -> pd.DataFrame:
    """Materialized-view maintenance gate: per-conversation (n_turns,
    text_chars) is maintained INCREMENTALLY from the second run's change
    feed — cost proportional to the changes, never re-reading the lake —
    and must equal a full recompute of the same aggregate from the final
    folded state (the SQL oracle)."""
    import shutil

    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import (
        apply_changes_aggregate,
        read_changes_pandas,
        read_lake_pandas,
    )

    cache = _gen_cached_events(sf_dir)
    h = _cache_event_count(cache) // 2

    def first_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["event_seq"], h))

    def second_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["event_seq"], h))

    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(
            ray.data.read_parquet(cache).map_batches(
                first_half, batch_format="pyarrow"
            ),
            lake,
            num_parts=NUM_PARTS,
            salt=2,
        )
        base = read_lake_pandas(lake)
        agg0 = (
            base.assign(text_chars=base["text"].str.len())
            .groupby("conv_id", sort=False)
            .agg(n_turns=("turn_idx", "size"), text_chars=("text_chars", "sum"))
            .reset_index()
        )
        r2 = replay(
            ray.data.read_parquet(cache).map_batches(
                second_half, batch_format="pyarrow"
            ),
            lake,
            emit_changes=True,
        )
        feed = read_changes_pandas(lake, run_id=r2.run_id)
        feed = feed.assign(text_chars=feed["text"].str.len())
        out = apply_changes_aggregate(
            agg0,
            feed,
            ["conv_id"],
            count_col="n_turns",
            sums={"text_chars": "text_chars"},
        )
        out["text_chars"] = out["text_chars"].astype(np.int64)
        return out.sort_values("conv_id", ignore_index=True)
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def cdc_validate(sf_dir: str) -> pd.DataFrame:
    """Replay + DiffData validation vs the independent oracle; returns the
    status counts (all-VALID on a correct engine)."""
    from cassandra_data_migrator_ray.gen import oracle_final_state
    from cassandra_data_migrator_ray.pipelines.diff import validate
    from cassandra_data_migrator_ray.pipelines.replay import replay

    import pyarrow.parquet as pq

    import shutil

    cache = _gen_cached_events(sf_dir)
    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(cache, lake, num_parts=NUM_PARTS)
        oracle = oracle_final_state(pq.read_table(cache).to_pandas())
        res = validate(oracle, lake)
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    return pd.DataFrame(
        [
            {"status": k, "n": np.int64(v)}
            for k, v in sorted(res.counts.items())
        ]
    )


def sit_autocorrect_counters(sf_dir: str) -> pd.DataFrame:
    """SIT golden-output parity gate (reference SIT/smoke/02_autocorrect_kvp
    + SIT/cdm-assert.sh asserts exact cqlsh output and final job counters):
    migrate → deterministically corrupt the target (drop one live row =
    MISSING, mutate one text = MISMATCH, inject one phantom key = EXTRA) →
    DiffData validate → autocorrect → validate clean.  Returns BOTH
    validations' counter tables — the counters the SIT harness greps for —
    oracle-paired in SQL (pre: 1/1/1 + K-2 valid; post: 0/0/0 + K valid,
    K = the LWW fold's key count)."""
    import glob as _glob
    import shutil

    import pyarrow.parquet as pq_

    from cassandra_data_migrator_ray.gen import oracle_final_state
    from cassandra_data_migrator_ray.pipelines.diff import autocorrect, validate
    from cassandra_data_migrator_ray.pipelines.replay import replay

    cache = _gen_cached_events(sf_dir)
    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        # fixed run_id → stable data-file names → deterministic corruption
        replay(cache, lake, num_parts=NUM_PARTS, run_id="sitgate01")
        expected = oracle_final_state(pq_.read_table(cache).to_pandas())
        corrupted = False
        for f in sorted(_glob.glob(os.path.join(lake, "data", "*.parquet"))):
            t = pq_.read_table(f)
            df = t.to_pandas()
            live = df.index[~df[DELETED]]
            if len(live) < 3:
                continue
            part_k = int(os.path.basename(f).split("-")[1])
            df = df.drop(index=live[0])  # MISSING
            df.loc[live[1], "text"] = "::SIT-CORRUPTED::"  # MISMATCH
            extra = df.loc[[live[2]]].copy()  # EXTRA (phantom write,
            # route-consistent: autocorrect deletes extras by key route)
            extra["conv_id"] = next(
                f"convEXTRA{i}"
                for i in range(100_000)
                if assign_partition(
                    np.array([f"convEXTRA{i}"], dtype=object),
                    np.array([0]),
                    NUM_PARTS,
                )[0]
                == part_k
            )
            extra["turn_idx"] = np.int32(0)
            df = pd.concat([df, extra], ignore_index=True)
            pq_.write_table(
                pa.Table.from_pandas(df, preserve_index=False).cast(t.schema), f
            )
            corrupted = True
            break
        assert corrupted, "no partition file with >=3 live rows to corrupt"
        res1 = validate(expected, lake)
        autocorrect(res1, lake)
        res2 = validate(expected, lake)
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    rows = [
        {"phase": phase, "status": k, "n": np.int64(v)}
        for phase, res in (("pre", res1), ("post", res2))
        for k, v in sorted(res.counts.items())
    ]
    return pd.DataFrame(rows).sort_values(
        ["phase", "status"], ignore_index=True
    )


# ---------------------------------------------------------------------------
# E. custom operators beyond the reference: windowed aggregate + as-of join
# ---------------------------------------------------------------------------


def tumbling_window_counts(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate (1-day windows): count + integer-cents sum per
    (user_id, window).  Ray Data has no event-time windows; the window key is
    computed per batch with Arrow temporal kernels and aggregated with the
    partial-then-final combiner pattern (ray_guide 'streaming-shaped')."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial_agg(t: pa.Table) -> pd.DataFrame:
        win = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "window_start": win.to_numpy(zero_copy_only=False),
                "cents": np.round(
                    t["value"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        g = (
            df.groupby(["user_id", "window_start"], sort=False)["cents"]
            .agg(["size", "sum"])
            .reset_index()
        )
        return g.rename(columns={"size": "n", "sum": "total_cents"})

    nparts = _scaled_nparts(ds)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df["__part"] = _mod_part(
            df["user_id"].to_numpy() * np.int64(0x9E3779B9)
            + df["window_start"].to_numpy(),
            nparts,
        )
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # one PARTITION of (user, window) groups — C-level groupby
        out = g.groupby(["user_id", "window_start"], sort=False, as_index=False)[
            ["n", "total_cents"]
        ].sum()
        out["window_start"] = out["window_start"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        out["total_cents"] = out["total_cents"].astype(np.int64)
        return out

    out = (
        ds.map_batches(partial_agg, batch_format="pyarrow")
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "window_start"], ignore_index=True)


def distinct_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Exact grouped COUNT(DISTINCT): distinct users per event type.  The
    100-TB shape: per-batch distinct (type, user) pairs bound the shuffle to
    the distinct-pair cardinality per batch; pairs co-locate by user hash,
    each partition distincts its disjoint pair set once and emits |types|
    count rows; the driver sums a tiny (partitions × types) frame — exact
    because the per-partition pair sets are disjoint."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nparts = _scaled_nparts(ds)

    def pairs(t: pa.Table) -> pd.DataFrame:
        t = t.filter(
            pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["event_type"]))
        )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
            }
        ).drop_duplicates(ignore_index=True)
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def count_partition(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "event_type"]].drop_duplicates()
        out = d.groupby("event_type", sort=False).size().reset_index(name="n")
        return out

    partials = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_partition, batch_format="pandas")
        .to_pandas()
    )
    partials = _typed_empty(partials, {"event_type": "object", "n": "int64"})
    out = (
        partials.groupby("event_type", sort=True)["n"].sum().reset_index()
    )
    out = out.rename(columns={"n": "n_users"})
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("event_type", ignore_index=True)


SLIDE_HOP_US = 21_600_000_000  # 6 h hop
SLIDE_K = 4  # window = K × hop = 24 h


def sliding_window_counts(
    sf_dir: str, hop_us: int = SLIDE_HOP_US, k: int = SLIDE_K
) -> pd.DataFrame:
    """Sliding (hopping) windows — each event counts in the k windows that
    cover it (window = k × hop).  Per batch: one bucket computation + k
    vectorized shifts + a np.unique partial count, so the shuffle carries at
    most one row per distinct window per batch, independent of event count."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_valid(t["ts"]))
        e = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        bucket = (e // hop_us) * hop_us
        ws = np.concatenate([bucket - i * hop_us for i in range(k)])
        uniq, counts = np.unique(ws, return_counts=True)
        return pd.DataFrame(
            {"window_start": uniq, "n": counts.astype(np.int64)}
        )

    nparts = 64  # windows are time-range-proportional; bounded partitions

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        # partition by the HOP INDEX, not the raw window_start: every
        # window_start is a multiple of hop_us, and any whole-second hop is
        # divisible by 64, so raw mod-64 sent EVERY window to partition 0
        # (review finding — one task folded all partials)
        df["__part"] = _mod_part(
            df["window_start"].to_numpy() // np.int64(hop_us), nparts
        )
        return df

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("window_start", sort=False, as_index=False)["n"].sum()
        out["window_start"] = out["window_start"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    out = _typed_empty(out, {"window_start": "int64", "n": "int64"})
    return out.sort_values("window_start", ignore_index=True)


def running_purchase_total(sf_dir: str) -> pd.DataFrame:
    """Running total (cumulative window sum): per user, the cumulative
    purchase amount in integer cents ordered by (ts, event_id) — exact and
    reduction-order-independent because the sum is integer and the order is
    total.  Co-partition by user, ONE sort + cumsum + boundary-offset
    subtraction per partition (no per-user Python)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])
    nparts = _scaled_nparts(ds)

    def tag(t: pa.Table) -> pd.DataFrame:
        t = t.filter(
            pc.and_(
                pc.equal(t["event_type"], "purchase"),
                pc.and_(
                    pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"])),
                    pc.is_valid(t["value"]),
                ),
            )
        )
        df = pd.DataFrame(
            {
                "event_id": t["event_id"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "t": pc.cast(
                    pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
                ).to_numpy(zero_copy_only=False),
                "cents": np.round(
                    t["value"].to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "t", "event_id"], kind="mergesort", ignore_index=True
        )
        u = g["user_id"].to_numpy()
        cs = np.cumsum(g["cents"].to_numpy())
        boundary = np.ones(len(g), dtype=bool)
        boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        grp_base = np.where(starts > 0, cs[starts - 1], 0)
        base = np.repeat(grp_base, np.diff(np.append(starts, len(g))))
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "running_cents": (cs - base).astype(np.int64),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(running, batch_format="pandas")
        .to_pandas()
    )
    out = _typed_empty(
        out, {"event_id": "int64", "user_id": "int64", "running_cents": "int64"}
    )
    return out.sort_values("event_id", ignore_index=True)


SESSION_GAP_US = 28_800_000_000  # 8 h — matches the sparse per-user event density


def session_windows(sf_dir: str, gap_us: int = SESSION_GAP_US) -> pd.DataFrame:
    """Gap-based sessionization (session windows — an operator Ray Data
    lacks): consecutive events of a user more than ``gap_us`` apart start a
    new session; emits per-session event count and start/end event times.

    Pattern: hash-partition users, then ONE vectorized pass per partition —
    sort by (user_id, t), boundary mask = user change OR gap, session sizes
    via ``np.diff`` over boundary indices (no per-user Python loop).
    Partitioning assumption: all rows of one user fit one group (true for
    per-user event volumes); partition count scales with data size."""
    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nparts = _scaled_nparts(ds)

    def tag(t: pa.Table) -> pd.DataFrame:
        # mirror the oracle's NOT NULL guards: a null timestamp or user
        # cannot be sessionized (and would poison the int64 view below)
        t = t.filter(pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"])))
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                # normalize to µs first: parquet written by pandas is ts[ns]
                "t": pc.cast(
                    pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
                ).to_numpy(zero_copy_only=False),
            }
        )
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "t"], kind="mergesort", ignore_index=True)
        u = g["user_id"].to_numpy(dtype=np.int64)
        t = g["t"].to_numpy(dtype=np.int64)
        boundary = np.ones(len(g), dtype=bool)
        boundary[1:] = (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > gap_us)
        starts = np.flatnonzero(boundary)
        n_events = np.diff(np.append(starts, len(g)))
        ends = np.append(starts[1:], len(g)) - 1
        s_user = u[starts]
        # per-user ordinal session id: position within the user's run of sessions
        first = np.ones(len(starts), dtype=bool)
        first[1:] = s_user[1:] != s_user[:-1]
        idx = np.arange(len(starts), dtype=np.int64)
        session_id = idx - np.maximum.accumulate(np.where(first, idx, 0)) + 1
        return pd.DataFrame(
            {
                "user_id": s_user,
                "session_id": session_id,
                "n_events": n_events.astype(np.int64),
                "session_start": t[starts],
                "session_end": t[ends],
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(sessionize, batch_format="pandas")
        .to_pandas()
    )
    out = _typed_empty(
        out,
        {
            "user_id": "int64",
            "session_id": "int64",
            "n_events": "int64",
            "session_start": "int64",
            "session_end": "int64",
        },
    )
    return out.sort_values(["user_id", "session_id"], ignore_index=True)


def asof_purchase_click(sf_dir: str) -> pd.DataFrame:
    """As-of join (an operator Ray Data lacks): for each purchase, the most
    recent click at-or-before it by the same user.  Pattern: co-partition both
    sides by the key, per-group sorted pd.merge_asof (ray_guide 'joins').
    Partitioning assumption: all rows of one user fit one group (true for
    per-user event volumes)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    # scale join parallelism with data size (never a fixed cap): one group per
    # ~64k input rows, floor 16 so small inputs still spread over the pool
    try:
        est = ds.count()
    except Exception:
        est = 0
    nparts = max(16, min(1024, est // 65536))

    def tag(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df[df["event_type"].isin(["purchase", "click"])]
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        c = g[g["event_type"] == "click"].sort_values(["ts", "event_id"])
        if p.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "click_event_id": pd.Series([], dtype="Int64"),
                }
            )
        merged = pd.merge_asof(
            p,
            c[["ts", "user_id", "event_id"]].rename(columns={"event_id": "click_event_id"}),
            on="ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        out = merged[["event_id", "user_id", "click_event_id"]].copy()
        out["click_event_id"] = out["click_event_id"].astype("Int64")
        return out

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(join_group, batch_format="pandas")
        .to_pandas()
    )
    # float64, not Int64: the DuckDB oracle's nullable BIGINT surfaces as
    # float64 in pandas, and the driver's value-hash is dtype-sensitive.
    # The cast happens ONLY at this oracle-comparison boundary (the join
    # itself stays Int64); event ids must stay < 2^53 or the float
    # round-trip would corrupt them — assert rather than corrupt silently.
    mx = out["click_event_id"].max()
    if pd.notna(mx) and int(mx) >= (1 << 53):
        raise ValueError(
            "click_event_id exceeds 2^53; float64 oracle-parity cast would "
            "corrupt it — widen the comparison boundary instead"
        )
    out["click_event_id"] = out["click_event_id"].astype("float64")
    return out.sort_values("event_id", ignore_index=True)


RANGE_JOIN_WINDOW_US = 86_400_000_000  # 24 h


def range_join_clicks(sf_dir: str, window_us: int = RANGE_JOIN_WINDOW_US) -> pd.DataFrame:
    """Range (interval) join — an operator Ray Data lacks: for each purchase,
    the number of same-user clicks in the half-open window
    ``(purchase.ts - window, purchase.ts]``.

    Pattern: co-partition both sides by user hash, then per partition ONE
    vectorized pass — clicks get a per-user running count, and two
    ``merge_asof`` probes (at ``ts`` and at ``ts - window``) turn the interval
    count into a difference of cumulative counts.  No per-row loop, no
    all-pairs expansion; shuffle carries each event exactly once.
    Partitioning assumption: all rows of one user fit one group (true for
    per-user event volumes); partition count scales with data size."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])
    nparts = _scaled_nparts(ds)

    def tag(t: pa.Table) -> pd.DataFrame:
        t = t.filter(
            pc.and_(
                pc.is_in(t["event_type"], value_set=pa.array(["purchase", "click"])),
                pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"])),
            )
        )
        df = pd.DataFrame(
            {
                "event_id": t["event_id"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
                "t": pc.cast(
                    pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
                ).to_numpy(zero_copy_only=False),
            }
        )
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def count_in_window(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"].sort_values(
            "t", kind="mergesort", ignore_index=True
        )
        if p.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "n_clicks": pd.Series([], dtype="int64"),
                }
            )
        c = g[g["event_type"] == "click"].sort_values(
            "t", kind="mergesort", ignore_index=True
        )
        # per-user running click count; merge_asof(backward) then picks the
        # LAST row with t <= probe, i.e. the count of clicks at-or-before it
        c = c[["t", "user_id"]].copy()
        c["cum"] = c.groupby("user_id", sort=False).cumcount() + 1
        probe_hi = p[["t", "user_id"]]
        hi = pd.merge_asof(
            probe_hi, c, on="t", by="user_id", direction="backward",
            allow_exact_matches=True,
        )["cum"].fillna(0)
        probe_lo = probe_hi.copy()
        probe_lo["t"] = probe_lo["t"] - window_us  # same sort order: const shift
        lo = pd.merge_asof(
            probe_lo, c, on="t", by="user_id", direction="backward",
            allow_exact_matches=True,
        )["cum"].fillna(0)
        return pd.DataFrame(
            {
                "event_id": p["event_id"].to_numpy(),
                "user_id": p["user_id"].to_numpy(),
                "n_clicks": (hi.to_numpy() - lo.to_numpy()).astype(np.int64),
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(count_in_window, batch_format="pandas")
        .to_pandas()
    )
    out = _typed_empty(
        out, {"event_id": "int64", "user_id": "int64", "n_clicks": "int64"}
    )
    return out.sort_values("event_id", ignore_index=True)


def topk_orders_per_customer(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Grouped top-k (window-rank) — an operator Ray Data lacks: the k
    highest-value orders per customer with a dense 1-based rank, tie-broken by
    order key for determinism.

    Pattern: per-batch partial top-k per customer BEFORE the shuffle (the
    combiner cuts shuffle volume to <= k rows per (batch, customer)), then a
    hash-partitioned final top-k.  Both passes are one sort + groupby.head —
    no per-group Python loop."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    nparts = _scaled_nparts(ds)

    def partial_topk(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
        df = df.groupby("o_custkey", sort=False).head(k)
        df["__part"] = _mod_part(df["o_custkey"].to_numpy(), nparts)
        return df

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
            ignore_index=True,
        )
        g = g.groupby("o_custkey", sort=False).head(k).reset_index(drop=True)
        g["rk"] = g.groupby("o_custkey", sort=False).cumcount() + 1
        return g[["o_custkey", "rk", "o_orderkey", "o_totalprice"]]

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["o_custkey", "rk"], ignore_index=True)


def quantile_quantity_by_flag(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantiles over a discrete-domain column — scalable
    histogram method: per-batch value counts of (flag, quantity) are the
    partial aggregate (shuffle carries one row per distinct pair per batch,
    independent of row count), the driver reduces a tiny counts table and
    selects quantiles from cumulative counts.  Selection (quantile_disc
    semantics: 0-based index ceil(q*n)-1 of the sorted values) returns an
    actual element — bit-exact vs the oracle, no float interpolation."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial_counts(t: pa.Table) -> pd.DataFrame:
        t = t.filter(pc.is_valid(t["l_quantity"]))
        df = t.to_pandas()
        g = (
            df.groupby(["l_returnflag", "l_quantity"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .to_pandas()
        .groupby(["l_returnflag", "l_quantity"], sort=True)["n"]
        .sum()
        .reset_index()
    )

    def disc_quantile(cum: np.ndarray, vals: np.ndarray, n: int, q: float) -> float:
        h = q * float(n)  # duckdb computes the position in float64 too
        idx = int(np.floor(h))
        if float(idx) == h:
            idx -= 1
        idx = max(idx, 0)
        return float(vals[np.searchsorted(cum, idx + 1)])

    rows = []
    for flag, g in counts.groupby("l_returnflag", sort=True):
        vals = g["l_quantity"].to_numpy()
        cnts = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        rows.append(
            {
                "l_returnflag": flag,
                "p50": disc_quantile(cum, vals, n, 0.5),
                "p90": disc_quantile(cum, vals, n, 0.9),
            }
        )
    return pd.DataFrame(rows, columns=["l_returnflag", "p50", "p90"]).sort_values(
        "l_returnflag", ignore_index=True
    )


def price_quantiles_lineitem(sf_dir: str) -> pd.DataFrame:
    """Exact quantiles over a HIGH-cardinality float column
    (l_extendedprice: ~every value distinct), where the counts-table method
    of quantile_quantity_by_flag would ship the whole domain to the driver.
    dataops.quantile_exact narrows each rank by iterative histogram
    bisection — one streaming pass per iteration, driver reduces bins-sized
    arrays — then selects the exact element; bit-equal to DuckDB
    quantile_disc."""
    from cassandra_data_migrator_ray.pipelines.dataops import quantile_exact

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    got = quantile_exact(ds, "l_extendedprice", (0.25, 0.5, 0.9, 0.99))
    return pd.DataFrame(
        [
            {
                "p25": got[0.25],
                "p50": got[0.5],
                "p90": got[0.9],
                "p99": got[0.99],
            }
        ]
    )


def pricing_summary_lineitem(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary through the generic
    dataops.agg_by_key operator (map-side partial combine → one tiny
    exchange).  Quantities and prices aggregate as scaled integers
    (round_even ≡ np.round) so the distributed sums are order-independent
    and bit-equal to SQL; min/max exercise the non-additive combiners."""
    from cassandra_data_migrator_ray.pipelines.dataops import agg_by_key

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def cents(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["qty_c"] = np.round(df.pop("l_quantity").to_numpy() * 100).astype(
            np.int64
        )
        df["price_c"] = np.round(
            df.pop("l_extendedprice").to_numpy() * 100
        ).astype(np.int64)
        return df

    out = agg_by_key(
        ds.map_batches(cents, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty_c": ("qty_c", "sum"),
            "sum_price_c": ("price_c", "sum"),
            "min_price_c": ("price_c", "min"),
            "max_price_c": ("price_c", "max"),
            "count_order": (None, "count"),
        },
    ).to_pandas()
    for c in out.columns:
        if c.endswith("_c") or c == "count_order":
            out[c] = out[c].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"], ignore_index=True)


def orders_by_nation_priority(sf_dir: str) -> pd.DataFrame:
    """Map-side broadcast join as a first-class operator
    (dataops.broadcast_join): orders stream against a ray.put customer
    dimension — zero shuffle — then per-batch partial aggregation on
    (nationkey, priority) so the driver reduces ≤ 125 rows.  Money sums in
    integer cents (round_even ≡ np.round banker's rounding, verified on
    data) so the reduction is order-independent and bit-equal to SQL."""
    import pyarrow.parquet as pq_

    from cassandra_data_migrator_ray.pipelines.dataops import broadcast_join

    cust = pq_.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).to_pandas()
    nation = pq_.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"]
    )
    joined = broadcast_join(
        orders, cust.rename(columns={"c_custkey": "o_custkey"}), on="o_custkey"
    )

    def partial_agg(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            cents=np.round(b["o_totalprice"].to_numpy() * 100).astype(np.int64)
        )
        g = b.groupby(["c_nationkey", "o_orderpriority"], sort=False).agg(
            n_orders=("cents", "size"), total_cents=("cents", "sum")
        )
        return g.reset_index()

    part = joined.map_batches(partial_agg, batch_format="pandas").to_pandas()
    fin = (
        part.groupby(["c_nationkey", "o_orderpriority"], sort=False)
        .agg(n_orders=("n_orders", "sum"), total_cents=("total_cents", "sum"))
        .reset_index()
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    )
    fin["n_orders"] = fin["n_orders"].astype(np.int64)
    return fin[["n_name", "o_orderpriority", "n_orders", "total_cents"]].sort_values(
        ["n_name", "o_orderpriority"], ignore_index=True
    )


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Multi-table star join (TPC-H Q5 shape): revenue per nation through
    lineitem ⨝ orders ⨝ customer ⨝ nation.

    Scale plan: lineitem revenue is pre-aggregated per order key inside each
    batch (integer cents — order-independent exact sums), both big sides are
    co-partitioned by the SAME key (order key) through one hash groupby, the
    per-partition join emits (custkey, cents) partials, and the two dimension
    lookups (customer → nation, nation → name) are broadcast via ``ray.put``
    — dimensions are the small side; no second shuffle.  Driver only ever
    sees one row per (partition, custkey-group) partial, reduced to ~25
    nation rows."""
    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    nparts = _scaled_nparts(li)

    def li_partial(t: pa.Table) -> pd.DataFrame:
        p = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        # same expression order as the oracle: price * (1 - discount) * 100,
        # banker's rounding both sides (duckdb round_even == np.round)
        cents = np.round(p * (1.0 - d) * 100.0).astype(np.int64)
        df = pd.DataFrame(
            {"o_orderkey": t["l_orderkey"].to_numpy(zero_copy_only=False), "cents": cents}
        )
        g = df.groupby("o_orderkey", sort=False)["cents"].sum().reset_index()
        g["o_custkey"] = np.int64(-1)  # marker: revenue-side rows
        g["__part"] = _mod_part(g["o_orderkey"].to_numpy(), nparts)
        return g[["__part", "o_orderkey", "o_custkey", "cents"]]

    def orders_side(t: pa.Table) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_custkey": t["o_custkey"].to_numpy(zero_copy_only=False),
            }
        )
        g["cents"] = np.int64(0)
        g["__part"] = _mod_part(g["o_orderkey"].to_numpy(), nparts)
        return g[["__part", "o_orderkey", "o_custkey", "cents"]]

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    both = li.map_batches(li_partial, batch_format="pyarrow").union(
        orders.map_batches(orders_side, batch_format="pyarrow")
    )

    # broadcast the dimension lookup once: custkey -> nationkey (dense array —
    # custkeys are a contiguous id space; fall back to a dict would be the
    # general path)
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .to_pandas()
        .sort_values("c_custkey")
    )
    lut_keys = cust["c_custkey"].to_numpy(dtype=np.int64)
    lut_vals = cust["c_nationkey"].to_numpy(dtype=np.int64)
    lut_ref = ray.put((lut_keys, lut_vals))

    def join_partition(g: pd.DataFrame) -> pd.DataFrame:
        rev = g[g["o_custkey"] == -1]
        ords = g[g["o_custkey"] != -1]
        per_order = rev.groupby("o_orderkey", sort=False)["cents"].sum().reset_index()
        j = per_order.merge(
            ords[["o_orderkey", "o_custkey"]], on="o_orderkey", how="inner"
        )
        per_cust = j.groupby("o_custkey", sort=False)["cents"].sum().reset_index()
        keys, vals = ray.get(lut_ref)
        pos = np.searchsorted(keys, per_cust["o_custkey"].to_numpy())
        # guard: a custkey absent from the dimension drops (inner-join parity)
        pos = np.clip(pos, 0, len(keys) - 1)
        ok = keys[pos] == per_cust["o_custkey"].to_numpy()
        nk = vals[pos]
        out = pd.DataFrame({"n_nationkey": nk[ok], "cents": per_cust["cents"].to_numpy()[ok]})
        return out.groupby("n_nationkey", sort=False)["cents"].sum().reset_index()

    partials = (
        both.groupby("__part")
        .map_groups(join_partition, batch_format="pandas")
        .to_pandas()
    )
    total = partials.groupby("n_nationkey", sort=True)["cents"].sum().reset_index()
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = total.merge(nation, on="n_nationkey", how="inner")[["n_name", "cents"]]
    out = out.rename(columns={"cents": "revenue_cents"})
    out["revenue_cents"] = out["revenue_cents"].astype(np.int64)
    return out.sort_values("n_name", ignore_index=True)


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_event_counts(sf_dir: str) -> pd.DataFrame:
    """Pivot / reshape: per-user event counts spread into one column per event
    type.  Per-batch crosstab partials (one row per user per batch, columns
    fixed by the known type domain) pre-aggregate before the shuffle; the
    final fold is an integer sum per user — reduction-order independent."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    nparts = _scaled_nparts(ds)

    def partial(t: pa.Table) -> pd.DataFrame:
        # crosstab silently drops NaN index keys, so filter null users up
        # front and mirror it in the oracle (user_id IS NOT NULL) — otherwise
        # a null-user group would survive in SQL but vanish here
        t = t.filter(pc.is_valid(t["user_id"]))
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
            }
        )
        # a null event_type counts toward no column but must keep its user's
        # group row (SQL GROUP BY semantics) — crosstab drops NaN keys, so
        # route nulls through a sentinel column that the reindex then drops
        ct = pd.crosstab(df["user_id"], df["event_type"].fillna(""))
        ct = ct.reindex(columns=list(EVENT_TYPES), fill_value=0).astype(np.int64)
        ct.columns = [f"n_{c}" for c in ct.columns]
        ct = ct.reset_index()
        ct["__part"] = _mod_part(ct["user_id"].to_numpy(), nparts)
        return ct

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized sum per partition (NOT per user) — scales to
        # millions of users without per-group Python dispatch
        g = g.drop(columns="__part")
        return g.groupby("user_id", sort=False).sum().reset_index()

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold_partition, batch_format="pandas")
        .to_pandas()
    )
    for c in out.columns:
        if c != "user_id":
            out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id", ignore_index=True)


def lag_purchase_delta(sf_dir: str) -> pd.DataFrame:
    """Window offset (lag) — per purchase, the previous purchase value of the
    same user in (ts, event_id) order, as a nullable delta source column.
    Pattern: hash-partition users, ONE sort + masked shift per partition (a
    user's first row lags to null); no per-user loop."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts", "value"])
    nparts = _scaled_nparts(ds)

    def tag(t: pa.Table) -> pd.DataFrame:
        t = t.filter(
            pc.and_(
                pc.equal(t["event_type"], "purchase"),
                pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"])),
            )
        )
        df = pd.DataFrame(
            {
                "event_id": t["event_id"].to_numpy(zero_copy_only=False),
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "t": pc.cast(
                    pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
                ).to_numpy(zero_copy_only=False),
                "value": t["value"].to_numpy(zero_copy_only=False),
            }
        )
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def shift_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["user_id", "t", "event_id"], kind="mergesort", ignore_index=True
        )
        u = g["user_id"].to_numpy()
        prev = np.roll(g["value"].to_numpy(), 1)
        same_user = np.zeros(len(g), dtype=bool)
        same_user[1:] = u[1:] == u[:-1]
        prev = np.where(same_user, prev, np.nan)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "value": g["value"].to_numpy(),
                "prev_value": prev,
            }
        )

    out = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(shift_group, batch_format="pandas")
        .to_pandas()
    )
    out = _typed_empty(
        out,
        {
            "event_id": "int64",
            "user_id": "int64",
            "value": "float64",
            "prev_value": "float64",
        },
    )
    return out.sort_values("event_id", ignore_index=True)


def collect_event_types(sf_dir: str) -> pd.DataFrame:
    """Ordered collect-distinct (string_agg): per user, the sorted distinct
    event types joined by ','.  Per-batch distinct partials bound the shuffle
    to |type domain| rows per (batch, user); the final fold set-unions and
    joins — output size bounded by the domain, safe at any scale."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nparts = _scaled_nparts(ds)

    def partial(t: pa.Table) -> pd.DataFrame:
        # string_agg skips NULL elements and the oracle filters NULL users;
        # drop both here so the group sets agree (a user with only-null types
        # would otherwise appear in SQL with a NULL aggregate but not here)
        t = t.filter(
            pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["event_type"]))
        )
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "event_type": t["event_type"].to_pandas(),
            }
        )
        df = df.drop_duplicates(ignore_index=True)
        df["__part"] = _mod_part(df["user_id"].to_numpy(), nparts)
        return df

    def fold_partition(g: pd.DataFrame) -> pd.DataFrame:
        # distinct again across batches, then ONE vectorized sorted join per
        # partition: sort (user, type), cut group boundaries with a mask, and
        # join via Arrow's binary_join over a zero-copy ListArray — no
        # per-user Python dispatch
        g = g[["user_id", "event_type"]].drop_duplicates()
        g = g.sort_values(["user_id", "event_type"], kind="mergesort", ignore_index=True)
        u = g["user_id"].to_numpy()
        boundary = np.ones(len(g), dtype=bool)
        boundary[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(boundary)
        offsets = pa.array(np.append(starts, len(g)).astype(np.int32))
        lists = pa.ListArray.from_arrays(
            offsets, pa.array(g["event_type"], type=pa.string())
        )
        joined = pc.binary_join(lists, ",")
        return pd.DataFrame(
            {"user_id": u[starts], "types": joined.to_pandas()}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold_partition, batch_format="pandas")
        .to_pandas()
    )
    out = _typed_empty(out, {"user_id": "int64", "types": "object"})
    return out.sort_values("user_id", ignore_index=True)


def hll_distinct_users(sf_dir: str, p: int = 14) -> pd.DataFrame:
    """Approximate distinct count via mergeable HyperLogLog sketches — the
    100-TB shape for COUNT(DISTINCT): each batch reduces to a fixed 2**p-byte
    register array, the driver folds register maxima (bytes moved independent
    of row count; merge is associative/commutative/idempotent, so retries and
    reduction order cannot change the answer).

    Not SQL-oracle-paired (DuckDB's approx_count_distinct uses a different
    sketch); gated instead by pytest accuracy/merge-property tests and the
    rows-only driver check.  Returns the estimate alongside sketch params."""
    from cassandra_data_migrator_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    ds = _read(sf_dir, "events", ["user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        regs = hll_partial(t["user_id"].to_numpy(zero_copy_only=False), p=p)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = hll_merge(
        *(np.frombuffer(b, dtype=np.uint8) for b in parts["regs"])
    )
    return pd.DataFrame(
        {
            "estimate": [np.int64(round(hll_estimate(merged)))],
            "precision_p": [np.int64(p)],
        }
    )


def hll_distinct_users_by_type(sf_dir: str, p: int = 14) -> pd.DataFrame:
    """GROUPED approximate COUNT(DISTINCT user_id) BY event_type via
    mergeable per-group HLL sketches: each batch reduces to one fixed
    2**p-byte register array per group present, the per-group fold happens
    in a distributed ``groupby(key)`` (the driver sees one row per group).
    Registers are deterministic per value multiset, so batch splits and
    retries cannot change the estimate.

    Not SQL-oracle-paired (different sketch than DuckDB); gated by pytest
    accuracy (3σ per group vs exact) + register determinism, and the
    rows-only driver check."""
    from cassandra_data_migrator_ray.functions.sketch import (
        hll_estimate,
        hll_merge,
        hll_partial_grouped,
    )

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pd.DataFrame:
        return hll_partial_grouped(
            t["event_type"].to_numpy(zero_copy_only=False),
            t["user_id"].to_numpy(zero_copy_only=False),
            p=p,
        )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        merged = hll_merge(*(np.frombuffer(b, dtype=np.uint8) for b in group["regs"]))
        return pd.DataFrame(
            {
                "event_type": group["key"].iloc[:1],
                "n_users_approx": np.array(
                    [round(hll_estimate(merged))], dtype=np.int64
                ),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("key")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_type", ignore_index=True)


def conversation_stats(sf_dir: str) -> pd.DataFrame:
    """Lake → downstream-analytics integration: replay the change stream into
    a lake, then compute per-conversation transcript statistics from the
    STREAMING lake read (column-pruned) — turn count, assistant-turn count,
    total text chars, last event-time.

    All measures are algebraic (count/sum/max), so per-batch partials fold
    exactly regardless of how conversations split across lake blocks; the
    shuffle carries one row per (batch, conversation)."""
    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_lake

    import shutil

    cache = _gen_cached_events(sf_dir)
    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(cache, lake, num_parts=NUM_PARTS, salt=2)
        ds = read_lake(lake, columns=["conv_id", "role", "text", "ts"])
        nparts = _scaled_nparts(ds)

        def partial(t: pa.Table) -> pd.DataFrame:
            df = pd.DataFrame(
                {
                    "conv_id": t["conv_id"].to_pandas(),
                    "is_assistant": pc.equal(t["role"], "assistant")
                    .to_pandas()
                    .fillna(False)
                    .to_numpy(dtype=np.int64),
                    "chars": pc.coalesce(
                        pc.utf8_length(t["text"]), pa.scalar(0, pa.int32())
                    )
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    "ts": t["ts"].to_numpy(zero_copy_only=False),
                }
            )
            g = df.groupby("conv_id", sort=False).agg(
                n_turns=("conv_id", "size"),
                n_assistant=("is_assistant", "sum"),
                chars=("chars", "sum"),
                last_ts=("ts", "max"),
            )
            g = g.reset_index()
            from pandas.util import hash_array

            g["__part"] = (
                hash_array(g["conv_id"].to_numpy(dtype=object), categorize=False)
                % np.uint64(nparts)
            ).astype(np.int32)
            return g

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            # one vectorized fold per hash partition, not per conversation
            a = g.groupby("conv_id", sort=False).agg(
                n_turns=("n_turns", "sum"),
                n_assistant=("n_assistant", "sum"),
                chars=("chars", "sum"),
                last_ts=("last_ts", "max"),
            )
            return a.reset_index()

        out = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(fold, batch_format="pandas")
            .to_pandas()
        )
        if "__part" in out.columns:
            out = out.drop(columns="__part")
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    for c in ("n_turns", "n_assistant", "chars"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("conv_id", ignore_index=True)


def alter_schema_roundtrip(sf_dir: str) -> pd.DataFrame:
    """ALTER gate: replay the first half of the change stream, rename
    ``tool`` -> ``fn`` mid-stream (copy-on-write partition rewrite —
    the schema-evolution surface the reference delegates to CQL DDL),
    metadata-drop ``role`` and time-travel-check it, re-add it via a full
    compaction purge, then replay the second half under the new name with
    ``role`` restored.  The final public table must equal the cdc_replay
    fold with ``tool AS fn`` — except ``role``, which is null for every key
    not touched by the second half (the drop erased the first half's
    values), so the gate projects it out of the oracle-compared result;
    the exact no-resurrection null pattern is pinned by
    tests/test_alter_lake.py."""
    import shutil

    from cassandra_data_migrator_ray.pipelines.maintenance import (
        alter_lake,
        compact_lake,
    )
    from cassandra_data_migrator_ray.pipelines.replay import replay
    from cassandra_data_migrator_ray.sources.lake import read_lake_pandas

    cache = _gen_cached_events(sf_dir)
    h = _cache_event_count(cache) // 2

    def first_half(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t["event_seq"], h))

    def second_half(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["event_seq"], h))
        return t.rename_columns(
            ["fn" if c == "tool" else c for c in t.column_names]
        )

    lake = tempfile.mkdtemp(prefix="cdm_ray_lake_")
    try:
        replay(
            ray.data.read_parquet(cache).map_batches(
                first_half, batch_format="pyarrow"
            ),
            lake,
            num_parts=NUM_PARTS,
        )
        from cassandra_data_migrator_ray.state.manifest import Manifest

        v0 = Manifest.load(lake).version
        alter_lake(lake, rename={"tool": "fn"}, drop=["role"])
        # pre-ALTER snapshot still reads the old schema and values
        old = read_lake_pandas(lake, version=v0)
        assert "tool" in old.columns and "role" in old.columns
        # combined rename+drop rewrote partitions: name free immediately
        replay(
            ray.data.read_parquet(cache).map_batches(
                second_half, batch_format="pyarrow"
            ),
            lake,
        )
        out = read_lake_pandas(lake)
        # role was re-added by the second half: keys whose latest role cell
        # arrived before the drop must be null (no resurrection)
        assert "role" in out.columns
        out = out.drop(columns=["role"])
    finally:
        shutil.rmtree(lake, ignore_errors=True)
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)
