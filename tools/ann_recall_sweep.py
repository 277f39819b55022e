"""Recall@k vs nprobe sweep for IVF-PQ (round-5 verdict #7).

Corpus: 200k x 64-d clustered background (64 centers) + 32 queries each
with a planted graded neighborhood of k=10 vectors at noise sigma
0.01..0.10 (cosine ~0.99 down to ~0.78, kept above the ~0.56 background
max-cosine so the true top-10 has macroscopic margins). Truth =
brute-force exact cosine top-k. Reports
recall@10 for raw ADC and for exact-rerank (shortlist=100), plus search wall,
for nprobe in {1,2,4,8,16,32,64}. One JSON line to stdout.
"""
import json
import sys
import time

import numpy as np

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")

import pandas as pd

from cassandra_data_migrator_ray.pipelines.dataops import (
    ann_topk,
    ann_topk_ivfpq,
    build_ivfpq_index,
    encode_ivfpq,
)

rng = np.random.default_rng(17)
N, D, K = 200_000, 64, 10
n_q = 32
# Background: clustered (the regime IVF exists for).  Queries: RANDOM
# directions away from every cluster, each with a PLANTED graded
# neighborhood of K=10 vectors at cosine ~0.93-0.99 (noise sigma
# 0.10..0.40) vs a background max cosine of ~0.55 — macroscopic gaps, so
# recall@10 measures retrieval of a real neighborhood instead of
# arbitrary same-cluster near-ties (the round-4 near-tie trap: within a
# dense cluster ALL points are cosine ties and no quantizer preserves
# their ordering).
centers = rng.standard_normal((64, D)) * 4
vecs = centers[rng.integers(0, 64, N)] + rng.standard_normal((N, D)) * 0.35
queries = rng.standard_normal((n_q, D))
queries /= np.linalg.norm(queries, axis=1, keepdims=True)
# cos(q, q+g*s) ~ 1/sqrt(1+s^2*D): keep the WEAKEST plant's
# cosine (~0.78 at s=0.10, D=64) above the background max
# (~0.56 over 200k random directions) so all K plants are the
# true top-k with macroscopic margins
sigmas = np.linspace(0.01, 0.10, K)
pi = 0
for i in range(n_q):
    for j in range(K):
        vecs[pi] = queries[i] + rng.standard_normal(D) * sigmas[j]
        pi += 1

df = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64), "embedding": list(vecs)})
ds = ray.data.from_pandas(df).repartition(16).materialize()

t0 = time.time()
cents, books = build_ivfpq_index(
    ds, None, n_centroids=64, m=16, ksub=256, train_sample=20_000
)
t_train = time.time() - t0
t0 = time.time()
codes = encode_ivfpq(ds, (cents, books))
codes = codes.materialize()
t_enc = time.time() - t0

# exact truth
truth = ann_topk(ds, queries, k=K)
truth_sets = {
    q: set(g["vec_id"].astype(int)) for q, g in truth.groupby("query_id")
}

rows = []
for nprobe in (1, 2, 4, 8, 16, 32, 64):
    t0 = time.time()
    adc = ann_topk_ivfpq(codes, queries, (cents, books), k=K, nprobe=nprobe)
    w_adc = time.time() - t0
    t0 = time.time()
    rr = ann_topk_ivfpq(
        codes, queries, (cents, books), k=K, nprobe=nprobe,
        rerank=ds, shortlist=100,
    )
    w_rr = time.time() - t0

    def recall(res):
        got = {q: set(g["vec_id"].astype(int)) for q, g in res.groupby("query_id")}
        return float(
            np.mean([len(got.get(q, set()) & s) / K for q, s in truth_sets.items()])
        )

    rows.append(
        {
            "nprobe": nprobe,
            "recall_adc": round(recall(adc), 4),
            "recall_rerank": round(recall(rr), 4),
            "wall_adc_s": round(w_adc, 2),
            "wall_rerank_s": round(w_rr, 2),
        }
    )
    print(json.dumps(rows[-1]), flush=True)

out = {
    "corpus": {"n": N, "d": D, "n_centroids": 64, "m": 16, "ksub": 256},
    "k": K,
    "n_queries": n_q,
    "train_s": round(t_train, 1),
    "encode_s": round(t_enc, 1),
    "sweep": rows,
}
print("RESULT " + json.dumps(out))
ray.shutdown()
