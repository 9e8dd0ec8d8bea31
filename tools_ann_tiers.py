"""Unified ANN serving-tier ledger: recall@10, index bytes/vector, and
relative scan cost for EVERY tier the engine ships, measured on the
same fixture with the same 50 held-out queries — the one-table answer
to "which index do I reach for at 100 TB".

NumPy mirrors of the exact engine formulas (same seeds/codebooks as
operators/similarity.py and the registered queries):
- exact cosine scan (the baseline, recall 1.0 by definition)
- JL random projection 16d (squared-mix +-1 matrix), raw top-10 and
  the registered coarse-to-fine 100-candidate rerank
- matryoshka prefix 16d, raw and reranked
- SQ8 decoded-dot full scan (vs exact-dot truth: SQ8 approximates the
  dot product, so that is the honest reference)
- IVF-Flat 1/2/4 probes of 16 cells (vs exact cosine)
- PQ m=8 ks=16 ADC full scan and IVF-PQ 2-probe (vs exact L2 — ADC
  approximates L2) [summarized from tools_ann_recall.py's formulas]

Feeds the "ANN serving tiers, one ledger" table in SCALE.md.
Usage: python tools_ann_tiers.py [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 50
K = 10

t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
V = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
n, dim = V.shape
norms = np.linalg.norm(V, axis=1)
queries = list(range(N_QUERIES))
print(f"{n} vectors, dim {dim}, {N_QUERIES} queries\n")


def exact_cos_topk(qi):
    sims = V @ V[qi] / (norms * norms[qi])
    return set([i for i in np.argsort(-sims, kind="stable") if i != qi][:K])


def exact_dot_topk(qi):
    s = V @ V[qi]
    return set([i for i in np.argsort(-s, kind="stable") if i != qi][:K])


def mean_recall(fn, truth_fn):
    rs = []
    for qi in queries:
        rs.append(len(fn(qi) & truth_fn(qi)) / K)
    return float(np.mean(rs))


# --- JL signs: exact engine formula
P, M_, A_ = 1_000_000_007, 1_000_003, 12_345


def sign(x: int) -> float:
    h = ((x % P) * M_ + A_) % P
    return -1.0 if ((h * h) % P) * 2 >= P else 1.0


S16 = np.array([[sign(j * dim + d) for d in range(dim)] for j in range(16)])
RP = V @ S16.T
rp_norms = np.linalg.norm(RP, axis=1)
PRE = V[:, :16]
pre_norms = np.linalg.norm(PRE, axis=1)


def coarse_topm(space, snorms, qi, m):
    sims = space @ space[qi] / (snorms * snorms[qi])
    return [i for i in np.argsort(-sims, kind="stable") if i != qi][:m]


def rerank(space, snorms, qi, m=100):
    cand = coarse_topm(space, snorms, qi, m)
    sims = V[cand] @ V[qi] / (norms[cand] * norms[qi])
    order = np.argsort(-sims, kind="stable")
    return set(np.array(cand)[order][:K])


# --- SQ8: exact engine formula (min-max codes, decoded micro dot)
mn, mx = V.min(0), V.max(0)
rng = np.where(mx == mn, 1.0, mx - mn)
codes = np.clip(np.floor((V - mn) / rng * 255 + 0.5), 0, 255)
codes = np.where((mx == mn)[None, :], 0, codes)
dec = np.floor((mn + codes * (mx - mn) / 255) * 1e6 + 0.5)


def sq8_topk(qi):
    s = dec @ dec[qi]
    return set([i for i in np.argsort(-s, kind="stable") if i != qi][:K])


# --- IVF-Flat
cents = V[:16]
d2c = (V * V).sum(1)[:, None] - 2 * V @ cents.T + (cents * cents).sum(1)[None, :]
assign = d2c.argmin(1)


def ivf_topk(qi, probes):
    cells = np.argsort(d2c[qi], kind="stable")[:probes]
    mask = np.isin(assign, cells)
    idx = np.where(mask)[0]
    sims = V[idx] @ V[qi] / (norms[idx] * norms[qi])
    order = np.argsort(-sims, kind="stable")
    return set([i for i in idx[order] if i != qi][:K])


rows = []
rows.append(("exact cosine scan", 8 * dim, "1.00x full-dim", 1.0))
rows.append(
    ("RP-16 raw top-10", 8 * dim, "0.25x (16d scan)",
     mean_recall(lambda qi: set(coarse_topm(RP, rp_norms, qi, K)), exact_cos_topk))
)
rows.append(
    ("RP-16 -> 100 -> exact rerank", 8 * dim, "0.25x + 100 exact",
     mean_recall(lambda qi: rerank(RP, rp_norms, qi), exact_cos_topk))
)
rows.append(
    ("MRL prefix-16 raw top-10", 8 * dim, "0.25x (16d scan)",
     mean_recall(lambda qi: set(coarse_topm(PRE, pre_norms, qi, K)), exact_cos_topk))
)
rows.append(
    ("MRL prefix-16 -> 100 -> rerank", 8 * dim, "0.25x + 100 exact",
     mean_recall(lambda qi: rerank(PRE, pre_norms, qi), exact_cos_topk))
)
rows.append(
    ("SQ8 decoded-dot scan (vs exact dot)", dim, "1.00x int8",
     mean_recall(sq8_topk, exact_dot_topk))
)
for p in (1, 2, 4):
    rows.append(
        (f"IVF-Flat 16 cells, {p} probe(s)", 8 * dim + 8,
         f"~{p}/16 of corpus", mean_recall(lambda qi, p=p: ivf_topk(qi, p), exact_cos_topk))
    )


def ivfsq_topk(qi, probes):
    cells = np.argsort(d2c[qi], kind="stable")[:probes]
    idx = np.where(np.isin(assign, cells))[0]
    s = dec[idx] @ dec[qi]
    order = np.argsort(-s, kind="stable")
    return set([i for i in idx[order] if i != qi][:K])


# truth for IVF-SQ8 = exact dot restricted to nothing (global): the
# composition loses from BOTH pruning and quantization; score against
# the global exact-dot ranking to show the combined effect
for p in (1, 2):
    rows.append(
        (f"IVF-SQ8 16 cells, {p} probe(s)", dim + 8,
         f"~{p}/16 corpus, int8",
         mean_recall(lambda qi, p=p: ivfsq_topk(qi, p), exact_dot_topk))
    )

# --- trained PQ ks=256 with and without the OPQ-style rotation
# (round 7): NumPy mirror of pq_codebooks_from_seeds -> one Lloyd
# step -> encode -> ADC, on the native fixture AND an anisotropic
# variant (per-subspace variance ramp) — the regime rotation exists
# for. Orthogonality preserves exact-L2 truth, so truth is computed
# per-space and stays comparable.
import sys as _sys

_sys.path.insert(0, "/root/repo")
from bo_sql_spark.operators.similarity import seeded_rotation_micro

ROT = np.array(seeded_rotation_micro()) / 1e6
M_PQ, DSUB, KS_PQ = 8, 8, 256


def pq256_recall(X):
    cbs, codes_cols = [], []
    for s in range(M_PQ):
        sl = X[:, s * DSUB:(s + 1) * DSUB]
        cb = X[:KS_PQ, s * DSUB:(s + 1) * DSUB].copy()
        a = ((sl[:, None, :] - cb[None, :, :]) ** 2).sum(-1).argmin(1)
        for c in range(KS_PQ):
            mask = a == c
            if mask.any():
                cb[c] = sl[mask].mean(0)
        cbs.append(cb)
        codes_cols.append(((sl[:, None, :] - cb[None, :, :]) ** 2).sum(-1).argmin(1))
    codes = np.stack(codes_cols, axis=1)
    rs = []
    for qi in queries:
        d2 = ((X - X[qi]) ** 2).sum(1)
        want = set([i for i in np.argsort(d2, kind="stable") if i != qi][:K])
        lut = np.stack(
            [((cbs[s] - X[qi, s * DSUB:(s + 1) * DSUB]) ** 2).sum(1) for s in range(M_PQ)]
        )
        adc = lut[np.arange(M_PQ)[None, :], codes].sum(1)
        got = set([i for i in np.argsort(adc, kind="stable") if i != qi][:K])
        rs.append(len(got & want) / K)
    return float(np.mean(rs))


W_ANISO = np.repeat([3.0, 1.5, 1.0, 0.7, 0.5, 0.4, 0.3, 0.25], dim // 8)
VA = V * W_ANISO
rows.append(("PQ trained ks=256 (vs exact L2)", M_PQ, "LUT scan", pq256_recall(V)))
rows.append(
    ("OPQ-rotated PQ ks=256 (vs exact L2)", M_PQ, "LUT scan (+rotate at encode)",
     pq256_recall(V @ ROT.T))
)
rows.append(
    ("PQ ks=256, ANISOTROPIC variant", M_PQ, "LUT scan", pq256_recall(VA))
)
rows.append(
    ("OPQ-rotated PQ ks=256, ANISOTROPIC", M_PQ, "LUT scan (+rotate)",
     pq256_recall(VA @ ROT.T))
)

print("| tier | index bytes/vec | scan cost | recall@10 |")
print("|---|---|---|---|")
for name, bytes_, cost, r in rows:
    print(f"| {name} | {bytes_} | {cost} | {r:.2f} |")
