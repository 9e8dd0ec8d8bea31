"""Measure ANN recall of the repo's deterministic IVF/PQ/IVF-PQ schemes.

NumPy mirror of operators/similarity.py (same seeds: centroids =
vectors 0..15, PQ codebooks = seed vectors' subspace slices, m=8
subspaces of 8 dims, expanded-L2 assignment) over the sf embeddings
fixture. Feeds the "ANN recall, measured" table in SCALE.md.

Cosine-path methods (IVF-Flat: exact cosine inside probed cells) are
scored against exact-cosine top-10; quantized-distance methods (PQ,
IVF-PQ: ADC approximates L2) are scored against exact-L2 top-10, which
isolates the quantization loss from the metric mismatch.

Usage: python tools_ann_recall.py [sf_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_QUERIES = 50
K = 10
M, DSUB, KS, N_CELLS = 8, 8, 16, 16

t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
ids = np.asarray(t["vec_id"])
V = np.stack([np.asarray(x, dtype=np.float64) for x in t["embedding"].to_pylist()])
n, dim = V.shape
print(f"{n} vectors, dim {dim}")

cents = V[:N_CELLS]
d2_cells = (V * V).sum(1)[:, None] - 2 * V @ cents.T + (cents * cents).sum(1)[None, :]
assign = d2_cells.argmin(1)

norms = np.linalg.norm(V, axis=1)
queries = list(range(N_QUERIES))


def exact_cosine_topk(qi):
    sims = V @ V[qi] / (norms * norms[qi])
    order = [i for i in np.argsort(-sims, kind="stable") if i != qi]
    return set(order[:K])


def exact_l2_topk(qi):
    d = ((V - V[qi]) ** 2).sum(1)
    order = [i for i in np.argsort(d, kind="stable") if i != qi]
    return set(order[:K])


def recall(got: set, want: set) -> float:
    return len(got & want) / len(want)


# ---- IVF-Flat, exact cosine inside probed cells (vs exact cosine)
for probes in (1, 4):
    rs, frac = [], []
    for qi in queries:
        cell_order = np.argsort(d2_cells[qi], kind="stable")[:probes]
        cand = [i for i in range(n) if assign[i] in set(cell_order) and i != qi]
        sims = [(-(V[i] @ V[qi] / (norms[i] * norms[qi])), i) for i in cand]
        got = set(i for _, i in sorted(sims)[:K])
        rs.append(recall(got, exact_cosine_topk(qi)))
        frac.append(len(cand) / n)
    print(f"IVF-Flat {N_CELLS} cells, {probes} probe(s): recall@10 "
          f"{np.mean(rs):.2f}, scan {np.mean(frac)*100:.1f}%")

# ---- PQ codebooks from seed slices; encode; ADC (vs exact L2)
CB = np.stack([cents[:, s * DSUB:(s + 1) * DSUB] for s in range(M)])  # (M,KS,DSUB)
codes = np.zeros((n, M), dtype=np.int64)
for s in range(M):
    sub = V[:, s * DSUB:(s + 1) * DSUB]
    d2 = (sub * sub).sum(1)[:, None] - 2 * sub @ CB[s].T + (CB[s] * CB[s]).sum(1)[None, :]
    codes[:, s] = d2.argmin(1)

rs = []
for qi in queries:
    lut = np.zeros((M, KS))
    for s in range(M):
        qs = V[qi, s * DSUB:(s + 1) * DSUB]
        lut[s] = ((CB[s] - qs) ** 2).sum(1)
    adc = lut[np.arange(M)[None, :], codes].sum(1)
    order = [i for i in np.argsort(adc, kind="stable") if i != qi]
    rs.append(recall(set(order[:K]), exact_l2_topk(qi)))
print(f"PQ m={M} ks={KS} (full scan, ADC): recall@10 {np.mean(rs):.2f}, "
      f"bytes/vec {M} (vs {dim*4} raw = {dim*4//M}x)")

# ---- PQ with Lloyd-trained codebooks (what ivf_train-per-subspace buys)
def lloyd(data, seeds, iters=10):
    C = seeds.copy()
    for _ in range(iters):
        d2 = (data * data).sum(1)[:, None] - 2 * data @ C.T + (C * C).sum(1)[None, :]
        a = d2.argmin(1)
        for c in range(len(C)):
            mask = a == c
            if mask.any():
                C[c] = data[mask].mean(0)
    return C


CBT = np.stack([lloyd(V[:, s * DSUB:(s + 1) * DSUB], CB[s]) for s in range(M)])
tcodes = np.zeros((n, M), dtype=np.int64)
for s in range(M):
    sub = V[:, s * DSUB:(s + 1) * DSUB]
    d2 = (sub * sub).sum(1)[:, None] - 2 * sub @ CBT[s].T + (CBT[s] * CBT[s]).sum(1)[None, :]
    tcodes[:, s] = d2.argmin(1)
rs = []
for qi in queries:
    lut = np.zeros((M, KS))
    for s in range(M):
        qs = V[qi, s * DSUB:(s + 1) * DSUB]
        lut[s] = ((CBT[s] - qs) ** 2).sum(1)
    adc = lut[np.arange(M)[None, :], tcodes].sum(1)
    order = [i for i in np.argsort(adc, kind="stable") if i != qi]
    rs.append(recall(set(order[:K]), exact_l2_topk(qi)))
print(f"PQ m={M} ks={KS} TRAINED (10 Lloyd iters/subspace): recall@10 {np.mean(rs):.2f}")


# ---- IVF-PQ: residual codebooks, per-cell ADC inside probed cells (vs exact L2)
# seed the residual codebooks PAST the centroid ids (ids KS..2*KS) —
# the centroid seeds' own residuals are zero vectors (degenerate book)
R = V - cents[assign]
CBR = np.stack([R[KS:2 * KS, s * DSUB:(s + 1) * DSUB] for s in range(M)])
rcodes = np.zeros((n, M), dtype=np.int64)
for s in range(M):
    sub = R[:, s * DSUB:(s + 1) * DSUB]
    d2 = (sub * sub).sum(1)[:, None] - 2 * sub @ CBR[s].T + (CBR[s] * CBR[s]).sum(1)[None, :]
    rcodes[:, s] = d2.argmin(1)

for probes in (2, 4):
    rs, frac = [], []
    for qi in queries:
        cell_order = np.argsort(d2_cells[qi], kind="stable")[:probes]
        cand = [i for i in range(n) if assign[i] in set(cell_order) and i != qi]
        scores = []
        for c in cell_order:
            qr = V[qi] - cents[c]
            lut = np.zeros((M, KS))
            for s in range(M):
                qs = qr[s * DSUB:(s + 1) * DSUB]
                lut[s] = ((CBR[s] - qs) ** 2).sum(1)
            for i in cand:
                if assign[i] == c:
                    scores.append((lut[np.arange(M), rcodes[i]].sum(), i))
        got = set(i for _, i in sorted(scores)[:K])
        rs.append(recall(got, exact_l2_topk(qi)))
        frac.append(len(cand) / n)
    print(f"IVF-PQ {N_CELLS} cells, {probes} probes, m={M}: recall@10 "
          f"{np.mean(rs):.2f}, scan {np.mean(frac)*100:.1f}%")


# ---- IVF-PQ with a Lloyd-TRAINED residual codebook (train_steps=1,
# fixed-point means — mirrors ivfpq_encode(train_steps=1))
def fixed_point_lloyd_step(data, C):
    d2 = (data * data).sum(1)[:, None] - 2 * data @ C.T + (C * C).sum(1)[None, :]
    a = d2.argmin(1)
    out = C.copy()
    kept = []
    for c in range(len(C)):
        mask = a == c
        if mask.any():
            micros = np.floor(data[mask] * 1e6 + 0.5).sum(0)
            out[c] = np.floor(micros / mask.sum() + 0.5) / 1e6
            kept.append(c)
    return out[kept], np.array(kept)


CBRT, keptmaps = [], []
for s in range(M):
    trained, kept = fixed_point_lloyd_step(R[:, s * DSUB:(s + 1) * DSUB], CBR[s])
    CBRT.append(trained)
    keptmaps.append(kept)
rtcodes = np.zeros((n, M), dtype=np.int64)
for s in range(M):
    sub = R[:, s * DSUB:(s + 1) * DSUB]
    d2 = (sub * sub).sum(1)[:, None] - 2 * sub @ CBRT[s].T + (CBRT[s] * CBRT[s]).sum(1)[None, :]
    rtcodes[:, s] = d2.argmin(1)

for probes in (2, 4):
    rs = []
    for qi in queries:
        cell_order = np.argsort(d2_cells[qi], kind="stable")[:probes]
        cand = [i for i in range(n) if assign[i] in set(cell_order) and i != qi]
        scores = []
        for c in cell_order:
            qr = V[qi] - cents[c]
            for i in cand:
                if assign[i] == c:
                    d = 0.0
                    for s in range(M):
                        qs = qr[s * DSUB:(s + 1) * DSUB]
                        cw = CBRT[s][rtcodes[i, s]]
                        d += ((cw - qs) ** 2).sum()
                    scores.append((d, i))
        got = set(i for _, i in sorted(scores)[:K])
        rs.append(recall(got, exact_l2_topk(qi)))
    print(f"IVF-PQ {N_CELLS} cells, {probes} probes, m={M} TRAINED residual "
          f"books (1 step): recall@10 {np.mean(rs):.2f}")
