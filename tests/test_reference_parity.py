"""Algorithmic parity: synchronous-batch trainers vs a sequential per-sample
replica of the reference algorithms.

Network access is unavailable in CI, so ml-100k golden numbers can't be
reproduced here; instead we implement the reference's *algorithm* (from the
equations at `/root/reference/cymf/model.pyx` + `optimizer.pyx`, per-sample
sequential — the single-thread limit of Hogwild) in numpy and check that our
vectorized minibatch trainers reach the same ranking quality on synthetic
data.  This is the convergence-parity gate SURVEY.md §7 calls for.
"""

import numpy as np
import pytest
from scipy import sparse

from cymf_tpu import BPR, AoaEvaluator
from cymf_tpu.dataset import SyntheticImplicitDataset


def _sequential_bpr(X, K, lr, wd, num_epochs, seed=4321, sample_seed=1234):
    """Single-thread per-sample BPR-Adam exactly as the reference computes it
    (model.pyx:47-87, optimizer.pyx:126-160), written from the equations."""
    U, I = X.shape
    np.random.seed(seed)
    W = np.random.uniform(-0.1, 0.1, (U, K)) / K
    H = np.random.uniform(-0.1, 0.1, (I, K)) / K
    mW = np.zeros_like(W); vW = np.zeros_like(W)
    mH = np.zeros_like(H); vH = np.zeros_like(H)
    b1, b2, eps = 0.9, 0.999, 1e-8

    users, positives = X.nonzero()
    pos_sets = [set(X[u].indices) for u in range(U)]
    rng = np.random.default_rng(sample_seed)

    def adam(table, m, v, row, g):
        m[row] = b1 * m[row] + (1 - b1) * g
        v[row] = b2 * v[row] + (1 - b2) * g * g
        table[row] -= lr * (m[row] / (1 - b1)) / (
            np.sqrt(v[row] / (1 - b2)) + eps)

    for _ in range(num_epochs):
        for u, i in zip(users, positives):
            j = rng.integers(0, I)
            if j in pos_sets[u]:
                continue
            x = W[u] @ (H[i] - H[j])
            sig = 1.0 / (1.0 + np.exp(x))
            g_wu = -(sig * (H[i] - H[j]) - wd * W[u])
            g_hi = -(sig * W[u] - wd * H[i])
            g_hj = -(-sig * W[u] - wd * H[j])
            adam(W, mW, vW, u, g_wu)
            adam(H, mH, vH, i, g_hi)
            adam(H, mH, vH, j, g_hj)
    return W, H


@pytest.mark.slow
def test_bpr_batch_matches_sequential_reference_quality():
    data = SyntheticImplicitDataset(num_user=150, num_item=100, rank=4,
                                    density=0.12, seed=21)
    X = sparse.csr_matrix(data.train).astype(np.float64)
    ev = AoaEvaluator(data.test, data.train, k=5)

    K, lr, wd, epochs = 10, 0.01, 0.01, 60
    W_ref, H_ref = _sequential_bpr(X, K, lr, wd, epochs)
    ref = ev.evaluate(W_ref, H_ref)

    model = BPR(num_components=K, learning_rate=lr, weight_decay=wd,
                batch_size=256)
    model.fit(X, num_epochs=epochs, verbose=False)
    got = ev.evaluate(model.W, model.H)

    # same algorithm family, different update schedule (sync minibatch vs
    # per-sample): quality must match within a small margin
    for key in ("DCG@5", "Recall@5", "MAP@5"):
        assert got[key] > ref[key] - 0.03, (key, got[key], ref[key])
