"""Synthetic implicit-feedback data for tests and benchmarks.

The reference has nothing like this — its single test downloads the real
ml-100k at import time (`/root/reference/tests/test_dataset.py:13`), which is
network-dependent and slow.  Synthetic low-rank data lets the whole suite run
hermetically and gives the benchmark ML-20M-*shaped* workloads without the
raw files.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import sparse
from sklearn.model_selection import train_test_split

from .implicit import ImplicitFeedbackDataset


def synthetic_interactions(num_user: int, num_item: int, rank: int = 8,
                           density: float = 0.05, seed: int = 0,
                           noise: float = 0.2) -> sparse.csr_matrix:
    """Binary interaction matrix sampled from a planted low-rank model.

    Scores S = U V^T + noise; the top ``density * num_user * num_item`` cells
    become positives.  Guarantees every user has at least one interaction.
    """
    rng = np.random.default_rng(seed)
    Uf = rng.normal(size=(num_user, rank)) / np.sqrt(rank)
    Vf = rng.normal(size=(num_item, rank)) / np.sqrt(rank)
    scores = Uf @ Vf.T + noise * rng.normal(size=(num_user, num_item))
    nnz = max(int(density * num_user * num_item), num_user)
    thresh = np.partition(scores.ravel(), -nnz)[-nnz]
    X = (scores >= thresh).astype(np.float64)
    # ensure no empty users (the reference datasets have none either)
    empty = X.sum(axis=1) == 0
    X[empty, np.argmax(scores[empty], axis=1)] = 1.0
    return sparse.csr_matrix(X)


class SyntheticImplicitDataset(ImplicitFeedbackDataset):
    """Train/valid/test splits over synthetic interactions, with the same
    90/10/10 protocol as the MovieLens loader (`movielens.py:65-66`)."""

    def __init__(self, num_user: int = 200, num_item: int = 100,
                 rank: int = 8, density: float = 0.05, seed: int = 0):
        self.num_user = num_user
        self.num_item = num_item
        X = synthetic_interactions(num_user, num_item, rank, density, seed)
        coo = X.tocoo()
        idx = np.arange(coo.nnz)
        tr, te = train_test_split(idx, test_size=0.1, random_state=12345)
        tr, va = train_test_split(tr, test_size=0.1, random_state=12345)

        def to_lil(sel):
            m = sparse.coo_matrix(
                (coo.data[sel], (coo.row[sel], coo.col[sel])),
                shape=(num_user, num_item))
            return m.tolil()

        self.train = to_lil(tr)
        self.valid = to_lil(va)
        self.test = to_lil(te)
        self._finalize()


def bench_interactions(num_user: int, num_item: int, nnz: int,
                       seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(users, items) interaction arrays with a power-law-ish user degree
    distribution, ML-20M-shaped, for throughput benchmarks (no low-rank
    structure needed to measure interactions/sec)."""
    rng = np.random.default_rng(seed)
    users = rng.zipf(1.3, size=nnz * 2) % num_user
    users = users[:nnz].astype(np.int32)
    items = rng.integers(0, num_item, size=nnz).astype(np.int32)
    return users, items
