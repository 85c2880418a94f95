"""ExpoMF tests: exact numerical parity against a numpy implementation of
the reference EM equations (`/root/reference/cymf/expomf.pyx:101-204`), plus
convergence.  The numpy replica uses the same (paper-correct) Gaussian
prefactor as the trainer; the reference's precedence bug is NOT replicated
(see models/expomf.py docstring)."""

import numpy as np
import pytest
from scipy import sparse

from cymf_tpu import AoaEvaluator, ExpoMF
from cymf_tpu.dataset import SyntheticImplicitDataset


def _numpy_expomf_epochs(X, W, H, lam_y, wd, prefactor, epochs):
    """Dense-matrix implementation of the EM loop (what the reference does,
    but with explicit loops replaced by numpy and the fixed prefactor)."""
    W, H = W.copy(), H.copy()
    U, I = X.shape
    K = W.shape[1]
    Xd = X.toarray()
    mu = np.ones(I) * 0.01

    def als(csr, Exposure, Xtab, Y):
        for r in range(csr.shape[0]):
            idx = csr.indices[csr.indptr[r]:csr.indptr[r + 1]]
            if len(idx) == 0:
                Xtab[r] = 0.0
                continue
            A = (wd / lam_y) * np.eye(K) \
                + lam_y * (Y * Exposure[r][:, None]).T @ Y
            b = lam_y * np.sum(Y[idx] * Exposure[r][idx][:, None], axis=0)
            Xtab[r] = np.linalg.solve(A, b)

    Xt = X.T.tocsr()
    for _ in range(epochs):
        n_ui = prefactor * np.exp(-lam_y * (W @ H.T) ** 2 / 2.0)
        A = (n_ui + 1e-8) / (n_ui + 1e-8 + (1 - mu) / mu)
        A[Xd.nonzero()] = 1.0
        Exposure = A
        als(X, Exposure, W, H)
        als(Xt, Exposure.T, H, W)
        mu = (1.0 + Exposure.sum(axis=0) - 1.0) / (1.0 + 1.0 + U - 2.0)
    return W, H, mu


@pytest.fixture(scope="module")
def data():
    return SyntheticImplicitDataset(num_user=60, num_item=40, rank=4,
                                    density=0.15, seed=9)


def test_expomf_matches_numpy_reference_equations(data):
    X = sparse.csr_matrix(data.train).astype(np.float64)
    model = ExpoMF(num_components=6, lam_y=1.0, weight_decay=0.05,
                   chunk_size=16)
    model.fit(X, num_epochs=2, verbose=False)

    np.random.seed(4321)
    W0 = np.random.randn(X.shape[0], 6) * 0.01
    H0 = np.random.randn(X.shape[1], 6) * 0.01
    W_ref, H_ref, mu_ref = _numpy_expomf_epochs(
        X, W0, H0, 1.0, 0.05, model.prefactor, 2)

    np.testing.assert_allclose(model.W, W_ref, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(model.H, H_ref, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(model.mu, mu_ref, rtol=1e-3, atol=1e-5)


def test_expomf_improves_ranking(data):
    ev = AoaEvaluator(data.test, data.train, metrics=["DCG"], k=5)
    model = ExpoMF(num_components=8, weight_decay=0.01)
    np.random.seed(4321)
    W0 = np.random.randn(data.num_user, 8) * 0.01
    H0 = np.random.randn(data.num_item, 8) * 0.01
    before = ev.evaluate(W0, H0)["DCG@5"]
    model.fit(data.train, num_epochs=6, verbose=False)
    after = ev.evaluate(model.W, model.H)["DCG@5"]
    assert after > before + 0.05, (before, after)


def test_expomf_empty_rows_zeroed():
    X = np.zeros((5, 4))
    X[0, 0] = 1.0
    X[1, 2] = 1.0
    model = ExpoMF(num_components=3, chunk_size=4)
    model.fit(sparse.csr_matrix(X), num_epochs=1, verbose=False)
    np.testing.assert_allclose(model.W[[2, 3, 4]], 0.0)
    np.testing.assert_allclose(model.H[[1, 3]], 0.0)


def test_expomf_early_stopping(data):
    ev = AoaEvaluator(data.valid, data.train, metrics=["DCG"], k=5)
    model = ExpoMF(num_components=8)
    model.fit(data.train, num_epochs=25, valid_evaluator=ev,
              early_stopping=True, verbose=False)
    restored = ev.evaluate(model.W, model.H)["DCG@5"]
    assert restored == pytest.approx(model.valid_dcg, abs=1e-6)
