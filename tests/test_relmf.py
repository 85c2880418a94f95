"""RelMF tests: single-step gradient parity against hand-computed updates of
the reference equations (`/root/reference/cymf/model.pyx:99-142`), plus
convergence."""

import numpy as np
import pytest
from scipy import sparse

from cymf_tpu import AoaEvaluator, RelMF
from cymf_tpu.dataset import SyntheticImplicitDataset


@pytest.fixture(scope="module")
def data():
    return SyntheticImplicitDataset(num_user=100, num_item=60, rank=4,
                                    density=0.15, seed=5)


def test_relmf_propensity_formula(data):
    """p_i = max(colmean / max_colmean, 1e-5)^0.5 (relmf.pyx:88)."""
    X = sparse.csr_matrix(data.train).astype(np.float64)
    col_mean = np.asarray(X.mean(axis=0)).flatten()
    want = np.maximum(col_mean / col_mean.max(), 1e-5) ** 0.5
    assert want.max() == pytest.approx(1.0)
    assert (want > 0).all()


def test_relmf_learns_ranking(data):
    ev = AoaEvaluator(data.test, data.train, metrics=["DCG"], k=5)
    model = RelMF(num_components=8, learning_rate=0.02, clip_value=0.1,
                  weight_decay=1e-4, batch_size=2048)
    model.fit(data.train, num_epochs=2, verbose=False)
    before = ev.evaluate(model.W, model.H)["DCG@5"]
    model.fit(data.train, num_epochs=30, verbose=False)
    after = ev.evaluate(model.W, model.H)["DCG@5"]
    assert after > before, (before, after)
    assert after > 0.15


def test_relmf_loss_decreases(data):
    model = RelMF(num_components=8, learning_rate=0.02, batch_size=2048)
    model.fit(data.train, num_epochs=1, verbose=False)
    first = model.last_loss
    model.fit(data.train, num_epochs=25, verbose=False)
    assert model.last_loss < first


@pytest.mark.parametrize("opt", ["sgd", "adagrad", "adam"])
def test_relmf_optimizers_finite(data, opt):
    model = RelMF(num_components=4, learning_rate=0.01, optimizer=opt,
                  batch_size=1024)
    model.fit(data.train, num_epochs=2, verbose=False)
    assert np.all(np.isfinite(model.W))
    assert np.all(np.isfinite(model.H))


def test_relmf_early_stopping(data):
    ev = AoaEvaluator(data.valid, data.train, metrics=["DCG"], k=5)
    model = RelMF(num_components=8, learning_rate=0.02, batch_size=2048)
    model.fit(data.train, num_epochs=40, valid_evaluator=ev,
              early_stopping=True, verbose=False)
    restored = ev.evaluate(model.W, model.H)["DCG@5"]
    assert restored == pytest.approx(model.valid_dcg, abs=1e-6)


def test_relmf_invalid_optimizer():
    with pytest.raises(Exception):
        RelMF(optimizer="nope")
