"""Multi-device semantics: training on an 8-device mesh must match
single-device training (synchronous SPMD has no Hogwild-style
nondeterminism — determinism is a test asset, SURVEY.md §5)."""

import jax
import numpy as np
import pytest

from cymf_tpu import BPR, WMF
from cymf_tpu.dataset import SyntheticImplicitDataset
from cymf_tpu.parallel import MeshContext, use_mesh


@pytest.fixture(scope="module")
def data():
    return SyntheticImplicitDataset(num_user=96, num_item=64, rank=4,
                                    density=0.15, seed=13)


def _fit_bpr(data, devices):
    with use_mesh(MeshContext.create(devices)):
        m = BPR(num_components=8, learning_rate=0.02, batch_size=128)
        m.fit(data.train, num_epochs=5, verbose=False, seed=3)
        return m.W.copy(), m.H.copy()


def test_bpr_same_result_1dev_vs_8dev(data):
    W1, H1 = _fit_bpr(data, jax.devices()[:1])
    W8, H8 = _fit_bpr(data, jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)


def test_wmf_same_result_1dev_vs_8dev(data):
    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = WMF(num_components=8, chunk_size=32)
            m.fit(data.train, num_epochs=2, verbose=False)
            return m.W.copy(), m.H.copy()

    W1, H1 = run(jax.devices()[:1])
    W8, H8 = run(jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(len(jax.devices()))


def test_graft_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_relmf_same_result_1dev_vs_8dev(data):
    from cymf_tpu import RelMF

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = RelMF(num_components=6, batch_size=256)
            m.fit(data.train, num_epochs=2, verbose=False, seed=5)
            return m.W.copy()

    W1 = run(jax.devices()[:1])
    W8 = run(jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)


def test_glove_same_result_1dev_vs_8dev():
    from scipy import sparse
    from cymf_tpu import GloVe
    rng = np.random.default_rng(4)
    dense = np.triu(rng.integers(0, 20, (24, 24))
                    * (rng.random((24, 24)) < 0.3))
    X = sparse.csr_matrix(dense)

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            np.random.seed(11)
            m = GloVe(num_components=8, batch_size=64)
            m.fit(X, num_epochs=5)
            return m.W.copy()

    W1 = run(jax.devices()[:1])
    W8 = run(jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
