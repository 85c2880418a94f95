"""Run-to-run determinism: synchronous SPMD replaces Hogwild's races, so
identical seeds must give identical results (SURVEY.md par.5: determinism
becomes a test asset)."""

import numpy as np

from cymf_tpu import BPR, RelMF
from cymf_tpu.dataset import SyntheticImplicitDataset


def _data():
    return SyntheticImplicitDataset(num_user=80, num_item=50, rank=4,
                                    density=0.15, seed=1)


def test_bpr_deterministic_across_runs():
    d = _data()
    runs = []
    for _ in range(2):
        m = BPR(num_components=6, learning_rate=0.02, batch_size=128)
        m.fit(d.train, num_epochs=5, verbose=False, seed=42)
        runs.append((m.W.copy(), m.H.copy()))
    np.testing.assert_array_equal(runs[0][0], runs[1][0])
    np.testing.assert_array_equal(runs[0][1], runs[1][1])


def test_bpr_seed_changes_stream():
    d = _data()
    m1 = BPR(num_components=6, batch_size=128)
    m1.fit(d.train, num_epochs=3, verbose=False, seed=1)
    m2 = BPR(num_components=6, batch_size=128)
    m2.fit(d.train, num_epochs=3, verbose=False, seed=2)
    assert not np.array_equal(m1.W, m2.W)


def test_relmf_deterministic_across_runs():
    d = _data()
    runs = []
    for _ in range(2):
        m = RelMF(num_components=6, batch_size=512)
        m.fit(d.train, num_epochs=2, verbose=False, seed=7)
        runs.append(m.W.copy())
    np.testing.assert_array_equal(runs[0], runs[1])


def test_evaluator_seed_reproducible():
    from cymf_tpu import AoaEvaluator
    d = _data()
    rng = np.random.default_rng(0)
    W = rng.normal(size=(80, 6))
    H = rng.normal(size=(50, 6))
    ev = AoaEvaluator(d.test, d.train, k=5)
    a = ev.evaluate(W, H, seed=3)
    b = ev.evaluate(W, H, seed=3)
    assert a == b
    # a different seed changes the negative draws; on this tiny catalog a
    # single pair of seeds can coincide on the coarse metric values, so
    # scan a few — at least one must differ
    assert any(
        any(a[k] != c[k] for k in a)
        for c in (ev.evaluate(W, H, seed=s) for s in range(4, 10)))
