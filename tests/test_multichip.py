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
    """entry() is the flagship packed v4 step (round 5): it returns the
    updated packed tables + the step loss."""
    import __graft_entry__ as g
    fn, args = g.entry()
    Wp, Hp, loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(Wp)).all()
    assert Wp.shape == args[0].shape and Hp.shape == args[1].shape


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


def test_evaluator_sharded_matches_single_device():
    """Sharded evaluation (users partitioned over the mesh) must equal the
    single-device result when metrics are insensitive to which negatives
    were drawn (every positive outscores every negative by construction);
    the per-device negative streams differ, the metrics must not."""
    from scipy import sparse

    from cymf_tpu.evaluation.evaluator import Evaluator

    rng = np.random.default_rng(5)
    U, I, K = 100, 60, 6
    X_test = sparse.random(U, I, density=0.05, random_state=2, format="csr",
                           data_rvs=lambda n: np.ones(n))
    X_train = sparse.random(U, I, density=0.1, random_state=3, format="csr",
                            data_rvs=lambda n: np.ones(n))
    W = rng.normal(size=(U, K))
    # all-ties scores: stable top-k ranks candidates in list order, i.e.
    # positives first — every metric becomes a deterministic function of
    # the per-user positive count, independent of the negative draws
    H = np.zeros((I, K))

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            ev = Evaluator(X_test, X_train, k=[1, 5], num_negatives=20)
            return ev.evaluate(W, H, seed=11)

    r1 = run(jax.devices()[:1])
    r8 = run(jax.devices())
    assert r1.keys() == r8.keys()
    for key in r1:
        np.testing.assert_allclose(r8[key], r1[key], rtol=1e-6, atol=1e-7)


def test_recommend_sharded_matches_single_device():
    """The distributed top-k (H row-sharded, per-shard top-k + merge) is
    bitwise-identical to the single-device full-row top-k, including
    exclusion masking and non-divisible catalog padding."""
    from scipy import sparse

    from cymf_tpu import recommend

    rng = np.random.default_rng(7)
    W = rng.normal(size=(37, 5))
    H = rng.normal(size=(53, 5))  # not divisible by 8 -> padded shards
    X = sparse.random(37, 53, density=0.2, random_state=1, format="csr",
                      data_rvs=lambda n: np.ones(n))

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            return recommend(W, H, k=7, exclude=X)

    s1, i1 = run(jax.devices()[:1])
    s8, i8 = run(jax.devices())
    np.testing.assert_array_equal(i8, i1)
    # score values may differ in the last ulp (different matmul shapes
    # compile to different reduction schedules); ranking must not
    np.testing.assert_allclose(s8, s1, rtol=1e-6)


def test_bpr_medium_shape_nondivisible_1dev_vs_8dev():
    """Medium-shape mesh run (thousands of rows, non-divisible by the
    device count everywhere: users, items, and batch) — the tiny-shape
    equality tests can't catch padding/donation bugs that only appear
    when shard boundaries fall mid-table."""
    d = SyntheticImplicitDataset(num_user=5003, num_item=2001, rank=6,
                                 density=0.005, seed=21)

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = BPR(num_components=12, learning_rate=0.02,
                    batch_size=4096)
            m.fit(d.train, num_epochs=3, verbose=False, seed=9)
            return m.W.copy(), m.H.copy()

    W1, H1 = run(jax.devices()[:1])
    W8, H8 = run(jax.devices())
    assert W1.shape == (5003, 12) and H1.shape == (2001, 12)
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)


def test_evaluator_sharded_medium_nondivisible():
    """Sharded evaluator at a user count that leaves a ragged last
    shard (1003 users over 8 devices) with mixed user degrees."""
    from scipy import sparse

    from cymf_tpu.evaluation.evaluator import Evaluator

    rng = np.random.default_rng(17)
    U, I, K = 1003, 517, 8
    X_test = sparse.random(U, I, density=0.02, random_state=4,
                           format="csr", data_rvs=lambda n: np.ones(n))
    X_train = sparse.random(U, I, density=0.05, random_state=5,
                            format="csr", data_rvs=lambda n: np.ones(n))
    W = rng.normal(size=(U, K))
    H = np.zeros((I, K))  # all-ties: metrics independent of neg draws

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            ev = Evaluator(X_test, X_train, k=[1, 5], num_negatives=30)
            return ev.evaluate(W, H, seed=2)

    r1 = run(jax.devices()[:1])
    r8 = run(jax.devices())
    for key in r1:
        np.testing.assert_allclose(r8[key], r1[key], rtol=1e-6, atol=1e-7)


def test_expomf_same_result_1dev_vs_8dev(data):
    from cymf_tpu import ExpoMF

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = ExpoMF(num_components=8, chunk_size=32)
            m.fit(data.train, num_epochs=2, verbose=False)
            return m.W.copy(), m.H.copy(), m.mu.copy()

    W1, H1, mu1 = run(jax.devices()[:1])
    W8, H8, mu8 = run(jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(mu8, mu1, rtol=2e-3, atol=2e-6)


def test_expomf_nondivisible_shapes_1dev_vs_8dev():
    """Rows/items NOT multiples of the device count: table padding, chunk
    sentinel padding and the mu column mask must all compose."""
    from cymf_tpu import ExpoMF
    d = SyntheticImplicitDataset(num_user=101, num_item=67, rank=4,
                                 density=0.15, seed=5)

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = ExpoMF(num_components=8, chunk_size=24)
            m.fit(d.train, num_epochs=2, verbose=False)
            return m.W.copy(), m.H.copy(), m.mu.copy()

    W1, H1, mu1 = run(jax.devices()[:1])
    W8, H8, mu8 = run(jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(mu8, mu1, rtol=2e-3, atol=2e-6)


def test_glove_kfold_same_result_1dev_vs_8dev():
    """The reference-exact kfold bias mode through its round-4 explicit
    shard_map epoch must equal single-device training."""
    from scipy import sparse
    from cymf_tpu import GloVe
    rng = np.random.default_rng(4)
    dense = np.triu(rng.integers(0, 20, (24, 24))
                    * (rng.random((24, 24)) < 0.3))
    X = sparse.csr_matrix(dense)

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            np.random.seed(11)
            m = GloVe(num_components=8, batch_size=64, bias_mode="kfold")
            m.fit(X, num_epochs=5)
            return m.W.copy(), m.bias.copy()

    W1, b1 = run(jax.devices()[:1])
    W8, b8 = run(jax.devices())
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(b8, b1, rtol=2e-3, atol=2e-5)


def test_bpr_packed_sharded_same_result_1dev_vs_8dev(data):
    """The PACKED engine's explicit shard_map form (row-sharded packed W,
    replicated logical H, shard-contiguous sample slices, one H psum per
    step — round-4) must equal the single-device packed engine: negative
    streams are drawn globally before slicing, so the fit is
    mesh-size-invariant up to float summation order."""
    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = BPR(num_components=8, learning_rate=0.02, batch_size=128,
                    packed="on")
            m.fit(data.train, num_epochs=3, verbose=False, seed=3)
            return m.W.copy(), m.H.copy(), m.last_loss

    W1, H1, l1 = run(jax.devices()[:1])
    W8, H8, l8 = run(jax.devices())
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)


def test_bpr_packed_sharded_medium_nondivisible_1dev_vs_8dev():
    """Sharded packed engine at shapes where nothing divides evenly
    (users, items, batch vs the 8-device mesh) — shard slice boundaries
    fall mid-stream and the last shard holds all global padding."""
    d = SyntheticImplicitDataset(num_user=3001, num_item=1203, rank=6,
                                 density=0.005, seed=21)

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            # sgd: accumulation-ORDER robust (adam's -lr*sign(g)
            # first-touch step amplifies tiny fp reorder diffs to ~2*lr
            # on ~0.1% of elements — the DRIFT class of
            # scripts/tpu_kernel_smoke.py)
            m = BPR(num_components=12, learning_rate=0.02,
                    batch_size=2048, packed="on", optimizer="sgd")
            m.fit(d.train, num_epochs=2, verbose=False, seed=9)
            return m.W.copy(), m.H.copy()

    W1, H1 = run(jax.devices()[:1])
    W8, H8 = run(jax.devices())
    assert W1.shape == (3001, 12) and H1.shape == (1203, 12)
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)


def test_bpr_packed_neg_pool_multidevice_warns(data):
    """The shared-negative pool is a single-chip VMEM structure: on a
    multi-device mesh it warns and runs on the default device instead of
    taking the sharded path (which has no pool form)."""
    with use_mesh(MeshContext.create(jax.devices())):
        m = BPR(num_components=8, batch_size=128, packed="on",
                neg_pool=128)
        with pytest.warns(UserWarning, match="single-chip"):
            m.fit(data.train, num_epochs=1, verbose=False, seed=3)
        assert m.packed_kernel_ == 8 and np.isfinite(m.W).all()


def test_bpr_packed_sharded_resume_cross_mesh(data, tmp_path):
    """A checkpoint written mid-fit by the 8-device sharded packed
    engine resumes on ONE device (and vice versa) and matches the
    uninterrupted single-device fit — cross-device-count resume for the
    packed schema (round-3 VERDICT #31 extended to the sharded form)."""
    p = str(tmp_path / "ck.npz")

    def make(devices):
        return BPR(num_components=8, learning_rate=0.02, batch_size=128,
                   packed="on")

    with use_mesh(MeshContext.create(jax.devices()[:1])):
        m0 = make(None)
        m0.fit(data.train, num_epochs=4, verbose=False, seed=3)
        W_ref, H_ref = m0.W.copy(), m0.H.copy()

    with use_mesh(MeshContext.create(jax.devices())):
        m1 = make(None)
        m1.fit(data.train, num_epochs=2, verbose=False, seed=3,
               checkpoint_path=p)
    with use_mesh(MeshContext.create(jax.devices()[:1])):
        m2 = make(None)
        m2.fit(data.train, num_epochs=4, verbose=False, seed=3,
               checkpoint_path=p, resume=True)
    np.testing.assert_allclose(m2.W, W_ref, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(m2.H, H_ref, rtol=2e-3, atol=2e-5)


def test_glove_packed_sharded_same_result_1dev_vs_8dev():
    """The packed GloVe engine's shard_map form (row-sharded packed
    central table, replicated context table, one psum per step) must
    equal single-device packed training — streams are static per fit
    and sliced from the same global sort."""
    from scipy import sparse

    from cymf_tpu import GloVe
    rng = np.random.default_rng(8)
    V = 90
    dense = (rng.random((V, V)) < 0.1) * rng.integers(1, 30, (V, V))
    np.fill_diagonal(dense, 0)
    X = sparse.csr_matrix(dense.astype(np.float64))

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            np.random.seed(6)
            m = GloVe(num_components=8, batch_size=1024, packed="on",
                      learning_rate=0.05)
            m.fit(X, num_epochs=4)
            return (m.W_central.copy(), m.W_context.copy(),
                    m.bias.copy(), m.context_bias.copy(), m.last_loss)

    Wc1, Wx1, b1, bx1, l1 = run(jax.devices()[:1])
    Wc8, Wx8, b8, bx8, l8 = run(jax.devices())
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    np.testing.assert_allclose(Wc8, Wc1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(Wx8, Wx1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(b8, b1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(bx8, bx1, rtol=2e-3, atol=2e-5)


def test_bpr_wide_sharded_same_result_1dev_vs_8dev():
    """The WIDE engine's explicit shard_map form (round 5 — row-sharded
    wide W, replicated wide H, shard-contiguous sample slices, one
    (rh, Kp+128) psum per step) must equal the single-device wide
    engine: negative streams are drawn globally before slicing, so the
    fit is mesh-size-invariant up to float summation order."""
    from scipy import sparse
    X = sparse.random(300, 150, density=0.1, random_state=3, format="csr")
    X.data[:] = 1.0

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            # sgd: accumulation-ORDER robust (see the packed
            # non-divisible test's adam first-touch note)
            m = BPR(num_components=128, learning_rate=0.02,
                    batch_size=1024, packed="on", optimizer="sgd")
            m.fit(X, num_epochs=2, verbose=False, seed=3)
            return m.W.copy(), m.H.copy(), m.last_loss

    W1, H1, l1 = run(jax.devices()[:1])
    W8, H8, l8 = run(jax.devices())
    assert W1.shape == (300, 128) and H1.shape == (150, 128)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    np.testing.assert_allclose(W8, W1, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(H8, H1, rtol=2e-3, atol=2e-5)


def test_bpr_wide_sharded_nondivisible_adam_1dev_vs_8dev():
    """Sharded wide engine with adam at shapes where users/items/batch
    don't divide the mesh — slice boundaries fall mid-stream and the
    last shard holds all global padding."""
    d = SyntheticImplicitDataset(num_user=1301, num_item=403, rank=6,
                                 density=0.01, seed=21)

    def run(devices):
        with use_mesh(MeshContext.create(devices)):
            m = BPR(num_components=130, learning_rate=0.02,
                    batch_size=1024, packed="on")
            m.fit(d.train, num_epochs=2, verbose=False, seed=9)
            return m.W.copy(), m.H.copy()

    W1, H1 = run(jax.devices()[:1])
    W8, H8 = run(jax.devices())
    assert W1.shape == (1301, 130) and H1.shape == (403, 130)
    # adam first-touch sign flips under summation reorder bound the
    # per-element diff at ~2*lr on a tiny fraction of elements
    assert np.mean(np.abs(W8 - W1) > 4 * 0.02) < 0.005
    assert np.mean(np.abs(H8 - H1) > 4 * 0.02) < 0.005


def test_bpr_wide_sharded_resume_cross_mesh(tmp_path):
    """A checkpoint written mid-fit by the 8-device sharded wide engine
    resumes on ONE device (and vice versa) and matches the uninterrupted
    single-device fit — cross-device-count resume for the wide schema."""
    from scipy import sparse
    X = sparse.random(300, 150, density=0.1, random_state=3, format="csr")
    X.data[:] = 1.0
    p = str(tmp_path / "ckw.npz")
    kw = dict(num_components=128, learning_rate=0.02, batch_size=1024,
              packed="on", optimizer="sgd")

    with use_mesh(MeshContext.create(jax.devices()[:1])):
        m0 = BPR(**kw)
        m0.fit(X, num_epochs=4, verbose=False, seed=3)
        W_ref, H_ref = m0.W.copy(), m0.H.copy()

    with use_mesh(MeshContext.create(jax.devices())):
        m1 = BPR(**kw)
        m1.fit(X, num_epochs=2, verbose=False, seed=3, checkpoint_path=p)
    with use_mesh(MeshContext.create(jax.devices()[:1])):
        m2 = BPR(**kw)
        m2.fit(X, num_epochs=4, verbose=False, seed=3, checkpoint_path=p,
               resume=True)
    np.testing.assert_allclose(m2.W, W_ref, rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(m2.H, H_ref, rtol=2e-3, atol=2e-5)
