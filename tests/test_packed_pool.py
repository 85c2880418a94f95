"""Shared-negative-pool packed engine (v8) tests.

Pool mode changes WHERE negatives come from (a per-step P-item pool)
but not the per-sample update math: feeding the exact engine (v4) the
identical negative stream ``j = pool[r]`` must produce the same tables
up to accumulation order.  Reference behavior being replaced:
`/root/reference/cymf/bpr.pyx:162-169` (per-sample uniform negative
draws — pool mode keeps the marginal distribution uniform).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cymf_tpu.dataset.synthetic import SyntheticImplicitDataset
from cymf_tpu.ops import packed as pk
from cymf_tpu.ops.packed_epoch import (
    _sorted_side, make_packed_optimizer, packed_bpr_epoch,
    packed_bpr_pool_epoch, prep_pool_epoch, prep_static, prep_static_pool,
    unpack_device)


def _setup(U=500, I=300, K=20, S=2, B=2048, seed=0):
    rng = np.random.default_rng(seed)
    wrows = 512
    rw = pk.packed_rows(U, K, multiple=wrows)
    rh = pk.logical_rows(I, multiple=wrows)
    u2 = np.sort(rng.integers(0, U, (S, B)).astype(np.int32), axis=1)
    i2 = rng.integers(0, I, (S, B)).astype(np.int32)
    # positives set: make ~1/4 of (u, j) pairs collide sometimes
    nk = 600
    pos_keys = np.unique(
        rng.integers(0, U, nk).astype(np.int64) * I
        + rng.integers(0, I, nk))
    W0 = rng.normal(size=(U, K)).astype(np.float32) / K
    H0 = rng.normal(size=(I, K)).astype(np.float32) / K
    return rng, wrows, rw, rh, u2, i2, pos_keys, W0, H0


@pytest.mark.parametrize("P,opt_name", [(128, "sgd"), (256, "sgd"),
                                        (128, "adam"), (256, "adam")])
def test_pool_epoch_matches_exact_engine_same_stream(P, opt_name):
    """v8 pool epoch == v4 exact epoch when v4 is fed j = pool[r].

    SGD is linear in the gradient, so the only divergence is the v8
    kernel's ~2^-16 bf16 hi+lo pool-expansion rounding — tight
    tolerance.  Adam's rsqrt amplifies that rounding at near-zero
    second moments, so its gate is looser (observed: 1/10k elements at
    ~1e-2 relative)."""
    U, I, K, S, B = 500, 300, 20, 2, 2048
    rng, wrows, rw, rh, u2, i2, pos_keys, W0, H0 = _setup(U, I, K, S, B)

    pool2, rjs, mask, j2 = prep_pool_epoch(
        np.random.default_rng(7), u2, pos_keys, U, I, P)
    assert (j2 == pool2[np.arange(S)[:, None], rjs.reshape(S, B)]).all()
    # some rejections should actually occur for the test to mean much
    assert mask.min() == 0.0 and mask.mean() > 0.9

    opt = make_packed_optimizer(opt_name, 0.05)
    Wp0 = jnp.asarray(pk.pack_array(W0, K, multiple=wrows))
    Hp0 = jnp.asarray(pk.pack_logical(H0, K, multiple=wrows))

    # --- pool engine
    winw_p, si, rowsi, wini = prep_static_pool(u2, i2, K, rw, rh, wrows,
                                               wrows)
    # fresh copies per engine call: the epoch fns donate their state
    # buffers (no-op on the CPU backend, but keep the test TPU-correct)
    Wp1, Hp1, _, _, loss1 = packed_bpr_pool_epoch(
        jnp.array(Wp0), jnp.array(Hp0), opt.init(Wp0), opt.init(Hp0),
        jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(si),
        jnp.asarray(rowsi), jnp.asarray(wini), jnp.asarray(pool2),
        jnp.asarray(rjs), jnp.asarray(mask), jnp.asarray(winw_p),
        jnp.asarray(S * B, jnp.int32),
        opt_name=opt_name, lr=0.05, weight_decay=0.01, K=K, rw=rw,
        rh=rh, wrows_w=wrows, wrows_h=wrows, interpret=True)

    # --- exact engine (v4) on the identical negative stream
    winw, wstart, si2, rowsi2, wini2, bcs, bcn, _ = prep_static(
        u2, i2, K, rw, rh, wrows, wrows)
    sj, rowsj, winj = _sorted_side(j2, rh, wrows, 1024)
    Wp2, Hp2, _, _, loss2 = packed_bpr_epoch(
        jnp.array(Wp0), jnp.array(Hp0), opt.init(Wp0), opt.init(Hp0),
        jnp.asarray(u2), jnp.asarray(i2), jnp.asarray(si2),
        jnp.asarray(rowsi2), jnp.asarray(wini2), jnp.asarray(j2),
        jnp.asarray(mask), jnp.asarray(sj), jnp.asarray(rowsj),
        jnp.asarray(winj), jnp.asarray(winw), jnp.asarray(wstart),
        jnp.asarray(bcs), jnp.asarray(bcn), jnp.asarray(S * B, jnp.int32),
        opt_name=opt_name, lr=0.05, weight_decay=0.01, K=K, rw=rw,
        rh=rh, wrows_w=wrows, wrows_h=wrows, interpret=True, kernel_v=4)

    rtol, atol = (2e-2, 1e-3) if opt_name == "adam" else (2e-4, 2e-5)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(unpack_device(Wp1, K))[:U],
                               np.asarray(unpack_device(Wp2, K))[:U],
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(Hp1[:I, :K]),
                               np.asarray(Hp2[:I, :K]),
                               rtol=rtol, atol=atol)


def test_pool_fit_learns():
    """BPR(neg_pool=128) trains to a sane DCG on synthetic data."""
    import cymf_tpu

    d = SyntheticImplicitDataset(num_user=400, num_item=200, rank=5,
                                 density=0.1, seed=11)
    ev = cymf_tpu.AoaEvaluator(d.test, d.train, metrics=["DCG"], k=5)
    m = cymf_tpu.BPR(num_components=20, learning_rate=0.02,
                     weight_decay=0.01, packed="on", neg_pool=128)
    m.fit(d.train, num_epochs=12, verbose=False, seed=3)
    assert m.packed_kernel_ == 8
    dcg = ev.evaluate(m.W, m.H)["DCG@5"]
    # exact engine reaches ~0.3 on this config; pool sampling should be
    # in the same regime, far above the ~0.1 random floor
    assert dcg > 0.2, dcg


def test_pool_resume_matches_uninterrupted(tmp_path):
    """Pool-mode checkpoints share the packed schema, and the pool RNG
    reseeds per (seed, epoch), so resume replays the exact stream."""
    import cymf_tpu

    d = SyntheticImplicitDataset(num_user=300, num_item=200, rank=4,
                                 density=0.12, seed=5)
    kw = dict(num_components=20, learning_rate=0.02, weight_decay=0.01,
              packed="on", neg_pool=128)
    p = str(tmp_path / "pool.npz")

    m1 = cymf_tpu.BPR(**kw)
    m1.fit(d.train, num_epochs=6, verbose=False, seed=7)

    m2 = cymf_tpu.BPR(**kw)
    m2.fit(d.train, num_epochs=3, verbose=False, seed=7,
           checkpoint_path=p)
    m3 = cymf_tpu.BPR(**kw)
    m3.fit(d.train, num_epochs=6, verbose=False, seed=7,
           checkpoint_path=p, resume=True)

    np.testing.assert_allclose(m3.W, m1.W, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(m3.H, m1.H, rtol=1e-4, atol=1e-6)


def test_pool_gate_rejects_bad_sizes():
    from cymf_tpu.ops.fused_step import supports_v8
    assert supports_v8(20, 512, 512, 128)
    assert not supports_v8(20, 512, 512, 100)   # not lane-aligned
    assert not supports_v8(20, 512, 512, 0)
