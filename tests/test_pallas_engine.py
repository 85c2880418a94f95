"""Pallas sequential engine: exact parity with a numpy per-sample replica.

Unlike the statistical parity of the batch path, the Pallas engine replays
the reference's per-sample sequential update schedule exactly, so with
identical inputs (same negatives + masks) the resulting tables must match a
numpy implementation of the same recurrence to float32 tolerance.  On CPU
the kernel runs in interpreter mode (slow) — shapes here are tiny.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cymf_tpu.ops.pallas_engine import (bpr_pallas_epoch, fits_vmem,
                                        generate_epoch_negatives,
                                        pack_table, unpack_table)


def _numpy_sequential(W, H, u, i, j, mask, optimizer, lr, wd,
                      b1=0.9, b2=0.999, eps=1e-8):
    W = W.copy(); H = H.copy()
    state = {}
    if optimizer == "adam":
        state = dict(mW=np.zeros_like(W), vW=np.zeros_like(W),
                     mH=np.zeros_like(H), vH=np.zeros_like(H))
    elif optimizer == "adagrad":
        state = dict(aW=np.ones_like(W), aH=np.ones_like(H))

    def apply(table, tid, row, g):
        if optimizer == "adam":
            m, v = state["m" + tid], state["v" + tid]
            m[row] = b1 * m[row] + (1 - b1) * g
            v[row] = b2 * v[row] + (1 - b2) * g * g
            table[row] -= lr * (m[row] / (1 - b1)) / (
                np.sqrt(v[row] / (1 - b2)) + eps)
        elif optimizer == "adagrad":
            a = state["a" + tid]
            a[row] += g * g
            table[row] -= lr * g / np.sqrt(a[row])
        else:
            table[row] -= lr * g

    total = 0.0
    for b in range(len(u)):
        if not mask[b]:
            continue
        x = W[u[b]] @ (H[i[b]] - H[j[b]])
        sig = 1.0 / (1.0 + np.exp(x))
        g_wu = -(sig * (H[i[b]] - H[j[b]]) - wd * W[u[b]])
        g_hi = -(sig * W[u[b]] - wd * H[i[b]])
        g_hj = -(-sig * W[u[b]] - wd * H[j[b]])
        total += np.log1p(np.exp(-x)) + wd * (
            W[u[b]] @ W[u[b]] + H[i[b]] @ H[i[b]] + H[j[b]] @ H[j[b]])
        apply(W, "W", u[b], g_wu)
        apply(H, "H", i[b], g_hi)
        apply(H, "H", j[b], g_hj)
    return W, H, total


@pytest.mark.parametrize("optimizer", ["sgd", "adagrad", "adam"])
def test_pallas_matches_numpy_sequential(optimizer):
    rng = np.random.default_rng(0)
    U, I, K, N = 24, 16, 8, 96
    chunk = 32
    S = N // chunk
    W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
    H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
    u = rng.integers(0, U, N).astype(np.int32)
    i = rng.integers(0, I, N).astype(np.int32)
    j = rng.integers(0, I, N).astype(np.int32)
    # precondition of the real flow: a kept sample has i != j (j is
    # rejected when it is a positive of u, and i is one)
    mask = ((rng.random(N) > 0.1) & (i != j)).astype(np.int32)
    lr, wd = 0.05, 0.01

    Wp = pack_table(W0, optimizer)
    Hp = pack_table(H0, optimizer)
    Wo, Ho, loss = bpr_pallas_epoch(
        Wp, Hp, jnp.asarray(u.reshape(S, 1, chunk)),
        jnp.asarray(i.reshape(S, 1, chunk)),
        jnp.asarray(j.reshape(S, 1, chunk)),
        jnp.asarray(mask.reshape(S, 1, chunk)),
        optimizer=optimizer, lr=lr, wd=wd, interpret=True)

    # float32 replica: the kernel runs sequentially in f32, so compare
    # against the same-precision recurrence (f64 drifts ~1e-4 over the
    # dependent chain)
    W_ref, H_ref, loss_ref = _numpy_sequential(
        W0.astype(np.float32), H0.astype(np.float32), u, i, j, mask,
        optimizer, lr, wd)
    np.testing.assert_allclose(np.asarray(unpack_table(Wo, K)), W_ref,
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(unpack_table(Ho, K)), H_ref,
                               rtol=2e-4, atol=2e-5)
    assert float(loss) == pytest.approx(loss_ref, rel=1e-3)


def test_fits_vmem_gate():
    assert fits_vmem(943 + 1682, "adam")          # ml-100k
    assert not fits_vmem(138493 + 26744, "adam")  # ml-20m


def test_generate_epoch_negatives_rejects_positives():
    rng = np.random.default_rng(1)
    users = rng.integers(0, 50, 5000).astype(np.int32)
    items = rng.integers(0, 30, 5000).astype(np.int32)
    keys = np.sort(users.astype(np.int64) * 30 + items)
    j, keep = generate_epoch_negatives(rng, users, 30, keys)
    qkeys = users.astype(np.int64) * 30 + j
    is_pos = np.isin(qkeys, keys)
    np.testing.assert_array_equal(keep, ~is_pos)


def test_bpr_pallas_engine_fit_tiny():
    """End-to-end BPR(engine='pallas') on tiny data (interpret mode)."""
    from cymf_tpu import BPR
    from cymf_tpu.dataset import SyntheticImplicitDataset
    d = SyntheticImplicitDataset(num_user=20, num_item=15, rank=3,
                                 density=0.2, seed=2)
    m = BPR(num_components=4, learning_rate=0.05, engine="pallas")
    m.fit(d.train, num_epochs=2, verbose=False)
    assert np.isfinite(m.W).all() and np.isfinite(m.H).all()
    assert m.W.shape == (20, 4)
    assert m.last_loss is not None and np.isfinite(m.last_loss)


def test_bpr_pallas_engine_rejects_big_tables():
    from cymf_tpu import BPR
    from scipy import sparse
    m = BPR(engine="pallas", optimizer="adam")
    rng = np.random.default_rng(0)
    X = sparse.coo_matrix(
        (np.ones(5000), (rng.integers(0, 150000, 5000),
                         rng.integers(0, 30000, 5000))),
        shape=(150000, 30000)).tocsr()
    with pytest.raises(ValueError):
        m.fit(X, num_epochs=1, verbose=False)


def _numpy_relmf_sequential(W, H, u, i, w, mask, optimizer, lr, wd,
                            b1=0.9, b2=0.999, eps=1e-8):
    W = W.copy(); H = H.copy()
    state = {}
    if optimizer == "adam":
        state = dict(mW=np.zeros_like(W), vW=np.zeros_like(W),
                     mH=np.zeros_like(H), vH=np.zeros_like(H))
    elif optimizer == "adagrad":
        state = dict(aW=np.ones_like(W), aH=np.ones_like(H))

    def apply(table, tid, row, g):
        if optimizer == "adam":
            m, v = state["m" + tid], state["v" + tid]
            m[row] = b1 * m[row] + (1 - b1) * g
            v[row] = b2 * v[row] + (1 - b2) * g * g
            table[row] -= lr * (m[row] / (1 - b1)) / (
                np.sqrt(v[row] / (1 - b2)) + eps)
        elif optimizer == "adagrad":
            a = state["a" + tid]
            a[row] += g * g
            table[row] -= lr * g / np.sqrt(a[row])
        else:
            table[row] -= lr * g

    total = 0.0
    for b in range(len(u)):
        if not mask[b]:
            continue
        s = W[u[b]] @ H[i[b]]
        coef = w[b] - s
        g_w = -coef * H[i[b]] + wd * W[u[b]]
        g_h = -coef * W[u[b]] + wd * H[i[b]]
        total += (w[b] * (1 - s) ** 2 + (1 - w[b]) * s ** 2
                  + wd * (W[u[b]] @ W[u[b]] + H[i[b]] @ H[i[b]]))
        apply(W, "W", u[b], g_w)
        apply(H, "H", i[b], g_h)
    return W, H, total


@pytest.mark.parametrize("optimizer", ["sgd", "adagrad", "adam"])
def test_relmf_pallas_matches_numpy_sequential(optimizer):
    from cymf_tpu.ops.pallas_engine import relmf_pallas_epoch
    rng = np.random.default_rng(1)
    U, I, K, N = 20, 14, 6, 96
    chunk = 32
    S = N // chunk
    W0 = rng.normal(size=(U, K)).astype(np.float32) * 0.1
    H0 = rng.normal(size=(I, K)).astype(np.float32) * 0.1
    u = rng.integers(0, U, N).astype(np.int32)
    i = rng.integers(0, I, N).astype(np.int32)
    w = (rng.random(N) < 0.3).astype(np.float32) * rng.uniform(1, 5, N)
    mask = (rng.random(N) > 0.1).astype(np.int32)
    lr, wd = 0.05, 0.01

    Wp = pack_table(W0, optimizer)
    Hp = pack_table(H0, optimizer)
    Wo, Ho, loss = relmf_pallas_epoch(
        Wp, Hp, jnp.asarray(u.reshape(S, 1, chunk)),
        jnp.asarray(i.reshape(S, 1, chunk)),
        jnp.asarray(w.reshape(S, 1, chunk)),
        jnp.asarray(mask.reshape(S, 1, chunk)),
        optimizer=optimizer, lr=lr, wd=wd, interpret=True)

    W_ref, H_ref, loss_ref = _numpy_relmf_sequential(
        W0.astype(np.float32), H0.astype(np.float32), u, i,
        w.astype(np.float32), mask, optimizer, lr, wd)
    np.testing.assert_allclose(np.asarray(unpack_table(Wo, K)), W_ref,
                               rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(unpack_table(Ho, K)), H_ref,
                               rtol=3e-4, atol=3e-5)
    assert float(loss) == pytest.approx(loss_ref, rel=2e-3)


def test_relmf_pallas_engine_fit_tiny():
    from cymf_tpu import RelMF
    from cymf_tpu.dataset import SyntheticImplicitDataset
    d = SyntheticImplicitDataset(num_user=15, num_item=12, rank=3,
                                 density=0.2, seed=3)
    m = RelMF(num_components=4, learning_rate=0.05, engine="pallas")
    m.fit(d.train, num_epochs=2, verbose=False)
    assert np.isfinite(m.W).all() and np.isfinite(m.H).all()
    assert m.last_loss is not None and np.isfinite(m.last_loss)


def test_glove_pallas_matches_numpy_sequential():
    from cymf_tpu.ops.pallas_engine import glove_pallas_epoch
    rng = np.random.default_rng(2)
    V1, V2, K, N = 14, 12, 6, 64
    chunk = 32
    S = N // chunk
    Wc = rng.normal(size=(V1, K)).astype(np.float32) * 0.1
    Wx = rng.normal(size=(V2, K)).astype(np.float32) * 0.1
    bc = rng.normal(size=V1).astype(np.float32) * 0.1
    bx = rng.normal(size=V2).astype(np.float32) * 0.1
    c = rng.integers(0, V1, N).astype(np.int32)
    x = rng.integers(0, V2, N).astype(np.int32)
    cnt = (rng.exponential(3, N) + 1).astype(np.float32)
    mask = (rng.random(N) > 0.1).astype(np.int32)
    lr, x_max, alpha = 0.05, 10.0, 0.75
    f = np.minimum((cnt / x_max) ** alpha, 1.0).astype(np.float32)
    logcnt = np.log(cnt).astype(np.float32)

    # numpy sequential replica of the fused-bias AdaGrad scheme
    Wc_r, Wx_r = Wc.copy(), Wx.copy()
    bc_r, bx_r = bc.copy(), bx.copy()
    aW = np.ones_like(Wc_r); aX = np.ones_like(Wx_r)
    abc = np.ones_like(bc_r); abx = np.ones_like(bx_r)
    total = 0.0
    for b in range(N):
        if not mask[b]:
            continue
        diff = Wc_r[c[b]] @ Wx_r[x[b]] + bc_r[c[b]] + bx_r[x[b]] - logcnt[b]
        fd = f[b] * diff
        total += 0.5 * f[b] * diff * diff
        gW = fd * Wx_r[x[b]].copy()
        gX = fd * Wc_r[c[b]].copy()
        aW[c[b]] += gW * gW
        Wc_r[c[b]] -= lr * gW / np.sqrt(aW[c[b]])
        abc[c[b]] += fd * fd
        bc_r[c[b]] -= lr * fd / np.sqrt(abc[c[b]])
        aX[x[b]] += gX * gX
        Wx_r[x[b]] -= lr * gX / np.sqrt(aX[x[b]])
        abx[x[b]] += fd * fd
        bx_r[x[b]] -= lr * fd / np.sqrt(abx[x[b]])

    Wc_aug = np.concatenate([Wc, bc[:, None], np.ones((V1, 1), np.float32)],
                            axis=1)
    Wx_aug = np.concatenate([Wx, np.ones((V2, 1), np.float32),
                             bx[:, None]], axis=1)
    Wp = pack_table(Wc_aug, "adagrad")
    Xp = pack_table(Wx_aug, "adagrad")
    sh = (S, 1, chunk)
    Wo, Xo, loss = glove_pallas_epoch(
        Wp, Xp, jnp.asarray(c.reshape(sh)), jnp.asarray(x.reshape(sh)),
        jnp.asarray(f.reshape(sh)), jnp.asarray(logcnt.reshape(sh)),
        jnp.asarray(mask.reshape(sh)), lr=lr, k_dim=K, interpret=True)

    np.testing.assert_allclose(np.asarray(Wo[:, :K]), Wc_r, rtol=3e-4,
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(Wo[:, K]), bc_r, rtol=3e-4,
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(Xo[:, :K]), Wx_r, rtol=3e-4,
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(Xo[:, K + 1]), bx_r, rtol=3e-4,
                               atol=3e-5)
    # const columns untouched
    np.testing.assert_allclose(np.asarray(Wo[:, K + 1]), 1.0)
    np.testing.assert_allclose(np.asarray(Xo[:, K]), 1.0)
    assert float(loss) == pytest.approx(total, rel=2e-3)


def test_glove_pallas_engine_fit_tiny():
    from scipy import sparse
    from cymf_tpu import GloVe
    rng = np.random.default_rng(5)
    dense = np.triu(rng.integers(0, 15, (12, 12))
                    * (rng.random((12, 12)) < 0.4))
    X = sparse.csr_matrix(dense)
    m = GloVe(num_components=4, learning_rate=0.05, batch_size=32,
              engine="pallas")
    m.fit(X, num_epochs=2)
    assert np.isfinite(m.W).all()
    assert m.W.shape == (12, 4)


def test_glove_pallas_rejects_big_vocab():
    from scipy import sparse
    from cymf_tpu import GloVe
    rng = np.random.default_rng(6)
    X = sparse.coo_matrix(
        (np.ones(100), (rng.integers(0, 60000, 100),
                        rng.integers(0, 60000, 100))),
        shape=(60000, 60000)).tocsr()
    m = GloVe(num_components=4, engine="pallas")
    with pytest.raises(ValueError):
        m.fit(X, num_epochs=1)
