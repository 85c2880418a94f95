"""Optimizer semantics tests against hand-rolled numpy replicas of the
reference update rules (`/root/reference/cymf/optimizer.pyx`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cymf_tpu.optim import Adam, AdaGrad, Sgd, make_optimizer


def _apply(opt, table, rows, grads, steps=1):
    t = jnp.asarray(table)
    state = opt.init(t)
    for _ in range(steps):
        t, state = opt.update_rows(t, state, jnp.asarray(rows, jnp.int32),
                                   jnp.asarray(grads))
    return np.asarray(t), state


def test_sgd_matches_reference_rule():
    table = np.ones((4, 3), np.float32)
    rows = [2, 0]
    grads = np.asarray([[1.0, 2.0, 3.0], [0.5, 0.5, 0.5]], np.float32)
    got, _ = _apply(Sgd(0.1), table, rows, grads)
    want = table.copy()
    want[2] -= 0.1 * grads[0]
    want[0] -= 0.1 * grads[1]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_adagrad_accumulator_init_ones():
    """accumulators start at ONES (optimizer.pyx:69-70): first update divides
    by sqrt(1 + g^2), not sqrt(g^2)."""
    table = np.zeros((2, 1), np.float32)
    g = 3.0
    got, state = _apply(AdaGrad(1.0), table, [1], np.asarray([[g]], np.float32))
    np.testing.assert_allclose(got[1, 0], -g / np.sqrt(1.0 + g * g), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state["accum"])[1, 0], 1.0 + g * g,
                               rtol=1e-6)
    # untouched row keeps accumulator 1
    np.testing.assert_allclose(np.asarray(state["accum"])[0, 0], 1.0)


def test_adam_constant_bias_correction():
    """Adam divides by constant (1-beta1), (1-beta2) (optimizer.pyx:150-160),
    not (1-beta^t)."""
    alpha, b1, b2, eps = 0.001, 0.9, 0.999, 1e-8
    table = np.zeros((3, 2), np.float32)
    g = np.asarray([[1.0, -2.0]], np.float32)
    got, state = _apply(Adam(alpha, b1, b2, eps), table, [1], g)
    m = (1 - b1) * g
    v = (1 - b2) * g * g
    want = -alpha * (m / (1 - b1)) / (np.sqrt(v / (1 - b2)) + eps)
    np.testing.assert_allclose(got[1], want[0], rtol=1e-5)


def test_adam_second_step_sequence():
    alpha, b1, b2, eps = 0.01, 0.9, 0.999, 1e-8
    opt = Adam(alpha, b1, b2, eps)
    t = jnp.zeros((2, 1), jnp.float32)
    state = opt.init(t)
    m = v = w = 0.0
    for g in [1.0, -0.5, 2.0]:
        t, state = opt.update_rows(t, state, jnp.asarray([0], jnp.int32),
                                   jnp.asarray([[g]], jnp.float32))
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        w -= alpha * (m / (1 - b1)) / (np.sqrt(v / (1 - b2)) + eps)
    np.testing.assert_allclose(np.asarray(t)[0, 0], w, rtol=1e-5)


def test_duplicate_rows_single_update_with_summed_grad():
    """A row repeated in the batch gets ONE update with the summed gradient."""
    opt = AdaGrad(0.5)
    t = jnp.zeros((2, 1), jnp.float32)
    state = opt.init(t)
    rows = jnp.asarray([0, 0, 0], jnp.int32)
    grads = jnp.asarray([[1.0], [2.0], [3.0]], jnp.float32)
    t, state = opt.update_rows(t, state, rows, grads)
    g = 6.0
    np.testing.assert_allclose(np.asarray(t)[0, 0],
                               -0.5 * g / np.sqrt(1 + g * g), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state["accum"])[0, 0], 1 + g * g,
                               rtol=1e-6)


def test_make_optimizer_whitelist():
    assert isinstance(make_optimizer("adam", 0.1), Adam)
    assert isinstance(make_optimizer("adagrad", 0.1), AdaGrad)
    assert isinstance(make_optimizer("sgd", 0.1), Sgd)
    with pytest.raises(Exception):
        make_optimizer("rmsprop", 0.1)
