"""Pallas diagonal-block Cholesky kernel (`ops/chol_kernel.py`) —
interpret-mode correctness and solver-name routing.  Hardware lowering
is validated by `scripts/tpu_kernel_smoke.py` like every other kernel."""

import numpy as np
import pytest

import jax.numpy as jnp

from cymf_tpu.ops.chol_kernel import chol_inv_batched


def _spd(rng, C, B):
    X = rng.standard_normal((C, B, 8)).astype(np.float32)
    return np.einsum("cki,cli->ckl", X, X) / 8 + np.eye(B, dtype=np.float32)


@pytest.mark.parametrize("C,B", [(8, 64), (6, 32), (128, 64)])
def test_chol_inv_matches_numpy(C, B):
    rng = np.random.default_rng(0)
    A = _spd(rng, C, B)
    L, Linv = chol_inv_batched(jnp.asarray(A), block=B, interpret=True)
    L, Linv = np.array(L), np.array(Linv)
    Lref = np.linalg.cholesky(A)
    assert np.abs(L - Lref).max() / np.abs(Lref).max() < 1e-4
    assert np.abs(Linv @ Lref - np.eye(B)).max() < 1e-3


def test_pallas_solver_name_roundtrip():
    """get_solver('cholesky_pallas64') solves K=128 systems identically
    to the XLA path; batches below the Mosaic small-tile threshold
    (C < 256) route back to the XLA diagonal inside the blocked solve."""
    from cymf_tpu.ops.als import get_solver

    rng = np.random.default_rng(3)
    for C in (16, 256):
        A = _spd(rng, C, 128)
        b = rng.standard_normal((C, 128)).astype(np.float32)
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        got = np.array(get_solver("cholesky_pallas64")(
            jnp.asarray(A), jnp.asarray(b)))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 5e-4, (C, rel)


def test_resolve_pallas_modes(monkeypatch):
    """auto resolves to the pallas form only on TPU backends; the
    explicit modes force their form (engagement-guarded)."""
    import jax

    from cymf_tpu.ops.als import resolve_chol_solver

    monkeypatch.delenv("CYMF_TPU_ALS_CHOL_BLOCK", raising=False)
    monkeypatch.setenv("CYMF_TPU_ALS_CHOL", "pallas")
    assert resolve_chol_solver("cholesky", 256) == "cholesky_pallas64"
    monkeypatch.setenv("CYMF_TPU_ALS_CHOL", "auto")
    expected = ("cholesky_pallas64" if jax.default_backend() == "tpu"
                else "cholesky_blocked64")
    assert resolve_chol_solver("cholesky", 256) == expected
    # non-divisible K cannot engage either fast form
    assert resolve_chol_solver("cholesky", 144) == "cholesky_xla"


def test_g_collapse_falls_back_to_xla():
    """Batches whose size has no divisor in [8, 64] would collapse the
    VMEM tile below 8 sublanes (a Mosaic relayout hazard on hardware) —
    the wrapper must solve them via the XLA path instead."""
    rng = np.random.default_rng(7)
    A = _spd(rng, 262, 64)  # 262 = 2 * 131: largest divisor <= 64 is 2
    L, Linv = chol_inv_batched(jnp.asarray(A), block=64, interpret=True)
    Lref = np.linalg.cholesky(A)
    assert np.abs(np.array(L) - Lref).max() / np.abs(Lref).max() < 1e-4
    assert np.abs(np.array(Linv) @ Lref - np.eye(64)).max() < 1e-3
