"""Hash-set membership parity with CSR binary search."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from cymf_tpu.ops.hashset import build_pair_hashset, hashset_contains
from cymf_tpu.ops.segment import csr_contains


@pytest.mark.parametrize("seed,shape,density", [
    (0, (200, 300), 0.05), (1, (50, 50), 0.3), (2, (1000, 37), 0.02)])
def test_hashset_matches_csr(seed, shape, density):
    rng = np.random.default_rng(seed)
    X = sparse.random(*shape, density=density, random_state=seed,
                      format="csr", data_rvs=lambda n: np.ones(n))
    X.sort_indices()
    coo = X.tocoo()
    hs = build_pair_hashset(coo.row, coo.col)
    q_u = rng.integers(0, shape[0], 5000).astype(np.int32)
    q_i = rng.integers(0, shape[1], 5000).astype(np.int32)
    got = np.asarray(hashset_contains(hs, jnp.asarray(q_u), jnp.asarray(q_i)))
    want = np.asarray(csr_contains(
        jnp.asarray(X.indptr), jnp.asarray(X.indices),
        jnp.asarray(q_u), jnp.asarray(q_i)))
    np.testing.assert_array_equal(got, want)


def test_hashset_all_members_found():
    rng = np.random.default_rng(3)
    u = rng.integers(0, 500, 2000).astype(np.int32)
    i = rng.integers(0, 400, 2000).astype(np.int32)
    hs = build_pair_hashset(u, i)
    got = np.asarray(hashset_contains(hs, jnp.asarray(u), jnp.asarray(i)))
    assert got.all()


def test_hashset_empty():
    hs = build_pair_hashset(np.zeros(0, np.int32), np.zeros(0, np.int32))
    got = np.asarray(hashset_contains(
        hs, jnp.asarray([1, 2], jnp.int32), jnp.asarray([3, 4], jnp.int32)))
    assert not got.any()


def test_hashset_heavy_skew():
    """Zipf-skewed users (many pairs share a user) must still build+answer."""
    rng = np.random.default_rng(4)
    u = (rng.zipf(1.3, 30000) % 100).astype(np.int32)
    i = rng.integers(0, 5000, 30000).astype(np.int32)
    hs = build_pair_hashset(u, i)
    got = np.asarray(hashset_contains(hs, jnp.asarray(u), jnp.asarray(i)))
    assert got.all()
