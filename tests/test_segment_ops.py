"""Unit tests for the index-space primitives (dedup, CSR search)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import sparse

from cymf_tpu.ops.segment import csr_contains, csr_lookup, dedup_rows


def test_dedup_rows_sums_duplicates():
    rows = jnp.asarray([3, 1, 3, 3, 0], dtype=jnp.int32)
    grads = jnp.asarray([[1.0], [2.0], [10.0], [100.0], [5.0]])
    out_rows, out_grads = dedup_rows(rows, grads, drop_index=7)
    dense = jnp.zeros((8, 1)).at[out_rows].add(out_grads, mode="drop")
    np.testing.assert_allclose(np.asarray(dense[:4, 0]),
                               [5.0, 2.0, 0.0, 111.0])


def test_dedup_rows_no_duplicates_identity():
    rows = jnp.asarray([4, 2, 0], dtype=jnp.int32)
    grads = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    out_rows, out_grads = dedup_rows(rows, grads, drop_index=9)
    dense = jnp.zeros((5, 2)).at[out_rows].add(out_grads, mode="drop")
    expected = np.zeros((5, 2))
    expected[[4, 2, 0]] = np.asarray(grads)
    np.testing.assert_allclose(np.asarray(dense), expected)


def test_dedup_rows_vector_grads():
    rows = jnp.asarray([1, 1, 1], dtype=jnp.int32)
    grads = jnp.asarray([1.0, 2.0, 3.0])
    out_rows, out_grads = dedup_rows(rows, grads, drop_index=4)
    dense = jnp.zeros(4).at[out_rows].add(out_grads, mode="drop")
    np.testing.assert_allclose(np.asarray(dense), [0.0, 6.0, 0.0, 0.0])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_csr_contains_random(seed):
    rng = np.random.default_rng(seed)
    X = sparse.random(50, 80, density=0.1, random_state=seed,
                      format="csr")
    X.sort_indices()
    users = rng.integers(0, 50, size=200).astype(np.int32)
    items = rng.integers(0, 80, size=200).astype(np.int32)
    got = np.asarray(csr_contains(
        jnp.asarray(X.indptr), jnp.asarray(X.indices),
        jnp.asarray(users), jnp.asarray(items)))
    want = np.asarray(X[users, items]).flatten() != 0
    np.testing.assert_array_equal(got, want)


def test_csr_contains_empty_rows():
    X = sparse.csr_matrix(np.zeros((4, 6)))
    got = np.asarray(csr_contains(
        jnp.asarray(X.indptr), jnp.asarray(X.indices, dtype=jnp.int32),
        jnp.asarray([0, 3], dtype=jnp.int32),
        jnp.asarray([2, 5], dtype=jnp.int32)))
    np.testing.assert_array_equal(got, [False, False])


def test_csr_lookup_values():
    dense = np.zeros((3, 5))
    dense[0, 1] = 2.5
    dense[2, 4] = -1.0
    X = sparse.csr_matrix(dense)
    X.sort_indices()
    found, vals = csr_lookup(
        jnp.asarray(X.indptr), jnp.asarray(X.indices),
        jnp.asarray(X.data, dtype=jnp.float32),
        jnp.asarray([0, 0, 2, 1], dtype=jnp.int32),
        jnp.asarray([1, 2, 4, 0], dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(found),
                                  [True, False, True, False])
    np.testing.assert_allclose(np.asarray(vals), [2.5, 0.0, -1.0, 0.0])


def test_csr_contains_under_jit():
    X = sparse.csr_matrix(np.eye(8))
    f = jax.jit(csr_contains)
    got = np.asarray(f(
        jnp.asarray(X.indptr), jnp.asarray(X.indices, dtype=jnp.int32),
        jnp.asarray(np.arange(8), dtype=jnp.int32),
        jnp.asarray(np.arange(8), dtype=jnp.int32)))
    np.testing.assert_array_equal(got, np.ones(8, bool))
