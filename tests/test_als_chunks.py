"""build_chunks edge cases: coverage, adaptivity, empty inputs."""

import numpy as np
from scipy import sparse

from cymf_tpu.ops.als import build_chunks


def _cover_check(X, chunks, sentinel):
    seen = []
    for ch in chunks:
        for k, r in enumerate(ch.rows):
            if r == sentinel:
                continue
            seen.append(int(r))
            lo, hi = X.indptr[r], X.indptr[r + 1]
            got = np.sort(ch.idx_pad[k][ch.valid[k]])
            np.testing.assert_array_equal(got, np.sort(X.indices[lo:hi]))
    assert sorted(seen) == list(range(X.shape[0]))


def test_chunks_cover_all_rows_exactly_once():
    rng = np.random.default_rng(0)
    X = sparse.random(133, 50, density=0.1, random_state=0, format="csr")
    X.sort_indices()
    chunks = build_chunks(X, chunk_size=16, drop_sentinel=999)
    _cover_check(X, chunks, 999)


def test_chunks_adapt_to_skew():
    rows = np.concatenate([np.zeros(500, int), np.arange(1, 50)])
    cols = np.concatenate([np.arange(500) % 600, np.zeros(49, int)])
    X = sparse.csr_matrix((np.ones(len(rows)), (rows, cols)),
                          shape=(50, 600))
    X.sort_indices()
    chunks = build_chunks(X, chunk_size=64, drop_sentinel=77,
                          max_elems=1024)
    _cover_check(X, chunks, 77)
    for ch in chunks:
        assert ch.rows.shape[0] * ch.idx_pad.shape[1] <= 1024


def test_chunks_empty_matrix():
    X = sparse.csr_matrix((4, 6))
    chunks = build_chunks(X, chunk_size=8, drop_sentinel=9)
    _cover_check(X, chunks, 9)
    assert all(not ch.valid.any() for ch in chunks)


def test_chunks_single_row():
    X = sparse.csr_matrix(np.ones((1, 5)))
    chunks = build_chunks(X, chunk_size=8, drop_sentinel=3)
    _cover_check(X, chunks, 3)


def test_woodbury_solve_higher_k_correlated():
    """Woodbury == standard at K=64 with CORRELATED factor columns (the
    ill-conditioning case the auto guard protects; at the guard's
    wd >= 1e-3 the explicit-inverse route must stay within f32 parity)."""
    import jax.numpy as jnp

    from cymf_tpu.ops.als import (build_chunks, wmf_chunk_solve,
                                  wmf_chunk_solve_woodbury)

    rng = np.random.default_rng(1)
    U, I, K = 300, 220, 64
    X = sparse.random(U, I, density=0.04, random_state=1, format="csr",
                      data_rvs=lambda n: np.ones(n))
    # correlated columns: low-rank base + small noise -> large cond(YtY)
    base = rng.normal(size=(I, 6)).astype(np.float32)
    mixer = rng.normal(size=(6, K)).astype(np.float32)
    Y = jnp.asarray(base @ mixer * 0.1
                    + 0.01 * rng.normal(size=(I, K)).astype(np.float32))
    A0 = Y.T @ Y + 1e-3 * jnp.eye(K, dtype=jnp.float32)
    A0i = jnp.linalg.inv(A0)
    w = jnp.float32(10.0)
    for ch in build_chunks(X, 128, U, num_components=K):
        xs = wmf_chunk_solve(Y, A0, jnp.asarray(ch.idx_pad),
                             jnp.asarray(ch.valid), w, solver="cholesky")
        xw = wmf_chunk_solve_woodbury(Y, A0i, jnp.asarray(ch.idx_pad),
                                      jnp.asarray(ch.valid), w)
        scale = float(jnp.max(jnp.abs(xs))) + 1e-9
        err = float(jnp.max(jnp.abs(xs - xw))) / scale
        assert err < 5e-3, (ch.idx_pad.shape, err)
