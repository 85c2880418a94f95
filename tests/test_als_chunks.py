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
