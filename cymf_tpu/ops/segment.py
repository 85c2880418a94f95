"""Index-space primitives for sparse row updates and CSR membership tests.

These replace the two native data structures at the heart of the reference's
Hogwild loops:

* per-sample lock-free row updates with benign races
  (`/root/reference/cymf/optimizer.pyx:52-58`) -> :func:`dedup_rows`, which
  turns a batch of (row, grad) pairs with duplicates into "one summed gradient
  per unique row" so a synchronous scatter update is race-free and exact;
* the C++ ``vector[set[int]]`` positive-membership filter used for negative
  sampling (`/root/reference/cymf/bpr.pyx:140-147,166`) ->
  :func:`csr_contains` / :func:`csr_lookup`, a vectorized binary search over
  the CSR column-index array (no per-user hash sets, no padded U x max_degree
  matrix — memory stays O(nnz)).

Everything is jit-friendly: static shapes, ``lax``-style control flow only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Binary search iterations: supports segment lengths up to 2^32.
_BSEARCH_ITERS = 32


def dedup_rows(rows: jax.Array, grads: jax.Array, drop_index: int,
               presorted: bool = False):
    """Combine duplicate row indices by summing their gradients.

    Args:
      rows: int32[B] row indices (may contain duplicates).
      grads: [B, ...] per-sample gradients aligned with ``rows``.
      drop_index: an out-of-range row index; duplicate occurrences are
        redirected here so that a subsequent ``.at[].add(..., mode='drop')``
        ignores them.

    Returns:
      (unique_rows, summed_grads): both length B.  ``unique_rows[p]`` is the
      row index at the first occurrence of each distinct row (others are
      ``drop_index``); ``summed_grads[p]`` holds the sum of all gradients for
      that row (zeros elsewhere).

    Semantics note: the reference applies B sequential per-sample optimizer
    updates even when a row repeats within a batch-worth of samples; the
    synchronous equivalent is a single update with the summed gradient, which
    is what every scatter-add based framework does.
    """
    b = rows.shape[0]
    if presorted:
        srows, sgrads = rows, grads
    else:
        order = jnp.argsort(rows)  # stable
        srows = rows[order]
        sgrads = grads[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), srows[1:] != srows[:-1]])
    seg_id = jnp.cumsum(is_start) - 1
    sums = jax.ops.segment_sum(sgrads, seg_id, num_segments=b)
    out_rows = jnp.where(is_start, srows, drop_index)
    gshape = (b,) + (1,) * (grads.ndim - 1)
    out_grads = jnp.where(is_start.reshape(gshape), sums[seg_id],
                          jnp.zeros_like(sgrads))
    return out_rows, out_grads


def _lower_bound(flat: jax.Array, lo: jax.Array, hi: jax.Array,
                 query: jax.Array) -> jax.Array:
    """Vectorized ``std::lower_bound`` of ``query`` in ``flat[lo:hi)``.

    ``flat`` must be sorted within each ``[lo, hi)`` segment (scipy CSR with
    ``sort_indices()`` guarantees this per row).
    """
    n = flat.shape[0]

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        v = flat[jnp.clip(mid, 0, n - 1)]
        go_right = v < query
        active = lo < hi
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, _BSEARCH_ITERS, body, (lo, hi))
    return lo


def csr_contains(indptr: jax.Array, indices: jax.Array, seg: jax.Array,
                 query: jax.Array) -> jax.Array:
    """bool[B]: is ``query[b]`` among ``indices[indptr[seg[b]]:indptr[seg[b]+1]]``?

    Replaces the reference's hash-set rejection test during negative sampling
    (`/root/reference/cymf/bpr.pyx:166-167`): collisions are *masked* instead
    of skipped, which under fixed shapes is the faithful equivalent.
    """
    if indices.shape[0] == 0:  # empty matrix: nothing is a member
        return jnp.zeros(seg.shape, dtype=bool)
    lo = indptr[seg]
    hi = indptr[seg + 1]
    pos = _lower_bound(indices, lo, hi, query)
    n = indices.shape[0]
    found = (pos < hi) & (indices[jnp.clip(pos, 0, n - 1)] == query)
    return found


def csr_lookup(indptr: jax.Array, indices: jax.Array, data: jax.Array,
               seg: jax.Array, query: jax.Array):
    """(found bool[B], value[B]): CSR value at (seg, query), 0 where absent.

    Used by RelMF, whose per-epoch sampler reads the *label* at arbitrary
    (user, item) cells (`/root/reference/cymf/relmf.pyx:148` reads the
    densified ``X[u, i]``) — we keep X in CSR and look the cell up instead of
    densifying U x I.
    """
    if indices.shape[0] == 0:
        return (jnp.zeros(seg.shape, dtype=bool),
                jnp.zeros(seg.shape, dtype=data.dtype))
    lo = indptr[seg]
    hi = indptr[seg + 1]
    pos = _lower_bound(indices, lo, hi, query)
    n = indices.shape[0]
    cpos = jnp.clip(pos, 0, n - 1)
    found = (pos < hi) & (indices[cpos] == query)
    value = jnp.where(found, data[cpos], jnp.zeros((), dtype=data.dtype))
    return found, value
