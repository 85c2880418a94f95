"""Full-catalog top-k scorer / recommender.

The reference has no batch recommendation path at all — scoring happens only
inside the sampled-negative evaluator's per-user Python loop
(`/root/reference/cymf/evaluator.pyx:113`).  This module is the sharded
full-catalog scorer called for by the north star (BASELINE.json): one
``(users_chunk x K) @ (K x items)`` matmul on the MXU per chunk, train-
positive exclusion by scatter-masking, and ``jax.lax.top_k`` for the
ranking.  With row-sharded H on a mesh, XLA turns the matmul into
local-matmul + collectives over ICI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse

from .. import config


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_chunk(W_chunk, H, excl_idx, excl_valid, *, k: int):
    scores = jnp.matmul(W_chunk, H.T, preferred_element_type=jnp.float32)
    C = W_chunk.shape[0]
    cols = jnp.where(excl_valid, excl_idx, H.shape[0])
    mask = jnp.zeros(scores.shape, bool).at[
        jnp.arange(C)[:, None], cols].set(True, mode="drop")
    scores = jnp.where(mask, -jnp.inf, scores)
    return jax.lax.top_k(scores, k)


def recommend(W, H, k: int = 10, exclude=None,
              user_chunk: int = 4096) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k items per user over the full catalog.

    Args:
      W: [U, K] user factors (numpy or jax array).
      H: [I, K] item factors.
      k: items to return per user.
      exclude: optional scipy sparse matrix of already-seen (train)
        interactions to exclude from recommendations.
      user_chunk: users scored per device matmul.

    Returns:
      (scores float32[U, k], items int32[U, k]) sorted by score descending.
    """
    Wd = jnp.asarray(W, config.param_dtype())
    Hd = jnp.asarray(H, config.param_dtype())
    U, K = Wd.shape
    I = Hd.shape[0]
    if k > I:
        raise ValueError(f"k={k} exceeds catalog size {I}")

    if exclude is not None:
        X = sparse.csr_matrix(exclude)
        deg = np.diff(X.indptr)
        P = max(int(deg.max()) if deg.size else 0, 1)
    else:
        X = None
        P = 1

    out_scores = np.empty((U, k), np.float32)
    out_items = np.empty((U, k), np.int32)
    for start in range(0, U, user_chunk):
        end = min(start + user_chunk, U)
        C = end - start
        excl_idx = np.zeros((C, P), np.int32)
        excl_valid = np.zeros((C, P), bool)
        if X is not None:
            for r, u in enumerate(range(start, end)):
                lo, hi = X.indptr[u], X.indptr[u + 1]
                excl_idx[r, :hi - lo] = X.indices[lo:hi]
                excl_valid[r, :hi - lo] = True
        s, idx = _topk_chunk(Wd[start:end], Hd, jnp.asarray(excl_idx),
                             jnp.asarray(excl_valid), k=k)
        out_scores[start:end] = np.asarray(s)
        out_items[start:end] = np.asarray(idx)
    return out_scores, out_items
