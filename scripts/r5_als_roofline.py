"""ALS d=256 roofline at ML-20M shapes (round-5 verdict #4).

Stage-breaks the WMF half-sweep at the real chunk-shape distribution:
per (C, P) bucket, times (a) the padded gather, (b) the rank-P
correction einsum `cpk,cpl->ckl`, (c) the batched Cholesky solve —
then compares the standard form against a WOODBURY form whose matmuls
contract over K (=256, full MXU depth) instead of P (the measured
inefficiency for small-degree buckets).

Usage: python scripts/r5_als_roofline.py [d]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse

sys.path.insert(0, "/root/repo")

from cymf_tpu.dataset.synthetic import bench_interactions  # noqa: E402
from cymf_tpu.ops.als import build_chunks, wmf_chunk_solve  # noqa: E402

U, I, NNZ = 138493, 26744, 20_000_263
K = int(sys.argv[1]) if len(sys.argv) > 1 else 256
CHUNK = 2048
users, items = bench_interactions(U, I, NNZ, seed=0)
X = sparse.csr_matrix((np.ones(NNZ, np.float32), (users, items)),
                      shape=(U, I))
Xt = X.T.tocsr()
Xt.sort_indices()

rng = np.random.default_rng(0)
# resolve the CYMF_TPU_ALS_CHOL knob ONCE (the bare "cholesky" name is
# the deterministic XLA form since the round-5 solver-name rework)
from cymf_tpu.ops.als import resolve_chol_solver  # noqa: E402
SOLVER = resolve_chol_solver("cholesky", K)
print(f"devices={jax.devices()} K={K} solver={SOLVER}", flush=True)


def t_of(fn, *args, reps=2):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


import functools


@functools.partial(jax.jit, static_argnames=())
def stage_gather(Y, idx, valid):
    return jnp.sum(Y[idx] * valid[..., None].astype(Y.dtype))


@jax.jit
def stage_einsum(Y, A0, idx, valid):
    sub = Y[idx] * valid[..., None].astype(Y.dtype)
    A = A0[None] + 9.0 * jnp.einsum("cpk,cpl->ckl", sub, sub,
                                    preferred_element_type=jnp.float32)
    return jnp.sum(A)


@jax.jit
def stage_full(Y, A0, idx, valid):
    return jnp.sum(wmf_chunk_solve(Y, A0, idx, valid,
                                   jnp.float32(10.0), solver=SOLVER))


@jax.jit
def stage_woodbury(Y, A0i, idx, valid):
    """x = A0i b - T M^-1 (U^T A0i b), T = A0i U, M = I/(c-1) + U^T T.
    Every big matmul contracts over K (full MXU depth)."""
    mask = valid[..., None].astype(Y.dtype)
    Ug = Y[idx] * mask                                    # (C, P, K)
    b = 10.0 * jnp.sum(Ug, axis=1)                        # (C, K)
    T = jnp.einsum("kl,cpl->cpk", A0i, Ug,
                   preferred_element_type=jnp.float32)    # (C, P, K)
    P = Ug.shape[1]
    M = (jnp.eye(P, dtype=jnp.float32) / 9.0
         + jnp.einsum("cpk,cqk->cpq", Ug, T,
                      preferred_element_type=jnp.float32))
    A0ib = jnp.einsum("kl,cl->ck", A0i, b)
    UtA0ib = jnp.einsum("cpk,ck->cp", Ug, A0ib)
    L = jnp.linalg.cholesky(M)
    y = jax.scipy.linalg.solve_triangular(L, UtA0ib[..., None],
                                          lower=True)
    z = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)[..., 0]
    x = A0ib - jnp.einsum("cpk,cp->ck", T, z)
    nonempty = jnp.any(valid, axis=1, keepdims=True)
    return jnp.sum(jnp.where(nonempty, x, 0.0))


@jax.jit
def stage_woodbury_x(Y, A0i, idx, valid):
    mask = valid[..., None].astype(Y.dtype)
    Ug = Y[idx] * mask
    b = 10.0 * jnp.sum(Ug, axis=1)
    T = jnp.einsum("kl,cpl->cpk", A0i, Ug,
                   preferred_element_type=jnp.float32)
    P = Ug.shape[1]
    M = (jnp.eye(P, dtype=jnp.float32) / 9.0
         + jnp.einsum("cpk,cqk->cpq", Ug, T,
                      preferred_element_type=jnp.float32))
    A0ib = jnp.einsum("kl,cl->ck", A0i, b)
    UtA0ib = jnp.einsum("cpk,ck->cp", Ug, A0ib)
    L = jnp.linalg.cholesky(M)
    y = jax.scipy.linalg.solve_triangular(L, UtA0ib[..., None],
                                          lower=True)
    z = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False)[..., 0]
    x = A0ib - jnp.einsum("cpk,cp->ck", T, z)
    nonempty = jnp.any(valid, axis=1, keepdims=True)
    return jnp.where(nonempty, x, 0.0)


for side, Xs, nrows in (("users", X, U), ("items", Xt, I)):
    chunks = build_chunks(Xs, CHUNK, nrows, num_components=K)
    shapes = {}
    for c in chunks:
        key = (len(c.rows), c.idx_pad.shape[1])
        shapes[key] = shapes.get(key, 0) + 1
    print(f"\n== {side}: {len(chunks)} chunks, shapes {shapes}",
          flush=True)
    Y = jnp.asarray(rng.normal(size=(nrows, K)).astype(np.float32) * 0.1)
    A0 = (Y.T @ Y + 0.01 * jnp.eye(K, dtype=jnp.float32))
    A0i = jnp.linalg.inv(A0)
    tot_g = tot_e = tot_f = tot_w = 0.0
    for (C, P), cnt in sorted(shapes.items(), key=lambda t: t[0][1]):
        ch = next(c for c in chunks
                  if (len(c.rows), c.idx_pad.shape[1]) == (C, P))
        idx, valid = jnp.asarray(ch.idx_pad), jnp.asarray(ch.valid)
        tg = t_of(stage_gather, Y, idx, valid)
        te = t_of(stage_einsum, Y, A0, idx, valid)
        tf = t_of(stage_full, Y, A0, idx, valid)
        # probe Woodbury only where production routes it (P <= K) and
        # the (C, P, P) M buffer stays sane (P=1024 at C=2048 OOM'd hbm)
        tw = t_of(stage_woodbury, Y, A0i, idx, valid) \
            if P <= max(K, 256) and C * P * P * 4 < (1 << 31) \
            else float("nan")
        tot_g += tg * cnt
        tot_e += te * cnt
        tot_f += tf * cnt
        tot_w += (tw if tw == tw else tf) * cnt
        flops = 2 * C * P * K * K
        eff = flops / max(te - tg, 1e-4) / 197e12
        print(f"  (C={C:5d}, P={P:5d}) x{cnt:3d}: gather {tg*1e3:7.2f} "
              f"einsum +{(te-tg)*1e3:7.2f} solve +{(tf-te)*1e3:7.2f} "
              f"full {tf*1e3:8.2f} ms | woodbury {tw*1e3:8.2f} ms | "
              f"corr-MXU-eff {eff*100:4.1f}%", flush=True)
    print(f"  {side} half-sweep: gather {tot_g:.2f}s einsum-cum "
          f"{tot_e:.2f}s full {tot_f:.2f}s | woodbury-mix {tot_w:.2f}s",
          flush=True)

# correctness spot check at one small-P USER-side shape (the item side
# has no small-P chunks at ML-20M degrees — an unguarded large-P check
# OOM'd the M buffer)
chunks = [c for c in build_chunks(X, CHUNK, U, num_components=K)
          if c.idx_pad.shape[1] <= K]
ch = min(chunks, key=lambda c: c.idx_pad.shape[1])
Y = jnp.asarray(rng.normal(size=(I, K)).astype(np.float32) * 0.1)
A0 = (Y.T @ Y + 0.01 * jnp.eye(K, dtype=jnp.float32))
A0i = jnp.linalg.inv(A0)
xs = wmf_chunk_solve(Y, A0, jnp.asarray(ch.idx_pad),
                     jnp.asarray(ch.valid), jnp.float32(10.0),
                     solver="cholesky")
xw = stage_woodbury_x(Y, A0i, jnp.asarray(ch.idx_pad),
                      jnp.asarray(ch.valid))
err = float(jnp.max(jnp.abs(xs - xw)) / (jnp.max(jnp.abs(xs)) + 1e-9))
print(f"\nwoodbury max rel err vs standard (P={ch.idx_pad.shape[1]}): "
      f"{err:.2e}", flush=True)
