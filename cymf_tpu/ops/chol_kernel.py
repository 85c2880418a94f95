"""Pallas batched small-Cholesky kernel — the ALS blocked solve's last
measured wall (docs/ROOFLINE.md round-5 "K^3 Cholesky wall" section).

XLA's Cholesky expander runs one While iteration per matrix column; the
per-iteration cost is max(~0.27 ms fixed, bytes / ~130 GB/s effective)
and C-scaling is refuted as an amortization lever
(`docs/measurements/r5/chol_cscale.log`).  This kernel instead holds a
(G, B, B) tile of the batch in VMEM and runs the full factorization
and triangular inversion as an in-core ``fori_loop`` — no XLA While
overhead, VMEM-rate rank-1 updates.

Only the DIAGONAL-BLOCK work of `ops/als.py::_solve_spd_blocked` is
replaced (its measured ~70 ms of the 81 ms (2048, 256, 256) solve);
panel formation and both substitution sweeps stay in XLA where they
are already MXU matmuls.

In-place layout: the loop carries one (G, B, B) buffer whose columns
``<= i`` hold L and columns ``> i`` hold the partially-updated A.  All
selections are mask algebra over lane/sublane iotas — no dynamic
slicing, no gathers, so Mosaic's layout analysis stays trivial.

Opt-in via ``CYMF_TPU_ALS_CHOL=pallas`` (resolved to the
``cholesky_pallas<block>`` solver name at fit level); falls back to
interpret mode off-TPU like every other kernel in the repo.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_inv_kernel(a_ref, l_ref, linv_ref, *, B: int):
    """Per-tile: factorize (G, B, B) SPD matrices and invert the lower
    factor.  Masks: ``rows``/``cols`` are (B, B) iotas shared by every
    step; the loop index enters only through comparisons.  The loops
    mutate the OUTPUT refs in place instead of carrying (G, B, B)
    values — loop-carried buffers became ~32 MB of register spills on
    the first hardware contact (VMEM OOM at 128 MB)."""
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    l_ref[...] = a_ref[...].astype(f32)                  # working buffer

    def fact_step(i, _):
        M = l_ref[...]
        colmask = (cols == i).astype(f32)                # (B, B)
        col = jnp.sum(M * colmask[None], axis=2)         # (G, B) col i
        rvec = rows[:, 0]                                # (B,) row index
        d = jnp.sum(jnp.where(rvec[None, :] == i, col, 0.0), axis=1)
        li = col * jax.lax.rsqrt(d)[:, None]             # (G, B)
        li = jnp.where(rvec[None, :] >= i, li, 0.0)
        # write column i := li, update trailing columns (> i)
        M = jnp.where((cols == i)[None], li[:, :, None], M)
        upd = li[:, :, None] * li[:, None, :]
        l_ref[...] = jnp.where((cols > i)[None], M - upd, M)
        return 0

    jax.lax.fori_loop(0, B, fact_step, 0)
    l_ref[...] = jnp.where((rows >= cols)[None], l_ref[...], 0.0)

    # forward substitution for Z = L^{-1}: row r of Z at step r
    linv_ref[...] = jnp.zeros_like(l_ref[...])

    def inv_step(r, _):
        L = l_ref[...]
        Z = linv_ref[...]
        rowmask = (rows == r).astype(f32)                # (B, B)
        Lrow = jnp.sum(L * rowmask[None], axis=1)        # (G, B) = L[:, r, :]
        cvec = cols[0, :]                                # (B,) lane index
        Lrr = jnp.sum(jnp.where(cvec[None, :] == r, Lrow, 0.0), axis=1)
        Lbelow = jnp.where(cvec[None, :] < r, Lrow, 0.0)
        acc = jnp.sum(Lbelow[:, :, None] * Z, axis=1)    # (G, B)
        er = (cvec == r).astype(f32)                     # (B,)
        zr = (er[None, :] - acc) / Lrr[:, None]
        linv_ref[...] = jnp.where((rows == r)[None], zr[:, None, :], Z)
        return 0

    jax.lax.fori_loop(0, B, inv_step, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def chol_inv_batched(A: jax.Array, *, block: int = 64,
                     interpret: bool = False):
    """Batched Cholesky + lower-triangular inverse: A (C, B, B) SPD ->
    (L, Linv), both (C, B, B) f32.  Grid tiles G matrices per step
    (G chosen so three (G, B, B) f32 buffers stay well inside VMEM)."""
    C, B, _ = A.shape
    assert B == block, (A.shape, block)
    G = max(1, min(C, (1 << 20) // (B * B * 4)))         # ~1MB per buffer
    while C % G:
        G -= 1
    if G < 8:
        # the divisor search can collapse (C with no divisor in [8, 64],
        # or a large CYMF_TPU_ALS_CHOL_BLOCK shrinking the tile budget):
        # sub-8-sublane tiles trip a Mosaic relayout on (G, B) vectors
        # (found on hardware), and such batches are cheap on XLA anyway
        L = jnp.linalg.cholesky(A.astype(jnp.float32))
        eye = jnp.eye(B, dtype=jnp.float32)
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(eye, L.shape), lower=True)
        return L, Linv
    grid = (C // G,)
    kern = functools.partial(_chol_inv_kernel, B=B)
    L, Linv = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((G, B, B), lambda i: (i, 0, 0))],
        out_specs=[pl.BlockSpec((G, B, B), lambda i: (i, 0, 0)),
                   pl.BlockSpec((G, B, B), lambda i: (i, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((C, B, B), jnp.float32),
                   jax.ShapeDtypeStruct((C, B, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(A.astype(jnp.float32))
    return L, Linv
