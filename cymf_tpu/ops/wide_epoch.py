"""Wide-row fused BPR epoch — the fast path for K >= 128 (BASELINE.json
config 5: "BPR + WMF on ML-20M, d=256").

The packed engine (`ops/packed_epoch.py`) exists because narrow rows
(K < 128) waste lane bandwidth; at K >= 128 rows already fill whole
128-lane granules, so there is nothing to pack and no slot machinery to
run — what remains from the packed design is its real lesson: **no XLA
scatter anywhere**.  Gradient accumulation stays windowed one-hot MXU
contraction over host-sorted streams (`ops/sorted_accum.py`, generalized
to multi-granule rows), host/C++ epoch prep supplies the negative
streams, rejection masks, sort permutations and window ranges, and the
sample phase is plain fused XLA elementwise+reduce over the gathered
rows (the packed engine's Pallas sample kernel earns its keep doing lane
rotations, which wide rows do not need).

Stream layout: tables are (rows, Kp) with Kp = K padded to a granule
multiple; gradient/product streams carry ONE extra granule whose lane 0
is the live-sample count channel, so the same accumulation produces
summed gradients AND per-row live counts (for the weight-decay
reconstruction ``wd * n_r * T_r`` and the touched-row optimizer masks,
exactly as the packed engine — see `ops/packed_epoch.py` items 2-3).

Reference behaviour being replaced: the same Hogwild loop as the packed
engine (`/root/reference/cymf/bpr.pyx:162-169`, `model.pyx:37-87`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import packed as pk
from .packed_epoch import make_packed_optimizer
from .sorted_accum import sorted_accum, sorted_accum_dual

TILE = 1024
LANES = 128


def kp_width(K: int) -> int:
    """Payload lanes of the wide layout: K padded to a granule multiple."""
    return -(-int(K) // LANES) * LANES


def wide_rows(n: int, multiple: int = 512) -> int:
    return -(-int(n) // multiple) * multiple


def pack_wide(table, K: int, multiple: int = 512) -> np.ndarray:
    """(N, K) -> (R, Kp) float32 with zero padding."""
    table = np.asarray(table, np.float32)
    N = table.shape[0]
    out = np.zeros((wide_rows(N, multiple), kp_width(K)), np.float32)
    out[:N, :K] = table[:, :K]
    return out


def wide_sorted_masks(mask, si, sj):
    """Once per epoch (host): the per-stream live masks in sorted order,
    folded lane-major — ``(S, B//128, 128)`` uint8 each.  The epoch scan
    routes masked samples' target rows to the sentinel so the
    accumulation kernels can compute live counts from one-hot row-sums
    (``sorted_accum(count_lanes=True)``) and the gradient streams carry
    payload lanes only (round-4 stream-width optimization: -33% HBM
    traffic per accumulation pass at Kp=256)."""
    S, B = mask.shape
    mi = np.take_along_axis(mask, si, axis=1)
    mj = np.take_along_axis(mask, sj, axis=1)
    return (mi.reshape(S, B // LANES, LANES),
            mj.reshape(S, B // LANES, LANES))


@functools.partial(
    jax.jit, static_argnames=("opt_name", "lr", "weight_decay", "K", "rw",
                              "rh", "wrows", "interpret", "precision"),
    donate_argnums=(0, 1, 2, 3))
def wide_bpr_epoch(W, H, ow, oh, u_steps, i_steps, rowsu_steps, winw,
                   si_steps, rowsi_steps, wini, j_steps, mask_steps,
                   sj_steps, rowsj_steps, winj, mi_steps, mj_steps,
                   n_valid, *, opt_name, lr, weight_decay, K, rw, rh,
                   wrows=512, interpret=False, precision="split"):
    """One epoch over S pre-sorted minibatches (scan), K >= 128.

    ``W``/``H`` are (rw, Kp) / (rh, Kp) wide tables.  Index streams as in
    :func:`cymf_tpu.ops.packed_epoch.packed_bpr_epoch` (slots=1: target
    rows ARE the user/item ids), plus ``rowsu_steps`` (folded sorted user
    rows — the W side needs its own fold at slots=1) and
    ``mi_steps``/``mj_steps`` (:func:`wide_sorted_masks`).

    Gradient streams are payload-only (no count granule): live counts
    come from the accumulation kernels' one-hot row-sums with masked
    samples routed to sentinel rows — see
    :func:`cymf_tpu.ops.sorted_accum.sorted_accum` ``count_lanes``.
    """
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    Kp = W.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Kp), 1)
    payf = (lane < K).astype(jnp.float32)
    payb = lane < K
    acc = functools.partial(sorted_accum, tile=TILE, interpret=interpret,
                            precision=precision, count_lanes=True)

    def step(carry, xs):
        W, H, ow, oh, loss_acc = carry
        (u, i, rowsu, ww, si, rowsi, wi, j, mf, sj, rowsj, wj, mi,
         mj) = xs
        mfold = mf.reshape(rowsu.shape)
        # masked/padding samples -> sentinel rows (never match a window)
        rowsu_m = jnp.where(mfold > 0, rowsu, rw)
        rowsi_m = jnp.where(mi > 0, rowsi, rh)
        rowsj_m = jnp.where(mj > 0, rowsj, rh)
        mf = mf.astype(jnp.float32)  # uint8 upload, f32 math

        wu, hi, hj = W[u], H[i], H[j]
        x = jnp.sum(wu * (hi - hj), axis=1, keepdims=True)
        sigm = jax.nn.sigmoid(-x) * mf[:, None]  # mask folded into sig
        SW = sigm * (hi - hj)
        Q = sigm * wu
        l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1)
        loss = jnp.sum(
            (-jax.nn.log_sigmoid(x[:, 0]) + wd * l2) * mf)

        Aw = acc(rowsu_m, SW, ww[0], ww[1], r_pad=rw, wrows=wrows)
        nw = Aw[:, Kp:Kp + 1]
        W, ow = opt.update(W, ow, (-Aw[:, :Kp] + wd * nw * W) * payf,
                           (nw > 0) & payb, K)

        D = sorted_accum_dual(
            rowsi_m, Q[si], wi[0], wi[1], rowsj_m, Q[sj], wj[0], wj[1],
            r_pad=rh, neg_lanes=Kp, wrows=wrows, tile=TILE,
            interpret=interpret, precision=precision, count_lanes=True)
        nh = D[:, Kp:Kp + 1]
        H, oh = opt.update(H, oh, (D[:, :Kp] + wd * nh * H) * payf,
                           (nh > 0) & payb, K)
        return (W, H, ow, oh, loss_acc + loss), None

    init = (W, H, ow, oh, jnp.zeros((), jnp.float32))
    (W, H, ow, oh, loss), _ = jax.lax.scan(
        step, init, (u_steps, i_steps, rowsu_steps, winw, si_steps,
                     rowsi_steps, wini, j_steps, mask_steps, sj_steps,
                     rowsj_steps, winj, mi_steps, mj_steps))
    return W, H, ow, oh, loss / jnp.maximum(n_valid, 1).astype(jnp.float32)


def prep_static_wide(u2, i2, rw: int, rh: int, wrows: int,
                     tile: int = TILE):
    """Once per fit: folded sorted user rows + W windows (u pre-sorted),
    and the full i-side prep.  Returns
    ``(rowsu, winw, si, rowsi, wini)``."""
    from .packed_epoch import _sorted_side
    from .sorted_accum import window_ranges

    S, B = u2.shape
    rowsu = np.empty((S, B // LANES, LANES), np.int32)
    winw = np.empty((S, 2, rw // wrows), np.int32)
    for t in range(S):
        rowsu[t] = u2[t].reshape(B // LANES, LANES)
        winw[t, 0], winw[t, 1] = window_ranges(u2[t], rw, wrows, tile,
                                               align=128)
    si, rowsi, wini = _sorted_side(i2, rh, wrows, tile)
    return rowsu, winw, si, rowsi, wini
