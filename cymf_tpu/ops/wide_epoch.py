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


def prep_shard_static_wide(u2, i2, rw: int, rh: int, wrows: int, n: int,
                           tile: int = TILE):
    """Once per fit (sharded wide engine, round 5 — BASELINE config 5's
    multi-device d >= 128 fast path): slice the u-sorted static streams
    into ``n`` shard-contiguous pieces (wide layout: slots = 1, the
    target row IS the id), localize user ids to shard row offsets, and
    build the per-shard W windows/folded rows and i-side sorted streams.
    The partition mirrors ``ops.packed_epoch.prep_shard_static`` — shard
    ``p`` statically owns rows ``[p*rw/n, (p+1)*rw/n)`` of the wide W
    table, so every W stage is local (`/root/reference/cymf/bpr.pyx:162`
    scaled to a mesh).

    Returns ``(u_loc, rowsu, winw, i_loc, si, rowsi, wini, starts,
    counts, Bd)`` with a leading shard axis on every stream array.
    """
    from .packed_epoch import _sorted_side, shard_slices
    from .sorted_accum import window_ranges

    S, B = u2.shape
    starts, counts, Bd = shard_slices(u2, 0, rw, n, tile, slots=1)
    rw_l = rw // n
    sent = rw_l  # local sentinel: outside every window, gather clamps
    u_loc = np.full((n, S, Bd), sent, np.int32)
    i_loc = np.zeros((n, S, Bd), np.int32)
    rowsu = np.empty((n, S, Bd // LANES, LANES), np.int32)
    winw = np.empty((n, S, 2, rw_l // wrows), np.int32)
    si = np.empty((n, S, Bd), np.int32)
    rowsi = np.empty((n, S, Bd // LANES, LANES), np.int32)
    wini = np.empty((n, S, 2, rh // wrows), np.int32)
    u64 = np.asarray(u2, np.int64)
    for p in range(n):
        off = np.int64(p) * rw_l
        for t in range(S):
            a, c = int(starts[t, p]), int(counts[t, p])
            u_loc[p, t, :c] = np.minimum(u64[t, a:a + c] - off, sent)
            i_loc[p, t, :c] = i2[t, a:a + c]
            rowsu[p, t] = u_loc[p, t].reshape(Bd // LANES, LANES)
            winw[p, t, 0], winw[p, t, 1] = window_ranges(
                u_loc[p, t], rw_l, wrows, tile, align=128)
        si[p], rowsi[p], wini[p] = _sorted_side(i_loc[p], rh, wrows, tile)
    return u_loc, rowsu, winw, i_loc, si, rowsi, wini, starts, counts, Bd


def wide_shard_masks(mf, si, sj):
    """Per-epoch (sharded wide engine): the per-shard sorted live masks —
    :func:`wide_sorted_masks` applied shard-wise to the sliced mask and
    the per-shard sort permutations.  Returns ``(mi, mj)`` uint8
    ``(n, S, Bd//128, 128)`` each."""
    n, S, Bd = mf.shape
    mi = np.empty((n, S, Bd // LANES, LANES), np.uint8)
    mj = np.empty((n, S, Bd // LANES, LANES), np.uint8)
    for p in range(n):
        mi[p], mj[p] = wide_sorted_masks(mf[p], si[p], sj[p])
    return mi, mj


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
