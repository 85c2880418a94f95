"""Packed fused RelMF engine — the packed-table fast path applied to the
propensity-clipped pointwise model (`/root/reference/cymf/relmf.pyx` +
`model.pyx:89-142`).

The per-sample math maps EXACTLY onto the GloVe sample kernel
(`ops/glove_epoch.py::glove_sample_phase`): with the clipped relevance
weight ``theta = r / max(p_i, M)`` riding the context decoration's
"-log(count)" lane and the sample weight lane set to 1, the kernel's
``diff = w.h - theta`` and ``q = diff`` are precisely the reference's
shared gradient factor (`model.pyx:130-139` emits ``(s - theta) * h``
— NO factor 2, like BPR's "no factor 2" quirk), and its outputs are the
lane-placed W gradient and the compact H gradient.  What differs is
epoch-side only:

* loss: ``theta*(1-s)^2 + (1-theta)*s^2 = diff^2 + theta*(1-theta)`` —
  the kernel's ``0.5*f*diff^2`` sum (f=1) is doubled and the static
  ``theta*(1-theta)`` correction plus the reference's ``wd*l2`` term
  (computed from the accumulation count channels against the
  step-start tables) are added;
* weight decay is ADDED into both gradients via the count channels
  (`model.pyx` sign quirk, same fold as the XLA engine).

Unlike BPR (static u, per-epoch j) the WHOLE cell stream is drawn per
epoch, so both sort sides are per-epoch host prep
(:func:`prep_relmf_epoch`).  Labels are read on the host from the
sorted positive-key array (the stream is deterministic per
(seed, epoch) and identical at any mesh size); the propensity factor is
applied ON DEVICE from a gathered ``1/max(p, M)`` column so the label
stream uploads as uint8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import packed as pk
from .fused_sample import decorate
from .glove_epoch import decorate_x, glove_sample_phase
from .packed_epoch import (TILE, _fold_rows, _pad_lanes, _sorted_side,
                           make_packed_optimizer, window_ranges)
from .sorted_accum import sorted_accum

LANES = 128


def supports_packed_relmf(K: int) -> bool:
    """The payload must lane-pack and the context decoration needs lanes
    ``K`` and ``K + 1`` free."""
    return pk.packable(K) and K + 2 <= LANES


def prep_relmf_epoch(seed, epoch, S: int, B: int, num_users: int,
                     num_items: int, K: int, rw: int, rh: int,
                     wrows_w: int, wrows_h: int, pos_keys: np.ndarray,
                     key_filter=None, tile: int = TILE):
    """Once per epoch: draw ``S*B`` uniform (u, i) cells (the reference
    samples positives AND negatives, `relmf.pyx:143-148`), label them by
    membership in the sorted positive keys, sort each step by user, and
    build both accumulation sides.  Deterministic per ``(seed, epoch)``
    from the portable PCG64 stream.

    Returns ``(u2, i2, lab, winw, si, rowsi, wini)`` — all streams in
    u-sorted per-step order, ``lab`` uint8.

    When the C++ extension is built (and ``CYMF_TPU_PREP`` doesn't force
    numpy) the whole pass runs in ``_native.relmf_prep_epoch`` (OpenMP
    over steps, counting sorts — the numpy path costs ~12s per ml-1m
    epoch vs ~0.5s of device time).  The native and numpy paths draw
    from different (equally uniform) deterministic streams, like BPR's
    epoch prep (``prep_backend`` reports which)."""
    import os
    s_w = pk.num_slots(K)
    from .packed_epoch import prep_backend
    if key_filter is not None and prep_backend() == "native":
        from ..native import _native
        if hasattr(_native, "relmf_prep_epoch"):
            fkeys, filt, indptr, log2_bits = key_filter
            nseed = int(seed) * 1_000_003 + int(epoch) + 0x5e1f
            ub, ib, lb, wwb, pb, rb, wib = _native.relmf_prep_epoch(
                fkeys, indptr, filt, S, B, num_users, num_items, s_w,
                rw, rh, wrows_w, wrows_h, tile, nseed, log2_bits)
            return (np.frombuffer(ub, np.int32).reshape(S, B),
                    np.frombuffer(ib, np.int32).reshape(S, B),
                    np.frombuffer(lb, np.uint8).reshape(S, B),
                    np.frombuffer(wwb, np.int32)
                    .reshape(S, 2, rw // wrows_w),
                    np.frombuffer(pb, np.int32).reshape(S, B),
                    np.frombuffer(rb, np.int32).reshape(S, B // 128, 128),
                    np.frombuffer(wib, np.int32)
                    .reshape(S, 2, rh // wrows_h))
    rng = np.random.default_rng((int(seed), int(epoch), 7))
    r = rng.integers(0, np.int64(num_users) * num_items, (S, B),
                     dtype=np.int64)
    u2 = (r // num_items).astype(np.int32)
    i2 = (r % num_items).astype(np.int32)
    order = np.argsort(u2, axis=1, kind="stable")
    u2 = np.take_along_axis(u2, order, axis=1)
    i2 = np.take_along_axis(i2, order, axis=1)
    # label = membership in the positives — the complement of the BPR
    # rejection mask (same native-accelerated probe; all cells are
    # in-data here, so in_data never gates)
    from .packed_epoch import _reject_mask
    lab = (1.0 - _reject_mask(u2, i2, pos_keys, num_users, num_items,
                              key_filter=key_filter)).astype(np.uint8)
    s = pk.num_slots(K)
    winw = np.empty((S, 2, rw // wrows_w), np.int32)
    for t in range(S):
        winw[t, 0], winw[t, 1] = window_ranges(
            u2[t].astype(np.int64) // s, rw, wrows_w, tile, align=128)
    si, rowsi, wini = _sorted_side(i2, rh, wrows_h, tile)
    return u2, i2, lab, winw, si, rowsi, wini


def window_ranges_device(rows_sorted, r_pad: int, wrows: int,
                         tile: int = TILE):
    """In-jit :func:`cymf_tpu.ops.sorted_accum.window_ranges` (align=128
    path, bit-identical outputs) — round 5's on-device epoch prep
    (verdict #2): with the whole draw->label->sort->window pipeline
    traced into the epoch scan, per-epoch host streams (and their
    uploads) disappear.  ``rows_sorted`` is the traced ascending (B,)
    int32 row stream; B must be a tile multiple (it is — the trainer
    rounds the batch)."""
    B = rows_sorted.shape[0]
    nw = r_pad // wrows
    bounds = jnp.arange(nw + 1, dtype=jnp.int32) * wrows
    edges = jnp.searchsorted(rows_sorted, bounds).astype(jnp.int32)
    Bp = -(-max(B, 1) // tile) * tile
    starts = (edges[:-1] // 128) * 128
    counts = edges[1:] - starts
    nch = -(-counts // tile)
    over = starts + nch * tile > Bp
    need = jnp.maximum(nch, -(-(Bp - edges[:-1]) // tile))
    starts = jnp.where(over, Bp - need * tile, starts)
    counts = edges[1:] - starts
    return starts, counts


def _sorted_side_device(vals, r_pad: int, wrows: int, tile: int = TILE):
    """In-jit :func:`cymf_tpu.ops.packed_epoch._sorted_side` for one
    traced (B,) stream: (perm, folded sorted rows, (2, NW) windows)."""
    B = vals.shape[0]
    srt, perm = jax.lax.sort_key_val(
        vals, jnp.arange(B, dtype=jnp.int32))
    starts, counts = window_ranges_device(srt, r_pad, wrows, tile)
    return perm, srt.reshape(B // LANES, LANES), starts, counts


@functools.partial(
    jax.jit,
    static_argnames=("S", "B", "num_users", "num_items", "opt_name",
                     "lr", "weight_decay", "K", "rw", "rh", "wrows_w",
                     "wrows_h", "interpret", "precision"),
    donate_argnums=(0, 1, 2, 3))
def packed_relmf_epoch_device(Wp, Hp, ow, oh, hs, key, t0,
                              n_valid, *, S, B, num_users, num_items,
                              opt_name, lr, weight_decay, K, rw, rh,
                              wrows_w=256, wrows_h=256, interpret=False,
                              precision="split"):
    """Packed RelMF epoch with ON-DEVICE stream prep (round 5, verdict
    #2): each scan step draws its own ``B`` uniform (u, i) cells with
    counter-based threefry, labels them against the replicated pair
    hash-set (``ops/hashset.py`` — the same structure the XLA engine
    rejects with), sorts by user (carrying i/label through the
    permutation), and builds both accumulation sides' windows in-jit
    (:func:`window_ranges_device`).  The per-sample math and update
    semantics are identical to :func:`packed_relmf_epoch`; only the
    stream SOURCE differs (device threefry vs host PCG64/mt19937 — a
    third deterministic, equally uniform draw backend).

    Measured costs of the added prep stages (docs/measurements/r5/
    probes.log): draw+sort+windows ~0.12 ms/step at B=131k — per-epoch
    host prep, its ~20 B/cell upload stream, and the
    ``CYMF_TPU_RELMF_PACKED_MAX_CELLS`` cap (`models/relmf.py`) all
    disappear, unlocking packed rates at ML-20M's 3.7B-cell epochs
    (`/root/reference/cymf/relmf.pyx:143-148` semantics).

    ``t0`` is the traced GLOBAL step offset of this dispatch: long
    epochs are chunked into <=2048-step scans (the relay kills
    minutes-long single dispatches — CLAUDE.md), re-dispatched with
    advancing ``t0``; draws depend only on ``fold_in(key, t0 + step)``,
    so chunking is RNG-transparent.  ``S`` is this dispatch's scan
    length.

    ``invp`` rides on LANE ``K`` of the ``Hp`` table (the trainer
    injects it — :meth:`RelMF._fit_packed_relmf`): the item gather the
    step already performs brings ``1/max(p_i, M)`` along for free,
    where a separate ``invp[i_s]`` gather measured 0.29 ms/step
    (docs/measurements/r5/prep_ablate.log).  Lane ``K`` survives every
    optimizer pass because gradients are payload-masked (lanes >= K are
    exactly zero in ``gbh``), and the decoration overwrites lanes
    >= K in the STREAM, so the kernel never sees it as payload.
    """
    from .hashset import hashset_contains

    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)
    cb = pk.count_base(K)
    payb = jnp.arange(pk.LANES) < K
    payf = payb.astype(jnp.float32)

    def step(carry, t):
        Wp, Hp, ow, oh, loss_acc = carry
        kt = jax.random.fold_in(key, t)
        u = jax.random.randint(jax.random.fold_in(kt, 0), (B,), 0,
                               num_users, dtype=jnp.int32)
        i = jax.random.randint(jax.random.fold_in(kt, 1), (B,), 0,
                               num_items, dtype=jnp.int32)
        lab = hashset_contains(hs, u, i)
        # u-sort carrying (i, label): pack both into the value word
        val = i * 2 + lab.astype(jnp.int32)
        su, sval = jax.lax.sort_key_val(u, val)
        i_s = sval // 2
        lab_f = (sval & 1).astype(jnp.float32)
        ones = jnp.ones((B,), jnp.float32)
        phys, slot = su // s, su % s
        ws, wc = window_ranges_device(phys, rw, wrows_w)
        si, rowsi, is_, ic = _sorted_side_device(i_s, rh, wrows_h)

        Du = decorate(Wp.at[phys].get(
            indices_are_sorted=True, mode="promise_in_bounds"),
            slot, ones, K)
        Dxg = Hp.at[i_s].get(mode="promise_in_bounds")
        th = lab_f * Dxg[:, K]  # invp rides the gathered row's lane K
        Dx = decorate_x(Dxg, ones, th, K)
        SW, Q, lossp = glove_sample_phase(Du, Dx, Kp=K,
                                          interpret=interpret)

        Aw = sorted_accum(_fold_rows(phys), SW, ws, wc, r_pad=rw,
                          wrows=wrows_w, tile=TILE, interpret=interpret,
                          precision=precision)
        gw, nw = pk.split_counts(Aw, K)
        nwE = pk.expand_counts(nw, K)
        l2w = jnp.sum(nwE * jnp.square(Wp[:, :cb]))
        gbw = _pad_lanes(gw + wd * nwE * Wp[:, :cb])
        mw = _pad_lanes(nwE > 0)
        Wp, ow = opt.update(Wp, ow, gbw, mw, K)

        D = sorted_accum(rowsi, Q[si], is_, ic, r_pad=rh,
                         wrows=wrows_h, tile=TILE, interpret=interpret,
                         precision=precision)
        nh = D[:, K:K + 1]
        l2h = jnp.sum(nh * jnp.square(Hp * payf))
        gbh = (D + wd * nh * Hp) * payf
        mh = (nh > 0) & payb
        Hp, oh = opt.update(Hp, oh, gbh, mh, K)

        loss_step = (2.0 * lossp[0, 0] + jnp.sum(th * (1.0 - th))
                     + wd * (l2w + l2h))
        return (Wp, Hp, ow, oh, loss_acc + loss_step), None

    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init, t0 + jnp.arange(S))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(
        jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("opt_name", "lr", "weight_decay", "K", "rw", "rh",
                     "wrows_w", "wrows_h", "interpret", "precision"),
    donate_argnums=(0, 1, 2, 3))
def packed_relmf_epoch(Wp, Hp, ow, oh, u_steps, i_steps, lab_steps,
                       si_steps, rowsi_steps, wini, winw, invp, n_valid,
                       *, opt_name, lr, weight_decay, K, rw, rh,
                       wrows_w=256, wrows_h=256, interpret=False,
                       precision="split"):
    """One epoch over S u-sorted minibatches (scan) of packed RelMF.
    ``Wp`` is the packed user table, ``Hp`` the logical item table,
    ``invp`` a replicated ``(rh, 1)`` column of ``1 / max(p_i, M)``
    (clip folded in), and the streams come from
    :func:`prep_relmf_epoch`.  Update semantics match the XLA engine's
    synchronous per-batch step (`models/relmf.py::_relmf_epoch`) —
    identical math, different (equally uniform) draw stream."""
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)
    cb = pk.count_base(K)
    payb = jnp.arange(pk.LANES) < K
    payf = payb.astype(jnp.float32)

    def step(carry, xs):
        Wp, Hp, ow, oh, loss_acc = carry
        u, i, lab, si, rowsi, wi, ww = xs
        B = u.shape[0]
        ones = jnp.ones((B,), jnp.float32)
        phys, slot = u // s, u % s
        th = lab.astype(jnp.float32) * invp[i, 0]
        Du = decorate(Wp.at[jnp.minimum(phys, rw - 1)].get(
            indices_are_sorted=True, mode="promise_in_bounds"),
            slot, ones, K)
        Dx = decorate_x(Hp.at[i].get(mode="promise_in_bounds"), ones, th,
                        K)
        SW, Q, lossp = glove_sample_phase(Du, Dx, Kp=K,
                                          interpret=interpret)

        Aw = sorted_accum(_fold_rows(phys), SW, ww[0], ww[1], r_pad=rw,
                          wrows=wrows_w, tile=TILE, interpret=interpret,
                          precision=precision)
        gw, nw = pk.split_counts(Aw, K)
        nwE = pk.expand_counts(nw, K)
        # loss l2 term uses the step-start tables (forward values)
        l2w = jnp.sum(nwE * jnp.square(Wp[:, :cb]))
        # decay ADDED into the gradient (model.pyx:130-139 sign quirk)
        gbw = _pad_lanes(gw + wd * nwE * Wp[:, :cb])
        mw = _pad_lanes(nwE > 0)
        Wp, ow = opt.update(Wp, ow, gbw, mw, K)

        D = sorted_accum(rowsi, Q[si], wi[0], wi[1], r_pad=rh,
                         wrows=wrows_h, tile=TILE, interpret=interpret,
                         precision=precision)
        nh = D[:, K:K + 1]
        l2h = jnp.sum(nh * jnp.square(Hp * payf))
        gbh = (D + wd * nh * Hp) * payf
        mh = (nh > 0) & payb
        Hp, oh = opt.update(Hp, oh, gbh, mh, K)

        # loss = sum diff^2 (kernel, f=1 makes lossp half of it)
        #      + sum theta*(1-theta) + wd * sum l2   (model.pyx:117)
        loss_step = (2.0 * lossp[0, 0] + jnp.sum(th * (1.0 - th))
                     + wd * (l2w + l2h))
        return (Wp, Hp, ow, oh, loss_acc + loss_step), None

    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init, (u_steps, i_steps, lab_steps, si_steps, rowsi_steps,
                     wini, winw))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(
        jnp.float32)
