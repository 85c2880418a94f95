"""Packed-table fused BPR epoch — the single-chip fast path.

Replaces the reference's Hogwild per-sample SGD loop
(`/root/reference/cymf/bpr.pyx:162-169`, `model.pyx:54-87`) with a
synchronous-minibatch pipeline engineered around three measured TPU facts
(docs/PERF.md): XLA scatter is the bottleneck (40-90M rows/s), gathers are
per-row issue-bound (~2.2ns/row), and HBM round-trips of batch-sized
buffers are the next cost after that.  Design:

1. **Packed W, logical H** (`ops/packed.py`): the user table packs
   ``s`` logical rows per 128-lane physical row, so every gathered
   granule is fully useful and its dense optimizer pass shrinks
   ``s``-fold; the item table stores ONE logical row per physical row
   (payload lanes ``[0, K)``), so item gathers arrive lane-aligned and
   the sample kernel spends zero rotations on them — H is ~5x smaller
   than W on the MovieLens family, so its optimizer pass stays cheap
   either way.  One lane per logical row is reserved as a *count
   channel* (see 3).
2. **Pallas sorted accumulation** (`ops/sorted_accum.py`): gradient
   scatter-adds become windowed one-hot MXU matmuls over host-sorted row
   streams — three calls per step (W: batches are host-sorted by user;
   H-positive and H-negative: device gather by a host-computed sort
   permutation, one per side — a 2B-index gather from a B-row buffer is
   5x slower than two B-index gathers, measured).  Both H sides gather
   from the SAME compact kernel output ``Q = sig*m*wu`` (they differ
   only in sign and target row), which pipelines ~2.3x better than two
   distinct-source gathers and saves a (B, 128) kernel output.
3. **Fused gradient formation**: per-sample gradients NEVER materialize.
   The kernels accumulate the compact per-sample products
   ``sig*m*(hi-hj)`` (W side) / ``sig*m*wu`` (H sides) while the count
   channel accumulates live-sample counts ``n_r`` in the same matmul;
   the weight-decay term reconstitutes per ROW in the optimizer pass as
   ``wd * n_r * T_r`` (algebraically identical: every contribution in a
   step reads the same pre-update row).
4. **Host-side negative sampling**: the reference draws negatives on the
   fly from a shared mt19937 (`bpr.pyx:165-167`); here each epoch's
   negative stream, rejection mask, and j-side sort permutation are one
   vectorized pass (numpy, or the C++ OpenMP pipeline in ``native/``).
   Batch composition is fixed across epochs exactly like the reference
   (one shuffle before training, `bpr.pyx:104`), so the u- and i-side
   permutations are computed once per fit; only the j side re-sorts.

Semantics match the XLA batch engine (`models/bpr.py`): one synchronous
update per touched row per step with the summed gradient, collision
masking == the reference's skip.  One documented measure-zero edge
differs: the packed engine's touched-row mask is COUNT-based (a row is
touched iff a live sample hit it — the count channel; this is the
reference-faithful semantics, `optimizer.pyx:150-160` updates moments per
touched element), while the XLA engine's is value-based (summed gradient
!= 0), so they diverge only when live samples' gradients cancel exactly.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import packed as pk
from .fused_sample import (TILE as SAMPLE_TILE, WROWS_A, bpr_sample_phase,
                           bpr_sample_phase_v5, decorate)
from .fused_step import (CROWS, LOSS_LANE, bpr_block_step_v6,
                         bpr_pool_step_v8, bpr_range_step_v7, prep_blocks,
                         supports_v6, supports_v7, supports_v8)
from .sorted_accum import sorted_accum, sorted_accum_dual, window_ranges

TILE = int(os.environ.get("CYMF_TPU_ACCUM_TILE", "1024"))


def _fold_rows(phys):
    """int32[B] -> lane-major int32[B/128, 128] (B must be a multiple of
    the DMA tile — the batch is rounded up to one by the trainer, so no
    per-step padding copy is ever materialized)."""
    return phys.reshape(-1, 128)


def unpack_device(Tp, K: int):
    """(R, 128) packed device array -> (R*s, K) logical rows (device op)."""
    s = pk.num_slots(K)
    R = Tp.shape[0]
    return Tp[:, : s * K].reshape(R * s, K)


class PackedAdam:
    """Adam over packed tables with per-logical-row touched masking
    (constant bias correction — parity quirk, `optimizer.pyx:150-160`).
    ``mask`` comes from the count channel: True on every payload lane of
    a row touched by at least one live sample."""

    def __init__(self, alpha, beta1=0.9, beta2=0.999, epsilon=1e-8):
        self.alpha, self.beta1, self.beta2, self.epsilon = \
            float(alpha), float(beta1), float(beta2), float(epsilon)

    def init(self, Tp):
        return {"m": jnp.zeros_like(Tp), "v": jnp.zeros_like(Tp)}

    def update(self, Tp, state, gbuf, mask, K):
        m = jnp.where(mask, self.beta1 * state["m"]
                      + (1.0 - self.beta1) * gbuf, state["m"])
        v = jnp.where(mask, self.beta2 * state["v"]
                      + (1.0 - self.beta2) * jnp.square(gbuf), state["v"])
        delta = jnp.where(
            mask, -self.alpha * (m / (1.0 - self.beta1))
            / (jnp.sqrt(v / (1.0 - self.beta2)) + self.epsilon), 0.0)
        return Tp + delta, {"m": m, "v": v}


class PackedAdaGrad:
    """AdaGrad, ones-init accumulators (`optimizer.pyx:69-82`).  Zero
    gradient is naturally a no-op — no mask needed."""

    def __init__(self, lr):
        self.lr = float(lr)

    def init(self, Tp):
        return {"accum": jnp.ones_like(Tp)}

    def update(self, Tp, state, gbuf, mask, K):
        accum = state["accum"] + jnp.square(gbuf)
        return Tp - self.lr * gbuf * jax.lax.rsqrt(accum), {"accum": accum}


class PackedSgd:
    def __init__(self, lr):
        self.lr = float(lr)

    def init(self, Tp):
        return {}

    def update(self, Tp, state, gbuf, mask, K):
        return Tp - self.lr * gbuf, state


def make_packed_optimizer(name, lr):
    if name == "adam":
        return PackedAdam(alpha=lr)
    if name == "adagrad":
        return PackedAdaGrad(lr)
    if name == "sgd":
        return PackedSgd(lr)
    raise Exception(f"{name} is invalid.")


def _pad_lanes(a):
    return jnp.pad(a, ((0, 0), (0, 128 - a.shape[1])))


@functools.partial(
    jax.jit, static_argnames=("opt_name", "lr", "weight_decay", "K", "rw",
                              "rh", "wrows_w", "wrows_h", "interpret",
                              "precision", "kernel_v"),
    donate_argnums=(0, 1, 2, 3))
def packed_bpr_epoch(Wp, Hp, ow, oh, u_steps, i_steps, si_steps,
                     rowsi_steps, wini, j_steps, mask_steps, sj_steps,
                     rowsj_steps, winj, winw, wstart_steps, cs_steps,
                     cn_steps, n_valid, *,
                     opt_name, lr, weight_decay, K, rw, rh, wrows_w=512,
                     wrows_h=512, interpret=False, precision="split",
                     kernel_v=4):
    """One epoch over S pre-sorted minibatches (scan).  ``Wp`` is the
    packed user table (``rw`` physical rows); ``Hp`` is the LOGICAL item
    table (``rh`` = padded item count, payload lanes [0, K), count lane
    K).  All index streams, permutations and window ranges are
    host-prepared device arrays:

      u_steps int32[S, B]        users, ascending within each step
      i_steps int32[S, B]        positives, aligned with u order
      si_steps int32[S, B]       permutation sorting samples by item id
      rowsi_steps int32[S, B/128, 128]  folded sorted item ids
      wini int32[S, 2, NWH]      i-side windows (starts; counts)
      j_steps int32[S, B]        negatives (host-drawn), aligned with u
      mask_steps f32[S, B]       1 = live sample (in-data, no collision)
      sj/rowsj/winj              j-side analogues of si/rowsi/wini
      winw int32[S, 2, NWW]      W-side windows over the sorted users
      wstart_steps int32[S, B/SAMPLE_TILE or B/TILE]  per-chunk W
                                 expansion window starts (v5/v6 kernels)
      cs_steps/cn_steps int32[S, rw/wrows_w]  per-block home chunk
                                 ranges (v6 kernel, `prep_blocks`)

    ``kernel_v`` comes from :func:`prep_static` (data-dependent — see
    :func:`engine_version`): 6 = ONE kernel fuses the sample phase with
    the W-side accumulation (``bpr_block_step_v6``) — the W gradient
    stream never touches HBM and the loss rides lane 127 of the
    accumulated block; 5 = the W table is never gathered by XLA — the
    sample kernel expands each tile's rows from a DMA'd window
    (``bpr_sample_phase_v5``), with the mask/slot decoration riding the
    j-stream's dead lanes; 4 = XLA W gather + sample kernel + separate
    accumulation (correct for any user sparsity — 5/6 require every
    chunk's row span to fit its expansion window).  All paths run the
    H-side accumulations as ONE dual-stream kernel producing ``Aj - Ai``
    with summed counts (``sorted_accum_dual``).
    """
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)
    cb = pk.count_base(K)
    acc = functools.partial(sorted_accum, tile=TILE, interpret=interpret,
                            precision=precision)
    payb = jnp.arange(pk.LANES) < K
    payf = payb.astype(jnp.float32)
    if kernel_v == 5 and s < 2:
        raise ValueError("kernel_v=5 requires >= 2 slots per row")

    def step(carry, xs):
        Wp, Hp, ow, oh, loss_acc = carry
        u, i, si, rowsi, wi, j, mf, sj, rowsj, wj, ww, wstart, bcs, bcn = xs
        mf = mf.astype(jnp.float32)  # uint8 upload, f32 decoration
        phys_u, slot_u = u // s, u % s

        # fused sample phase (Pallas): W slot extraction, score/loss, and
        # W lane placement happen on VMEM tiles — XLA's forms of the same
        # ops each cost a full (B, 128) HBM round-trip (docs/PERF.md).
        # H rows gather raw: the logical layout is already lane-aligned.
        if kernel_v == 6:
            Dj = decorate(Hp[j], slot_u, mf, K)
            Aw, Q = bpr_block_step_v6(
                Wp, _fold_rows(phys_u), Hp[i], Dj, wstart, bcs, bcn,
                K=K, wd=weight_decay, rw=rw, wrows=wrows_w,
                interpret=interpret)
            loss_step = jnp.sum(Aw[:, LOSS_LANE])
        elif kernel_v == 5:
            Dj = decorate(Hp[j], slot_u, mf, K)
            SW, Q, lossp = bpr_sample_phase_v5(
                Wp, wstart, _fold_rows(phys_u), Hp[i], Dj, K=K,
                wd=weight_decay, interpret=interpret)
            loss_step = lossp[0, 0]
        else:
            # clamp ONLY the gather index (padding sentinels are OOB by
            # design — their rows stay >= rw so accumulation drops them;
            # their gathered values are mask-zeroed in the kernel)
            Du = decorate(Wp.at[jnp.minimum(phys_u, rw - 1)].get(
                indices_are_sorted=True, mode="promise_in_bounds"),
                slot_u, mf, K)
            if kernel_v == 7:
                Aw, Q = bpr_range_step_v7(
                    _fold_rows(phys_u), Du, Hp[i], Hp[j], ww[0], ww[1],
                    K=K, wd=weight_decay, rw=rw, wrows=wrows_w,
                    interpret=interpret)
                loss_step = jnp.sum(Aw[:, LOSS_LANE])
            else:
                SW, Q, lossp = bpr_sample_phase(
                    Du, Hp[i], Hp[j], K=K, wd=weight_decay,
                    interpret=interpret)
                loss_step = lossp[0, 0]

        if kernel_v not in (6, 7):
            Aw = acc(_fold_rows(phys_u), SW, ww[0], ww[1], r_pad=rw,
                     wrows=wrows_w)
        gw, nw = pk.split_counts(Aw, K)
        nwE = pk.expand_counts(nw, K)
        gbw = _pad_lanes(-gw + wd * nwE * Wp[:, :cb])
        mw = _pad_lanes(nwE > 0)
        Wp, ow = opt.update(Wp, ow, gbw, mw, K)

        # logical H: payload lanes [0, K), live-sample counts at lane K.
        # One dual-stream kernel yields D = Aj - Ai with counts summed.
        D = sorted_accum_dual(
            rowsi, Q[si], wi[0], wi[1], rowsj, Q[sj], wj[0], wj[1],
            r_pad=rh, neg_lanes=K, wrows=wrows_h, tile=TILE,
            interpret=interpret, precision=precision)
        nh = D[:, K:K + 1]
        gbh = (D + wd * nh * Hp) * payf
        mh = (nh > 0) & payb
        Hp, oh = opt.update(Hp, oh, gbh, mh, K)
        return (Wp, Hp, ow, oh, loss_acc + loss_step), None

    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init, (u_steps, i_steps, si_steps, rowsi_steps, wini,
                     j_steps, mask_steps, sj_steps, rowsj_steps, winj,
                     winw, wstart_steps, cs_steps, cn_steps))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("opt_name", "lr", "weight_decay", "K", "rw",
                              "rh", "num_users", "num_items", "wrows_w",
                              "wrows_h", "interpret", "precision"),
    donate_argnums=(0, 1, 2, 3))
def packed_bpr_epoch_device_j(Wp, Hp, ow, oh, u_steps, i_steps, si_steps,
                              rowsi_steps, wini, winw, hs, key, t0,
                              n_valid, *, opt_name, lr, weight_decay, K,
                              rw, rh, num_users, num_items, wrows_w=256,
                              wrows_h=256, interpret=False,
                              precision="split"):
    """The v4 packed BPR epoch with ON-DEVICE negative prep (round 5 —
    the BPR analogue of `ops.relmf_epoch.packed_relmf_epoch_device`):
    each scan step draws its negatives with counter-based threefry,
    rejects against the replicated pair hash-set in-jit (the
    fixed-shape skip of `/root/reference/cymf/bpr.pyx:166-167`), and
    builds the j-side sort/windows with `lax.sort_key_val` + the in-jit
    window builder.  The u/i streams and their sort sides stay static
    per fit (batch composition is fixed across epochs, `bpr.pyx:104`) —
    so a FIT performs zero per-epoch host work and zero per-epoch
    uploads.

    Trade (measured, docs/measurements/r5/prep_ablate.log at ML-20M
    shapes): the in-step draw+reject+sort+windows add ~1.6-2 ms/step on
    top of the 3.29 ms v4 kernel step — fit()-level throughput becomes
    the real device rate instead of being bounded by host-stream
    uploads (CYMF_TPU_BPR_PREP=device opts in; the headline epoch-rate
    protocol keeps host prep, which real local hosts overlap for free).

    ``t0``/``key`` as in ``packed_relmf_epoch_device`` (chunk-safe).
    """
    from .hashset import hashset_contains
    from .relmf_epoch import window_ranges_device

    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)
    cb = pk.count_base(K)
    payb = jnp.arange(pk.LANES) < K
    payf = payb.astype(jnp.float32)

    def step(carry, xs):
        Wp, Hp, ow, oh, loss_acc = carry
        u, i, si, rowsi, wi, ww, t = xs
        B = u.shape[0]
        kt = jax.random.fold_in(key, t)
        j = jax.random.randint(kt, (B,), 0, num_items, dtype=jnp.int32)
        mask = (u < num_users) & ~hashset_contains(hs, u, j)
        mf = mask.astype(jnp.float32)
        js, sj = jax.lax.sort_key_val(j, jnp.arange(B, dtype=jnp.int32))
        rowsj = js.reshape(B // 128, 128)
        wjs, wjc = window_ranges_device(js, rh, wrows_h)

        phys_u, slot_u = u // s, u % s
        Du = decorate(Wp.at[jnp.minimum(phys_u, rw - 1)].get(
            indices_are_sorted=True, mode="promise_in_bounds"),
            slot_u, mf, K)
        SW, Q, lossp = bpr_sample_phase(Du, Hp[i], Hp[j], K=K,
                                        wd=weight_decay,
                                        interpret=interpret)
        loss_step = lossp[0, 0]
        Aw = sorted_accum(_fold_rows(phys_u), SW, ww[0], ww[1], r_pad=rw,
                          wrows=wrows_w, tile=TILE, interpret=interpret,
                          precision=precision)
        gw, nw = pk.split_counts(Aw, K)
        nwE = pk.expand_counts(nw, K)
        gbw = _pad_lanes(-gw + wd * nwE * Wp[:, :cb])
        mw = _pad_lanes(nwE > 0)
        Wp, ow = opt.update(Wp, ow, gbw, mw, K)

        D = sorted_accum_dual(
            rowsi, Q[si], wi[0], wi[1], rowsj, Q[sj], wjs, wjc,
            r_pad=rh, neg_lanes=K, wrows=wrows_h, tile=TILE,
            interpret=interpret, precision=precision)
        nh = D[:, K:K + 1]
        gbh = (D + wd * nh * Hp) * payf
        mh = (nh > 0) & payb
        Hp, oh = opt.update(Hp, oh, gbh, mh, K)
        return (Wp, Hp, ow, oh, loss_acc + loss_step), None

    S = u_steps.shape[0]
    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init, (u_steps, i_steps, si_steps, rowsi_steps, wini,
                     winw, t0 + jnp.arange(S)))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(
        jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("opt_name", "lr", "weight_decay", "K", "rw",
                              "rh", "wrows_w", "wrows_h", "interpret",
                              "precision"),
    donate_argnums=(0, 1, 2, 3))
def packed_bpr_pool_epoch(Wp, Hp, ow, oh, u_steps, i_steps, si_steps,
                          rowsi_steps, wini, pool_steps, rj_steps,
                          mask_steps, winw, n_valid, *,
                          opt_name, lr, weight_decay, K, rw, rh,
                          wrows_w=512, wrows_h=512, interpret=False,
                          precision="split"):
    """Shared-negative-pool epoch (opt-in, ``BPR(neg_pool=P)``).

    Replaces the same reference Hogwild loop as :func:`packed_bpr_epoch`
    (`/root/reference/cymf/bpr.pyx:162-169`) but draws each step's
    negatives from a P-item pool: ``j[b] = pool[rj[b]]`` — per-sample
    negatives stay marginally uniform over the catalog, but a step's
    samples share P distinct candidate items.  What that buys on TPU
    (docs/PERF.md): the negative-side table gather, the ``Q[sj]``
    reorder gather, and the j half of the dual sorted accumulation —
    three of the step's per-row issue-bound passes — become MXU one-hot
    contractions against the VMEM-resident pool inside the v8 kernel,
    plus ONE P-row gather and ONE P-row scatter per step.

      pool_steps int32[S, P]   per-step pool item ids
      rj_steps  int32[S, B/128, 128]  folded per-sample pool slots
      mask_steps f32[S, B]     1 = live (in-data, pool draw no collision)

    The i/W streams and the optimizer pass are identical to the exact
    engine's.
    """
    opt = make_packed_optimizer(opt_name, lr)
    wd = jnp.float32(weight_decay)
    s = pk.num_slots(K)
    cb = pk.count_base(K)
    payb = jnp.arange(pk.LANES) < K
    payf = payb.astype(jnp.float32)
    sv_neg = jnp.where(payb, jnp.float32(-1), jnp.float32(1))[None, :]

    def step(carry, xs):
        Wp, Hp, ow, oh, loss_acc = carry
        u, i, si, rowsi, wi, pool, rj, mf, ww = xs
        mf = mf.astype(jnp.float32)  # uint8 upload, f32 decoration
        phys_u, slot_u = u // s, u % s

        Du = decorate(Wp.at[jnp.minimum(phys_u, rw - 1)].get(
            indices_are_sorted=True, mode="promise_in_bounds"),
            slot_u, mf, K)
        Hpool = Hp[pool]
        Aw, Apool, Q = bpr_pool_step_v8(
            _fold_rows(phys_u), rj, Du, Hp[i], Hpool, ww[0], ww[1],
            K=K, wd=weight_decay, rw=rw, wrows=wrows_w,
            interpret=interpret)
        loss_step = jnp.sum(Aw[:, LOSS_LANE])

        gw, nw = pk.split_counts(Aw, K)
        nwE = pk.expand_counts(nw, K)
        gbw = _pad_lanes(-gw + wd * nwE * Wp[:, :cb])
        mw = _pad_lanes(nwE > 0)
        Wp, ow = opt.update(Wp, ow, gbw, mw, K)

        # H side: i stream via sorted accumulation; pool stream lands
        # with ONE P-row scatter-add.  D == sorted_accum_dual's Aj - Ai
        # with counts summed.
        Ai = sorted_accum(rowsi, Q[si], wi[0], wi[1], r_pad=rh,
                          wrows=wrows_h, tile=TILE, interpret=interpret,
                          precision=precision)
        Aj = jnp.zeros((rh, pk.LANES), jnp.float32).at[pool].add(
            Apool, mode="drop")
        D = Aj + Ai * sv_neg
        nh = D[:, K:K + 1]
        gbh = (D + wd * nh * Hp) * payf
        mh = (nh > 0) & payb
        Hp, oh = opt.update(Hp, oh, gbh, mh, K)
        return (Wp, Hp, ow, oh, loss_acc + loss_step), None

    init = (Wp, Hp, ow, oh, jnp.zeros((), jnp.float32))
    (Wp, Hp, ow, oh, loss), _ = jax.lax.scan(
        step, init, (u_steps, i_steps, si_steps, rowsi_steps, wini,
                     pool_steps, rj_steps, mask_steps, winw))
    return Wp, Hp, ow, oh, loss / jnp.maximum(n_valid, 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# host-side preparation
# ---------------------------------------------------------------------------

def prep_backend() -> str:
    """Which epoch-prep backend :func:`prep_epoch` uses: ``"native"``
    (C++ OpenMP pipeline, mt19937_64 stream) or ``"numpy"`` (portable
    PCG64 stream).  ``CYMF_TPU_PREP=numpy`` forces the numpy stream."""
    import os
    if os.environ.get("CYMF_TPU_PREP", "").lower() == "numpy":
        return "numpy"
    from ..native import HAVE_NATIVE, _native
    if HAVE_NATIVE and hasattr(_native, "bpr_prep_epoch_v2"):
        return "native"
    return "numpy"


def _sorted_side(vals2, r_pad, wrows, tile):
    """Per-step sort permutation + folded sorted rows + windows for one
    H side (``vals2`` = item ids, int [S, B]).  The H table is stored in
    LOGICAL layout, so the target row IS the item id."""
    S, B = vals2.shape
    perm = np.empty((S, B), np.int32)
    rows = np.empty((S, B // 128, 128), np.int32)
    win = np.empty((S, 2, r_pad // wrows), np.int32)
    for t in range(S):
        p = np.argsort(vals2[t], kind="stable").astype(np.int32)
        perm[t] = p
        srt = vals2[t][p]
        win[t, 0], win[t, 1] = window_ranges(srt, r_pad, wrows, tile,
                                             align=128)
        rows[t] = srt.reshape(B // 128, 128)
    return perm, rows, win


def _spans_fit(pu2, stride: int, margin: int, rw: int) -> bool:
    """True iff EVERY `stride`-sample chunk of every step's (sorted)
    packed-row stream fits a `margin`-row expansion window anchored at
    its first row (clipped to ``rw - margin``).  The naive bound
    "a chunk of `stride` sorted samples spans <= ceil(stride/s)+1 rows"
    only holds when the chunk's users are CONSECUTIVE — a sparse batch
    (users absent from this step) has gaps, and a chunk's row span is
    unbounded.  Samples outside the window would silently expand to a
    zero W row (wrong gradients), so the engine version gate is DATA
    dependent; chunked streams that do not fit fall back to the XLA
    W-gather pipeline (v4), which is span-independent.

    Padding samples (PAD_USER sentinel — rows >= rw, sorted last) are
    excluded: their one-hot never matches and their mask is 0, so their
    expanded values are irrelevant."""
    S, B = pu2.shape
    ch = pu2.reshape(S, B // stride, stride)
    first = ch[:, :, 0]
    # per-chunk max over in-table rows only (-1 when the chunk is all
    # padding — trivially fits)
    lastv = np.where(ch < rw, ch, -1).max(axis=2)
    return bool(np.all((lastv - first < margin) | (first > rw - margin)
                       | (lastv < 0)))


def engine_version(K: int, rw: int, wrows_w: int, u2=None,
                   tile: int = TILE) -> int:
    """Which fused kernel pipeline the packed engine runs for THESE
    batches: 6 (fully fused sample+W-accumulation block kernel — needs
    chunk row spans to fit), 5 (in-kernel W expansion sample kernel +
    separate accumulation — needs spans to fit), 7 (fused
    sample+W-accumulation over a GATHERED Du stream — span-independent),
    or 4 (XLA W gather + sample kernel + separate accumulation — the
    always-available fallback).  ``u2`` is the [S, B] sorted user
    stream; without it only the static gates apply (shape-only
    callers).  Env overrides: ``CYMF_TPU_PACKED_KERNEL=4|5|6|7`` forces
    (5/6/7 still subject to their correctness gates),
    ``CYMF_TPU_PACKED_V6=0`` disables v6.

    Round-4 hardware measurement: on sparse streams (where v5/v6 gates
    fail) v4 BEATS v7 at the ML-20M headline — 39.6M vs 37.4M int/s
    (docs/measurements/r4) — so v7 is now selected only when forced;
    the fusion saves the SW HBM round-trip but repays it re-streaming
    straddle chunks per window."""
    import os
    s = pk.num_slots(K)
    forced = os.environ.get("CYMF_TPU_PACKED_KERNEL", "")
    no_v6 = os.environ.get("CYMF_TPU_PACKED_V6", "").lower() in (
        "0", "off", "false") or forced in ("4", "5", "7")
    if forced == "4":
        return 4
    pu2 = None
    if u2 is not None:
        pu2 = np.minimum(np.asarray(u2).astype(np.int64) // s,
                         np.iinfo(np.int32).max)
    if not no_v6 and supports_v6(K, rw, wrows_w) and (
            pu2 is None or _spans_fit(pu2, tile, CROWS, rw)):
        return 6
    wrows_a = min(WROWS_A, rw)
    if forced != "7" and s >= 2 \
            and wrows_a >= min(-(-SAMPLE_TILE // s) + 1, rw) and (
            pu2 is None or _spans_fit(pu2, SAMPLE_TILE, wrows_a, rw)):
        return 5
    if forced == "7" and supports_v7(K, rw, wrows_w):
        return 7
    return 4


def prep_static(u2, i2, K: int, rw: int, rh: int, wrows_w: int,
                wrows_h: int, tile: int = TILE):
    """Once per fit: W-side windows (u is pre-sorted), the per-chunk W
    expansion window starts (v5/v6 kernels), the v6 per-block home-chunk
    ranges, and the full i-side prep (batch composition is fixed across
    epochs, `bpr.pyx:104`).

    Returns ``(winw, wstart, si, rowsi, wini, cs, cn, version)`` —
    ``version`` is the data-dependent kernel version
    (:func:`engine_version`) and MUST be passed to
    :func:`packed_bpr_epoch` as ``kernel_v``."""
    S, B = u2.shape
    s = pk.num_slots(K)
    version = engine_version(K, rw, wrows_w, u2=u2, tile=tile)
    stride = tile if version == 6 else SAMPLE_TILE
    margin = CROWS if version == 6 else min(WROWS_A, rw)
    nT = B // stride if version in (5, 6) else 1
    nb = rw // wrows_w
    winw = np.empty((S, 2, nb), np.int32)
    wstart = np.zeros((S, nT), np.int32)
    cs = np.zeros((S, nb), np.int32)
    cn = np.zeros((S, nb), np.int32)
    for t in range(S):
        pu = np.minimum(u2[t].astype(np.int64) // s, np.iinfo(np.int32).max)
        winw[t, 0], winw[t, 1] = window_ranges(pu, rw, wrows_w, tile,
                                               align=128)
        if version == 7:
            # the last window's range extends over the padding tail so
            # every sample's Q row gets written (mask-zeroed for
            # padding); re-anchor so its chunk grid ends exactly at B
            st = int(winw[t, 0, nb - 1])
            st2 = B - -(-(B - st) // tile) * tile
            winw[t, 0, nb - 1] = st2
            winw[t, 1, nb - 1] = B - st2
        if version in (5, 6):
            # each chunk's expansion window starts at its first row
            # (spans proven to fit by the engine_version gate)
            wstart[t] = np.clip(pu[::stride], 0,
                                max(rw - margin, 0)).astype(np.int32)
        if version == 6:
            cs[t], cn[t] = prep_blocks(wstart[t], rw, wrows_w)
    si, rowsi, wini = _sorted_side(i2, rh, wrows_h, tile)
    return winw, wstart, si, rowsi, wini, cs, cn, version


def prep_static_pool(u2, i2, K: int, rw: int, rh: int, wrows_w: int,
                     wrows_h: int, tile: int = TILE):
    """:func:`prep_static` for the pool engine (v8): W-side windows with
    the v7-style last-window re-anchor (every sample's Q row written,
    padding mask-zeroed) plus the i-side prep.  No expansion-window /
    home-block prep — v8 is span-independent."""
    S, B = u2.shape
    s = pk.num_slots(K)
    nb = rw // wrows_w
    winw = np.empty((S, 2, nb), np.int32)
    for t in range(S):
        pu = np.minimum(u2[t].astype(np.int64) // s,
                        np.iinfo(np.int32).max)
        winw[t, 0], winw[t, 1] = window_ranges(pu, rw, wrows_w, tile,
                                               align=128)
        st = int(winw[t, 0, nb - 1])
        st2 = B - -(-(B - st) // tile) * tile
        winw[t, 0, nb - 1] = st2
        winw[t, 1, nb - 1] = B - st2
    si, rowsi, wini = _sorted_side(i2, rh, wrows_h, tile)
    return winw, si, rowsi, wini


def make_reject_filter(pos_keys, num_users: int, num_items: int):
    """One-per-fit rejection acceleration state for :func:`_reject_mask`:
    ``(keys, filter_bits, indptr, log2_bits)`` — a 1-bit hash filter over
    the sorted positive keys (~16 bits/key) plus the per-user indptr for
    the exact fallback.  ``None`` when the native extension is absent or
    there are no keys (the numpy path then runs)."""
    from ..native import HAVE_NATIVE, _native
    if not (HAVE_NATIVE and hasattr(_native, "pool_reject_v3")) \
            or len(pos_keys) == 0:
        return None
    keys = np.ascontiguousarray(pos_keys, np.int64)
    log2_bits = int(np.clip(int(np.ceil(np.log2(len(keys) * 16))),
                            10, 33))
    filt = _native.build_key_filter(keys, log2_bits)
    indptr = np.searchsorted(
        keys, np.arange(num_users + 1, dtype=np.int64)
        * num_items).astype(np.int64)
    return keys, filt, indptr, log2_bits


def prep_pool_epoch(rng: np.random.Generator, u2: np.ndarray,
                    pos_keys: np.ndarray, num_users: int, num_items: int,
                    P: int, r2=None, key_filter=None):
    """Per-epoch pool prep: P pool items per step (uniform, with
    replacement), per-sample pool slots, and the rejection mask — the
    pool analogue of :func:`prep_epoch`'s draws (`bpr.pyx:165-167`).
    j-side sort permutations do not exist in pool mode (the kernel
    accumulates the pool side in-place), so epoch prep is draw +
    membership only.

    ``r2`` (per-sample pool slots) may be drawn ONCE per fit and passed
    in: with a fresh uniform pool every epoch, ``j = pool_e[r]`` is
    distributionally identical whether ``r`` is redrawn or fixed
    (independent uniform negatives across epochs either way), and a
    fixed ``r`` makes the big slot-stream upload once-per-fit.  The
    mask returns as uint8 (cast on device) to quarter the per-epoch
    host->device transfer."""
    S, B = u2.shape
    pool2 = rng.integers(0, num_items, (S, P), dtype=np.int32)
    if r2 is None:
        r2 = rng.integers(0, P, (S, B), dtype=np.int32)
    j2 = pool2[np.arange(S)[:, None], r2]
    mask = _reject_mask(u2, j2, pos_keys, num_users, num_items,
                        key_filter=key_filter)
    rjs = r2.reshape(S, B // 128, 128)
    return pool2, rjs, mask.astype(np.uint8), j2


def _reject_mask(u2, j2, pos_keys, num_users: int, num_items: int,
                 key_filter=None):
    """``1.0`` where the sample is in-data and ``(u, j)`` is not a known
    positive.  Uses the C++ OpenMP membership test when built (the
    20M-lookup `searchsorted` is the pool prep's only hot loop) —
    bit-identical to the numpy path, which stays the sole RNG source.
    The v2 form bounds each lookup by the user's indptr slice of the
    sorted keys (an ~8-probe search over ~1KB instead of ~24 DRAM-random
    probes over the whole key array — measured ~10x at ML-20M shapes)."""
    import os
    if os.environ.get("CYMF_TPU_PREP", "").lower() != "numpy":
        from ..native import HAVE_NATIVE, _native
        if key_filter is not None and HAVE_NATIVE \
                and hasattr(_native, "pool_reject_v3"):
            keys, filt, indptr, log2_bits = key_filter
            u2c = np.ascontiguousarray(u2, np.int32)
            j2c = np.ascontiguousarray(j2, np.int32)
            mb = _native.pool_reject_v3(u2c, j2c, keys, indptr, filt,
                                        u2c.size, num_users, num_items,
                                        log2_bits)
            return np.frombuffer(mb, np.float32).reshape(u2.shape)
        if HAVE_NATIVE and hasattr(_native, "pool_reject_v2"):
            u2c = np.ascontiguousarray(u2, np.int32)
            j2c = np.ascontiguousarray(j2, np.int32)
            keys = np.ascontiguousarray(pos_keys, np.int64)
            indptr = np.searchsorted(
                keys, np.arange(num_users + 1, dtype=np.int64)
                * num_items).astype(np.int64)
            mb = _native.pool_reject_v2(u2c, j2c, keys, indptr, u2c.size,
                                        num_users, num_items)
            return np.frombuffer(mb, np.float32).reshape(u2.shape)
        if HAVE_NATIVE and hasattr(_native, "pool_reject"):
            u2c = np.ascontiguousarray(u2, np.int32)
            j2c = np.ascontiguousarray(j2, np.int32)
            keys = np.ascontiguousarray(pos_keys, np.int64)
            mb = _native.pool_reject(u2c, j2c, keys, u2c.size,
                                     num_users, num_items)
            return np.frombuffer(mb, np.float32).reshape(u2.shape)
    u64 = u2.astype(np.int64)
    in_data = u64 < num_users
    keys = u64 * num_items + j2
    idx = np.searchsorted(pos_keys, keys)
    idx = np.minimum(idx, max(len(pos_keys) - 1, 0))
    collide = (pos_keys[idx] == keys) if len(pos_keys) else \
        np.zeros_like(keys, bool)
    return (in_data & ~collide).astype(np.float32)


def shard_slices(u2, K: int, rw: int, n: int, tile: int = TILE,
                 slots: int | None = None):
    """Per-step contiguous slice boundaries of the u-sorted sample stream
    for ``n`` equal W row shards (the sharded packed engine's partition).
    ``slots`` overrides the lane-packing slot count (the sharded WIDE
    engine passes 1: at K >= 128 the target row IS the user id).

    Each step's stream is ascending in u, and shard ``p`` statically owns
    packed rows ``[p*rw/n, (p+1)*rw/n)`` — so shard p's samples are
    exactly ONE contiguous slice per step, found by binary search.  No
    all_to_all is ever needed: this is the TPU-mesh analogue of the
    reference's single-address-space Hogwild threads
    (`/root/reference/cymf/bpr.pyx:162`), with the sort replacing the
    shared-memory free-for-all.  Global padding sentinels (PAD_USER)
    sort last and land in the final shard.

    Returns ``(starts int64[S, n], counts int64[S, n], Bd)`` — ``Bd`` (a
    ``tile`` multiple) is the static per-shard batch: the max slice
    length over every (step, shard).  On degree-balanced row ranges
    (real datasets: user ids are arbitrary wrt degree) Bd ~= B/n.
    """
    S, B = u2.shape
    s = pk.num_slots(K) if slots is None else int(slots)
    if rw % n:
        raise ValueError("rw must be a multiple of the device count")
    rw_l = rw // n
    bounds = np.arange(1, n, dtype=np.int64) * rw_l * s
    splits = np.empty((S, n - 1), np.int64)
    u64 = np.asarray(u2, np.int64)
    for t in range(S):
        splits[t] = np.searchsorted(u64[t], bounds)
    starts = np.concatenate([np.zeros((S, 1), np.int64), splits], axis=1)
    ends = np.concatenate([splits, np.full((S, 1), B, np.int64)], axis=1)
    counts = ends - starts
    Bd = max(int(counts.max()), 1)
    # small batches see 2x skew from ordinary randomness; only flag
    # shard-degenerate streams at sizes where 2x means real imbalance
    if n > 1 and B // n >= 1024 and Bd > 2 * B // n:
        import warnings
        warnings.warn(
            f"sharded packed engine: one shard owns {Bd} of {B} samples "
            f"in some step (balanced would be ~{B // n}); every shard is "
            "padded to that length, multiplying per-step compute/memory. "
            "A degree-skewed user->shard distribution is the usual cause "
            "— consider the XLA sharded engine (packed='off') instead.",
            stacklevel=2)
    return starts, counts, -(-Bd // tile) * tile


def prep_shard_static(u2, i2, K: int, rw: int, rh: int, wrows_w: int,
                      wrows_h: int, n: int, tile: int = TILE):
    """Once per fit (sharded packed engine): slice the static u/i streams
    into ``n`` shard-contiguous pieces, localize user ids to shard row
    offsets, and build the per-shard W windows and i-side sorted streams.

    Per-shard padding conventions mirror the single-device engine's:
    padding samples get the local W-row sentinel ``rw_local`` (outside
    every accumulation window; the gather clamps), item index 0 (they
    accumulate exactly-zero Q rows, like the trainer's global pads), and
    mask 0 via :func:`prep_shard_epoch`.

    Returns ``(u_loc, i_loc, winw, si, rowsi, wini, starts, counts, Bd)``
    with a leading shard axis on every array.
    """
    S, B = u2.shape
    s = pk.num_slots(K)
    starts, counts, Bd = shard_slices(u2, K, rw, n, tile)
    rw_l = rw // n
    sent = rw_l * s
    u_loc = np.full((n, S, Bd), sent, np.int32)
    i_loc = np.zeros((n, S, Bd), np.int32)
    winw = np.empty((n, S, 2, rw_l // wrows_w), np.int32)
    si = np.empty((n, S, Bd), np.int32)
    rowsi = np.empty((n, S, Bd // 128, 128), np.int32)
    wini = np.empty((n, S, 2, rh // wrows_h), np.int32)
    u64 = np.asarray(u2, np.int64)
    for p in range(n):
        off = np.int64(p) * rw_l * s
        for t in range(S):
            a, c = int(starts[t, p]), int(counts[t, p])
            u_loc[p, t, :c] = np.minimum(u64[t, a:a + c] - off, sent)
            i_loc[p, t, :c] = i2[t, a:a + c]
            pu = u_loc[p, t].astype(np.int64) // s
            winw[p, t, 0], winw[p, t, 1] = window_ranges(
                pu, rw_l, wrows_w, tile, align=128)
        si[p], rowsi[p], wini[p] = _sorted_side(i_loc[p], rh, wrows_h, tile)
    return u_loc, i_loc, winw, si, rowsi, wini, starts, counts, Bd


def prep_shard_epoch(j2, mask, starts, counts, Bd: int, rh: int,
                     wrows_h: int, n: int, tile: int = TILE):
    """Once per epoch (sharded packed engine): slice the GLOBALLY drawn
    negative stream (identical to the 1-device stream — draws happen
    before sharding, so results are mesh-size-invariant up to float
    summation order) and rebuild the j-side sorted streams per shard.
    """
    S, B = j2.shape
    j_loc = np.zeros((n, S, Bd), np.int32)
    mf = np.zeros((n, S, Bd), np.uint8)
    sj = np.empty((n, S, Bd), np.int32)
    rowsj = np.empty((n, S, Bd // 128, 128), np.int32)
    winj = np.empty((n, S, 2, rh // wrows_h), np.int32)
    for p in range(n):
        for t in range(S):
            a, c = int(starts[t, p]), int(counts[t, p])
            j_loc[p, t, :c] = j2[t, a:a + c]
            mf[p, t, :c] = mask[t, a:a + c]
        sj[p], rowsj[p], winj[p] = _sorted_side(j_loc[p], rh, wrows_h, tile)
    return j_loc, mf, sj, rowsj, winj


def prep_epoch(rng: np.random.Generator, u2: np.ndarray, i2: np.ndarray,
               pos_keys: np.ndarray, num_users: int, num_items: int, K: int,
               rh: int, wrows_h: int, tile: int = TILE, native_seed=None,
               key_filter=None, sides: bool = True):
    """Once per epoch: negative draws, rejection+padding mask, and the
    j-side sort permutation/rows/windows.  Mirrors `bpr.pyx:165-167`: one
    uniform draw per interaction, collisions with known positives masked
    out.

    When the C++ extension is built and ``native_seed`` is given, the
    whole pass runs in ``_native.bpr_prep_epoch`` (OpenMP over steps,
    counting sort) — the TPU-era analogue of the reference's native host
    layer.  The native and numpy paths draw from different (equally
    uniform) streams; each is deterministic in its seed, but the native
    stream additionally depends on the platform's
    ``std::uniform_int_distribution``.  Set ``CYMF_TPU_PREP=numpy`` to
    force the portable numpy (PCG64) stream — e.g. when a resumed
    checkpoint must replay the exact stream of a different install — and
    check :func:`prep_backend` / ``BPR.prep_backend_`` for which one ran.
    """
    S, B = u2.shape
    if native_seed is not None and prep_backend() == "native":
        from ..native import _native
        u2c = np.ascontiguousarray(u2, np.int32)
        keys = np.ascontiguousarray(pos_keys, np.int64)
        # slots=1: the logical H layout's target row IS the item id
        if key_filter is not None \
                and hasattr(_native, "bpr_prep_epoch_v3"):
            fkeys, filt, indptr, log2_bits = key_filter
            jb, mb, pb, rb, wb = _native.bpr_prep_epoch_v3(
                u2c, fkeys, indptr, filt, S, B, num_users, num_items,
                1, rh, wrows_h, tile, int(native_seed), log2_bits)
        else:
            jb, mb, pb, rb, wb = _native.bpr_prep_epoch_v2(
                u2c, keys, S, B, num_users, num_items, 1, rh,
                wrows_h, tile, int(native_seed))
        return (np.frombuffer(jb, np.int32).reshape(S, B),
                np.frombuffer(mb, np.float32).reshape(S, B)
                .astype(np.uint8),
                np.frombuffer(pb, np.int32).reshape(S, B),
                np.frombuffer(rb, np.int32).reshape(S, B // 128, 128),
                np.frombuffer(wb, np.int32).reshape(S, 2, rh // wrows_h))
    # sides=False: the caller re-sorts per shard (the sharded packed
    # engine) — skip the global j-side argsort/windows and return Nones
    # in their place.  The native path ignores the flag: its fused C++
    # pass computes the sorted side for ~free and MUST keep drawing the
    # same stream as the 1-device engine (mesh-size invariance).
    j2 = rng.integers(0, num_items, (S, B)).astype(np.int32)
    u64 = u2.astype(np.int64)
    in_data = u64 < num_users
    keys = u64 * num_items + j2
    idx = np.searchsorted(pos_keys, keys)
    idx = np.minimum(idx, max(len(pos_keys) - 1, 0))
    collide = (pos_keys[idx] == keys) if len(pos_keys) else \
        np.zeros_like(keys, bool)
    mask = (in_data & ~collide).astype(np.uint8)
    if not sides:
        return j2, mask, None, None, None
    sj, rowsj, winj = _sorted_side(j2, rh, wrows_h, tile)
    return j2, mask, sj, rowsj, winj
