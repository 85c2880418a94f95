"""Packed fused GloVe engine — the BPR fast path's machinery applied to
the co-occurrence model (`/root/reference/cymf/glove.pyx:148-153`,
`model.pyx:166-204`).

GloVe is an even better fit for the packed pipeline than BPR: there is
no negative sampling, so the ENTIRE sample stream — triples, weights
``f = min((count/x_max)^alpha, 1)``, ``log(count)``, sort permutations
and accumulation windows — is static per fit (`glove.pyx:97-100`
shuffles the nnz triples once).  Epochs replay one jitted scan with
zero per-epoch host work.

Layout (fused-bias mode only): the augmented central table
``Zc = [w | b_c | 1]`` is LANE-PACKED (``ops/packed.py``, payload width
``Kp = K + 2``), the augmented context table ``Zx = [h | 1 | b_x]`` is
LOGICAL (payload lanes ``[0, Kp)``, live-count lane ``Kp``).  The
per-sample constants ride free lanes of the CONTEXT stream's decoration
(:func:`decorate_x`): lane ``Kp`` carries ``-log(count)`` and lane
``Kp + 1`` carries ``f`` — no extra HBM stream for the weights.

The constant-one columns (`models/glove.py` fused layout) must stay
constant: their gradient lanes are zeroed before the AdaGrad update
(ones-init accumulators make a zero gradient a bit-exact no-op,
`optimizer.pyx:69-82` semantics), so freezing costs one multiply.

Like every packed kernel, TPU lowering is validated by
``scripts/tpu_kernel_smoke.py``; interpret mode is used everywhere
else.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import packed as pk
from .fused_sample import TILE as SAMPLE_TILE
from .fused_sample import decorate
from .packed_epoch import (TILE, PackedAdaGrad, _fold_rows, _pad_lanes,
                           _sorted_side, window_ranges)
from .sorted_accum import sorted_accum

LANES = 128


def augment_tables(W_central, central_bias, W_context, context_bias):
    """The fused-bias augmented layout — THE column order the freeze
    masks in :func:`packed_glove_epoch` (and the XLA epoch's gradient
    masks) depend on:

        Zc = [w | b_central | 1]        Zx = [h | 1 | b_context]

    so ``Zc . Zx = w.h + b_c + b_x``.  Single source of truth for every
    engine (XLA fused, Pallas, packed) and the bench/smoke harnesses."""
    V1 = W_central.shape[0]
    V2 = W_context.shape[0]
    Zc = np.concatenate(
        [W_central, np.asarray(central_bias).reshape(V1, 1),
         np.ones((V1, 1))], axis=1)
    Zx = np.concatenate(
        [W_context, np.ones((V2, 1)),
         np.asarray(context_bias).reshape(V2, 1)], axis=1)
    return Zc, Zx


def supports_packed_glove(K: int) -> bool:
    """Gate: the augmented payload ``Kp = K + 2`` must pack (>= 1 slot)
    and the context decoration needs lanes ``Kp`` and ``Kp + 1`` free in
    the logical layout."""
    Kp = K + 2
    return pk.num_slots(Kp) >= 1 and Kp + 2 <= LANES


def decorate_x(gathered, f, logcnt, Kp: int):
    """Context-stream decoration: payload lanes pass through, lane ``Kp``
    := ``-log(count)`` (so the score dot-product absorbs the subtraction)
    and lane ``Kp + 1`` := ``f``.  One fused elementwise pass."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    payload = jnp.where(lane < Kp, gathered, jnp.float32(0))
    return (payload
            + (lane == Kp) * (-logcnt[:, None])
            + (lane == Kp + 1) * f[:, None])


def _glove_sample_kernel(du, dx, sw, q, lossp, *, Kp, s, cb, interpret):
    """Per (tile, 128) block: slot extraction of the central row, the
    weighted-LSQ residual/loss (`model.pyx:173-181`), lane placement of
    the central-side gradient product, and the compact context-side
    product.  Mirrors ``_bpr_sample_kernel``; the pairwise sigmoid is
    replaced by the GloVe residual and there is no j stream."""
    if interpret:
        def roll(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def roll(x, shift):
            return pltpu.roll(x, shift % LANES, axis=1)

    Du, Dx = du[:], dx[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, Du.shape, 1)
    paymask = (lane < Kp).astype(jnp.float32)
    cmask = (lane >= cb).astype(jnp.float32)

    def compact(D):
        acc = D[:, cb:cb + 1] * D
        for c in range(1, s):
            acc = acc + D[:, cb + c:cb + c + 1] * roll(D, -c * Kp)
        return acc * paymask

    zc = compact(Du)
    zx = Dx * paymask
    # diff = zc . zx - log(count): the -log rides lane Kp of the
    # decorated context buffer against an implicit 1 column
    neglog = jnp.sum(Dx * (lane == Kp), axis=1, keepdims=True)
    fcol = jnp.sum(Dx * (lane == Kp + 1), axis=1, keepdims=True)
    mcol = jnp.sum(Du * cmask, axis=1, keepdims=True)  # = live mask
    diff = jnp.sum(zc * zx, axis=1, keepdims=True) + neglog
    qv = fcol * diff * mcol                  # f * diff, masked
    loss = 0.5 * qv * diff                   # 0.5 * f * diff^2 * mask

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        lossp[:] = jnp.zeros_like(lossp)

    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    l8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    oh00 = ((r8 == 0) & (l8 == 0)).astype(jnp.float32)
    lossp[:] = lossp[:] + jnp.sum(loss) * oh00

    def placed(D, vals):
        out = D * cmask + D[:, cb:cb + 1] * vals
        for c in range(1, s):
            out = out + D[:, cb + c:cb + c + 1] * roll(vals, c * Kp)
        return out

    sw[:] = placed(Du, qv * zx)
    qk = (lane == Kp).astype(jnp.float32)
    q[:] = qv * zc + mcol * qk


@functools.partial(jax.jit, static_argnames=("Kp", "interpret", "tile"))
def glove_sample_phase(Du, Dx_dec, *, Kp: int, interpret=False,
                       tile: int = SAMPLE_TILE):
    """Decorated central gather + decorated context gather ->
    ``(SW, Q, loss)``: the lane-placed central-side gradient with count
    channel, the compact context-side gradient with the live mask at
    lane ``Kp``, and the revisited (8, 128) loss block (sum at (0, 0))."""
    B = Du.shape[0]
    if B % tile:
        raise ValueError("B must be a multiple of tile")
    s, cb = pk.num_slots(Kp), pk.count_base(Kp)
    kern = functools.partial(_glove_sample_kernel, Kp=int(Kp), s=s, cb=cb,
                             interpret=interpret)
    spec = pl.BlockSpec((tile, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B // tile,),
        in_specs=[spec] * 2,
        out_specs=[spec] * 2 + [
            pl.BlockSpec((8, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, LANES), jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
        interpret=interpret,
    )(Du, Dx_dec)


def prep_glove_static(c2, x2, cnt2, num_central: int, K: int, rw: int,
                      rh: int, wrows_w: int, wrows_h: int, x_max: float,
                      alpha: float, tile: int = TILE):
    """Once per fit (there are no per-epoch draws): live masks, sample
    weights ``f``/``log(count)``, central-side windows over the
    per-step-sorted stream, and the context-side sort/rows/windows.

    Returns ``(m2, f2, l2, winw, sx, rowsx, winx)``."""
    S, B = c2.shape
    s = pk.num_slots(K + 2)
    m2 = (c2.astype(np.int64) < num_central).astype(np.uint8)
    f2 = np.minimum((cnt2 / x_max) ** alpha, 1.0).astype(np.float32)
    l2 = np.log(np.maximum(cnt2, 1e-30)).astype(np.float32)
    winw = np.empty((S, 2, rw // wrows_w), np.int32)
    for t in range(S):
        pu = np.minimum(c2[t].astype(np.int64) // s,
                        np.iinfo(np.int32).max)
        winw[t, 0], winw[t, 1] = window_ranges(pu, rw, wrows_w, tile,
                                               align=128)
    sx, rowsx, winx = _sorted_side(x2, rh, wrows_h, tile)
    return m2, f2, l2, winw, sx, rowsx, winx


def prep_glove_shard_static(c2, x2, cnt2, num_central: int, K: int,
                            rw: int, rh: int, wrows_w: int, wrows_h: int,
                            n: int, x_max: float, alpha: float,
                            tile: int = TILE):
    """Once per fit (sharded packed GloVe): slice the c-sorted streams
    into ``n`` shard-contiguous pieces (see
    ``packed_epoch.shard_slices`` — shard ``p`` statically owns packed
    central rows ``[p*rw/n, (p+1)*rw/n)``), localize central ids, and
    build per-shard windows, weights and x-side sorted streams.  GloVe
    has no per-epoch draws, so unlike BPR there is NO per-epoch shard
    prep at all.

    Returns ``(c_loc, x_loc, m_loc, f_loc, l_loc, winw, sx, rowsx,
    winx, Bd)`` with a leading shard axis on every array."""
    from .packed_epoch import shard_slices
    S, B = c2.shape
    Kp = K + 2
    s = pk.num_slots(Kp)
    starts, counts, Bd = shard_slices(c2, Kp, rw, n, tile)
    rw_l = rw // n
    sent = rw_l * s
    m2 = (c2.astype(np.int64) < num_central).astype(np.uint8)
    f2 = np.minimum((cnt2 / x_max) ** alpha, 1.0).astype(np.float32)
    l2 = np.log(np.maximum(cnt2, 1e-30)).astype(np.float32)
    c_loc = np.full((n, S, Bd), sent, np.int32)
    x_loc = np.zeros((n, S, Bd), np.int32)
    m_loc = np.zeros((n, S, Bd), np.uint8)
    f_loc = np.zeros((n, S, Bd), np.float32)
    l_loc = np.zeros((n, S, Bd), np.float32)
    winw = np.empty((n, S, 2, rw_l // wrows_w), np.int32)
    sx = np.empty((n, S, Bd), np.int32)
    rowsx = np.empty((n, S, Bd // 128, 128), np.int32)
    winx = np.empty((n, S, 2, rh // wrows_h), np.int32)
    c64 = np.asarray(c2, np.int64)
    for p in range(n):
        off = np.int64(p) * rw_l * s
        for t in range(S):
            a, c = int(starts[t, p]), int(counts[t, p])
            c_loc[p, t, :c] = np.minimum(c64[t, a:a + c] - off, sent)
            x_loc[p, t, :c] = x2[t, a:a + c]
            m_loc[p, t, :c] = m2[t, a:a + c]
            f_loc[p, t, :c] = f2[t, a:a + c]
            l_loc[p, t, :c] = l2[t, a:a + c]
            pu = c_loc[p, t].astype(np.int64) // s
            winw[p, t, 0], winw[p, t, 1] = window_ranges(
                pu, rw_l, wrows_w, tile, align=128)
        sx[p], rowsx[p], winx[p] = _sorted_side(x_loc[p], rh, wrows_h,
                                                tile)
    return c_loc, x_loc, m_loc, f_loc, l_loc, winw, sx, rowsx, winx, Bd


@functools.partial(
    jax.jit,
    static_argnames=("lr", "K", "rw", "rh", "wrows_w", "wrows_h",
                     "interpret", "precision"),
    donate_argnums=(0, 1, 2, 3))
def packed_glove_epoch(Zc, Zx, oc, ox, c_steps, x_steps, m_steps, f_steps,
                       l_steps, sx_steps, rowsx_steps, winx, winw, n_valid,
                       *, lr, K, rw, rh, wrows_w=256, wrows_h=256,
                       interpret=False, precision="split"):
    """One epoch over S pre-sorted minibatches (scan) of fused-bias GloVe
    AdaGrad.  ``Zc`` is the packed augmented central table (``rw``
    physical rows, payload width ``Kp = K + 2``); ``Zx`` the LOGICAL
    augmented context table (``rh`` rows).  All streams come from
    :func:`prep_glove_static` — static across epochs.

    Update semantics match the XLA fused-bias epoch
    (`models/glove.py::_glove_epoch`): one synchronous AdaGrad step per
    minibatch with duplicate rows pre-combined (here by the scatter-free
    windowed accumulation), ones-init accumulators, constant-one columns
    frozen via zeroed gradient lanes."""
    Kp = K + 2
    opt = PackedAdaGrad(lr)
    s = pk.num_slots(Kp)
    cb = pk.count_base(Kp)
    lane = jnp.arange(LANES)
    # central table: freeze slot-relative lane K+1 (the constant-1 col)
    freeze_c = _pad_lanes(
        ((lane[:cb] % Kp) != K + 1).astype(jnp.float32)[None, :])
    # context table: payload only, freeze lane K (its constant-1 col)
    freeze_x = ((lane < Kp) & (lane != K)).astype(jnp.float32)[None, :]

    def step(carry, xs):
        Zc, Zx, oc, ox, loss_acc = carry
        c, x, mf, f, lc, sx, rowsx, wx, ww = xs
        mf = mf.astype(jnp.float32)
        phys, slot = c // s, c % s
        Du = decorate(Zc.at[jnp.minimum(phys, rw - 1)].get(
            indices_are_sorted=True, mode="promise_in_bounds"),
            slot, mf, Kp)
        Dx = decorate_x(Zx.at[x].get(mode="promise_in_bounds"), f, lc, Kp)
        SW, Q, lossp = glove_sample_phase(Du, Dx, Kp=Kp,
                                          interpret=interpret)
        Ac = sorted_accum(_fold_rows(phys), SW, ww[0], ww[1], r_pad=rw,
                          wrows=wrows_w, tile=TILE, interpret=interpret,
                          precision=precision)
        gc, _ = pk.split_counts(Ac, Kp)
        Zc, oc = opt.update(Zc, oc, _pad_lanes(gc) * freeze_c, None, Kp)

        D = sorted_accum(rowsx, Q[sx], wx[0], wx[1], r_pad=rh,
                         wrows=wrows_h, tile=TILE, interpret=interpret,
                         precision=precision)
        Zx, ox = opt.update(Zx, ox, D * freeze_x, None, Kp)
        return (Zc, Zx, oc, ox, loss_acc + lossp[0, 0]), None

    init = (Zc, Zx, oc, ox, jnp.zeros((), jnp.float32))
    (Zc, Zx, oc, ox, loss), _ = jax.lax.scan(
        step, init, (c_steps, x_steps, m_steps, f_steps, l_steps,
                     sx_steps, rowsx_steps, winx, winw))
    return Zc, Zx, oc, ox, loss / jnp.maximum(n_valid, 1).astype(jnp.float32)
