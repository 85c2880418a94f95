"""Fused BPR sample-phase Pallas kernel (packed fast path, stage 2).

Computes, in one pass over VMEM-resident sample tiles, everything the
packed BPR step needs between the table gathers and the sorted
accumulation: slot extraction of the user row, the pairwise score/loss
(`/root/reference/cymf/model.pyx:54-60`), the shared sigmoid factor
(`model.pyx:78`), lane placement of the W-side gradient product, and the
single compact H-side product both item streams share.

Why a kernel: the XLA forms of these ops each materialize full
(B, 128) HBM buffers — the difference profile of the packed epoch
(docs/PERF.md) shows ``place_with_count`` alone at ~2.2ms/step and the
extract+score floor at ~2.8ms, against <0.1ms of actual VPU work.  Slot
select/place are just static lane rotations plus multiply-adds once the
tile sits in VMEM.

Layout asymmetry (v4, measured in docs/PERF.md):

* **W is packed** (``s`` slots per physical row, `ops/packed.py`): the
  big table, so the dense optimizer pass must stay ``s``-fold smaller.
  The per-sample slot is smuggled in through the *count channel* of the
  decorated gather (:func:`decorate`): lanes ``[cb, cb+s)`` hold
  ``mask * onehot(slot)``, making the per-slot predicate a broadcastable
  column — no sublane/lane transpose of metadata, and the predicate
  applies the collision/padding mask for free (masked sample == the
  reference's skip, `bpr.pyx:166-167`).
* **H is logical** (one row per 128-lane row, payload lanes ``[0, K)``):
  item rows arrive lane-aligned, so no compaction rotations are spent on
  2 of the 3 streams, and both H-side gradients collapse into ONE output
  buffer ``Q = sig*wu`` (they differ only in sign and target row, both
  of which the accumulation stage owns).  The H table is ~5x smaller
  than W on the MovieLens family, so its optimizer pass stays cheap.

Outputs per (B, 128) step: ``SW`` (lane-placed ``sig*(hi-hj)`` with the
user's count channel), ``Q`` (compact ``sig*wu`` with the live-sample
mask at lane ``K`` — the count channel of the logical H layout), and an
(8, 128) loss-partials block whose (0, 0) element is the step loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import packed as pk

import os

LANES = 128
# fused-sample tile: 512 keeps Mosaic's scoped-VMEM stack (the kernel's
# live (tile,128) temporaries) under the DEFAULT 16MB limit; with the
# round-4 vmem_limit_bytes raise larger tiles are legal — env-tunable
# for measurement (CYMF_TPU_SAMPLE_TILE)
TILE = int(os.environ.get("CYMF_TPU_SAMPLE_TILE", "512"))


def decorate(gathered, slot, mf, K: int):
    """XLA-side prep for the PACKED (W) side: [B,128] gathered rows ->
    kernel input buffer.

    Payload lanes ``[0, cb)`` pass through untouched (the kernel's
    per-slot predicates select the right lanes); lanes ``>= cb`` are
    replaced by the mask-scaled slot one-hot.  A single elementwise pass
    that XLA fuses into the gather's consumer chain.
    """
    cb = pk.count_base(K)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    payload = jnp.where(lane < cb, gathered, jnp.float32(0))
    onehot = (lane == cb + slot[:, None]).astype(gathered.dtype)
    return payload + onehot * mf[:, None]


def _bpr_sample_kernel(du, di, dj, sw, q, lossp, *, K, s, cb, wd,
                       interpret):
    if interpret:
        def roll(x, shift):  # jnp semantics: shift>0 rotates right
            return jnp.roll(x, shift, axis=1)
    else:
        def roll(x, shift):
            return pltpu.roll(x, shift % LANES, axis=1)

    Du, Di, Dj = du[:], di[:], dj[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, Du.shape, 1)
    paymask = (lane < K).astype(jnp.float32)
    cmask = (lane >= cb).astype(jnp.float32)

    def compact(D):
        # packed row -> lanes [0, K): sum of left-rotations, each
        # predicated on the sample's (mask-scaled) slot one-hot column
        acc = D[:, cb:cb + 1] * D
        for c in range(1, s):
            acc = acc + D[:, cb + c:cb + c + 1] * roll(D, -c * K)
        return acc * paymask

    wu = compact(Du)
    hi, hj = Di, Dj                      # logical layout: already aligned
    diff = hi - hj
    x = jnp.sum(wu * diff, axis=1, keepdims=True)
    sig = jax.nn.sigmoid(-x)
    mcol = jnp.sum(Du * cmask, axis=1, keepdims=True)  # = mask
    l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1, keepdims=True)
    loss = (-jax.nn.log_sigmoid(x) + wd * l2) * mcol

    # loss reduction: one (8,128) block revisited across the sequential
    # grid; the tile sums land in element (0,0) via a one-hot add
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        lossp[:] = jnp.zeros_like(lossp)

    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    l8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    oh00 = ((r8 == 0) & (l8 == 0)).astype(jnp.float32)
    lossp[:] = lossp[:] + jnp.sum(loss) * oh00

    def placed(D, vals):
        # vals lanes >= K are zero, so each right-rotation lands exactly
        # in slot c's payload lanes; the count channel rides along from
        # the decorated buffer (mask at the slot's count lane).
        out = D * cmask + D[:, cb:cb + 1] * vals
        for c in range(1, s):
            out = out + D[:, cb + c:cb + c + 1] * roll(vals, c * K)
        return out

    sw[:] = placed(Du, sig * diff)
    qk = (lane == K).astype(jnp.float32)
    q[:] = sig * wu + mcol * qk


# ---------------------------------------------------------------------------
# v5: W gather folded into the kernel (windowed one-hot expansion)
# ---------------------------------------------------------------------------

# W rows DMA'd per sample tile.  A tile of `tile` u-sorted samples spans
# at most min(ceil(tile / s) + 1, rw) packed rows; the worst supported
# case (s=2, tile=512) spans 257, so 264 (8-sublane multiple) always
# covers it.  Tables smaller than this use the whole table as the window.
WROWS_A = 264


def _bpr_sample_kernel_v5(wstart_ref, rowsw, wp_hbm, di, dj, sw, q, lossp,
                          wbuf, sem, *, K, s, cb, wd, tile, wrows_a,
                          interpret):
    """Per-tile: DMA the tile's W row window, expand per-sample packed W
    rows on the MXU (one-hot contraction — replaces the XLA B-row gather),
    then the v4 sample math.  The mask/slot decoration rides on the
    j-stream's dead lanes (see :func:`bpr_sample_phase_v5`)."""
    t = pl.program_id(0)
    groups = tile // LANES

    cs = wstart_ref[t]
    wcopy = pltpu.make_async_copy(wp_hbm.at[pl.ds(cs, wrows_a), :], wbuf,
                                  sem)
    wcopy.start()

    if interpret:
        def roll(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def roll(x, shift):
            return pltpu.roll(x, shift % LANES, axis=1)

    Di, Djr = di[:], dj[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, Di.shape, 1)
    paymask = (lane < K).astype(jnp.float32)
    cmask = ((lane >= cb) & (lane < cb + s)).astype(jnp.float32)
    slotcol = Djr * cmask                 # mask * onehot(slot) columns
    hi = Di
    hj = Djr * paymask                    # strip the decoration lanes

    # --- W expansion: hot[r, b] = (phys[b] == cs + r), one deep MXU
    # contraction over the window rows; f32 exactness via the bf16 hi+lo
    # split (one-hot entries are exact in bf16).
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows_a, LANES), 0) + cs
    pr = rowsw[pl.ds(t * groups, groups), :]
    hot = jnp.concatenate(
        [(pr[a:a + 1, :] == w_iota).astype(jnp.bfloat16)
         for a in range(groups)], axis=1)               # (wrows_a, tile)
    wcopy.wait()
    w32 = wbuf[...]
    whi = w32.astype(jnp.bfloat16)
    wlo = (w32 - whi.astype(jnp.float32)).astype(jnp.bfloat16)
    Du_e = jax.lax.dot_general(
        jnp.concatenate([hot, hot], axis=0),
        jnp.concatenate([whi, wlo], axis=0),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (tile, 128)
    Du = Du_e * (lane < cb).astype(jnp.float32) + slotcol

    # --- v4 sample math on the reconstructed decorated buffer
    def compact(D):
        acc = D[:, cb:cb + 1] * D
        for c in range(1, s):
            acc = acc + D[:, cb + c:cb + c + 1] * roll(D, -c * K)
        return acc * paymask

    wu = compact(Du)
    diff = hi - hj
    x = jnp.sum(wu * diff, axis=1, keepdims=True)
    sig = jax.nn.sigmoid(-x)
    mcol = jnp.sum(Du * cmask, axis=1, keepdims=True)
    l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1, keepdims=True)
    loss = (-jax.nn.log_sigmoid(x) + wd * l2) * mcol

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
            out = out + D[:, cb + c:cb + c + 1] * roll(vals, c * K)
        return out

    sw[:] = placed(Du, sig * diff)
    qk = (lane == K).astype(jnp.float32)
    q[:] = sig * wu + mcol * qk


@functools.partial(jax.jit,
                   static_argnames=("K", "wd", "interpret", "tile"))
def bpr_sample_phase_v5(Wp, wstart, rowsw, Di, Dj_dec, *, K: int, wd: float,
                        interpret=False, tile: int = TILE):
    """v5 sample phase: the W-side table gather happens INSIDE the kernel.

    Instead of an XLA B-row gather of ``Wp[phys_u]`` (per-row issue-bound,
    plus a full (B, 128) HBM round-trip), each tile DMAs its
    :data:`WROWS_A`-row window of the packed W table (u is sorted, so a
    tile's rows are contiguous) and expands per-sample rows with a one-hot
    MXU contraction.  The mask/slot decoration that v4 carried on the
    gathered W stream moves to the j stream's dead lanes
    (``decorate(Hp[j], slot, mf, K)`` — the logical H layout leaves lanes
    ``[cb, cb+s)`` free).

    Args:
      Wp: (rw, 128) packed user table (stays in HBM).
      wstart: int32[B/tile] per-tile window start rows
        (``clip(phys[t*tile], 0, rw - WROWS_A)``, host-computed).
      rowsw: int32[B/128, 128] lane-major folded per-sample physical rows.
      Di: (B, 128) gathered item rows ``Hp[i]``.
      Dj_dec: (B, 128) gathered+decorated negative rows.

    Returns (SW, Q, loss) exactly as :func:`bpr_sample_phase`.
    """
    B = Di.shape[0]
    if B % tile:
        raise ValueError("B must be a multiple of tile")
    nT = B // tile
    s, cb = pk.num_slots(K), pk.count_base(K)
    if s < 2:
        raise ValueError("v5 expansion requires >= 2 slots per row")
    rw = Wp.shape[0]
    wrows_a = min(WROWS_A, rw)
    if wrows_a < min(-(-tile // s) + 1, rw):
        raise ValueError("expansion window cannot cover a sample tile")
    kern = functools.partial(_bpr_sample_kernel_v5, K=int(K), s=s, cb=cb,
                             wd=float(wd), tile=tile, wrows_a=wrows_a,
                             interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nT,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # rowsw
                  pl.BlockSpec(memory_space=pltpu.HBM),       # Wp
                  pl.BlockSpec((tile, LANES), lambda t, w: (t, 0),
                               memory_space=pltpu.VMEM),   # Di
                  pl.BlockSpec((tile, LANES), lambda t, w: (t, 0),
                               memory_space=pltpu.VMEM)],  # Dj_dec
        out_specs=[pl.BlockSpec((tile, LANES), lambda t, w: (t, 0),
                                memory_space=pltpu.VMEM)] * 2 + [
            pl.BlockSpec((8, LANES), lambda t, w: (0, 0),
                         memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((wrows_a, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, LANES), jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
        interpret=interpret,
    )(wstart, rowsw, Wp, Di, Dj_dec)


@functools.partial(jax.jit,
                   static_argnames=("K", "wd", "interpret", "tile"))
def bpr_sample_phase(Du, Di, Dj, *, K: int, wd: float, interpret=False,
                     tile: int = TILE):
    """Decorated W gather + raw logical H gathers -> (SW, Q, loss).

    ``SW`` is the lane-placed W-side gradient product with count channel —
    ready for packed-row accumulation.  ``Q`` is the compact shared H-side
    product ``sig * wu`` (payload lanes [0, K)) with the live-sample mask
    at lane ``K`` — both item-side accumulations gather from this one
    buffer, and lane ``K`` accumulates into the logical H layout's count
    lane.  ``loss`` is a single revisited [8, 128] block with the step
    loss in element (0, 0) (== its full sum).
    """
    B = Du.shape[0]
    if B % tile:
        raise ValueError("B must be a multiple of tile")
    nT = B // tile
    s, cb = pk.num_slots(K), pk.count_base(K)
    kern = functools.partial(_bpr_sample_kernel, K=int(K), s=s, cb=cb,
                             wd=float(wd), interpret=interpret)
    sample_spec = pl.BlockSpec((tile, LANES), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(nT,),
        in_specs=[sample_spec] * 3,
        out_specs=[sample_spec] * 2 + [
            pl.BlockSpec((8, LANES), lambda t: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, LANES), jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
        interpret=interpret,
    )(Du, Di, Dj)
