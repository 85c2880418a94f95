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

LANES = 128
# fused-sample tile: keeps Mosaic's scoped-VMEM stack (the kernel's live
# (tile,128) temporaries) comfortably under the 16MB limit
TILE = 512


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
