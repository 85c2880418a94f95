"""v6 fused BPR block step: sample phase + W-side accumulation in ONE
Pallas kernel (packed fast path, round 3).

v5 (`ops/fused_sample.py` + `ops/sorted_accum.py`) materializes the
W-side gradient stream ``SW`` to HBM (a (B, 128) write) only for the
W accumulation kernel to stream it straight back in (a (B, 128) read) —
~134MB/step of pure round-trip at ML-20M shapes.  v6 merges the two:
the kernel grids over **W-table blocks** (``wrows`` packed rows each) and,
for each block, processes its *home chunks* of u-sorted samples
end-to-end in VMEM:

  1. DMA the chunk's item rows (``Hi``), decorated negative rows
     (``Dj``), and its W expansion window (u-sorted samples span < 264
     packed rows per 1024-sample chunk at s >= 4).
  2. Expand per-sample packed W rows with a one-hot MXU contraction
     (exact via two bf16 dots — one-hot entries are exact in bf16 and
     the f32 payload splits into hi+lo halves).
  3. Sample math (score, sigmoid, loss, lane placement) — v5's kernel
     body.  The per-sample loss lands on **lane 127** of the W gradient
     stream (free for s*(K+1) <= 127), so the accumulated table block
     carries the loss sum and no separate loss output exists.
  4. Write the compact H-side product ``Q`` out (both item-side
     accumulations gather from it — `ops/sorted_accum.py`), and
     accumulate the W gradient stream into the block **plus a spill
     buffer**: a chunk whose samples overrun the block boundary
     contributes its tail rows to a (SPILL, 128) VMEM scratch that the
     NEXT block folds in before its own chunks.  Each chunk is
     processed exactly once (v5's tile-aligned window ranges reprocess
     straddling tiles once per side).

Chunk -> home-block assignment is host-computed (`prep_blocks`): chunk
``g`` belongs to ``bid[g] = wstart[g] // wrows`` (its first sample's
packed row), which is nondecreasing because u is sorted; sample rows
then fall in ``[bid*wrows, (bid+1)*wrows + CROWS)`` — block + spill.

Replaces the same reference Hogwild loop as v4/v5
(`/root/reference/cymf/bpr.pyx:162-169`, `model.pyx:54-87`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import packed as pk

LANES = 128
TILE = 1024
# Mosaic's default scoped-VMEM stack limit is 16MB; the fused kernels'
# vector temporaries (one-hot (wrows, tile) bf16 tiles + hi/lo splits)
# need ~17-18MB at wrows=512/tile=1024.  v5e has 128MB of VMEM per
# core; 64MB leaves ample room for the block/scratch buffers (measured
# OOM: v6 16.73M, v7 17.09M — scripts/tpu_kernel_smoke.py, round 4).
VMEM_LIMIT = 64 * 1024 * 1024
# W rows covering one chunk's expansion: ceil(TILE/s) + 1 <= 257 at
# s >= 4, rounded to a sublane multiple.
CROWS = 264
LOSS_LANE = 127


def supports_v6(K: int, rw: int, wrows: int = 512) -> bool:
    """v6 needs >= 4 slots (chunk expansion window), a free lane 127 for
    the loss channel, a table at least one expansion window tall, and
    blocks tall enough that a chunk's spill never crosses more than one
    block boundary (``wrows >= CROWS``)."""
    s = pk.num_slots(K)
    return s >= 4 and s * (K + 1) <= LOSS_LANE and rw >= CROWS \
        and rw % wrows == 0 and wrows >= CROWS


def prep_blocks(wstart: np.ndarray, rw: int, wrows: int = 512):
    """Host-side: per-block home chunk ranges.  ``wstart`` is the
    per-chunk expansion window start (`prep_static`), nondecreasing.
    Returns (cs, cn): int32[rw//wrows] start chunk id and chunk count."""
    bid = (np.asarray(wstart, np.int64) // wrows)
    nb = rw // wrows
    edges = np.searchsorted(bid, np.arange(nb + 1)).astype(np.int32)
    return edges[:-1], (edges[1:] - edges[:-1]).astype(np.int32)


def _kernel(cs_ref, cn_ref, wstart_ref, rowsw, wp_hbm, hi_hbm, dj_hbm,
            aw_ref, q_hbm, w_s0, w_s1, hi_s0, hi_s1, dj_s0, dj_s1,
            q_s, spill, in_sems, q_sem, *, K, s, cb, wd, tile,
            wrows, interpret):
    b = pl.program_id(0)
    groups = tile // LANES
    base = b * wrows

    if interpret:
        def roll(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def roll(x, shift):
            return pltpu.roll(x, shift % LANES, axis=1)

    w_slots = (w_s0, w_s1)
    hi_slots = (hi_s0, hi_s1)
    dj_slots = (dj_s0, dj_s1)

    @pl.when(b == 0)
    def _():
        spill[:] = jnp.zeros_like(spill)

    # fold the incoming spill (rows [base, base + SPILL)) into this block
    aw_ref[:] = jnp.pad(spill[...],
                        ((0, wrows - spill.shape[0]), (0, 0)))
    spill[:] = jnp.zeros_like(spill)

    c0 = cs_ref[b]
    nc = cn_ref[b]

    def dma_in(g, slot):
        return (pltpu.make_async_copy(
                    wp_hbm.at[pl.ds(wstart_ref[g], CROWS), :],
                    w_slots[slot], in_sems.at[0, slot]),
                pltpu.make_async_copy(
                    hi_hbm.at[pl.ds(g * tile, tile), :],
                    hi_slots[slot], in_sems.at[1, slot]),
                pltpu.make_async_copy(
                    dj_hbm.at[pl.ds(g * tile, tile), :],
                    dj_slots[slot], in_sems.at[2, slot]))

    @pl.when(nc > 0)
    def _():
        for cp in dma_in(c0, 0):
            cp.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    paymask = (lane < K).astype(jnp.float32)
    cmaskb = (lane >= cb) & (lane < cb + s)
    cmask = cmaskb.astype(jnp.float32)
    qk = (lane == K).astype(jnp.float32)
    lossk = (lane == LOSS_LANE).astype(jnp.float32)
    arows = wrows + spill.shape[0]
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (arows, LANES), 0) + base

    def process(c, slot):
        g = c0 + c
        for cp in dma_in(g, slot):
            cp.wait()
        cs_w = wstart_ref[g]
        pr = rowsw[pl.ds(g * groups, groups), :]

        # --- W expansion: two bf16 dots (hi+lo split), exact to f32
        e_iota = jax.lax.broadcasted_iota(
            jnp.int32, (CROWS, LANES), 0) + cs_w
        hot_e = jnp.concatenate(
            [(pr[a:a + 1, :] == e_iota).astype(jnp.bfloat16)
             for a in range(groups)], axis=1)            # (CROWS, tile)
        w32 = w_slots[slot][...]
        whi = w32.astype(jnp.bfloat16)
        wlo = (w32 - whi.astype(jnp.float32)).astype(jnp.bfloat16)
        Du_e = jax.lax.dot_general(
            hot_e, whi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Du_e = Du_e + jax.lax.dot_general(
            hot_e, wlo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (tile, 128)

        Djr = dj_slots[slot][...]
        slotcol = Djr * cmask
        Du = Du_e * (lane < cb).astype(jnp.float32) + slotcol
        hi = hi_slots[slot][...]
        hj = Djr * paymask

        def compact(D):
            acc = D[:, cb:cb + 1] * D
            for c2 in range(1, s):
                acc = acc + D[:, cb + c2:cb + c2 + 1] * roll(D, -c2 * K)
            return acc * paymask

        wu = compact(Du)
        diff = hi - hj
        x = jnp.sum(wu * diff, axis=1, keepdims=True)
        sig = jax.nn.sigmoid(-x)
        mcol = jnp.sum(Du * cmask, axis=1, keepdims=True)
        l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1, keepdims=True)
        loss = (-jax.nn.log_sigmoid(x) + wd * l2) * mcol

        def placed(D, vals):
            out = D * cmask + D[:, cb:cb + 1] * vals
            for c2 in range(1, s):
                out = out + D[:, cb + c2:cb + c2 + 1] * roll(vals, c2 * K)
            return out

        # loss rides the free lane: the block accumulation sums it per
        # row and the epilogue reduces Aw[:, 127] — in-window samples
        # only, so straddle chunks never double-count (their rows fall
        # in this block's [base, base+arows) exactly once).
        sw = placed(Du, sig * diff) + loss * lossk

        # --- Q out: fill the slab, start the copy, and let it land
        # under the accumulation dots below (waited before returning —
        # the slab is reused by the next chunk)
        q_s[:] = sig * wu + mcol * qk
        q_copy = pltpu.make_async_copy(
            q_s, q_hbm.at[pl.ds(g * tile, tile), :], q_sem)
        q_copy.start()

        # --- block + spill accumulation: one (arows, tile) one-hot,
        # two bf16 dots against the hi/lo split of sw
        hot_a = jnp.concatenate(
            [(pr[a:a + 1, :] == a_iota).astype(jnp.bfloat16)
             for a in range(groups)], axis=1)            # (arows, tile)
        shi = sw.astype(jnp.bfloat16)
        slo = (sw - shi.astype(jnp.float32)).astype(jnp.bfloat16)
        A = jax.lax.dot_general(
            hot_a, shi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        A = A + jax.lax.dot_general(
            hot_a, slo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (arows, 128)
        aw_ref[:] += A[:wrows]
        spill[:] += A[wrows:]
        q_copy.wait()

    def body(p, _):
        c2 = p * 2

        @pl.when(c2 + 1 < nc)
        def _():
            for cp in dma_in(c0 + c2 + 1, 1):
                cp.start()

        process(c2, 0)

        @pl.when(c2 + 1 < nc)
        def _():
            @pl.when(c2 + 2 < nc)
            def _():
                for cp in dma_in(c0 + c2 + 2, 0):
                    cp.start()

            process(c2 + 1, 1)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(nc, 2), body, 0)


def supports_v7(K: int, rw: int, wrows: int = 512) -> bool:
    """v7 (range-based fused sample+W-accumulation over a GATHERED Du
    stream) is span-independent; it only needs the free loss lane and a
    block-tileable table."""
    s = pk.num_slots(K)
    return s * (K + 1) <= LOSS_LANE and rw % wrows == 0


def _kernel_v7(st_ref, ct_ref, rowsw, du_hbm, hi_hbm, dj_hbm,
               aw_ref, q_hbm, du_s0, du_s1, hi_s0, hi_s1, dj_s0, dj_s1,
               q_s, in_sems, q_sem, *, K, s, cb, wd, tile, wrows,
               interpret):
    """Range-based fused sample phase + W accumulation (one window per
    grid step, samples assigned to windows by ROW VALUE — correct for
    any user sparsity).  A chunk straddling a window boundary is
    reprocessed by both windows: its Aw contribution is split exactly by
    the one-hot (out-of-window rows match nothing, so the loss lane
    counts every sample once), and its Q rows are written twice with
    identical values (the sample math only reads the chunk's own
    streams)."""
    w = pl.program_id(0)
    groups = tile // LANES
    base = w * wrows

    if interpret:
        def roll(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def roll(x, shift):
            return pltpu.roll(x, shift % LANES, axis=1)

    du_slots = (du_s0, du_s1)
    hi_slots = (hi_s0, hi_s1)
    dj_slots = (dj_s0, dj_s1)

    aw_ref[:] = jnp.zeros(aw_ref.shape, aw_ref.dtype)
    start = st_ref[w]
    count = ct_ref[w]
    nc = pl.cdiv(count, tile)

    def dma_in(c, slot):
        off = start + c * tile
        return (pltpu.make_async_copy(du_hbm.at[pl.ds(off, tile), :],
                                      du_slots[slot], in_sems.at[0, slot]),
                pltpu.make_async_copy(hi_hbm.at[pl.ds(off, tile), :],
                                      hi_slots[slot], in_sems.at[1, slot]),
                pltpu.make_async_copy(dj_hbm.at[pl.ds(off, tile), :],
                                      dj_slots[slot], in_sems.at[2, slot]))

    @pl.when(nc > 0)
    def _():
        for cp in dma_in(0, 0):
            cp.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    paymask = (lane < K).astype(jnp.float32)
    cmask = ((lane >= cb) & (lane < cb + s)).astype(jnp.float32)
    qk = (lane == K).astype(jnp.float32)
    lossk = (lane == LOSS_LANE).astype(jnp.float32)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, LANES), 0) + base

    def process(c, slot):
        off = start + c * tile
        for cp in dma_in(c, slot):
            cp.wait()
        pr = rowsw[pl.ds(off // LANES, groups), :]
        Du = du_slots[slot][...]
        hi = hi_slots[slot][...]
        hj = dj_slots[slot][...]

        def compact(D):
            acc = D[:, cb:cb + 1] * D
            for c2 in range(1, s):
                acc = acc + D[:, cb + c2:cb + c2 + 1] * roll(D, -c2 * K)
            return acc * paymask

        wu = compact(Du)
        diff = hi - hj
        x = jnp.sum(wu * diff, axis=1, keepdims=True)
        sig = jax.nn.sigmoid(-x)
        mcol = jnp.sum(Du * cmask, axis=1, keepdims=True)
        l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1, keepdims=True)
        loss = (-jax.nn.log_sigmoid(x) + wd * l2) * mcol

        def placed(D, vals):
            out = D * cmask + D[:, cb:cb + 1] * vals
            for c2 in range(1, s):
                out = out + D[:, cb + c2:cb + c2 + 1] * roll(vals, c2 * K)
            return out

        sw = placed(Du, sig * diff) + loss * lossk

        q_s[:] = sig * wu + mcol * qk
        q_copy = pltpu.make_async_copy(
            q_s, q_hbm.at[pl.ds(off, tile), :], q_sem)
        q_copy.start()

        hot = jnp.concatenate(
            [(pr[a:a + 1, :] == w_iota).astype(jnp.bfloat16)
             for a in range(groups)], axis=1)            # (wrows, tile)
        shi = sw.astype(jnp.bfloat16)
        slo = (sw - shi.astype(jnp.float32)).astype(jnp.bfloat16)
        A = jax.lax.dot_general(
            hot, shi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        A = A + jax.lax.dot_general(
            hot, slo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        aw_ref[:] += A
        q_copy.wait()

    def body(p, _):
        c2 = p * 2

        @pl.when(c2 + 1 < nc)
        def _():
            for cp in dma_in(c2 + 1, 1):
                cp.start()

        process(c2, 0)

        @pl.when(c2 + 1 < nc)
        def _():
            @pl.when(c2 + 2 < nc)
            def _():
                for cp in dma_in(c2 + 2, 0):
                    cp.start()

            process(c2 + 1, 1)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(nc, 2), body, 0)


@functools.partial(jax.jit, static_argnames=("K", "wd", "rw", "wrows",
                                             "tile", "interpret"))
def bpr_range_step_v7(rowsw, Du_dec, Hi, Dj, starts, counts, *, K: int,
                      wd: float, rw: int, wrows: int = 512,
                      tile: int = TILE, interpret: bool = False):
    """Span-independent fused sample phase + W accumulation.

    Args:
      rowsw: int32[B/128, 128] lane-major folded per-sample packed rows
        (padding sentinels >= rw).
      Du_dec: (B, 128) gathered+decorated packed user rows (u-order).
      Hi, Dj: (B, 128) gathered item / negative rows (u-order, raw).
      starts/counts: int32[rw//wrows] tile-aligned per-window sample
        ranges over the sorted rows (`window_ranges`), with the LAST
        window's count extended to cover the padding tail so every
        sample's Q row is written (mask-zeroed for padding).

    Returns (Aw, Q) exactly as :func:`bpr_block_step_v6`.
    """
    B = Hi.shape[0]
    if B % tile:
        raise ValueError("B must be a multiple of tile")
    s, cb = pk.num_slots(K), pk.count_base(K)
    if not supports_v7(K, rw, wrows):
        raise ValueError("v7 gate: need s*(K+1) <= 127 and "
                         "rw % wrows == 0")
    nw = rw // wrows
    kern = functools.partial(
        _kernel_v7, K=int(K), s=s, cb=cb, wd=float(wd), tile=tile,
        wrows=wrows, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # rowsw
                  pl.BlockSpec(memory_space=pltpu.HBM),       # Du
                  pl.BlockSpec(memory_space=pltpu.HBM),       # Hi
                  pl.BlockSpec(memory_space=pltpu.HBM)],      # Dj
        out_specs=[pl.BlockSpec((wrows, LANES), lambda w, *_: (w, 0),
                                memory_space=pltpu.VMEM),  # Aw
                   pl.BlockSpec(memory_space=pltpu.HBM)],     # Q
        scratch_shapes=[
            pltpu.VMEM((tile, LANES), jnp.float32),        # du slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # hi slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # dj slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # q slab
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rw, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(starts, counts, rowsw, Du_dec, Hi, Dj)


# ---------------------------------------------------------------------------
# v8: shared-negative-pool variant of v7 (opt-in, BPR(neg_pool=P))
# ---------------------------------------------------------------------------

POOL_MAX = 2048  # (P,128) pool + (P,tile) one-hot tiles stay in VMEM


def supports_v8(K: int, rw: int, wrows: int = 512, P: int = 0) -> bool:
    """v8 = v7's range-based fused step with the negative side served
    from a per-step item POOL resident in VMEM.  Same structural gates as
    v7 plus a lane-aligned, VMEM-bounded pool size."""
    return supports_v7(K, rw, wrows) and P >= LANES \
        and P % LANES == 0 and P <= POOL_MAX


def _kernel_v8(st_ref, ct_ref, rowsw, rjs, hpool, du_hbm, hi_hbm,
               aw_ref, apool_ref, q_hbm, du_s0, du_s1, hi_s0, hi_s1,
               q_s, in_sems, q_sem, *, K, s, cb, wd, tile, wrows,
               interpret):
    """v7's range kernel with the negative stream expanded IN-KERNEL
    from a (P, 128) VMEM pool: ``hj[b] = Hpool[rj[b]]`` via a one-hot
    MXU contraction (replacing the per-row issue-bound ``Hp[j]`` XLA
    gather), and the pool-side gradient accumulated the same way
    (``Apool += onehot @ Q`` — replacing the ``Q[sj]`` reorder gather
    AND the j half of the dual sorted accumulation).  A straddle chunk
    is processed by both neighbouring windows; its pool contribution is
    counted once via the HOME predicate (a sample accumulates only in
    the window that owns its packed W row)."""
    w = pl.program_id(0)
    groups = tile // LANES
    base = w * wrows
    P = hpool.shape[0]

    if interpret:
        def roll(x, shift):
            return jnp.roll(x, shift, axis=1)
    else:
        def roll(x, shift):
            return pltpu.roll(x, shift % LANES, axis=1)

    du_slots = (du_s0, du_s1)
    hi_slots = (hi_s0, hi_s1)

    @pl.when(w == 0)
    def _():
        apool_ref[:] = jnp.zeros(apool_ref.shape, apool_ref.dtype)

    aw_ref[:] = jnp.zeros(aw_ref.shape, aw_ref.dtype)
    start = st_ref[w]
    count = ct_ref[w]
    nc = pl.cdiv(count, tile)

    def dma_in(c, slot):
        off = start + c * tile
        return (pltpu.make_async_copy(du_hbm.at[pl.ds(off, tile), :],
                                      du_slots[slot], in_sems.at[0, slot]),
                pltpu.make_async_copy(hi_hbm.at[pl.ds(off, tile), :],
                                      hi_slots[slot], in_sems.at[1, slot]))

    @pl.when(nc > 0)
    def _():
        for cp in dma_in(0, 0):
            cp.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, LANES), 1)
    paymask = (lane < K).astype(jnp.float32)
    cmask = ((lane >= cb) & (lane < cb + s)).astype(jnp.float32)
    qk = (lane == K).astype(jnp.float32)
    lossk = (lane == LOSS_LANE).astype(jnp.float32)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, LANES), 0) + base
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, LANES), 0)
    # pool bf16 hi+lo split once per window (P x 128 — negligible)
    p32 = hpool[...]
    phi = p32.astype(jnp.bfloat16)
    plo = (p32 - phi.astype(jnp.float32)).astype(jnp.bfloat16)

    def process(c, slot):
        off = start + c * tile
        for cp in dma_in(c, slot):
            cp.wait()
        pr = rowsw[pl.ds(off // LANES, groups), :]
        pj = rjs[pl.ds(off // LANES, groups), :]
        Du = du_slots[slot][...]
        hi = hi_slots[slot][...]

        # --- pool expansion: hj[b] = Hpool[pj[b]], exact via hi+lo split
        hot_p = jnp.concatenate(
            [(pj[a:a + 1, :] == p_iota).astype(jnp.bfloat16)
             for a in range(groups)], axis=1)             # (P, tile)
        hj = jax.lax.dot_general(
            hot_p, phi, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hj = hj + jax.lax.dot_general(
            hot_p, plo, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (tile, 128)

        def compact(D):
            acc = D[:, cb:cb + 1] * D
            for c2 in range(1, s):
                acc = acc + D[:, cb + c2:cb + c2 + 1] * roll(D, -c2 * K)
            return acc * paymask

        wu = compact(Du)
        diff = hi - hj
        x = jnp.sum(wu * diff, axis=1, keepdims=True)
        sig = jax.nn.sigmoid(-x)
        mcol = jnp.sum(Du * cmask, axis=1, keepdims=True)
        l2 = jnp.sum(wu * wu + hi * hi + hj * hj, axis=1, keepdims=True)
        loss = (-jax.nn.log_sigmoid(x) + wd * l2) * mcol

        def placed(D, vals):
            out = D * cmask + D[:, cb:cb + 1] * vals
            for c2 in range(1, s):
                out = out + D[:, cb + c2:cb + c2 + 1] * roll(vals, c2 * K)
            return out

        sw = placed(Du, sig * diff) + loss * lossk

        qv = sig * wu + mcol * qk
        q_s[:] = qv
        q_copy = pltpu.make_async_copy(
            q_s, q_hbm.at[pl.ds(off, tile), :], q_sem)
        q_copy.start()

        # --- W accumulation (identical to v7)
        hot = jnp.concatenate(
            [(pr[a:a + 1, :] == w_iota).astype(jnp.bfloat16)
             for a in range(groups)], axis=1)             # (wrows, tile)
        shi = sw.astype(jnp.bfloat16)
        slo = (sw - shi.astype(jnp.float32)).astype(jnp.bfloat16)
        A = jax.lax.dot_general(
            hot, shi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        A = A + jax.lax.dot_general(
            hot, slo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        aw_ref[:] += A

        # --- pool accumulation, home-masked (each sample counted once:
        # only the window owning its packed W row accumulates it).  The
        # home predicate is folded into each (P, 128) piece BEFORE the
        # lane concat: Mosaic cannot lower a concat of (1, 128) bf16
        # pieces (sublane-offset mismatch — found on hardware, round 4)
        hot_h = jnp.concatenate(
            [((pj[a:a + 1, :] == p_iota)
              & (pr[a:a + 1, :] >= base)
              & (pr[a:a + 1, :] < base + wrows)).astype(jnp.bfloat16)
             for a in range(groups)], axis=1)             # (P, tile)
        qhi = qv.astype(jnp.bfloat16)
        qlo = (qv - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        Ap = jax.lax.dot_general(
            hot_h, qhi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Ap = Ap + jax.lax.dot_general(
            hot_h, qlo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (P, 128)
        apool_ref[:] += Ap
        q_copy.wait()

    def body(p, _):
        c2 = p * 2

        @pl.when(c2 + 1 < nc)
        def _():
            for cp in dma_in(c2 + 1, 1):
                cp.start()

        process(c2, 0)

        @pl.when(c2 + 1 < nc)
        def _():
            @pl.when(c2 + 2 < nc)
            def _():
                for cp in dma_in(c2 + 2, 0):
                    cp.start()

            process(c2 + 1, 1)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(nc, 2), body, 0)


@functools.partial(jax.jit, static_argnames=("K", "wd", "rw", "wrows",
                                             "tile", "interpret"))
def bpr_pool_step_v8(rowsw, rjs, Du_dec, Hi, Hpool, starts, counts, *,
                     K: int, wd: float, rw: int, wrows: int = 512,
                     tile: int = TILE, interpret: bool = False):
    """Shared-negative-pool fused step (see :func:`_kernel_v8`).

    Args (beyond :func:`bpr_range_step_v7`'s):
      rjs: int32[B/128, 128] lane-major folded per-sample POOL slots
        (``j[b] = pool[rjs[b]]``).
      Hpool: (P, 128) gathered pool rows ``Hp[pool]`` — fully
        VMEM-resident (P*512B; P <= ~4096 stays tiny).

    Returns:
      Aw: (rw, 128) accumulated W-side stream, loss sum on lane 127.
      Apool: (P, 128) accumulated pool-side H products (``sig*wu`` with
        live counts at lane K) — scatter ``Hacc.at[pool].add(Apool)``
        to land them, P rows instead of a B-row sorted stream.
      Q: (B, 128) compact H-side product for the i-side accumulation.
    """
    B = Hi.shape[0]
    if B % tile:
        raise ValueError("B must be a multiple of tile")
    s, cb = pk.num_slots(K), pk.count_base(K)
    P = Hpool.shape[0]
    if not supports_v8(K, rw, wrows, P):
        raise ValueError("v8 gate: v7 gates plus P a positive multiple "
                         f"of 128 <= {POOL_MAX}")
    nw = rw // wrows
    kern = functools.partial(
        _kernel_v8, K=int(K), s=s, cb=cb, wd=float(wd), tile=tile,
        wrows=wrows, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # rowsw
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # rjs
                  pl.BlockSpec(memory_space=pltpu.VMEM),   # Hpool
                  pl.BlockSpec(memory_space=pltpu.HBM),       # Du
                  pl.BlockSpec(memory_space=pltpu.HBM)],      # Hi
        out_specs=[pl.BlockSpec((wrows, LANES), lambda w, *_: (w, 0),
                                memory_space=pltpu.VMEM),  # Aw
                   pl.BlockSpec((P, LANES), lambda w, *_: (0, 0),
                                memory_space=pltpu.VMEM),  # Apool
                   pl.BlockSpec(memory_space=pltpu.HBM)],     # Q
        scratch_shapes=[
            pltpu.VMEM((tile, LANES), jnp.float32),        # du slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # hi slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # q slab
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rw, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((P, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(starts, counts, rowsw, rjs, Hpool, Du_dec, Hi)


@functools.partial(jax.jit, static_argnames=("K", "wd", "rw", "wrows",
                                             "tile", "interpret"))
def bpr_block_step_v6(Wp, rowsw, Hi, Dj_dec, wstart, cs, cn, *, K: int,
                      wd: float, rw: int, wrows: int = 512,
                      tile: int = TILE, interpret: bool = False):
    """Fused sample phase + W accumulation.

    Args:
      Wp: (rw, 128) packed user table (HBM).
      rowsw: int32[B/128, 128] lane-major folded per-sample packed rows.
      Hi: (B, 128) gathered item rows ``Hp[i]`` (u-order).
      Dj_dec: (B, 128) gathered+decorated negative rows (u-order).
      wstart: int32[B/tile] per-chunk expansion window starts
        (``clip(row[g*tile], 0, rw - CROWS)``, host-computed).
      cs, cn: int32[rw//wrows] per-block home chunk ranges
        (:func:`prep_blocks`).

    Returns:
      Aw: (rw, 128) accumulated W-side stream — payload+count channels
        as `sorted_accum` would produce, loss sum on lane 127.
      Q: (B, 128) compact H-side product, as v5.
    """
    B = Hi.shape[0]
    if B % tile:
        raise ValueError("B must be a multiple of tile")
    s, cb = pk.num_slots(K), pk.count_base(K)
    if not supports_v6(K, rw, wrows):
        raise ValueError("v6 gate: need s >= 4, s*(K+1) <= 127, "
                         "rw >= CROWS and rw % wrows == 0")
    nb = rw // wrows
    spill_rows = CROWS
    kern = functools.partial(
        _kernel, K=int(K), s=s, cb=cb, wd=float(wd), tile=tile,
        wrows=wrows, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),   # rowsw
                  pl.BlockSpec(memory_space=pltpu.HBM),       # Wp
                  pl.BlockSpec(memory_space=pltpu.HBM),       # Hi
                  pl.BlockSpec(memory_space=pltpu.HBM)],      # Dj
        out_specs=[pl.BlockSpec((wrows, LANES), lambda b, *_: (b, 0),
                                memory_space=pltpu.VMEM),  # Aw
                   pl.BlockSpec(memory_space=pltpu.HBM)],     # Q
        scratch_shapes=[
            pltpu.VMEM((CROWS, LANES), jnp.float32),       # w slabs
            pltpu.VMEM((CROWS, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # hi slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # dj slabs
            pltpu.VMEM((tile, LANES), jnp.float32),
            pltpu.VMEM((tile, LANES), jnp.float32),        # q slab
            pltpu.VMEM((spill_rows, LANES), jnp.float32),  # spill
            pltpu.SemaphoreType.DMA((3, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rw, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((B, LANES), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(cs, cn, wstart, rowsw, Wp, Hi, Dj_dec)
