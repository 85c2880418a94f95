"""Pallas sorted gradient accumulation — the TPU answer to scatter-add.

Replaces the reference's per-sample Hogwild writes
(`/root/reference/cymf/optimizer.pyx:52-58`) AND XLA's scatter-add, which
is the measured bottleneck of the batch SGD step (40-90M rows/s on v5e,
~11ns per scattered row — docs/PERF.md).  Design:

* The trainer keeps each batch's target rows **sorted** (users are sorted
  on the host; item/negative contributions are permuted into sorted order
  by a host-computed permutation).  Sorted rows mean each sample belongs
  to exactly one contiguous *window* of the table.
* The kernel grid iterates over row windows of the packed gradient buffer
  (``WROWS`` physical rows each).  The host — which knows the sorted row
  array — prefetches each window's sample range as scalars.  Ranges are
  aligned down to the DMA tile size; out-of-window samples swept in by the
  alignment excluded themselves (their row falls outside the window, so
  the one-hot match is all-zero).
* Each window accumulates its samples in tiles: for each 128-sample group
  the VPU builds the transposed one-hot ``Hot[w, b] = (rows[b] == base+w)``
  (samples live on lanes, window rows on sublanes — no transpose or
  reshape needed) and the MXU contracts ``window += Hot @ grads_group``.
  Duplicates combine natively, there is no conflict serialization to pay
  for, and throughput is MXU FLOPs instead of scatter issue rate.

Numerical note: within a window the sum order differs from scatter order
(matmul reduction), so results match ``.at[rows].add`` to float32
round-off, not bit-exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def window_ranges(rows_sorted: np.ndarray, r_pad: int, wrows: int,
                  tile: int = 1024, align: int | None = None):
    """Host-side: per-window aligned [start, count) sample ranges.

    ``rows_sorted`` must be ascending; padding sentinel rows must be
    >= r_pad so no window's range covers them as matches.

    ``align=None`` (legacy) aligns starts down to ``tile`` — every
    chunk DMA trivially stays inside the tile-padded sample array, but
    a window reprocesses up to ``tile-1`` pre-window samples (~40%
    extra chunk traffic at ML-20M shapes).  ``align=128`` (the fold
    granularity of the lane-major rows arrays — slices must land on
    whole 128-lane groups) cuts that to < 128 samples per window; the
    few windows whose last chunk would overrun the padded length are
    re-anchored so their chunk grid ends exactly at it (still covering
    every window sample, at tile granularity)."""
    nw = r_pad // wrows
    bounds = np.arange(nw + 1, dtype=np.int64) * wrows
    edges = np.searchsorted(rows_sorted, bounds).astype(np.int64)
    if align is None:
        starts = (edges[:-1] // tile) * tile
        counts = edges[1:] - starts
        return starts.astype(np.int32), counts.astype(np.int32)
    if align % LANES or tile % align:
        raise ValueError("align must be a multiple of 128 dividing tile")
    Bp = -(-max(len(rows_sorted), 1) // tile) * tile
    starts = (edges[:-1] // align) * align
    counts = edges[1:] - starts
    nch = -(-counts // tile)
    over = starts + nch * tile > Bp
    if over.any():
        need = np.maximum(nch, -(-(Bp - edges[:-1]) // tile))
        starts = np.where(over, Bp - need * tile, starts)
        counts = edges[1:] - starts
    return starts.astype(np.int32), counts.astype(np.int32)


def pad_samples(rows_sorted: np.ndarray, sentinel: int, tile: int = 1024):
    """Host-side: pad sorted rows up to a tile multiple (sentinel >= r_pad
    so padding never matches a window) and fold to the (B/128, 128)
    lane-major layout the kernel expects.  No spare tile is needed: window
    starts are tile-aligned and the padded length is a tile multiple, so
    every DMA offset satisfies off + tile <= B."""
    n = len(rows_sorted)
    total = -(-max(n, 1) // tile) * tile
    out = np.full(total, sentinel, np.int32)
    out[:n] = rows_sorted
    return out.reshape(total // LANES, LANES)


def _accum_kernel(starts_ref, counts_ref, rows_vmem, g_hbm, out_ref,
                  g_s0, g_s1, sems, *, wrows: int, tile: int, precision,
                  count_lanes: bool = False):
    """Per-window accumulation with double-buffered gradient DMA.

    The sorted row array is small (4 bytes/sample) and lives fully in VMEM;
    only the (tile, 128) gradient slabs stream from HBM, prefetched one
    chunk ahead so the DMA latency hides under the one-hot matmuls.  The
    two DMA slots are separate scratch refs indexed statically — a traced
    slot index would force Mosaic to materialize a copy of the slab.
    """
    w = pl.program_id(0)
    # starts arrive PRE-DIVIDED by 128 (lane groups): multiplying back
    # inside the kernel makes the DMA offset provably 128-divisible —
    # Mosaic cannot prove divisibility of a raw runtime scalar and
    # refuses the multi-granule (width > 128) memref_slice otherwise
    # (found on hardware, round 4)
    startg = starts_ref[w]
    count = counts_ref[w]
    base = w * wrows
    groups = tile // LANES
    nchunks = pl.cdiv(count, tile)
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, LANES), 0) + base
    slots = (g_s0, g_s1)

    def dma(c, slot):
        return pltpu.make_async_copy(
            g_hbm.at[pl.ds(startg * LANES + c * tile, tile), :],
            slots[slot], sems.at[slot])

    lane0 = (jax.lax.broadcasted_iota(jnp.int32, (wrows, LANES), 1)
             == 0).astype(jnp.float32)
    win = out_ref.shape[1] - LANES if count_lanes else out_ref.shape[1]

    def process(c, g_ref):
        rblock = rows_vmem[pl.ds(startg + c * groups, groups), :]
        # one deep contraction per tile: the per-group one-hots concatenate
        # along lanes into (wrows, tile), then a single MXU dot against the
        # (tile, 128) gradient slab — contraction depth `tile` keeps the
        # systolic array full (8 separate 128-deep dots each paid MXU
        # latency and ran ~3x slower).
        pieces = [rblock[a:a + 1, :] == w_iota for a in range(groups)]
        if precision == "split":
            # 0/1 one-hot entries are exact in bf16; splitting the f32
            # gradient slab into bf16 high + low halves makes the bf16
            # matmul near-exact (~2^-18 relative) at 2 MXU passes instead
            # of Precision.HIGHEST's 6.
            hot = jnp.concatenate(
                [p.astype(jnp.bfloat16) for p in pieces], axis=1)
            g32 = g_ref[...]
            ghi = g32.astype(jnp.bfloat16)
            glo = (g32 - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
            A = jax.lax.dot_general(
                jnp.concatenate([hot, hot], axis=1),
                jnp.concatenate([ghi, glo], axis=0),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            hot = jnp.concatenate(
                [p.astype(jnp.float32) for p in pieces], axis=1)
            A = jax.lax.dot_general(
                hot, g_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision)
        if count_lanes:
            # per-row live count from the one-hot row-sums (VPU) — the
            # caller routed masked samples to the sentinel row, so a
            # match IS a live sample; the gradient stream then carries
            # payload lanes only (128 fewer lanes of HBM traffic/sample)
            cnt = pieces[0].astype(jnp.float32).sum(axis=1, keepdims=True)
            for p in pieces[1:]:
                cnt = cnt + p.astype(jnp.float32).sum(axis=1,
                                                      keepdims=True)
            out_ref[:, :win] += A
            out_ref[:, win:] += cnt * lane0
        else:
            out_ref[:] += A

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(p, _):
        c0 = p * 2

        @pl.when(c0 + 1 < nchunks)
        def _():
            dma(c0 + 1, 1).start()

        dma(c0, 0).wait()
        process(c0, g_s0)

        @pl.when(c0 + 1 < nchunks)
        def _():
            @pl.when(c0 + 2 < nchunks)
            def _():
                dma(c0 + 2, 0).start()

            dma(c0 + 1, 1).wait()
            process(c0 + 1, g_s1)
        return 0

    jax.lax.fori_loop(0, pl.cdiv(nchunks, 2), body, 0)


def _accum_kernel_dual(si_ref, ci_ref, sj_ref, cj_ref, rows_i, rows_j,
                       gi_hbm, gj_hbm, out_ref, g_s0, g_s1, sems, *,
                       wrows: int, tile: int, precision, neg_lanes: int,
                       count_lanes: bool = False):
    """Two sorted streams into ONE window buffer: the i (positive-item)
    stream accumulates with NEGATED payload lanes (< ``neg_lanes``) while
    its count lane still adds — the output is directly ``Aj - Ai`` with
    summed live counts, which is exactly the packed BPR step's H-side
    gradient operand (one output buffer and one combine pass instead of
    two of each)."""
    w = pl.program_id(0)
    base = w * wrows
    groups = tile // LANES
    out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (wrows, LANES), 0) + base
    win = out_ref.shape[1] - LANES if count_lanes else out_ref.shape[1]
    lane0 = (jax.lax.broadcasted_iota(jnp.int32, (wrows, LANES), 1)
             == 0).astype(jnp.float32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
    sv_neg = jnp.where(lanes < neg_lanes, jnp.float32(-1), jnp.float32(1))
    slots = (g_s0, g_s1)

    for st_ref, ct_ref, rows_vmem, g_hbm, sign in (
            (si_ref, ci_ref, rows_i, gi_hbm, sv_neg),
            (sj_ref, cj_ref, rows_j, gj_hbm, None)):
        # starts pre-divided by 128 — see _accum_kernel
        startg = st_ref[w]
        count = ct_ref[w]
        nchunks = pl.cdiv(count, tile)

        def dma(c, slot, startg=startg, g_hbm=g_hbm):
            return pltpu.make_async_copy(
                g_hbm.at[pl.ds(startg * LANES + c * tile, tile), :],
                slots[slot], sems.at[slot])

        def process(c, g_ref, startg=startg, rows_vmem=rows_vmem,
                    sign=sign):
            rblock = rows_vmem[pl.ds(startg + c * groups, groups), :]
            g32 = g_ref[...]
            if sign is not None:
                g32 = g32 * sign
            pieces = [rblock[a:a + 1, :] == w_iota for a in range(groups)]
            if precision == "split":
                hot = jnp.concatenate(
                    [p.astype(jnp.bfloat16) for p in pieces], axis=1)
                ghi = g32.astype(jnp.bfloat16)
                glo = (g32 - ghi.astype(jnp.float32)).astype(jnp.bfloat16)
                A = jax.lax.dot_general(
                    jnp.concatenate([hot, hot], axis=1),
                    jnp.concatenate([ghi, glo], axis=0),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                hot = jnp.concatenate(
                    [p.astype(jnp.float32) for p in pieces], axis=1)
                A = jax.lax.dot_general(
                    hot, g32, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
            if count_lanes:
                cnt = pieces[0].astype(jnp.float32).sum(axis=1,
                                                        keepdims=True)
                for p in pieces[1:]:
                    cnt = cnt + p.astype(jnp.float32).sum(axis=1,
                                                          keepdims=True)
                out_ref[:, :win] += A
                out_ref[:, win:] += cnt * lane0  # counts ADD both streams
            else:
                out_ref[:] += A

        @pl.when(nchunks > 0)
        def _():
            dma(0, 0).start()

        def body(p, _, dma=dma, process=process, nchunks=nchunks):
            c0 = p * 2

            @pl.when(c0 + 1 < nchunks)
            def _():
                dma(c0 + 1, 1).start()

            dma(c0, 0).wait()
            process(c0, g_s0)

            @pl.when(c0 + 1 < nchunks)
            def _():
                @pl.when(c0 + 2 < nchunks)
                def _():
                    dma(c0 + 2, 0).start()

                dma(c0 + 1, 1).wait()
                process(c0 + 1, g_s1)
            return 0

        jax.lax.fori_loop(0, pl.cdiv(nchunks, 2), body, 0)


@functools.partial(jax.jit, static_argnames=("r_pad", "wrows", "tile",
                                             "interpret", "precision",
                                             "neg_lanes", "count_lanes"))
def sorted_accum_dual(rows_i, gi, starts_i, counts_i, rows_j, gj, starts_j,
                      counts_j, *, r_pad: int, neg_lanes: int,
                      wrows: int = 512, tile: int = 1024,
                      interpret: bool = False, precision: str = "highest",
                      count_lanes: bool = False):
    """Fused two-stream accumulation: returns
    ``scatter(rows_j, gj) - scatter(rows_i, gi * [-1 on lanes < neg_lanes])``
    ... i.e. per output row, j contributions add, i contributions subtract
    on the payload lanes (< ``neg_lanes``) and ADD on the remaining lanes
    (the live-count channel).  Argument contracts are as
    :func:`sorted_accum`, once per stream.

    ``count_lanes=True``: the gradient streams carry PAYLOAD ONLY and the
    per-row live counts (both streams adding) are computed in-kernel from
    the one-hot row-sums, landing on lane ``width`` of a
    ``(r_pad, width + 128)`` output — see :func:`sorted_accum`.
    """
    if r_pad % wrows:
        raise ValueError("r_pad must be a multiple of wrows")
    if tile % LANES or (tile // LANES) % 8:
        raise ValueError("tile must be a multiple of 1024")
    for r2, g in ((rows_i, gi), (rows_j, gj)):
        if (r2.shape[0] * LANES) % tile or g.shape[0] % tile:
            raise ValueError("sample count must be padded to a tile "
                             "multiple")
    width = gi.shape[1]
    if width % LANES or gj.shape[1] != width:
        raise ValueError("gradient widths must match and be multiples "
                         "of 128")
    wout = width + LANES if count_lanes else width
    nw = r_pad // wrows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((wrows, wout), lambda w, *_: (w, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, width), jnp.float32),
            pltpu.VMEM((tile, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    prec = "split" if precision == "split" else jax.lax.Precision(precision)
    return pl.pallas_call(
        functools.partial(_accum_kernel_dual, wrows=wrows, tile=tile,
                          precision=prec, neg_lanes=int(neg_lanes),
                          count_lanes=count_lanes),
        out_shape=jax.ShapeDtypeStruct((r_pad, wout), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts_i // LANES, counts_i, starts_j // LANES, counts_j,
      rows_i, rows_j, gi, gj)


@functools.partial(jax.jit, static_argnames=("r_pad", "wrows", "tile",
                                             "interpret", "precision",
                                             "count_lanes"))
def sorted_accum(rows2d, g, starts, counts, *, r_pad: int, wrows: int = 512,
                 tile: int = 1024, interpret: bool = False,
                 precision: str = "highest", count_lanes: bool = False):
    """Accumulate ``g[b]`` into output row ``rows[b]``.

    ``count_lanes=True`` (round 4 — the wide-engine stream-width
    optimization): ``g`` carries PAYLOAD lanes only and the output gains
    a trailing 128-lane granule whose lane 0 holds the per-row LIVE
    COUNT, computed in-kernel as the one-hot row-sum.  The caller must
    route masked/dead samples' rows to a sentinel ``>= r_pad`` (their
    window ranges may still cover the positions — a sentinel simply
    never matches), so a one-hot match is exactly a live sample.  This
    removes 128 lanes of per-sample HBM stream traffic that previously
    carried one mask bit (`wide_epoch._count_block`), at the cost of a
    cheap VPU lane-reduction.

    Args:
      rows2d: int32[Bp/128, 128] ascending target physical rows in
        lane-major fold (from :func:`pad_samples`; sample ``b`` lives at
        ``[b // 128, b % 128]``).  Bp must be a multiple of ``tile``
        (window starts are tile-aligned, so no DMA can then overrun) and
        padding rows must be >= r_pad.
      g: float32[Bp, width] lane-placed gradients (padding rows' values
        are never matched, so they may be anything).  ``width`` is any
        multiple of 128 — wide (K >= 128) engines pass multi-granule
        rows; the one-hot contraction shape follows the operand.
      starts/counts: int32[r_pad // wrows] tile-aligned window ranges from
        :func:`window_ranges` (computed on the host, which already knows
        the sorted rows).
      r_pad: output rows — a multiple of ``wrows``.

    Returns float32[r_pad, width] with summed gradients (zeros elsewhere).
    """
    if r_pad % wrows:
        raise ValueError("r_pad must be a multiple of wrows")
    if tile % LANES or (tile // LANES) % 8:
        raise ValueError("tile must be a multiple of 1024")
    if (rows2d.shape[0] * LANES) % tile or g.shape[0] % tile:
        raise ValueError("sample count must be padded to a tile multiple")
    width = g.shape[1]
    if width % LANES:
        raise ValueError("gradient width must be a multiple of 128")
    wout = width + LANES if count_lanes else width
    nw = r_pad // wrows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((wrows, wout), lambda w, s, c: (w, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile, width), jnp.float32),
            pltpu.VMEM((tile, width), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    prec = "split" if precision == "split" else jax.lax.Precision(precision)
    return pl.pallas_call(
        functools.partial(_accum_kernel, wrows=wrows, tile=tile,
                          precision=prec, count_lanes=count_lanes),
        out_shape=jax.ShapeDtypeStruct((r_pad, wout), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts // LANES, counts, rows2d, g)


def sorted_accum_reference(rows, g, r_pad: int):
    """jnp scatter-add equivalent (for tests and non-TPU fallback)."""
    return jnp.zeros((r_pad, LANES), g.dtype).at[rows].add(g, mode="drop")
