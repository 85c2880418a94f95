"""Gather/scatter roofline microbenchmark (TPU).

The packed BPR step's floor is set by four mandatory B-row random
accesses per step (docs/PERF.md): the W/Hi/Hj input gathers and the two
Q sort-permutation gathers.  This script measures XLA's actual gather
issue rate across source-table sizes, sortedness, and widths, plus the
scatter-add rate for contrast — the numbers that decide whether the
remaining step time is an XLA artifact or the memory system's
random-access wall.

Usage: timeout 1800 python scripts/roofline_gather.py > roofline.log
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pallas_gather(T, idx, *, tile=512, q=8, interpret=False):
    """Hand-rolled row gather: one DMA descriptor per row, ``q`` in
    flight.  Exists to answer whether XLA's gather rate (~450M rows/s,
    2.2ns/row) is an XLA artifact or the memory system's issue wall —
    if per-row DMA with a deep queue beats it, the packed step's
    reorder/table gathers should move into kernels; if it's slower, the
    XLA gather rate IS the roofline term."""
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = idx.shape[0]
    R, W = T.shape

    def kern(idx_ref, t_hbm, o_ref, sems):
        t = pl.program_id(0)
        base = t * tile

        def copy(k):
            return pltpu.make_async_copy(
                t_hbm.at[idx_ref[base + k]], o_ref.at[k], sems.at[k % q])

        def body(k, _):
            copy(k).start()

            @pl.when(k >= q - 1)
            def _():
                copy(k - (q - 1)).wait()
            return 0

        jax.lax.fori_loop(0, tile, body, 0)

        def drain(k, _):
            copy(k).wait()
            return 0

        jax.lax.fori_loop(tile - (q - 1), tile, drain, 0)

    @functools.partial(jax.jit, static_argnames=())
    def run(T, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // tile,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((tile, W), lambda t, _: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((q,))],
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, W), T.dtype),
            interpret=interpret,
        )(idx, T)

    return run(T, idx)


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("RL_BATCH", str(131072)))
    reps = 30
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} reps={reps}", flush=True)

    def timeit(fn, *args):
        out = fn(*args)
        float(jax.device_get(jnp.sum(out[0, :1])))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jax.device_get(jnp.sum(out[0, :1])))
        return (time.perf_counter() - t0) / reps

    for R in (4096, 23552, 27136, 131072, 1048576):
        T = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
        idx_r = jnp.asarray(rng.integers(0, R, B).astype(np.int32))
        idx_s = jnp.sort(idx_r)

        g_rand = jax.jit(lambda T, ix: T[ix])
        g_sort = jax.jit(lambda T, ix: T.at[ix].get(
            indices_are_sorted=True, mode="promise_in_bounds"))
        dt_r = timeit(g_rand, T, idx_r)
        dt_s = timeit(g_sort, T, idx_s)
        print(f"gather  R={R:8d} w=128  random {B/dt_r/1e6:7.1f}M rows/s "
              f"({dt_r*1e3:6.3f} ms)   sorted {B/dt_s/1e6:7.1f}M rows/s "
              f"({dt_s*1e3:6.3f} ms)", flush=True)

    # width sweep at the Q-reorder shape (source = B-row buffer)
    for w in (128, 256, 384):
        T = jnp.asarray(rng.normal(size=(B, w)).astype(np.float32))
        idx = jnp.asarray(rng.permutation(B).astype(np.int32))
        g = jax.jit(lambda T, ix: T[ix])
        dt = timeit(g, T, idx)
        print(f"gather  R={B:8d} w={w:3d}  perm   {B/dt/1e6:7.1f}M rows/s "
              f"({dt*1e3:6.3f} ms, {B*w*4*2/dt/1e9:5.0f} GB/s r+w)",
              flush=True)

    # scatter-add for contrast
    for R in (27136,):
        Tz = jnp.zeros((R, 128), jnp.float32)
        V = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
        idx = jnp.asarray(np.sort(rng.integers(0, R, B)).astype(np.int32))
        sc = jax.jit(lambda Z, ix, V: Z.at[ix].add(
            V, indices_are_sorted=True, mode="drop"))
        dt = timeit(sc, Tz, idx, V)
        print(f"scatter R={R:8d} w=128  sorted {B/dt/1e6:7.1f}M rows/s "
              f"({dt*1e3:6.3f} ms)", flush=True)

    # hand-rolled per-row DMA gather (see pallas_gather) vs XLA's
    if os.environ.get("RL_PALLAS", "1") == "1":
        interpret = jax.default_backend() != "tpu"
        R = 131072
        T = jnp.asarray(rng.normal(size=(R, 128)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, R, B).astype(np.int32))
        ref = np.asarray(T)[np.asarray(idx)[:2048]]
        for q in (4, 16, 64):
            fn = lambda T, ix, q=q: pallas_gather(T, ix, q=q,
                                                  interpret=interpret)
            out = fn(T, idx)
            np.testing.assert_allclose(np.asarray(out)[:2048], ref)
            dt = timeit(fn, T, idx)
            print(f"pallas-dma gather R={R} w=128 q={q:3d}  "
                  f"{B/dt/1e6:7.1f}M rows/s ({dt*1e3:6.3f} ms)",
                  flush=True)

    # HBM streaming bandwidth reference (copy of a (B,128) buffer)
    X = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
    cp = jax.jit(lambda x: x * 1.0000001)
    dt = timeit(cp, X)
    print(f"stream  copy (B,128)      {B*128*4*2/dt/1e9:5.0f} GB/s "
          f"({dt*1e3:6.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
