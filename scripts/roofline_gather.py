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

    # HBM streaming bandwidth reference (copy of a (B,128) buffer)
    X = jnp.asarray(rng.normal(size=(B, 128)).astype(np.float32))
    cp = jax.jit(lambda x: x * 1.0000001)
    dt = timeit(cp, X)
    print(f"stream  copy (B,128)      {B*128*4*2/dt/1e9:5.0f} GB/s "
          f"({dt*1e3:6.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
