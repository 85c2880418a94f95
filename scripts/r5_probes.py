"""Round-5 decisive probes (run on the real TPU, honest device_get barrier).

P1  sample-kernel streaming floor: a copy-through Pallas kernel with the
    EXACT same 3-in/2-out+loss block structure as `bpr_sample_phase` but
    ~zero VPU math.  If copy-through ~= the 1.08 ms measured stage, the
    kernel is HBM-streaming-bound and at its wall (write the refutation);
    if ~0.4 ms, the VPU op mix is the gap (MXU-ify the rolls).
P2  v4 sample kernel in isolation (same harness) for the delta.
P3  device sort cost at B=131k inside a scan: lax.sort_key_val of
    (i32 keys, i32 values) — the on-device epoch-prep lever (verdict #2).
P4  threefry draws + iota pairing cost in-scan (the rest of device prep).
P5  in-scan window_ranges equivalent: searchsorted of ~105 window bounds
    in the sorted stream.
P6  binomial-scan multinomial draw (the sort-free u-side window-count
    trick): 91 sequential binomials + within-window uniforms.

Usage: python scripts/r5_probes.py [S] > docs/measurements/r5/probes.log
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cymf_tpu.ops.fused_sample import bpr_sample_phase  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

B = 131072
S = int(sys.argv[1]) if len(sys.argv) > 1 else 96
LANES = 128
TILE = 512
K = 20


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.device_get(
            jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"{name}: {t*1e3:.2f} ms total = {t/S*1e3:.3f} ms/step "
          f"(S={S}, reps={reps})", flush=True)
    return t / S


# --- P1: copy-through kernel with the v4 block structure ----------------
def _copy_kernel(du, di, dj, sw, q, lossp):
    t = pl.program_id(0)
    Du, Di, Dj = du[:], di[:], dj[:]

    @pl.when(t == 0)
    def _init():
        lossp[:] = jnp.zeros_like(lossp)

    lossp[:] = lossp[:] + jnp.zeros_like(lossp)
    sw[:] = Du + Di          # one add: forces all reads, ~zero math
    q[:] = Di - Dj


@jax.jit
def copy_phase(Du, Di, Dj):
    nT = Du.shape[0] // TILE
    spec = pl.BlockSpec((TILE, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy_kernel, grid=(nT,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 2 + [pl.BlockSpec((8, LANES), lambda t: (0, 0),
                                             memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((Du.shape[0], LANES),
                                        jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
    )(Du, Di, Dj)


@jax.jit
def scan_copy(Du, Di, Dj):
    def step(c, t):
        sw, q, lp = copy_phase(Du + c, Di, Dj)
        return c + lp[0, 0] + sw[0, 0] + q[0, 0], None
    out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(S))
    return out


@jax.jit
def scan_v4(Du, Di, Dj):
    def step(c, t):
        sw, q, lp = bpr_sample_phase(Du + c, Di, Dj, K=K, wd=0.01,
                                     interpret=False)
        return c + lp[0, 0] + sw[0, 0] + q[0, 0], None
    out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(S))
    return out


@jax.jit
def scan_baseline(Du, Di, Dj):
    def step(c, t):
        return c + (Du[0, 0] + t), None
    out, _ = jax.lax.scan(step, jnp.float32(0),
                          jnp.arange(S, dtype=jnp.float32))
    return out


# --- P3/P4/P5: device epoch-prep stages ---------------------------------
@jax.jit
def scan_sort(key0):
    def step(c, t):
        k = jax.random.fold_in(key0, t)
        j = jax.random.randint(k, (B,), 0, 26744, dtype=jnp.int32)
        sk, sv = jax.lax.sort_key_val(j, jnp.arange(B, dtype=jnp.int32))
        return c + sk[0] + sv[0], None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


@jax.jit
def scan_draw_only(key0):
    def step(c, t):
        k = jax.random.fold_in(key0, t)
        j = jax.random.randint(k, (B,), 0, 26744, dtype=jnp.int32)
        return c + j[0], None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


@jax.jit
def scan_sort_windows(key0):
    nw = 26880 // 256

    def step(c, t):
        k = jax.random.fold_in(key0, t)
        j = jax.random.randint(k, (B,), 0, 26744, dtype=jnp.int32)
        sk, sv = jax.lax.sort_key_val(j, jnp.arange(B, dtype=jnp.int32))
        bounds = jnp.arange(nw + 1, dtype=jnp.int32) * 256
        edges = jnp.searchsorted(sk, bounds).astype(jnp.int32)
        return c + sk[0] + sv[0] + edges[-1], None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


@jax.jit
def scan_argsort(key0):
    def step(c, t):
        k = jax.random.fold_in(key0, t)
        j = jax.random.randint(k, (B,), 0, 26744, dtype=jnp.int32)
        p = jnp.argsort(j)
        return c + p[0], None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


@jax.jit
def scan_binomial_multinomial(key0):
    """u-side sort-free draw: multinomial window counts via a 91-step
    binomial scan + within-window uniforms (still B draws)."""
    NWW = 91
    ROWS_W = 256 * 6  # users per window (wrows_w * slots)

    def step(c, t):
        k = jax.random.fold_in(key0, t)

        def bin_step(carry, w):
            rem, kk = carry
            kk = jax.random.fold_in(kk, w)
            p = 1.0 / (NWW - w).astype(jnp.float32)
            cnt = jnp.rint(jax.random.binomial(
                kk, rem.astype(jnp.float32), p)).astype(jnp.int32)
            return (rem - cnt, kk), cnt
        (_, _), counts = jax.lax.scan(
            bin_step, (jnp.int32(B), k), jnp.arange(NWW))
        starts = jnp.cumsum(counts) - counts
        w_of_b = jnp.searchsorted(
            jnp.cumsum(counts), jnp.arange(B, dtype=jnp.int32),
            side="right").astype(jnp.int32)
        off = jax.random.randint(jax.random.fold_in(k, 7), (B,), 0,
                                 ROWS_W, dtype=jnp.int32)
        u = w_of_b * ROWS_W + off
        return c + u[0] + starts[0], None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  B={B} S={S}", flush=True)
    rng = np.random.default_rng(0)
    Du = jnp.asarray(rng.normal(size=(B, LANES)).astype(np.float32))
    Di = jnp.asarray(rng.normal(size=(B, LANES)).astype(np.float32))
    Dj = jnp.asarray(rng.normal(size=(B, LANES)).astype(np.float32))
    key0 = jax.random.PRNGKey(0)

    base = timeit("P0 scan baseline (no kernel)", scan_baseline, Du, Di, Dj)
    t_copy = timeit("P1 copy-through kernel", scan_copy, Du, Di, Dj)
    t_v4 = timeit("P2 v4 sample kernel", scan_v4, Du, Di, Dj)
    print(f"   -> kernel VPU-math delta: {(t_v4 - t_copy)*1e3:.3f} "
          f"ms/step; streaming floor ~{(t_copy - base)*1e3:.3f} ms/step",
          flush=True)
    t_draw = timeit("P4 draws only (threefry B randint)", scan_draw_only,
                    key0)
    t_sort = timeit("P3 draw + sort_key_val", scan_sort, key0)
    t_sw = timeit("P5 draw + sort + window searchsorted",
                  scan_sort_windows, key0)
    t_arg = timeit("P3b draw + argsort", scan_argsort, key0)
    print(f"   -> sort_key_val delta {(t_sort - t_draw)*1e3:.3f} ms/step;"
          f" windows delta {(t_sw - t_sort)*1e3:.3f} ms/step; argsort "
          f"delta {(t_arg - t_draw)*1e3:.3f} ms/step", flush=True)
    try:
        t_bin = timeit("P6 multinomial-scan u draw (sort-free)",
                       scan_binomial_multinomial, key0)
        print(f"   -> vs draw-only: +{(t_bin - t_draw)*1e3:.3f} ms/step",
              flush=True)
    except Exception as e:
        print(f"P6 failed: {type(e).__name__}: {e}", flush=True)
