"""Sample-kernel VPU-mix experiment (round-5 verdict #1 attempt).

The copy-through probe bounds the v4 kernel's VPU work at 0.30 ms/step
(probes.log).  This measures a restructured variant against v4 on the
same harness:

* the three lane reductions (x, mcol, l2) collapse to TWO: mcol rides a
  second selector column of the x reduction's operand, and the l2 loss
  term becomes ONE full-tensor reduce of the mask-scaled square sum
  (the per-row l2 column was only ever consumed by the loss sum);
* `placed`'s `D * cmask` term and the q-lane write reuse already-built
  predicates.

Exactness: identical math, different summation grouping for the loss
(f32 round-off class).  If the delta is < ~0.05 ms/step the VPU mix is
declared at its wall and v4 stands.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from cymf_tpu.ops import packed as pk  # noqa: E402
from cymf_tpu.ops.fused_sample import bpr_sample_phase  # noqa: E402

B = 131072
S = int(sys.argv[1]) if len(sys.argv) > 1 else 96
LANES = 128
TILE = 512
K = 20
WD = 0.01


def _kernel_v4r(du, di, dj, sw, q, lossp, *, K, s, cb, wd):
    def roll(x, shift):
        return pltpu.roll(x, shift % LANES, axis=1)

    Du, Di, Dj = du[:], di[:], dj[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, Du.shape, 1)
    paymask = (lane < K).astype(jnp.float32)
    cmask = (lane >= cb).astype(jnp.float32)

    acc = Du[:, cb:cb + 1] * Du
    for c in range(1, s):
        acc = acc + Du[:, cb + c:cb + c + 1] * roll(Du, -c * K)
    wu = acc * paymask

    hi, hj = Di, Dj
    diff = hi - hj
    # TWO reductions instead of three: Z's payload lanes carry wu*diff
    # (x) and its decoration lanes carry Du's mask one-hot (mcol)
    Z = wu * diff + Du * cmask
    zx = jnp.sum(Z * paymask, axis=1, keepdims=True)
    zm = jnp.sum(Z * cmask, axis=1, keepdims=True)
    x, mcol = zx, zm
    sig = jax.nn.sigmoid(-x)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        lossp[:] = jnp.zeros_like(lossp)

    # l2 term: one FULL-tensor reduce of the mask-scaled squares (the
    # per-row l2 column was only consumed by the loss sum)
    Y = (wu * wu + (hi * hi + hj * hj) * paymask) * mcol
    loss_tile = (jnp.sum((-jax.nn.log_sigmoid(x)) * mcol)
                 + wd * jnp.sum(Y))
    r8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    l8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    oh00 = ((r8 == 0) & (l8 == 0)).astype(jnp.float32)
    lossp[:] = lossp[:] + loss_tile * oh00

    vals = sig * diff
    out = Du * cmask + Du[:, cb:cb + 1] * vals
    for c in range(1, s):
        out = out + Du[:, cb + c:cb + c + 1] * roll(vals, c * K)
    sw[:] = out
    qk = (lane == K).astype(jnp.float32)
    q[:] = sig * wu + mcol * qk


@functools.partial(jax.jit, static_argnames=())
def phase_v4r(Du, Di, Dj):
    s, cb = pk.num_slots(K), pk.count_base(K)
    spec = pl.BlockSpec((TILE, LANES), lambda t: (t, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_v4r, K=K, s=s, cb=cb, wd=WD),
        grid=(B // TILE,),
        in_specs=[spec] * 3,
        out_specs=[spec] * 2 + [pl.BlockSpec((8, LANES), lambda t: (0, 0),
                                             memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, LANES), jnp.float32)] * 2 + [
            jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
    )(Du, Di, Dj)


def scan_of(phase):
    @jax.jit
    def f(Du, Di, Dj):
        def step(c, t):
            sw, q, lp = phase(Du + c, Di, Dj)
            return c + lp[0, 0] + sw[0, 0] + q[0, 0], None
        out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(S))
        return out
    return f


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.device_get(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/S*1e3:.3f} ms/step", flush=True)
    return min(ts) / S


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    Du0 = rng.normal(size=(B, LANES)).astype(np.float32)
    # decoration lanes: mask * onehot(slot) like decorate()
    s, cb = pk.num_slots(K), pk.count_base(K)
    slot = rng.integers(0, s, B)
    mf = (rng.random(B) > 0.1).astype(np.float32)
    Du0[:, cb:] = 0.0
    Du0[np.arange(B), cb + slot] = mf
    Du = jnp.asarray(Du0)
    Di0 = rng.normal(size=(B, LANES)).astype(np.float32)
    Dj0 = rng.normal(size=(B, LANES)).astype(np.float32)
    Di0[:, K:] = 0.0  # logical H rows: lanes >= K are zero in the table
    Dj0[:, K:] = 0.0
    Di = jnp.asarray(Di0)
    Dj = jnp.asarray(Dj0)

    v4 = scan_of(lambda a, b, c: bpr_sample_phase(
        a, b, c, K=K, wd=WD, interpret=False))
    v4r = scan_of(phase_v4r)

    # equality first (SW/Q identical; loss differs by summation order)
    sw1, q1, l1 = bpr_sample_phase(Du, Di, Dj, K=K, wd=WD,
                                   interpret=False)
    sw2, q2, l2 = phase_v4r(Du, Di, Dj)
    d_sw = float(jnp.max(jnp.abs(sw1 - sw2)))
    d_q = float(jnp.max(jnp.abs(q1 - q2)))
    d_l = abs(float(l1[0, 0]) - float(l2[0, 0])) / abs(float(l1[0, 0]))
    print(f"equality: max|dSW|={d_sw:.2e} max|dQ|={d_q:.2e} "
          f"rel dloss={d_l:.2e}", flush=True)

    t1 = timeit("v4 ", v4, Du, Di, Dj)
    t2 = timeit("v4r", v4r, Du, Di, Dj)
    print(f"delta: {(t1-t2)*1e3:+.3f} ms/step", flush=True)
