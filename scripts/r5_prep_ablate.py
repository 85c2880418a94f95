"""Ablate the device-prep chain of packed_relmf_epoch_device at ML-20M
shapes: which prep stage eats the ~1.6 ms/step gap between the host-prep
kernel step (~3.3 ms) and the measured device-prep step (4.93 ms)?

Stages, cumulative in a scan (no training kernels):
  A draws (u, i randint)
  B + hash membership
  C + u-sort carrying packed value
  D + i-side sort
  E + both window builds + invp gather  (the full prep chain)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cymf_tpu.ops.hashset import build_pair_hashset, hashset_contains
from cymf_tpu.ops.relmf_epoch import window_ranges_device

U, I, NNZ = 138493, 26744, 20_000_263
K, B, S, WR = 20, 131072, 96, 256
s_slots = 6
rw = 23296  # pk.packed_rows(U, 20, 256)
rh = 26880

rng = np.random.default_rng(0)
from cymf_tpu.dataset.synthetic import bench_interactions
users, items = bench_interactions(U, I, NNZ, seed=0)
hs = jax.tree_util.tree_map(jnp.asarray, build_pair_hashset(users, items))
invp = jnp.asarray(rng.uniform(1, 10, (rh, 1)).astype(np.float32))
key0 = jax.random.PRNGKey(0)
print(f"devices={jax.devices()}  table1={hs.table1.shape} "
      f"table2={hs.table2.shape}", flush=True)


def bench(name, fn):
    out = fn(key0)
    _ = float(jax.device_get(out).ravel()[0])
    ts = []
    for _r in range(3):
        t0 = time.perf_counter()
        out = fn(key0)
        _ = float(jax.device_get(out).ravel()[0])
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/S*1e3:.3f} ms/step", flush=True)
    return min(ts) / S


def scan(body):
    @jax.jit
    def f(key):
        def step(c, t):
            kt = jax.random.fold_in(key, t)
            return c + body(kt), None
        out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(S))
        return out
    return f


def draws(kt):
    u = jax.random.randint(jax.random.fold_in(kt, 0), (B,), 0, U,
                           dtype=jnp.int32)
    i = jax.random.randint(jax.random.fold_in(kt, 1), (B,), 0, I,
                           dtype=jnp.int32)
    return u, i


A = scan(lambda kt: draws(kt)[0][0].astype(jnp.float32))


def b_body(kt):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    return lab[0].astype(jnp.float32)


Bf = scan(b_body)


def c_body(kt):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    return (su[0] + sval[0]).astype(jnp.float32)


Cf = scan(c_body)


def d_body(kt):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    i_s = sval // 2
    srt, perm = jax.lax.sort_key_val(i_s, jnp.arange(B, dtype=jnp.int32))
    return (su[0] + srt[0] + perm[0]).astype(jnp.float32)


Df = scan(d_body)


def e_body(kt):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    i_s = sval // 2
    lab_f = (sval & 1).astype(jnp.float32)
    phys = su // s_slots
    ws, wc = window_ranges_device(phys, rw, WR)
    srt, perm = jax.lax.sort_key_val(i_s, jnp.arange(B, dtype=jnp.int32))
    is_, ic = window_ranges_device(srt, rh, WR)
    th = lab_f * invp[i_s, 0]
    return (th[0] + ws[0] + wc[0] + is_[0] + ic[0]
            + perm[0]).astype(jnp.float32)


Ef = scan(e_body)

tA = bench("A draws", A)
tB = bench("B +hash", Bf)
tC = bench("C +u-sort", Cf)
tD = bench("D +i-sort", Df)
tE = bench("E +windows+invp (full prep)", Ef)
print(f"deltas: hash={1e3*(tB-tA):.3f} usort={1e3*(tC-tB):.3f} "
      f"isort={1e3*(tD-tC):.3f} wins={1e3*(tE-tD):.3f} ms/step",
      flush=True)
