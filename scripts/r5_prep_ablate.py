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
    # hs/invp must be ARGUMENTS: closure constants >200MB embed in the
    # remote-compile request and the relay 413s (CLAUDE.md)
    @jax.jit
    def f(key, hs, invp):
        def step(c, t):
            kt = jax.random.fold_in(key, t)
            return c + body(kt, hs, invp), None
        out, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(S))
        return out
    return lambda key: f(key, hs, invp)


def draws(kt):
    u = jax.random.randint(jax.random.fold_in(kt, 0), (B,), 0, U,
                           dtype=jnp.int32)
    i = jax.random.randint(jax.random.fold_in(kt, 1), (B,), 0, I,
                           dtype=jnp.int32)
    return u, i


A = scan(lambda kt, hs, invp: draws(kt)[0][0].astype(jnp.float32))


def b_body(kt, hs, invp):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    return lab[0].astype(jnp.float32)


Bf = scan(b_body)


def c_body(kt, hs, invp):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    return (su[0] + sval[0]).astype(jnp.float32)


Cf = scan(c_body)


def d_body(kt, hs, invp):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    i_s = sval // 2
    srt, perm = jax.lax.sort_key_val(i_s, jnp.arange(B, dtype=jnp.int32))
    return (su[0] + srt[0] + perm[0]).astype(jnp.float32)


Df = scan(d_body)


def e_body(kt, hs, invp):
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


# F: full prep with the round-5 invp-on-lane trick and NO searchsorted
# (windows replaced by static ranges) — isolates the window-build cost
def f_body(kt, hs, invp):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    i_s = sval // 2
    lab_f = (sval & 1).astype(jnp.float32)
    phys = su // s_slots
    srt, perm = jax.lax.sort_key_val(i_s, jnp.arange(B, dtype=jnp.int32))
    th = lab_f * jnp.float32(3.0)  # invp rides the item gather now
    return (th[0] + phys[0] + srt[0] + perm[0]).astype(jnp.float32)


Ff = scan(f_body)
tF = bench("F prep sans windows (invp on lane)", Ff)
print(f"   -> window-build cost = E - invp(0.29) - F ~= "
      f"{1e3*(tE - tF) - 290:.0f} us/step (E includes the old invp "
      f"gather)", flush=True)


# G: windows via compare+matmul edges instead of searchsorted
def edges_mm(rows_sorted, nw, wrows):
    bounds = jnp.arange(nw + 1, dtype=jnp.int32) * wrows
    cmp = (rows_sorted[:, None] < bounds[None, :]).astype(jnp.bfloat16)
    ones = jnp.ones((1, rows_sorted.shape[0]), jnp.bfloat16)
    return jnp.dot(ones, cmp,
                   preferred_element_type=jnp.float32)[0].astype(
        jnp.int32)


def g_body(kt, hs, invp):
    u, i = draws(kt)
    lab = hashset_contains(hs, u, i)
    val = i * 2 + lab.astype(jnp.int32)
    su, sval = jax.lax.sort_key_val(u, val)
    i_s = sval // 2
    lab_f = (sval & 1).astype(jnp.float32)
    phys = su // s_slots
    e_w = edges_mm(phys, rw // WR, WR)
    srt, perm = jax.lax.sort_key_val(i_s, jnp.arange(B, dtype=jnp.int32))
    e_i = edges_mm(srt, rh // WR, WR)
    th = lab_f * jnp.float32(3.0)
    return (th[0] + e_w[0] + e_i[0] + perm[0]).astype(jnp.float32)


Gf = scan(g_body)
tG = bench("G prep with matmul edges", Gf)
