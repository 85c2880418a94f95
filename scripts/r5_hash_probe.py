"""Hash-membership cost vs table geometry at ML-20M scale (round 5).

The device-prep ablation measured hashset_contains at 1.34 ms/step —
the dominant prep stage.  This probes the level-1 gather cost as a
function of bucket count (table footprint) and slot width, to pick the
geometry for the label probe.  All variants stay EXACT (overflow goes
to level 2, grown until empty).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cymf_tpu.dataset.synthetic import bench_interactions  # noqa: E402
from cymf_tpu.ops import hashset as H  # noqa: E402

U, I, NNZ = 138493, 26744, 20_000_263
B, S = 131072, 96
users, items = bench_interactions(U, I, NNZ, seed=0)
key0 = jax.random.PRNGKey(0)
print(f"devices={jax.devices()}", flush=True)


def build(nb1, slots1):
    u = np.asarray(users, np.int64)
    it = np.asarray(items, np.int64)
    keyv = u * (it.max() + 1) + it
    _, uniq = np.unique(keyv, return_index=True)
    u, it = u[uniq].astype(np.int32), it[uniq].astype(np.int32)
    t1, of = H._place(u, it, nb1, H._SALT1, slots1)
    u2, i2 = u[of], it[of]
    nb2 = H._next_pow2(max(len(u2) // 4, 1))
    for _ in range(10):
        t2, of2 = H._place(u2, i2, nb2, H._SALT2, H._SLOTS2)
        if not of2.any():
            break
        nb2 *= 2
    return (jnp.asarray(t1), jnp.asarray(t2), int(of.sum()))


def probe(key, t1, t2, slots1):
    def lvl(table, salt, u32, i32, slots):
        nb = table.shape[0]
        b = (H._mix_jnp(u32, i32, salt)
             & jnp.uint32(nb - 1)).astype(jnp.int32)
        row = table[b]
        return jnp.any((row[:, :slots] == u32[:, None])
                       & (row[:, slots:] == i32[:, None]), axis=1)

    def step(c, t):
        kt = jax.random.fold_in(key, t)
        u = jax.random.randint(jax.random.fold_in(kt, 0), (B,), 0, U,
                               dtype=jnp.int32)
        i = jax.random.randint(jax.random.fold_in(kt, 1), (B,), 0, I,
                               dtype=jnp.int32)
        hit = (lvl(t1, int(H._SALT1), u, i, slots1)
               | lvl(t2, int(H._SALT2), u, i, H._SLOTS2))
        return c + jnp.sum(hit.astype(jnp.int32)), None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


def bench(name, t1, t2, slots1, of):
    slots1_static = int(slots1)
    fn = jax.jit(lambda k, a, b: probe(k, a, b, slots1_static),
                 static_argnums=())
    out = fn(key0, t1, t2)
    base_hits = int(jax.device_get(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(key0, t1, t2)
        _ = int(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    mb = t1.size * 4 / 1e6
    print(f"{name}: {min(ts)/S*1e3:.3f} ms/step  table1={mb:.0f}MB "
          f"overflow={of} hits={base_hits}", flush=True)


for name, nb1, slots1 in (
        ("64-slot nb=2^20 (current, load 19)", 1 << 20, 64),
        ("64-slot nb=2^19 (load 38)", 1 << 19, 64),
        ("64-slot nb=2^18 (load 76->of)", 1 << 18, 64),
        ("32-slot nb=2^20 (load 19, 256B rows)", 1 << 20, 32),
        ("32-slot nb=2^21 (load 10, 256B rows)", 1 << 21, 32),
        ("16-slot nb=2^21 (load 10, 128B rows)", 1 << 21, 16),
):
    t1, t2, of = build(nb1, slots1)
    bench(name, t1, t2, slots1, of)


# --- u-major layout: per-user contiguous bucket ranges, SORTED queries --
def build_umajor(load=32):
    u = np.asarray(users, np.int64)
    it = np.asarray(items, np.int64)
    keyv = u * (it.max() + 1) + it
    _, uniq = np.unique(keyv, return_index=True)
    u, it = u[uniq].astype(np.int32), it[uniq].astype(np.int32)
    deg = np.bincount(u, minlength=U)
    nb_u = np.maximum(-(-deg // load), 1).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(nb_u)]).astype(np.int32)
    nb_total = int(offs[-1])
    b = offs[u] + (H._mix_np(u, it, H._SALT1)
                   % nb_u[u].astype(np.uint32)).astype(np.int32)
    # place into 64-slot buckets (rank within bucket)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    new_run = np.r_[True, bs[1:] != bs[:-1]] if len(bs) > 1 else \
        np.ones(len(bs), bool)
    run_ids = np.cumsum(new_run) - 1
    first = np.flatnonzero(new_run)
    rank = np.arange(len(bs)) - first[run_ids]
    fits = rank < 64
    t1 = np.full((nb_total, 128), -1, np.int32)
    sel = order[fits]
    t1[bs[fits], rank[fits]] = u[sel]
    t1[bs[fits], 64 + rank[fits]] = it[sel]
    of = np.zeros(len(u), bool)
    of[order[~fits]] = True
    u2, i2 = u[of], it[of]
    nb2 = H._next_pow2(max(len(u2) // 4, 1))
    for _ in range(10):
        t2, of2 = H._place(u2, i2, nb2, H._SALT2, H._SLOTS2)
        if not of2.any():
            break
        nb2 *= 2
    return (jnp.asarray(t1), jnp.asarray(t2), jnp.asarray(offs),
            jnp.asarray(nb_u.astype(np.int32)), int(of.sum()), nb_total)


def probe_umajor(key, t1, t2, offs, nbu):
    def step(c, t):
        kt = jax.random.fold_in(key, t)
        u = jax.random.randint(jax.random.fold_in(kt, 0), (B,), 0, U,
                               dtype=jnp.int32)
        i = jax.random.randint(jax.random.fold_in(kt, 1), (B,), 0, I,
                               dtype=jnp.int32)
        su, si = jax.lax.sort_key_val(u, i)          # sorted queries
        b = offs[su] + (H._mix_jnp(su, si, int(H._SALT1))
                        % nbu[su].astype(jnp.uint32)).astype(jnp.int32)
        row = t1.at[b].get(mode="promise_in_bounds")
        hit1 = jnp.any((row[:, :64] == su[:, None])
                       & (row[:, 64:] == si[:, None]), axis=1)
        nb2 = t2.shape[0]
        b2 = (H._mix_jnp(su, si, int(H._SALT2))
              & jnp.uint32(nb2 - 1)).astype(jnp.int32)
        row2 = t2[b2]
        hit2 = jnp.any((row2[:, :16] == su[:, None])
                       & (row2[:, 16:] == si[:, None]), axis=1)
        return c + jnp.sum((hit1 | hit2).astype(jnp.int32)), None
    out, _ = jax.lax.scan(step, jnp.int32(0), jnp.arange(S))
    return out


t1, t2, offs, nbu, of, nbt = build_umajor()
print(f"u-major: {nbt} buckets = {t1.size*4/1e6:.0f}MB overflow={of}",
      flush=True)
fn = jax.jit(probe_umajor)
out = fn(key0, t1, t2, offs, nbu)
print(f"u-major hits={int(jax.device_get(out))}", flush=True)
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    out = fn(key0, t1, t2, offs, nbu)
    _ = int(jax.device_get(out))
    ts.append(time.perf_counter() - t0)
print(f"u-major sorted-query probe (incl draws+sort): "
      f"{min(ts)/S*1e3:.3f} ms/step", flush=True)
