"""Measure the opt-in device-prep packed BPR epoch at ML-20M shapes
(round 5): the v4 pipeline with in-scan negative draw/reject/sort —
fit-level rate with ZERO per-epoch host streams, vs the 39.9M int/s
host-prep kernel rate and the prep-ablation prediction (~1.6-2 ms/step
added)."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cymf_tpu.dataset.synthetic import bench_interactions  # noqa: E402
from cymf_tpu.ops import packed as pk  # noqa: E402
from cymf_tpu.ops.hashset import build_pair_hashset  # noqa: E402
from cymf_tpu.ops.packed_epoch import (  # noqa: E402
    make_packed_optimizer, packed_bpr_epoch_device_j, prep_static)

U, I, K, B = 138493, 26744, 20, 131072
NNZ = 20_000_263
WR = 256
users, items = bench_interactions(U, I, NNZ, seed=0)
N = len(users)
S = max(1, N // B)
u2 = users[:S * B].reshape(S, B)
i2 = items[:S * B].reshape(S, B)
order = np.argsort(u2, axis=1, kind="stable")
u2 = np.take_along_axis(u2, order, axis=1).astype(np.int32)
i2 = np.take_along_axis(i2, order, axis=1).astype(np.int32)

rw = pk.packed_rows(U, K, multiple=WR)
rh = pk.logical_rows(I, multiple=WR)
winw, _, si, rowsi, wini, _, _, _ = prep_static(u2, i2, K, rw, rh, WR, WR)
hs = jax.tree_util.tree_map(jnp.asarray,
                            build_pair_hashset(users, items))
rng = np.random.default_rng(0)
Wp = jnp.asarray(pk.pack_array(
    (rng.normal(size=(U, K)) * 0.01).astype(np.float32), K, multiple=WR))
Hp = jnp.asarray(pk.pack_logical(
    (rng.normal(size=(I, K)) * 0.01).astype(np.float32), K, multiple=WR))
opt = make_packed_optimizer("adam", 0.01)
ow, oh = opt.init(Wp), opt.init(Hp)
u_d, i_d, si_d, rowsi_d, wini_d, winw_d = (
    jnp.asarray(a) for a in (u2, i2, si, rowsi, wini, winw))
key = jax.random.PRNGKey(0)
n_valid = jnp.asarray(S * B, jnp.int32)
print(f"devices={jax.devices()} S={S} B={B}", flush=True)


def run(Wp, Hp, ow, oh):
    return packed_bpr_epoch_device_j(
        Wp, Hp, ow, oh, u_d, i_d, si_d, rowsi_d, wini_d, winw_d, hs,
        key, jnp.asarray(0, jnp.int32), n_valid, opt_name="adam",
        lr=0.01, weight_decay=0.01, K=K, rw=rw, rh=rh, num_users=U,
        num_items=I, wrows_w=WR, wrows_h=WR, interpret=False)


t0 = time.perf_counter()
Wp, Hp, ow, oh, loss = run(Wp, Hp, ow, oh)
print(f"compile+first: {time.perf_counter()-t0:.1f}s "
      f"loss={float(jax.device_get(loss)):.4f}", flush=True)
for rep in range(3):
    t0 = time.perf_counter()
    Wp, Hp, ow, oh, loss = run(Wp, Hp, ow, oh)
    _ = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    print(f"rep{rep}: {dt:.3f}s  {S*B/dt/1e6:.1f}M int/s  "
          f"({dt/S*1e3:.3f} ms/step)", flush=True)
