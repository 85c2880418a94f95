"""Measure the on-device-prep packed RelMF engine (round-5 verdict #2).

M1  ml-1m shapes (U=6040, I=3706): device-prep epoch rate vs the round-4
    host-prep packed rate (45.4M cells/s) and the XLA engine (25.6M).
M2  ML-20M shapes (U=138,493, I=26,744): the previously CAPPED config —
    device-prep packed rate vs the XLA engine's 18.2M cells/s, chunked
    into 2048-step dispatches.  Done-bar: >= 30M cells/s.

Epoch-rate protocol: resident tables, honest device_get barrier, first
call compiles then reps timed.  Usage:
  python scripts/r5_relmf_measure.py [ml1m|ml20m] [steps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from cymf_tpu.ops import packed as pk  # noqa: E402
from cymf_tpu.ops.hashset import build_pair_hashset  # noqa: E402
from cymf_tpu.ops.packed_epoch import make_packed_optimizer  # noqa: E402
from cymf_tpu.ops.relmf_epoch import packed_relmf_epoch_device  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "ml1m"
if mode == "ml1m":
    U, I, NNZ = 6040, 3706, 1_000_209
else:
    U, I, NNZ = 138493, 26744, 20_000_263
K, B = 20, 131072
WR = int(os.environ.get("RELMF_WR", "256"))
S_total = max(1, -(-(U * I) // B))
S_meas = int(sys.argv[2]) if len(sys.argv) > 2 else min(S_total, 2048)
CHUNK = 2048

rng = np.random.default_rng(0)
rows = rng.integers(0, U, NNZ % (1 << 22) + 1000).astype(np.int64)
cols = rng.integers(0, I, rows.size).astype(np.int64)
hs = jax.tree_util.tree_map(jnp.asarray, build_pair_hashset(rows, cols))

rw = pk.packed_rows(U, K, multiple=WR)
rh = pk.logical_rows(I, multiple=WR)
Wp = jnp.asarray(pk.pack_array(
    (rng.normal(size=(U, K)) * 0.01).astype(np.float32), K, multiple=WR))
Hp = jnp.asarray(pk.pack_logical(
    (rng.normal(size=(I, K)) * 0.01).astype(np.float32), K, multiple=WR))
# round-5 invp-on-lane contract: 1/max(p,M) rides lane K of Hp
Hp = Hp.at[:, K].set(jnp.asarray(
    rng.uniform(1.0, 10.0, rh).astype(np.float32)))
opt = make_packed_optimizer("adam", 0.01)
ow, oh = opt.init(Wp), opt.init(Hp)
key = jax.random.PRNGKey(0)
n_valid = jnp.asarray(float(S_total) * B, jnp.float32)

print(f"devices={jax.devices()} mode={mode} U={U} I={I} "
      f"S_total={S_total} S_meas={S_meas} chunk={CHUNK}", flush=True)


def run_chunks(Wp, Hp, ow, oh, steps):
    loss = None
    for off in range(0, steps, CHUNK):
        sc = min(CHUNK, steps - off)
        Wp, Hp, ow, oh, l = packed_relmf_epoch_device(
            Wp, Hp, ow, oh, hs, key, jnp.asarray(off, jnp.int32),
            n_valid, S=sc, B=B, num_users=U, num_items=I,
            opt_name="adam", lr=0.01, weight_decay=0.01, K=K, rw=rw,
            rh=rh, wrows_w=WR, wrows_h=WR, interpret=False)
        loss = l if loss is None else loss + l
    return Wp, Hp, ow, oh, loss


t0 = time.perf_counter()
Wp, Hp, ow, oh, loss = run_chunks(Wp, Hp, ow, oh, min(S_meas, CHUNK))
print(f"compile+first: {time.perf_counter()-t0:.1f}s "
      f"loss={float(jax.device_get(loss)):.4f}", flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    Wp, Hp, ow, oh, loss = run_chunks(Wp, Hp, ow, oh, S_meas)
    _ = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    cells = S_meas * B
    print(f"rep{rep}: {dt:.3f}s  {cells/dt/1e6:.1f}M cells/s  "
          f"({dt/S_meas*1e3:.3f} ms/step)", flush=True)
