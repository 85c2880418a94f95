"""Headline benchmark: BPR training throughput on ML-20M-shaped data.

Prints ONE JSON line:
  {"metric": "bpr_interactions_per_sec", "value": N, "unit":
   "interactions/s", "vs_baseline": N / 5.4e6}

Baseline: the reference's README quickstart rate — 98.46 epochs/s on
ml-100k (55,375 train nnz) with d=20 and 8 OpenMP threads ~= 5.4M
interaction-updates/s (BASELINE.md).  Same embedding dim (d=20) is used here
for an apples-to-apples per-interaction comparison; shapes follow ML-20M
(138,493 users x 26,744 items, 20M interactions).

Environment knobs:
  BENCH_SMALL=1     quick smoke run (1M interactions)
  BENCH_BATCH=N     override batch size (default 131072)
  BENCH_DIM=N       override embedding dim (default 20)
  BENCH_EPOCHS=N    timed epochs (default 3)
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.models.bpr import _bpr_epoch
    from cymf_tpu.ops.hashset import build_pair_hashset
    from cymf_tpu.optim import Adam
    from cymf_tpu.parallel.mesh import current_mesh

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = 138493, 26744
    nnz = 1_000_000 if small else 20_000_263
    K = int(os.environ.get("BENCH_DIM", "20"))
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))

    mesh = current_mesh()
    B = mesh.pad_rows(B)
    users, items = bench_interactions(U, I, nnz, seed=0)
    S = nnz // B  # full batches only; per-epoch interactions = S * B
    users = users[:S * B].reshape(S, B)
    items = items[:S * B].reshape(S, B)
    # per-batch user sort, exactly like the trainer (enables the
    # indices_are_sorted fast scatter)
    order = np.argsort(users, axis=1, kind="stable")
    users = np.take_along_axis(users, order, axis=1)
    items = np.take_along_axis(items, order, axis=1)

    # positive-set hash table for collision masking (same structure the
    # real trainer uses)
    import jax.tree_util

    rng = np.random.default_rng(0)
    Upad = mesh.pad_rows(U)
    Ipad = mesh.pad_rows(I)
    W = jax.device_put(
        jnp.asarray(rng.uniform(-0.1, 0.1, (Upad, K)) / K, jnp.float32),
        mesh.table())
    H = jax.device_put(
        jnp.asarray(rng.uniform(-0.1, 0.1, (Ipad, K)) / K, jnp.float32),
        mesh.table())
    u_steps = jax.device_put(jnp.asarray(users), mesh.batch2d())
    i_steps = jax.device_put(jnp.asarray(items), mesh.batch2d())
    hs = jax.tree_util.tree_map(
        mesh.put_replicated, build_pair_hashset(users.ravel(), items.ravel()))

    opt = Adam(0.001)
    opt_w, opt_h = opt.init(W), opt.init(H)
    step = jax.jit(
        functools.partial(_bpr_epoch, optimizer=opt, weight_decay=0.01,
                          num_users=U, num_items=I, u_presorted=True),
        donate_argnums=(0, 1, 2, 3))
    key = jax.random.PRNGKey(0)
    n_valid = jnp.asarray(S * B, jnp.int32)

    # warmup (compile + one full epoch)
    W, H, opt_w, opt_h, loss = step(W, H, opt_w, opt_h, u_steps, i_steps,
                                    hs, n_valid, key)
    float(jax.device_get(loss))  # real barrier (see note below)

    t0 = time.perf_counter()
    for e in range(epochs):
        W, H, opt_w, opt_h, loss = step(W, H, opt_w, opt_h, u_steps,
                                        i_steps, hs, n_valid,
                                        jax.random.fold_in(key, e))
    # NOTE: on remote-relay backends block_until_ready does not reliably
    # synchronize; fetching the value is the only trustworthy barrier.
    float(jax.device_get(loss))
    dt = time.perf_counter() - t0

    ips = epochs * S * B / dt
    print(json.dumps({
        "metric": "bpr_interactions_per_sec",
        "value": round(ips, 1),
        "unit": "interactions/s",
        "vs_baseline": round(ips / 5.4e6, 2),
    }))


if __name__ == "__main__":
    main()
