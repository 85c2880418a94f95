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
  BENCH_MODEL=bpr|wmf|bpr_pallas
                    secondary benchmarks: WMF ALS sweep time at ML-20M
                    shapes, or the Pallas engine at ml-100k shapes
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def main():
    model = os.environ.get("BENCH_MODEL", "bpr")
    if model == "wmf":
        return bench_wmf()
    if model == "bpr_pallas":
        return bench_bpr_pallas()
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


def bench_wmf():
    """ALS sweep time at ML-20M shapes (BASELINE.md: reference ~10 epochs/s
    on the 200x smaller ml-100k)."""
    import time

    import jax
    from scipy import sparse

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.models.wmf import WMF

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = 138493, 26744
    nnz = 1_000_000 if small else 20_000_263
    K = int(os.environ.get("BENCH_DIM", "64"))
    users, items = bench_interactions(U, I, nnz, seed=0)
    X = sparse.csr_matrix((np.ones(len(users), np.float64), (users, items)),
                          shape=(U, I))
    X.data[:] = 1.0
    m = WMF(num_components=K)
    m.fit(X, num_epochs=1, verbose=False)  # compile
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    t0 = time.perf_counter()
    m.fit(X, num_epochs=epochs, verbose=False)
    _ = m.W  # device->host barrier
    dt = (time.perf_counter() - t0) / epochs
    # baseline ALS work rate: ~10 epochs/s over ml-100k's 55,375 train nnz
    # (BASELINE.md) = ~554k interactions solved per second
    rate = X.nnz / dt
    print(json.dumps({
        "metric": "wmf_als_interactions_per_sec",
        "value": round(rate, 1),
        "unit": "interactions/s (per full user+item sweep)",
        "vs_baseline": round(rate / 553_750.0, 2),
    }))


def bench_bpr_pallas():
    """Pallas engine epoch rate at ml-100k shapes (reference README:
    98.46 epochs/s on 8 CPU threads)."""
    import time

    import jax
    import jax.numpy as jnp

    from cymf_tpu.ops.pallas_engine import bpr_pallas_epoch, pack_table

    U, I, K = 943, 1682, 20
    N = 55296
    chunk = 4096
    S = N // chunk
    rng = np.random.default_rng(0)
    Wp = pack_table((rng.uniform(-0.1, 0.1, (U, K)) / K).astype(np.float32),
                    "adam")
    Hp = pack_table((rng.uniform(-0.1, 0.1, (I, K)) / K).astype(np.float32),
                    "adam")
    u = jnp.asarray(rng.integers(0, U, (S, 1, chunk)), jnp.int32)
    i = jnp.asarray(rng.integers(0, I, (S, 1, chunk)), jnp.int32)
    j = jnp.asarray(rng.integers(0, I, (S, 1, chunk)), jnp.int32)
    mask = jnp.asarray(
        (rng.random((S, 1, chunk)) > 0.06).astype(np.int32)
        * (np.asarray(i) != np.asarray(j)))
    interpret = jax.default_backend() != "tpu"

    def run(Wp, Hp):
        return bpr_pallas_epoch(Wp, Hp, u, i, j, mask, optimizer="adam",
                                lr=0.01, wd=0.01, group=8,
                                interpret=interpret)

    Wp, Hp, loss = run(Wp, Hp)
    float(jax.device_get(loss))
    reps = int(os.environ.get("BENCH_EPOCHS", "10"))
    t0 = time.perf_counter()
    for _ in range(reps):
        Wp, Hp, loss = run(Wp, Hp)
    float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": "bpr_pallas_epochs_per_sec_ml100k",
        "value": round(1.0 / dt, 1),
        "unit": "epochs/s",
        "vs_baseline": round((1.0 / dt) / 98.46, 2),
    }))


if __name__ == "__main__":
    main()
