"""Benchmarks.  Prints ONE JSON line for the selected BENCH_MODEL.

Headline (default, what the driver records): BPR training throughput at
ML-20M shapes (138,493 users x 26,744 items, 20M interactions, d=20 —
matching the reference's README config dimension-for-dimension).
Baseline: the reference's README quickstart rate — 98.46 epochs/s on
ml-100k with 8 OpenMP threads ~= 5.4M interaction-updates/s (BASELINE.md).

All numbers are steady-state device rates with a true value-fetch barrier
(`jax.device_get`) — `block_until_ready` does not reliably synchronize
through the axon relay (CLAUDE.md).  Index streams are host-prepared and
resident before timing, matching how the trainer pipelines epochs (and the
reference, whose `sklearn.utils.shuffle` is likewise untimed outside the
epoch loop, `/root/reference/cymf/bpr.pyx:104`).

Environment knobs:
  BENCH_MODEL=bpr|bpr_pool|bpr_wide|bpr_xla|bpr_pallas|wmf|wmf256|relmf|expomf|
              relmf_packed|glove|glove_packed|evaluator|recommend|all
  BENCH_POOL=P      pool size for bpr_pool (default 1024)
  BENCH_SMALL=1     quick smoke run (1M interactions)
  BENCH_BATCH=N     override batch size (default 131072)
  BENCH_DIM=N       override embedding dim (default 20)
  BENCH_EPOCHS=N    timed epochs (default 3)

BENCH_MODEL=all runs every mode and writes BENCH_ALL.json (one object per
mode), still printing the headline line last.

Outage resilience: the axon TPU relay can be down for hours (CLAUDE.md).
Before any benchmark runs, ``_wait_for_backend`` pings a tiny matmul with
exponential backoff for up to BENCH_WAIT_S seconds (default 1800).  If the
backend never answers — or any benchmark raises — main() prints ONE
parseable ``{"metric": ..., "error": ...}`` JSON line and exits 0, so the
driver always records a JSON object rather than a traceback (round-3
failure mode: BENCH_r03.json rc=1).
"""

from __future__ import annotations

import functools
import json
import os
import time

import numpy as np


def _wait_for_backend():
    """Blocks until the JAX backend answers a tiny matmul (value-fetched),
    retrying with backoff for up to BENCH_WAIT_S seconds (default 1800).

    The axon relay can be down for hours; round 3 lost its entire perf
    record because backend-init failure propagated as rc=1.  Returns None
    on success, or an error string after the deadline.
    """
    deadline = time.time() + float(os.environ.get("BENCH_WAIT_S", "1800"))
    delay, last_err = 10.0, "unknown"
    while True:
        try:
            import jax
            import jax.numpy as jnp
            x = jnp.ones((128, 128), jnp.float32)
            s = float(jax.device_get(jnp.sum(x @ x)))
            assert s == 128.0 * 128 * 128
            return None
        except Exception as e:  # backend init / relay outage
            last_err = f"{type(e).__name__}: {e}"
        if time.time() >= deadline:
            return f"backend unavailable after BENCH_WAIT_S: {last_err[:300]}"
        time.sleep(min(delay, max(0.0, deadline - time.time())))
        delay = min(delay * 1.7, 120.0)


def _bench_device(fn, fetch, reps):
    """Times ``reps`` calls of ``fn`` with a value-fetch barrier."""
    out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / reps, out


def bench_bpr_packed():
    """Headline: the packed-table Pallas engine (the trainer's default
    single-TPU path) at ML-20M shapes."""
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import (packed_bpr_epoch, prep_epoch,
                                           prep_static)

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = 138493, 26744
    nnz = 1_000_000 if small else 20_000_263
    K = int(os.environ.get("BENCH_DIM", "20"))
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    B = -(-B // 1024) * 1024
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))

    users, items = bench_interactions(U, I, nnz, seed=0)
    S = max(1, len(users) // B)
    u2 = users[:S * B].reshape(S, B)
    i2 = items[:S * B].reshape(S, B)
    order = np.argsort(u2, axis=1, kind="stable")
    u2 = np.take_along_axis(u2, order, axis=1)
    i2 = np.take_along_axis(i2, order, axis=1)

    wrows_w = wrows_h = int(os.environ.get("BENCH_WROWS", "256"))
    rw = pk.packed_rows(U, K, multiple=wrows_w)
    rh = pk.logical_rows(I, multiple=wrows_h)
    winw, wstart, si, rowsi, wini, bcs, bcn, kernel_v = prep_static(
        u2, i2, K, rw, rh, wrows_w, wrows_h)
    pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
    j2, mask, sj, rowsj, winj = prep_epoch(
        np.random.default_rng(0), u2, i2, pos_keys, U, I, K, rh, wrows_h)

    rng = np.random.default_rng(0)
    Wp = jnp.asarray(pk.pack_array(
        rng.uniform(-0.1, 0.1, (U, K)) / K, K, multiple=wrows_w))
    Hp = jnp.asarray(pk.pack_logical(
        rng.uniform(-0.1, 0.1, (I, K)) / K, K, multiple=wrows_h))
    from cymf_tpu.ops.packed_epoch import make_packed_optimizer
    opt = make_packed_optimizer("adam", 0.001)
    ow, oh = opt.init(Wp), opt.init(Hp)
    args = [jnp.asarray(x) for x in
            (u2, i2, si, rowsi, wini, j2, mask, sj, rowsj, winj, winw,
             wstart, bcs, bcn)]
    n_valid = jnp.asarray(S * B, jnp.int32)
    interpret = jax.default_backend() != "tpu"

    state = [Wp, Hp, ow, oh]

    def run():
        state[0], state[1], state[2], state[3], loss = packed_bpr_epoch(
            state[0], state[1], state[2], state[3], *args, n_valid,
            opt_name="adam", lr=0.001, weight_decay=0.01, K=K, rw=rw,
            rh=rh, wrows_w=wrows_w, wrows_h=wrows_h, interpret=interpret,
            kernel_v=kernel_v)
        return loss

    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), epochs)
    ips = S * B / dt
    return {"metric": "bpr_interactions_per_sec", "value": round(ips, 1),
            "unit": "interactions/s", "vs_baseline": round(ips / 5.4e6, 2)}


def bench_bpr_pool():
    """Shared-negative-pool packed engine (BPR(neg_pool=P), opt-in) at
    ML-20M shapes — the negative side served from a per-step VMEM pool
    (BENCH_POOL, default 1024)."""
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           packed_bpr_pool_epoch,
                                           prep_pool_epoch,
                                           prep_static_pool)

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = 138493, 26744
    nnz = 1_000_000 if small else 20_000_263
    K = int(os.environ.get("BENCH_DIM", "20"))
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    B = -(-B // 1024) * 1024
    P = int(os.environ.get("BENCH_POOL", "1024"))
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))

    users, items = bench_interactions(U, I, nnz, seed=0)
    S = max(1, len(users) // B)
    u2 = users[:S * B].reshape(S, B)
    i2 = items[:S * B].reshape(S, B)
    order = np.argsort(u2, axis=1, kind="stable")
    u2 = np.take_along_axis(u2, order, axis=1)
    i2 = np.take_along_axis(i2, order, axis=1)

    wrows_w, wrows_h = 512, 512
    rw = pk.packed_rows(U, K, multiple=wrows_w)
    rh = pk.logical_rows(I, multiple=wrows_h)
    winw, si, rowsi, wini = prep_static_pool(u2, i2, K, rw, rh, wrows_w,
                                             wrows_h)
    pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
    pool2, rjs, mask, _ = prep_pool_epoch(
        np.random.default_rng(0), u2, pos_keys, U, I, P)

    rng = np.random.default_rng(0)
    Wp = jnp.asarray(pk.pack_array(
        rng.uniform(-0.1, 0.1, (U, K)) / K, K, multiple=wrows_w))
    Hp = jnp.asarray(pk.pack_logical(
        rng.uniform(-0.1, 0.1, (I, K)) / K, K, multiple=wrows_h))
    opt = make_packed_optimizer("adam", 0.001)
    ow, oh = opt.init(Wp), opt.init(Hp)
    args = [jnp.asarray(x) for x in
            (u2, i2, si, rowsi, wini, pool2, rjs, mask, winw)]
    n_valid = jnp.asarray(S * B, jnp.int32)
    interpret = jax.default_backend() != "tpu"

    state = [Wp, Hp, ow, oh]

    def run():
        state[0], state[1], state[2], state[3], loss = \
            packed_bpr_pool_epoch(
                state[0], state[1], state[2], state[3], *args, n_valid,
                opt_name="adam", lr=0.001, weight_decay=0.01, K=K, rw=rw,
                rh=rh, wrows_w=wrows_w, wrows_h=wrows_h,
                interpret=interpret)
        return loss

    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), epochs)
    ips = S * B / dt
    return {"metric": "bpr_pool_interactions_per_sec",
            "value": round(ips, 1),
            "unit": f"interactions/s (neg_pool={P})",
            "vs_baseline": round(ips / 5.4e6, 2)}


def bench_bpr_wide():
    """The wide-row fused engine (K >= 128 — BASELINE.json's d=256 scale
    config) at ML-20M shapes.  vs_baseline scales the reference's d=20
    CPU rate by 20/K (its per-interaction work is linear in d)."""
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           prep_epoch)
    from cymf_tpu.ops.wide_epoch import (pack_wide, prep_static_wide,
                                         wide_bpr_epoch, wide_rows,
                                         wide_sorted_masks)

    small = os.environ.get("BENCH_SMALL") == "1"
    U = int(os.environ.get("BENCH_USERS", "138493"))
    I = int(os.environ.get("BENCH_ITEMS", "26744"))
    nnz = 1_000_000 if small else 20_000_263
    nnz = int(os.environ.get("BENCH_NNZ", str(nnz)))
    K = int(os.environ.get("BENCH_DIM", "256"))
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    B = -(-B // 1024) * 1024
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))

    users, items = bench_interactions(U, I, nnz, seed=0)
    S = max(1, len(users) // B)
    u2 = users[:S * B].reshape(S, B)
    i2 = items[:S * B].reshape(S, B)
    order = np.argsort(u2, axis=1, kind="stable")
    u2 = np.take_along_axis(u2, order, axis=1)
    i2 = np.take_along_axis(i2, order, axis=1)

    wrows = 512
    rw, rh = wide_rows(U, wrows), wide_rows(I, wrows)
    rowsu, winw, si, rowsi, wini = prep_static_wide(u2, i2, rw, rh, wrows)
    pos_keys = np.sort(u2.ravel().astype(np.int64) * I + i2.ravel())
    j2, mask, sj, rowsj, winj = prep_epoch(
        np.random.default_rng(0), u2, i2, pos_keys, U, I, K, rh, wrows)
    mi2, mj2 = wide_sorted_masks(mask, si, sj)

    rng = np.random.default_rng(0)
    W = jnp.asarray(pack_wide(rng.uniform(-0.1, 0.1, (U, K)) / K, K, wrows))
    H = jnp.asarray(pack_wide(rng.uniform(-0.1, 0.1, (I, K)) / K, K, wrows))
    opt = make_packed_optimizer("adam", 0.001)
    ow, oh = opt.init(W), opt.init(H)
    args = [jnp.asarray(x) for x in
            (u2, i2, rowsu, winw, si, rowsi, wini, j2, mask, sj, rowsj,
             winj, mi2, mj2)]
    n_valid = jnp.asarray(S * B, jnp.int32)
    interpret = jax.default_backend() != "tpu"

    state = [W, H, ow, oh]

    def run():
        state[0], state[1], state[2], state[3], loss = wide_bpr_epoch(
            state[0], state[1], state[2], state[3], *args, n_valid,
            opt_name="adam", lr=0.001, weight_decay=0.01, K=K, rw=rw,
            rh=rh, wrows=wrows, interpret=interpret)
        return loss

    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), epochs)
    ips = S * B / dt
    ref = 5.4e6 * 20.0 / K
    return {"metric": f"bpr_wide_d{K}_interactions_per_sec",
            "value": round(ips, 1), "unit": "interactions/s",
            "vs_baseline": round(ips / ref, 2)}


def bench_bpr_xla():
    """The portable XLA batch engine (scatter-based dense updates) at
    ML-20M shapes — the multi-chip-capable path."""
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
    S = nnz // B
    users = users[:S * B].reshape(S, B)
    items = items[:S * B].reshape(S, B)
    order = np.argsort(users, axis=1, kind="stable")
    users = np.take_along_axis(users, order, axis=1)
    items = np.take_along_axis(items, order, axis=1)

    import jax.tree_util
    rng = np.random.default_rng(0)
    W = jax.device_put(jnp.asarray(
        rng.uniform(-0.1, 0.1, (mesh.pad_rows(U), K)) / K, jnp.float32),
        mesh.table())
    H = jax.device_put(jnp.asarray(
        rng.uniform(-0.1, 0.1, (mesh.pad_rows(I), K)) / K, jnp.float32),
        mesh.table())
    u_steps = jax.device_put(jnp.asarray(users), mesh.batch2d())
    i_steps = jax.device_put(jnp.asarray(items), mesh.batch2d())
    hs = jax.tree_util.tree_map(
        mesh.put_replicated, build_pair_hashset(users.ravel(), items.ravel()))

    opt = Adam(0.001)
    state = [W, H, opt.init(W), opt.init(H)]
    step = jax.jit(
        functools.partial(_bpr_epoch, optimizer=opt, weight_decay=0.01,
                          num_users=U, num_items=I, u_presorted=True),
        donate_argnums=(0, 1, 2, 3))
    key = jax.random.PRNGKey(0)
    n_valid = jnp.asarray(S * B, jnp.int32)

    def run():
        state[0], state[1], state[2], state[3], loss = step(
            state[0], state[1], state[2], state[3], u_steps, i_steps, hs,
            n_valid, key)
        return loss

    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), epochs)
    ips = S * B / dt
    return {"metric": "bpr_xla_interactions_per_sec", "value": round(ips, 1),
            "unit": "interactions/s", "vs_baseline": round(ips / 5.4e6, 2)}


def bench_wmf():
    """ALS sweep rate at ML-20M shapes (reference: ~10 epochs/s on the
    200x smaller ml-100k => ~554k interactions solved/s)."""
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
    rate = X.nnz / dt
    return {"metric": "wmf_als_interactions_per_sec",
            "value": round(rate, 1),
            "unit": "interactions/s (per full user+item sweep)",
            "normalization": (
                "rate = nnz/epoch_time at ML-20M shapes; baseline "
                "553,750 int/s = reference ~10 eps/s x ml-100k's 55,375 "
                "interactions (BASELINE.md).  Interactions-normalized: "
                "favors the reference if its rate degrades superlinearly "
                "with scale (ALS work is O(nnz*K^2 + rows*K^3)), so the "
                "ratio is a lower bound on the true speedup."),
            "vs_baseline": round(rate / 553_750.0, 2)}


def bench_wmf256():
    """ALS sweep rate at the BASELINE.json scale config (ML-20M, d=256)
    — the round-5 Woodbury + blocked/Pallas-Cholesky path.  MARGINAL
    epoch protocol: time fit(1) then fit(4) warm and report the 3-epoch
    difference, excluding the per-FIT constant (~29 s of relay upload
    of tables+chunks at ~12.5 MB/s random-payload rate — an environment
    artifact absent on local hosts, docs/measurements/r5/
    table_probe.log)."""
    from scipy import sparse

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.models.wmf import WMF

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = 138493, 26744
    nnz = 1_000_000 if small else 20_000_263
    users, items = bench_interactions(U, I, nnz, seed=0)
    X = sparse.csr_matrix((np.ones(len(users), np.float64), (users, items)),
                          shape=(U, I))
    X.data[:] = 1.0
    m = WMF(num_components=256)
    m.fit(X, num_epochs=1, verbose=False)  # compile
    t0 = time.perf_counter()
    m.fit(X, num_epochs=1, verbose=False)
    _ = m.W
    t1 = time.perf_counter()
    m.fit(X, num_epochs=4, verbose=False)
    _ = m.W
    t4 = time.perf_counter()
    marg = (t4 - t1) - (t1 - t0)
    # the subtraction is noise-dominated when epochs are tiny (e.g.
    # BENCH_SMALL): fall back to the plain per-epoch mean there
    dt = marg / 3.0 if marg > 0.1 * (t4 - t1) else (t4 - t1) / 4.0
    rate = X.nnz / dt
    return {"metric": "wmf256_als_interactions_per_sec",
            "value": round(rate, 1),
            "unit": "interactions/s (marginal epoch, d=256)",
            "normalization": (
                "marginal-epoch rate at ML-20M d=256 (fit(4)-fit(1) "
                "warm walls / 3); baseline 553,750 int/s normalized "
                "from the reference's ml-100k d=20 rate — ALS work "
                "grows ~K^2, so the ratio strongly favors the "
                "reference."),
            "vs_baseline": round(rate / 553_750.0, 2)}


def bench_relmf():
    """RelMF sampled-cell rate at ml-1m shapes (22.4M cells/epoch).
    Reference: ~3 epochs/s at ml-100k => ~4.8M cells/s."""
    import jax

    from cymf_tpu.dataset import SyntheticImplicitDataset
    from cymf_tpu.models.relmf import RelMF

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = (1200, 800) if small else (6040, 3706)
    data = SyntheticImplicitDataset(num_user=U, num_item=I, rank=8,
                                    density=0.04, seed=0)
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    # packed='off': end-to-end fit() through THIS dev relay penalizes the
    # packed engine's host-drawn streams ~25x (380MB/epoch at ~50MB/s vs
    # GB/s DMA on a real host) — its honest device rate is the
    # relmf_packed mode (45.4M cells/s vs this XLA path's ~19M e2e)
    m = RelMF(num_components=20, batch_size=131072, packed="off")
    m.fit(data.train, num_epochs=1, verbose=False)  # compile
    t0 = time.perf_counter()
    m.fit(data.train, num_epochs=epochs, verbose=False)
    _ = m.W
    dt = (time.perf_counter() - t0) / epochs
    rate = m._samples_per_epoch / dt
    eng = "packed" if getattr(m, "packed_engine_", False) else "xla"
    return {"metric": "relmf_cells_per_sec", "value": round(rate, 1),
            "unit": f"sampled cells/s (end-to-end fit, {eng} engine)",
            "vs_baseline": round(rate / 4.8e6, 2)}


def bench_relmf_packed():
    """Packed RelMF EPOCH rate at ml-1m shapes: streams prepped/resident
    before timing (the kernel rate; per-epoch native prep measured
    separately at ~0.3s — overlappable with the device epoch on a real
    host)."""
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset import SyntheticImplicitDataset
    from cymf_tpu.ops import packed as pk
    from cymf_tpu.ops.packed_epoch import (make_packed_optimizer,
                                           make_reject_filter)
    from cymf_tpu.ops.relmf_epoch import (packed_relmf_epoch,
                                          prep_relmf_epoch)

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = (1200, 800) if small else (6040, 3706)
    K = int(os.environ.get("BENCH_DIM", "20"))
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    B = -(-B // 1024) * 1024
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    data = SyntheticImplicitDataset(num_user=U, num_item=I, rank=8,
                                    density=0.04, seed=0)
    X = data.train.tocoo()
    pos_keys = np.sort(X.row.astype(np.int64) * I + X.col)
    kf = make_reject_filter(pos_keys, U, I)
    col_mean = np.asarray(data.train.mean(axis=0)).flatten()
    props = np.maximum(col_mean / max(col_mean.max(), 1e-12), 1e-5) ** 0.5

    wrows = 256
    rw = pk.packed_rows(U, K, multiple=wrows)
    rh = pk.logical_rows(I, multiple=wrows)
    S = max(1, -(-(U * I) // B))
    t0 = time.perf_counter()
    u2, i2, lab, winw, si, rowsi, wini = prep_relmf_epoch(
        0, 0, S, B, U, I, K, rw, rh, wrows, wrows, pos_keys,
        key_filter=kf)
    prep_s = time.perf_counter() - t0
    invp = np.zeros((rh, 1), np.float32)
    invp[:I, 0] = 1.0 / np.maximum(props, 0.1)
    rng = np.random.default_rng(0)
    Wp = jnp.asarray(pk.pack_array(
        rng.uniform(-0.1, 0.1, (U, K)) / K, K, multiple=wrows))
    Hp = jnp.asarray(pk.pack_logical(
        rng.uniform(-0.1, 0.1, (I, K)) / K, K, multiple=wrows))
    opt = make_packed_optimizer("adam", 0.001)
    args = [jnp.asarray(a) for a in (u2, i2, lab, si, rowsi, wini, winw,
                                     invp)]
    n_valid = jnp.asarray(S * B, jnp.int32)
    interpret = jax.default_backend() != "tpu"
    state = [Wp, Hp, opt.init(Wp), opt.init(Hp)]

    def run():
        state[0], state[1], state[2], state[3], loss = packed_relmf_epoch(
            state[0], state[1], state[2], state[3], *args, n_valid,
            opt_name="adam", lr=0.001, weight_decay=0.01, K=K, rw=rw,
            rh=rh, wrows_w=wrows, wrows_h=wrows, interpret=interpret)
        return loss

    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), epochs)
    rate = S * B / dt
    return {"metric": "relmf_packed_cells_per_sec", "value": round(rate, 1),
            "unit": f"sampled cells/s (epoch rate; host prep {prep_s:.2f}"
                    " s/epoch)",
            "vs_baseline": round(rate / 4.8e6, 2)}


def bench_relmf_ml20m():
    """RelMF at ML-20M shapes (VERDICT r1 #7): U x I = 3.7e9 cells/epoch,
    B=131072 (28,259 scan steps/epoch).  Round 5: runs the PACKED engine
    with ON-DEVICE epoch prep (`ops/relmf_epoch.py::
    packed_relmf_epoch_device`) — what ``RelMF.fit`` now auto-selects at
    this scale (the host-prep cell cap is gone); measured 26.6M vs the
    XLA engine's 18.2M cells/s.  ``BENCH_RELMF_ENGINE=xla`` pins the
    chunked XLA scan; BENCH_SMALL times a 1,000-step slice."""
    import jax
    import jax.numpy as jnp

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.ops.hashset import build_pair_hashset

    U, I = 138493, 26744
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    K = int(os.environ.get("BENCH_DIM", "20"))
    full_steps = -(-(U * I) // B)
    steps = 1000 if os.environ.get("BENCH_SMALL") == "1" else full_steps
    rng = np.random.default_rng(0)
    users, items = bench_interactions(U, I, 20_000_263, seed=0)
    key = jax.random.PRNGKey(0)

    if os.environ.get("BENCH_RELMF_ENGINE", "packed") == "xla":
        from scipy import sparse

        from cymf_tpu import config
        from cymf_tpu.models.relmf import _CHUNK_STEPS, _relmf_epoch_jit
        X = sparse.csr_matrix(
            (np.ones(len(users), np.float32), (users, items)),
            shape=(U, I))
        hs = build_pair_hashset(users, items)
        col_mean = np.asarray(X.mean(axis=0)).flatten()
        props = jnp.asarray(
            (np.maximum(col_mean / col_mean.max(), 1e-5) ** 0.5)[:, None],
            dtype=config.param_dtype())
        W = jnp.asarray(rng.uniform(-0.1, 0.1, (U, K)) / K, jnp.float32)
        H = jnp.asarray(rng.uniform(-0.1, 0.1, (I, K)) / K, jnp.float32)
        ch = min(steps, _CHUNK_STEPS)
        n_full, rem = divmod(steps, ch)
        opt, chunk = _relmf_epoch_jit("adam", 0.001, 0.01, 0.1, U, I, ch,
                                      B, "dense", True)
        parts = [(chunk, ch)] * n_full
        if rem:
            parts.append((_relmf_epoch_jit("adam", 0.001, 0.01, 0.1, U, I,
                                           rem, B, "dense", True)[1], rem))
        state = [W, H, opt.init(W), opt.init(H)]

        def run():
            loss = jnp.zeros(())
            off = 0
            for fn, n in parts:
                state[0], state[1], state[2], state[3], l = fn(
                    state[0], state[1], state[2], state[3], hs, props,
                    key, jnp.asarray(off, jnp.int32))
                loss = loss + l
                off += n
            return loss
    else:
        from cymf_tpu.ops import packed as pk
        from cymf_tpu.ops.packed_epoch import make_packed_optimizer
        from cymf_tpu.ops.relmf_epoch import packed_relmf_epoch_device

        WR = 256
        rw = pk.packed_rows(U, K, multiple=WR)
        rh = pk.logical_rows(I, multiple=WR)
        hs = jax.tree_util.tree_map(
            jnp.asarray, build_pair_hashset(users, items))
        col_mean = np.bincount(items, minlength=I).astype(np.float64) / U
        props = np.maximum(col_mean / col_mean.max(), 1e-5) ** 0.5
        invp = np.zeros(rh, np.float32)
        invp[:I] = 1.0 / np.maximum(props, 0.1)
        Wp = jnp.asarray(pk.pack_array(
            rng.uniform(-0.1, 0.1, (U, K)).astype(np.float32) / K, K,
            multiple=WR))
        Hp = jnp.asarray(pk.pack_logical(
            rng.uniform(-0.1, 0.1, (I, K)).astype(np.float32) / K, K,
            multiple=WR))
        # device prep reads 1/max(p,M) from lane K of the item table
        # (models/relmf.py::inject_invp contract)
        Hp = Hp.at[:, K].set(jnp.asarray(invp))
        opt = make_packed_optimizer("adam", 0.001)
        state = [Wp, Hp, opt.init(Wp), opt.init(Hp)]
        n_valid = jnp.asarray(float(full_steps) * B, jnp.float32)
        CH = 2048
        interp = jax.default_backend() != "tpu"

        def run():
            loss = jnp.zeros(())
            for off in range(0, steps, CH):
                sc = min(CH, steps - off)
                (state[0], state[1], state[2], state[3],
                 l) = packed_relmf_epoch_device(
                    state[0], state[1], state[2], state[3], hs,
                    key, jnp.asarray(off, jnp.int32), n_valid, S=sc, B=B,
                    num_users=U, num_items=I, opt_name="adam", lr=0.001,
                    weight_decay=0.01, K=K, rw=rw, rh=rh, wrows_w=WR,
                    wrows_h=WR, interpret=interp)
                loss = loss + l
            return loss

    reps = int(os.environ.get("BENCH_EPOCHS", "1"))
    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), reps)
    rate = steps * B / dt
    return {"metric": "relmf_ml20m_cells_per_sec", "value": round(rate, 1),
            "unit": f"sampled cells/s ({steps} steps x {B})",
            "vs_baseline": round(rate / 4.8e6, 2)}


def bench_expomf():
    """ExpoMF EM epoch rate at ml-1m shapes (the reference densifies U x I
    and is impractical here; baseline = its ml-100k ALS-ish rate is not
    comparable, so vs_baseline reports epochs/s directly)."""
    from cymf_tpu.dataset import SyntheticImplicitDataset
    from cymf_tpu.models.expomf import ExpoMF

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = (1200, 800) if small else (6040, 3706)
    data = SyntheticImplicitDataset(num_user=U, num_item=I, rank=8,
                                    density=0.04, seed=0)
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    m = ExpoMF(num_components=20)
    m.fit(data.train, num_epochs=1, verbose=False)  # compile
    t0 = time.perf_counter()
    m.fit(data.train, num_epochs=epochs, verbose=False)
    _ = m.W
    dt = (time.perf_counter() - t0) / epochs
    return {"metric": "expomf_epochs_per_sec_ml1m",
            "value": round(1.0 / dt, 2), "unit": "epochs/s",
            "vs_baseline": round(1.0 / dt, 2)}


def _glove_stream(small):
    from scipy import sparse
    V = 5000 if small else 50000
    nnz = 200_000 if small else 3_000_000
    B = int(os.environ.get("BENCH_BATCH", "131072"))
    B = -(-B // 1024) * 1024
    rng = np.random.default_rng(0)
    r = rng.integers(0, V, nnz)
    c = rng.integers(0, V, nnz)
    X = sparse.csr_matrix(
        (rng.integers(1, 50, nnz).astype(np.float64), (r, c)), shape=(V, V))
    coo = X.tocoo()
    # clamp the batch to the triple count (BENCH_BATCH > nnz would fail
    # the reshape below)
    B = min(B, max(1024, (X.nnz // 1024) * 1024))
    S = max(1, X.nnz // B)
    c2 = coo.row.astype(np.int32)[:S * B].reshape(S, B)
    x2 = coo.col.astype(np.int32)[:S * B].reshape(S, B)
    n2 = coo.data[:S * B].reshape(S, B)
    order = np.argsort(c2, axis=1, kind="stable")
    return (V, S, B, rng,
            np.take_along_axis(c2, order, 1),
            np.take_along_axis(x2, order, 1),
            np.take_along_axis(n2, order, 1))


def bench_glove(packed: str = "off"):
    """GloVe epoch rate: 50k vocab, ~3M co-occurrence triples, d=50,
    fused-bias AdaGrad, streams resident before timing (the bench
    convention — GloVe's streams are static per fit, so the trainer
    really does pay prep/upload once).  ``packed='on'`` benches the
    packed fused engine (`ops/glove_epoch.py`); default is the XLA
    batch engine."""
    import jax
    import jax.numpy as jnp

    small = os.environ.get("BENCH_SMALL") == "1"
    V, S, B, rng, c2, x2, n2 = _glove_stream(small)
    K = 50
    epochs = int(os.environ.get("BENCH_EPOCHS", "3"))
    from cymf_tpu.ops.glove_epoch import augment_tables
    Zc_np, Zx_np = augment_tables(
        rng.normal(size=(V, K)) * 0.1, rng.normal(size=(V, 1)),
        rng.normal(size=(V, K)) * 0.1, rng.normal(size=(V, 1)))
    Zc_np = Zc_np.astype(np.float32)
    Zx_np = Zx_np.astype(np.float32)

    if packed == "on":
        from cymf_tpu.ops import packed as pk
        from cymf_tpu.ops.glove_epoch import (packed_glove_epoch,
                                              prep_glove_static)
        from cymf_tpu.ops.packed_epoch import PackedAdaGrad
        Kp = K + 2
        wrows = 256
        rw = pk.packed_rows(V, Kp, multiple=wrows)
        rh = pk.logical_rows(V, multiple=wrows)
        m2, f2, l2, winw, sx, rowsx, winx = prep_glove_static(
            c2, x2, n2, V, K, rw, rh, wrows, wrows, 10.0, 0.75)
        Zc = jnp.asarray(pk.pack_array(Zc_np, Kp, multiple=wrows))
        Zx = jnp.asarray(pk.pack_logical(Zx_np, Kp, multiple=wrows))
        dev = [jnp.asarray(a) for a in
               (c2, x2, m2, f2, l2, sx, rowsx, winx, winw)]
        opt = PackedAdaGrad(0.01)
        nv = jnp.asarray(S * B, jnp.int32)
        interpret = jax.default_backend() != "tpu"
        state = [Zc, Zx, opt.init(Zc), opt.init(Zx)]

        def run():
            state[0], state[1], state[2], state[3], loss = \
                packed_glove_epoch(
                    state[0], state[1], state[2], state[3], *dev, nv,
                    lr=0.01, K=K, rw=rw, rh=rh, wrows_w=wrows,
                    wrows_h=wrows, interpret=interpret)
            return loss
    else:
        from cymf_tpu.models.glove import _glove_epoch_jit
        opt, fn = _glove_epoch_jit(0.01, 10.0, 0.75, K, V, "dense",
                                   "fused")
        Wc, Wx = jnp.asarray(Zc_np), jnp.asarray(Zx_np)
        # distinct buffers: the epoch donates all 8 state args, and
        # donating one buffer twice is an XLA aliasing error
        bc = jnp.zeros((1, 1), jnp.float32)
        bx = jnp.zeros((1, 1), jnp.float32)
        st = [Wc, Wx, bc, bx, opt.init(Wc), opt.init(Wx),
              jnp.ones_like(bc), jnp.ones_like(bx)]
        c_d, x_d = jnp.asarray(c2), jnp.asarray(x2)
        n_d = jnp.asarray(n2.astype(np.float32))
        nv = jnp.asarray(S * B, jnp.int32)

        def run():
            out = fn(*st, c_d, x_d, n_d, nv)
            st[:] = out[:8]
            return out[8]

    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), epochs)
    rate = S * B / dt
    tag = "glove_packed" if packed == "on" else "glove"
    return {"metric": f"{tag}_triples_per_sec", "value": round(rate, 1),
            "unit": "triples/s", "vs_baseline": None}


def bench_glove_packed():
    return bench_glove(packed="on")


def bench_evaluator():
    """Sampled-negative evaluation rate at ml-1m shapes (the reference's
    serial per-user Python loop is the epoch-validation bottleneck)."""
    from scipy import sparse

    from cymf_tpu.evaluation.evaluator import Evaluator

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I = (1200, 800) if small else (6040, 3706)
    rng = np.random.default_rng(0)
    X_test = sparse.random(U, I, density=0.02, random_state=0, format="csr",
                           data_rvs=lambda n: np.ones(n))
    X_train = sparse.random(U, I, density=0.04, random_state=1, format="csr",
                            data_rvs=lambda n: np.ones(n))
    W = rng.normal(size=(U, 20))
    H = rng.normal(size=(I, 20))
    ev = Evaluator(X_test, X_train, k=5, num_negatives=100)
    ev.evaluate(W, H)  # compile
    reps = int(os.environ.get("BENCH_EPOCHS", "5"))
    t0 = time.perf_counter()
    for s in range(reps):
        ev.evaluate(W, H, seed=s)
    dt = (time.perf_counter() - t0) / reps
    return {"metric": "evaluator_users_per_sec", "value": round(U / dt, 1),
            "unit": "users/s", "vs_baseline": None}


def bench_recommend():
    """Full-catalog top-10 recommendation rate at ML-20M shapes (138k
    users x 27k items, d=20, train-positive exclusion).  The reference
    has no batch recommendation path at all — its only scoring loop is
    the evaluator's per-user Python loop — so there is no baseline; this
    measures the serving-side story of the framework."""
    import jax
    from scipy import sparse

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.evaluation.recommend import recommend

    small = os.environ.get("BENCH_SMALL") == "1"
    U, I, K = (1200, 800, 20) if small else (138493, 26744, 20)
    nnz = 40000 if small else 20000000
    users, items = bench_interactions(U, I, nnz, seed=0)
    X = sparse.csr_matrix(
        (np.ones(nnz, np.float32), (users, items)), shape=(U, I))
    rng = np.random.default_rng(0)
    W = rng.normal(size=(U, K)).astype(np.float32)
    H = rng.normal(size=(I, K)).astype(np.float32)
    recommend(W, H, k=10, exclude=X)  # compile
    reps = int(os.environ.get("BENCH_EPOCHS", "3"))
    t0 = time.perf_counter()
    for _ in range(reps):
        scores, topk = recommend(W, H, k=10, exclude=X)
    dt = (time.perf_counter() - t0) / reps
    assert topk.shape == (U, 10)
    return {"metric": "recommend_users_per_sec", "value": round(U / dt, 1),
            "unit": "users/s (full-catalog top-10, train exclusion)",
            "vs_baseline": None}


def bench_bpr_pallas():
    """VMEM-resident per-sample Pallas engine at ml-100k shapes
    (reference README: 98.46 epochs/s on 8 CPU threads)."""
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

    state = [Wp, Hp]

    def run():
        state[0], state[1], loss = bpr_pallas_epoch(
            state[0], state[1], u, i, j, mask, optimizer="adam", lr=0.01,
            wd=0.01, group=8, interpret=interpret)
        return loss

    reps = int(os.environ.get("BENCH_EPOCHS", "10"))
    dt, _ = _bench_device(run, lambda x: float(jax.device_get(x)), reps)
    return {"metric": "bpr_pallas_epochs_per_sec_ml100k",
            "value": round(1.0 / dt, 1), "unit": "epochs/s",
            "vs_baseline": round((1.0 / dt) / 98.46, 2)}


_MODES = {
    "bpr": bench_bpr_packed,
    "bpr_pool": bench_bpr_pool,
    "bpr_wide": bench_bpr_wide,
    "bpr_xla": bench_bpr_xla,
    "bpr_pallas": bench_bpr_pallas,
    "wmf": bench_wmf,
    "wmf256": bench_wmf256,
    "relmf": bench_relmf,
    "relmf_packed": bench_relmf_packed,
    "relmf_ml20m": bench_relmf_ml20m,
    "expomf": bench_expomf,
    "glove": bench_glove,
    "glove_packed": bench_glove_packed,
    "evaluator": bench_evaluator,
    "recommend": bench_recommend,
}


def main():
    model = os.environ.get("BENCH_MODEL", "bpr")
    err = _wait_for_backend()
    if err is not None:
        print(json.dumps({"metric": f"{model}_interactions_per_sec",
                          "error": err}))
        return
    if model == "all":
        import gc
        results = {}
        for name, fn in _MODES.items():
            try:
                results[name] = fn()
            except Exception as e:  # record, keep going
                results[name] = {"metric": name, "error": str(e)[:400]}
            # drop the finished bench's device buffers (tables, hash
            # sets, streams): residual HBM pressure from earlier modes
            # measurably slowed later gather-heavy ones (round-4
            # BENCH_ALL evaluator 65.3k vs 94.9k standalone)
            gc.collect()
        with open("BENCH_ALL.json", "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results["bpr"]))
        return
    try:
        print(json.dumps(_MODES[model]()))
    except Exception as e:  # never emit a raw traceback to the driver
        print(json.dumps({"metric": f"{model}_interactions_per_sec",
                          "error": f"{type(e).__name__}: {str(e)[:400]}"}))


if __name__ == "__main__":
    main()
