"""Round-5 blocked-Cholesky microbench (the last ALS d>=256 wall).

Times the batched SPD solve at the ML-20M d=256 ALS chunk shapes:
XLA Cholesky+TriangularSolve (the round-5 roofline's measured ~180
ms/chunk term) vs the JAX-level blocked factorization
(`ops/als.py::_solve_spd_blocked`) over a block-size sweep, then the
epoch-level WMF effect at ML-20M-like shapes.

Run on TPU:  timeout 3000 python scripts/r5_chol_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cymf_tpu.ops.als import _solve_spd_blocked, solve_spd_xla


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _ = float(jax.device_get(jnp.sum(out)))  # honest barrier
    t0 = time.time()
    for _i in range(reps):
        out = fn(*args)
    s = float(jax.device_get(jnp.sum(out)))
    return (time.time() - t0) / reps, s


xla_solve = solve_spd_xla  # the library's own baseline form


def main():
    print("backend:", jax.devices())
    rng = np.random.default_rng(0)
    shapes = [(2048, 256), (2048, 128), (512, 256), (2048, 64)]
    for C, K in shapes:
        X = rng.standard_normal((C, K, 8)).astype(np.float32)
        A = np.einsum("cki,cli->ckl", X, X) / 8 + np.eye(K, dtype=np.float32)
        b = rng.standard_normal((C, K)).astype(np.float32)
        Ad, bd = jnp.asarray(A), jnp.asarray(b)
        jx = jax.jit(xla_solve)
        t_x, _ = timeit(jx, Ad, bd)
        ref = np.array(jx(Ad, bd))
        print(f"(C={C}, K={K}) xla chol+trsm: {t_x*1e3:8.2f} ms")
        for blk in (32, 64, 128):
            if K <= blk or K % blk:
                continue
            jb = jax.jit(lambda A_, b_, blk=blk: _solve_spd_blocked(
                A_, b_, blk))
            t_b, _ = timeit(jb, Ad, bd)
            got = np.array(jb(Ad, bd))
            rel = float(np.abs(got - ref).max() / np.abs(ref).max())
            print(f"(C={C}, K={K}) blocked B={blk:3d}: {t_b*1e3:8.2f} ms "
                  f"({t_x/t_b:4.1f}x)  rel={rel:.1e}")

    if os.environ.get("CHOL_BENCH_MICRO_ONLY"):
        return
    # epoch-level: WMF at ML-20M shapes, d=256, the realistic bench
    # stream (same generator as scripts/r5_als_roofline.py).  mode
    # "xla" = the round-5 shipped config (XLA chol + Woodbury P <= K);
    # "blocked" = blocked chol + the retuned P <= K/4 Woodbury cap.
    from scipy import sparse
    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.models.wmf import WMF
    U, I, nnz = 138_493, 26_744, int(
        os.environ.get("CHOL_BENCH_NNZ", "20000263"))
    u, it = bench_interactions(U, I, nnz, seed=0)
    Xc = sparse.csr_matrix(
        (np.ones(nnz, np.float32), (u, it)), shape=(U, I))
    Xc.sum_duplicates(); Xc.data[:] = 1.0
    for mode in ("xla", "blocked"):
        os.environ["CYMF_TPU_ALS_CHOL"] = mode
        m = WMF(num_components=256, weight_decay=0.01, weight=10.0)
        t0 = time.time()
        m.fit(Xc, num_epochs=1, verbose=False)
        warm = time.time()
        m.fit(Xc, num_epochs=1, verbose=False)
        t1 = time.time()
        print(f"WMF d=256 epoch ({mode:7s}): cold {warm-t0:6.1f}s "
              f"warm {t1-warm:6.1f}s")


if __name__ == "__main__":
    main()
