"""ExpoMF K=256 epoch: XLA vs blocked Cholesky transfer check.

The blocked SPD solve (`ops/als.py::solve_spd_blocked`) routes through
ExpoMF's chunk solves via the same resolved solver names; this times
one M-step-heavy epoch at ml-1m shapes, K=256, both modes.

Run on TPU:  timeout 3000 python scripts/r5_expomf_chol.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy import sparse


def main():
    import jax

    from cymf_tpu.dataset.synthetic import bench_interactions
    from cymf_tpu.models.expomf import ExpoMF

    print("devices:", jax.devices(), flush=True)
    U, I, nnz = 6040, 3706, 1_000_000
    u, it = bench_interactions(U, I, nnz, seed=1)
    X = sparse.csr_matrix((np.ones(nnz, np.float32), (u, it)),
                          shape=(U, I))
    X.sum_duplicates(); X.data[:] = 1.0
    for mode in ("xla", "blocked"):
        os.environ["CYMF_TPU_ALS_CHOL"] = mode
        np.random.seed(0)
        m = ExpoMF(num_components=256, weight_decay=0.01)
        t0 = time.time()
        m.fit(X, num_epochs=1, verbose=False)
        warm = time.time()
        m.fit(X, num_epochs=1, verbose=False)
        t1 = time.time()
        print(f"ExpoMF K=256 ml-1m epoch ({mode:7s}): "
              f"cold {warm-t0:6.1f}s warm {t1-warm:6.1f}s", flush=True)


if __name__ == "__main__":
    main()
