"""Evaluator cost at ML-20M shapes (138k users): per-epoch validation wall."""
import time
import numpy as np
from scipy import sparse
import sys; sys.path.insert(0, "/root/repo")
from cymf_tpu.evaluation.evaluator import Evaluator

U, I = 138493, 26744
rng = np.random.default_rng(0)
X_test = sparse.random(U, I, density=0.0007, random_state=0, format="csr",
                       data_rvs=lambda n: np.ones(n))   # ~2.6M test cells
X_train = sparse.random(U, I, density=0.005, random_state=1, format="csr",
                        data_rvs=lambda n: np.ones(n))
W = rng.normal(size=(U, 20))
H = rng.normal(size=(I, 20))
ev = Evaluator(X_test, X_train, k=5, num_negatives=100)
t0 = time.perf_counter()
ev.evaluate(W, H)  # compile
print(f"first evaluate (incl compile): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
for s in range(3):
    r = ev.evaluate(W, H, seed=s)
dt = (time.perf_counter() - t0) / 3
print(f"steady state: {dt:.2f}s/evaluation = {U/dt:,.0f} users/s", flush=True)
