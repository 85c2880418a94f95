"""Pool-mode quality study: DCG@5 of BPR(neg_pool=P) vs the exact
per-sample-negative engine across pool sizes, on synthetic data.

Shared-negative pools keep the marginal negative distribution uniform
but correlate a step's draws; this script quantifies what that costs in
ranking quality (answer recorded in docs/PERF.md).  CPU-runnable
(kernels in interpret mode).

Usage: timeout 1800 python scripts/pool_quality.py

``POOL_SCALE=1`` (round 4, VERDICT r3 #3): run at an ML-20M-shaped
CATALOG (27,000 items — where P=1024 is only 3.8% of the catalog per
step, vs 100%+ of the small config's 600) with 12,000 users, on the
real TPU (the kernels are hardware-validated).  Usage:
``POOL_SCALE=1 timeout 5400 python scripts/pool_quality.py``.
"""

import os
import sys

SCALE = os.environ.get("POOL_SCALE") == "1"
if not SCALE:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if not SCALE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import cymf_tpu  # noqa: E402
from cymf_tpu.dataset import SyntheticImplicitDataset  # noqa: E402


def main():
    print(f"backend={jax.default_backend()} scale={SCALE}", flush=True)
    if SCALE:
        # round 5: 5 seeds (the round-4 2-seed table had no real error
        # bars — verdict #9)
        seeds, epochs, batch = (3, 7, 11, 19, 23), 10, 65536
        shape = dict(num_user=12000, num_item=27000, rank=16,
                     density=0.003)
    else:
        seeds, epochs, batch = (3, 7, 11), 20, 4096
        shape = dict(num_user=1200, num_item=600, rank=8, density=0.05)
    rows = []
    for seed in seeds:
        d = SyntheticImplicitDataset(seed=seed, **shape)
        test = cymf_tpu.AoaEvaluator(d.test, d.train, metrics=["DCG"], k=5)
        cfgs = [("exact", 0)] + [(f"P={p}", p)
                                 for p in (128, 512, 1024, 2048)]
        for name, P in cfgs:
            m = cymf_tpu.BPR(num_components=20, learning_rate=0.01,
                             weight_decay=0.01, packed="on", neg_pool=P,
                             batch_size=batch)
            m.fit(d.train, num_epochs=epochs, verbose=False, seed=seed)
            dcg = test.evaluate(m.W, m.H)["DCG@5"]
            rows.append((seed, name, dcg))
            print(f"seed={seed} {name:8s} DCG@5={dcg:.4f}", flush=True)

    print("\nmean over seeds:")
    names = []
    for _, name, _ in rows:
        if name not in names:
            names.append(name)
    for name in names:
        vals = [r[2] for r in rows if r[1] == name]
        print(f"  {name:8s} {np.mean(vals):.4f} +- {np.std(vals):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
