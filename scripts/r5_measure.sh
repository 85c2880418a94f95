#!/bin/bash
# Round-5 one-shot measurement battery (run when the relay is UP).
# Each stage appends to docs/measurements/r5/ and is independently
# skippable; run under a generous timeout in the background.
set -x
cd /root/repo
mkdir -p docs/measurements/r5

# 1. ALS d=256 roofline + Woodbury comparison (verdict #4)
timeout 3600 python scripts/r5_als_roofline.py 256 \
  > docs/measurements/r5/als_roofline.log 2>&1

# 2. prep ablation stages F/G (window-build isolation)
timeout 1800 python scripts/r5_prep_ablate.py \
  > docs/measurements/r5/prep_ablate2.log 2>&1

# 3. re-measure device-prep RelMF with the invp-lane optimization
timeout 1800 python scripts/r5_relmf_measure.py ml1m 170 \
  > docs/measurements/r5/relmf_device_ml1m_v2.log 2>&1
timeout 1800 python scripts/r5_relmf_measure.py ml20m 2048 \
  > docs/measurements/r5/relmf_device_ml20m_v2.log 2>&1

# 4. TPU kernel smoke (hardware vs interpret) after round-5 changes
timeout 3600 python scripts/tpu_kernel_smoke.py \
  > docs/measurements/r5/kernel_smoke5.log 2>&1

# 5. pool quality at scale, 5 seeds (verdict #9)
POOL_SCALE=1 timeout 7200 python scripts/pool_quality.py \
  > docs/measurements/r5/pool_quality_5seed.log 2>&1

# 6. headline + full bench refresh
timeout 1200 python bench.py > docs/measurements/r5/bench_bpr.log 2>&1
BENCH_MODEL=relmf_ml20m BENCH_SMALL=1 timeout 1800 python bench.py \
  > docs/measurements/r5/bench_relmf_ml20m_small.log 2>&1
BENCH_MODEL=evaluator timeout 1200 python bench.py \
  > docs/measurements/r5/bench_eval.log 2>&1
echo DONE

# 7. device-prep BPR fit-level rate (opt-in engine)
timeout 1800 python scripts/r5_bpr_device_measure.py \
  > docs/measurements/r5/bpr_device_ml20m.log 2>&1

# 8. kernel VPU-mix variant experiment
timeout 1800 python scripts/r5_kernel_variant.py 96 \
  > docs/measurements/r5/kernel_variant.log 2>&1
