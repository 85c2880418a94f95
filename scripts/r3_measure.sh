#!/bin/bash
# Round-3 TPU measurement battery. Run when the axon relay is back.
# Each step under its own timeout, all output to /tmp/r3_logs/.
set -x
mkdir -p /tmp/r3_logs
cd /root/repo

# 0. sanity ping
timeout 600 python -c "
import jax
x = jax.numpy.ones((256, 256))
print('devices', jax.devices(), float(jax.device_get((x @ x).sum())))
" > /tmp/r3_logs/ping.log 2>&1 || exit 1

# 1. roofline microbenchmarks (gather/scatter/pallas-DMA rates)
timeout 2400 python scripts/roofline_gather.py > /tmp/r3_logs/roofline.log 2>&1

# 2. per-stage ablation, current default engine selection
timeout 2400 python scripts/ablate_packed.py 12 > /tmp/r3_logs/ablate_auto.log 2>&1
# forced v4 and v7 for comparison
CYMF_TPU_PACKED_KERNEL=4 timeout 2400 python scripts/ablate_packed.py 12 > /tmp/r3_logs/ablate_v4.log 2>&1
CYMF_TPU_PACKED_KERNEL=7 timeout 2400 python scripts/ablate_packed.py 12 > /tmp/r3_logs/ablate_v7.log 2>&1
ABL_POOL=1024 timeout 2400 python scripts/ablate_packed.py 12 > /tmp/r3_logs/ablate_pool.log 2>&1

# 3. headline + pool sweep + wide + evaluator
timeout 2400 python bench.py > /tmp/r3_logs/bench_bpr.log 2>&1
for P in 512 1024 2048; do
  BENCH_MODEL=bpr_pool BENCH_POOL=$P timeout 2400 python bench.py \
    > /tmp/r3_logs/bench_pool_$P.log 2>&1
done
BENCH_MODEL=bpr_wide timeout 2400 python bench.py > /tmp/r3_logs/bench_wide.log 2>&1
BENCH_MODEL=evaluator timeout 2400 python bench.py > /tmp/r3_logs/bench_eval.log 2>&1
BENCH_MODEL=bpr_xla timeout 2400 python bench.py > /tmp/r3_logs/bench_xla.log 2>&1
echo ALL DONE
