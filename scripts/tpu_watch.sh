#!/bin/bash
# Relay watcher: ping a tiny matmul every ~3min; log status to /tmp/tpu_watch.log
while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 90 python - <<'PY' 2>&1
import jax
x = jax.numpy.ones((256,256))
print('UP', float(jax.device_get((x@x).sum())))
PY
)
  if echo "$out" | grep -q '^UP'; then
    echo "$ts UP" >> /tmp/tpu_watch.log
  else
    echo "$ts DOWN" >> /tmp/tpu_watch.log
  fi
  sleep 170
done
