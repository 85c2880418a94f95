#!/bin/bash
# Wait for the relay to come back (2 consecutive UPs in the watcher
# log), then run the round-5 measurement battery once.
while true; do
  last2=$(tail -2 /tmp/tpu_watch.log | grep -c UP)
  if [ "$last2" = "2" ]; then
    break
  fi
  sleep 60
done
echo "relay UP at $(date +%H:%M:%S) — starting battery" >> /tmp/r5_autorun.log
bash /root/repo/scripts/r5_measure.sh >> /tmp/r5_autorun.log 2>&1
echo "battery finished at $(date +%H:%M:%S)" >> /tmp/r5_autorun.log
