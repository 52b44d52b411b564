#!/bin/bash
# v41: real-backend smoke of the round-3 composition.  After the v40
# pregen exits ($1), spend whatever remains before 18:56Z running the
# host-stream x native-res-aux NS aux step at production shape on the
# chip.  Goal is NOT a result — it's the backend signal (compiles?
# fits? steps at what ms?) for the ds32 shot; the tunnel backend has
# quirks (ignored donation, staged transfers) that only a real run
# reveals.  A timeout cut is fine; the log keeps the step cadence.
Q=runs/queue5
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q5] v41 start pid=$$ $(date)" >> $Q/queue.log

h=$(date -u +%H); m=$(date -u +%M); now=$((10#$h * 60 + 10#$m))
budget=$(( (1136 - now) * 60 ))   # 18:56Z cutoff
if [ $budget -lt 240 ]; then
  echo "[q5] v41 no window (budget ${budget}s) $(date)" >> $Q/queue.log
  exit 0
fi
echo "[q5] v41 hs-native smoke, budget ${budget}s $(date)" >> $Q/queue.log
timeout $budget python experiments/ns_production.py --skip-gen \
  --variants aux --n-primary-aux 2 --n-aux-per 6 --aux-grid 128 \
  --aux-compute native --host-stream --primary-store-dtype bf16 --remat \
  --epochs 2 --tag hssmoke > $Q/ns_hssmoke.log 2>&1 &
echo $! > /tmp/queue_item.pid
wait $!
rc=$?
rm -f /tmp/queue_item.pid
echo "[q5] v41 hssmoke rc=$rc $(date)" >> $Q/queue.log
