#!/bin/bash
# v42: replaces v41.  After the v40 pregen exits ($1), two endgame
# smokes before the 18:56Z cutoff (driver bench takes the chip ~19:05Z):
#   1. bench.py itself — it was rewritten this round (grounded H100
#      denominator, median-of-5, scan-chunked dispatch) and has NOT run
#      end-to-end on the chip since; a red BENCH_r02 artifact would be
#      far worse than any result we could squeeze from this window.
#   2. host-stream x native-res-aux NS aux step at production shape —
#      the round-3 ds32 composition's real-backend signal (compiles?
#      fits? step ms?).  A timeout cut is fine; the log keeps cadence.
Q=runs/queue5
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q5] v42 start pid=$$ $(date)" >> $Q/queue.log

mins_left() {
  local h m
  h=$(date -u +%H); m=$(date -u +%M)
  echo $(( 1136 - (10#$h * 60 + 10#$m) ))   # minutes to 18:56Z
}

if [ "$(mins_left)" -ge 5 ]; then
  echo "[q5] v42 bench smoke $(date)" >> $Q/queue.log
  timeout $(( $(mins_left) * 60 )) python bench.py > $Q/bench_smoke.log 2>&1 &
  echo $! > /tmp/queue_item.pid
  wait $!; rc=$?
  rm -f /tmp/queue_item.pid
  echo "[q5] v42 bench smoke rc=$rc $(date)" >> $Q/queue.log
fi

budget=$(( $(mins_left) * 60 ))
if [ $budget -lt 240 ]; then
  echo "[q5] v42 no hssmoke window (budget ${budget}s) $(date)" >> $Q/queue.log
  exit 0
fi
echo "[q5] v42 hs-native smoke, budget ${budget}s $(date)" >> $Q/queue.log
timeout $budget python experiments/ns_production.py --skip-gen \
  --variants aux --n-primary-aux 2 --n-aux-per 6 --aux-grid 128 \
  --aux-compute native --host-stream --primary-store-dtype bf16 --remat \
  --epochs 2 --tag hssmoke > $Q/ns_hssmoke.log 2>&1 &
echo $! > /tmp/queue_item.pid
wait $!; rc=$?
rm -f /tmp/queue_item.pid
echo "[q5] v42 hssmoke rc=$rc $(date)" >> $Q/queue.log
