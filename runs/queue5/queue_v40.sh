#!/bin/bash
# v40: idle-window tail after v39.  Waits for the v39 runner ($1) to
# exit, then uses whatever chip time remains before the 18:57Z cutoff
# (the driver's round-end bench takes the chip at ~19:05Z) to
# pre-generate NS primary files 2..7 for the round-3 ds32 shot
# (ROADMAP "Round-3 NS priority").  Generation is resume-safe (skips
# existing files), so a cut run still banks whole files.  If the
# filesystem recycles at the round boundary nothing is lost; if it
# survives, round 3 starts ~2 files (~20 min of chip time) ahead.
Q=runs/queue5
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q5] v40 start pid=$$ $(date)" >> $Q/queue.log

h=$(date -u +%H); m=$(date -u +%M); now=$((10#$h * 60 + 10#$m))
budget=$(( (1137 - now) * 60 ))   # 18:57Z cutoff
if [ $budget -lt 300 ]; then
  echo "[q5] v40 no window left (budget ${budget}s) $(date)" >> $Q/queue.log
  exit 0
fi

until timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
" >/dev/null 2>&1; do
  echo "[q5] v40 tpu probe failed, parking $(date)" >> $Q/queue.log
  sleep 120
  h=$(date -u +%H); m=$(date -u +%M); now=$((10#$h * 60 + 10#$m))
  [ $now -ge 1137 ] && exit 0
done

h=$(date -u +%H); m=$(date -u +%M); now=$((10#$h * 60 + 10#$m))
budget=$(( (1137 - now) * 60 ))
[ $budget -lt 300 ] && exit 0
echo "[q5] v40 gen primaries, budget ${budget}s $(date)" >> $Q/queue.log
timeout $budget python experiments/ns_production.py \
  --n-primary 8 --n-aux-per 0 --n-test 1 --variants none \
  > $Q/ns_gen_primaries.log 2>&1 &
echo $! > /tmp/queue_item.pid
wait $!
rc=$?
rm -f /tmp/queue_item.pid
echo "[q5] v40 gen rc=$rc ($(ls data/ns_production/ | grep -c 'incom.*2d_256-[0-9]*\.h5') primary files) $(date)" >> $Q/queue.log
