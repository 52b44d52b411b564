#!/bin/bash
# v39: round-2 endgame reorder.  The v38 tail (BVP 100k, DR gens, DR
# ds128/ds256, aux24-upsampled) cannot land before the round boundary
# (~19:20Z) and generated data evaporates when the filesystem recycles —
# so it is replaced by the ONE item that attacks the open headline gap
# with data already on disk: the NS FNO aux PRIMARY-POOL shot
# ([2,2,12]: 2 primary files for the aux variant vs the ladder's 1,
# 12 native-res 128^2 aux).  The aux-volume ladder saturated at 1
# primary (aux12 0.0469 == aux24nat 0.0471); this run tests the
# "primary pool is the binding axis" hypothesis in-round.
#  - inherits the in-flight ns_tf_aux10 item (waits on its pid, $1).
#  - every train item keeps its --eval-only guard keyed on the summary
#    entry so a cut run still lands its table from the best-val ckpt.
#  - p2 timeout 4500 s + eval guard 1500 s so the table lands before the
#    19:05Z bench guard.
#  - bench guard: same as v38 (SIGSTOP active item 19:05Z-20:30Z).
exec 9>/tmp/sciml_queue.lock
flock -n 9 || {
  echo "lock busy (in-flight item from the previous runner); waiting" >&2
  flock 9
}

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue5
mkdir -p $Q
echo "[q5] v39 start pid=$$ (inheriting tf_aux pid=$1) $(date)" >> $Q/queue.log

bench_guard() {
  local done=0
  while [ $done -eq 0 ]; do
    local h m t
    h=$(date -u +%H); m=$(date -u +%M); t=$((10#$h * 60 + 10#$m))
    if [ $t -ge 1145 ] && [ $t -lt 1230 ]; then  # 19:05Z .. 20:30Z
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q5] bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (1230 - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q5] bench_guard CONT $p $kids $(date)" >> $Q/queue.log
      else
        sleep 300
      fi
      done=1
    fi
    sleep 60
  done
}
bench_guard &

run_item() {  # run_item <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1 &
  echo $! > /tmp/queue_item.pid
  wait $!
  local rc=$?
  rm -f /tmp/queue_item.pid
  echo "[q5] $name rc=$rc $(date)" >> $Q/queue.log
  return $rc
}

probe() {
  until timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
" >/dev/null 2>&1; do
    echo "[q5] tpu probe failed, parking $(date)" >> $Q/queue.log
    sleep 120
  done
}

summary_has() {
  python - "$1" "$2" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
sys.exit(0 if sys.argv[2] in d else 1)
EOF
}

# 0. inherit the in-flight ns_tf_aux10 item from v38
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "[q5] inherited tf_aux finished $(date)" >> $Q/queue.log
fi
if ! summary_has runs/ns_transformer/summary.json ns_aux; then
  probe
  run_item ns_tf_aux10_evalonly 5400 \
    python experiments/ns_transformer.py --variants aux --epochs 10 \
    --num-aux-samples 3 --primary-store-dtype bf16 --remat --eval-only || true
fi

# 1. NS FNO aux PRIMARY-POOL shot: [2,2,12] — 2 primary files (both on
#    disk), 6 aux per primary = 12 aux @ 128^2, aux forward at native
#    store resolution (validated outcome-equivalent, ~4x cheaper).
#    ~990 steps/epoch; 18 epochs ~ 65-70 min + eval.
if ! summary_has runs/ns_production/summary.json aux_p2; then
  probe
  run_item ns_aux_p2 4500 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 2 --n-aux-per 6 --aux-grid 128 --aux-chunks 8 \
    --aux-compute native --primary-store-dtype bf16 --remat --epochs 18 \
    --tag p2 --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_p2; then
  probe
  run_item ns_aux_p2_evalonly 1500 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 2 --n-aux-per 6 --aux-grid 128 --aux-chunks 8 \
    --aux-compute native --primary-store-dtype bf16 --remat \
    --tag p2 --eval-only || true
fi

# 2. Opportunistic tail: BVP at the reference CLI default 100k iters
#    (~20 min); only lands if the p2 item finished early.
probe
run_item bvp_100k 3600 python experiments/bvp_study.py --iters 100000

echo "[q5] v39 ALL DONE $(date)" >> $Q/queue.log
