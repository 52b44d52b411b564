#!/bin/bash
# v54 — consolidated round-4 queue (replaces v52+v53, whose runners were
# killed during the round-3 bench window: a STOPped tunnel client never
# releases the chip claim — see the claim note below).  GATED: parks
# until 20:50Z so the round-3 driver bench gets the chip alone, then
# runs, in VERDICT priority order:
#   1. aux_ds48v3 finish (block-schedule rotation now default — the
#      cyclic schedule OOM'd the host via swap staging retention)
#   2. DR gen family -> ds128 LEAK-CHECK (--leaky-clip, baseline only)
#   3. gen aux to 24 -> aux_ds64v3 [16,8,24] rotation (+R=4 fallback)
#   4. NS transformer aux extended (30 epochs)
#   5. ds32 baseline retries
#   6. DR seed sweeps (ds8/ds32/ds128 x seeds 99,17; both-variant guards)
#   7. DR ds256, lie_ds32, plume3d tf pair, DR-tf early-boost
#   8. dr_seed_figure aggregation
#
# CLAIM RULE (learned round 3): the tunnel chip claim does NOT transfer
# away from a SIGSTOPped client — bench_guard now KILLS the active item
# at window start instead of stopping it (items are resume-safe and take
# --continue-training), so driver benches always find the chip free.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue6
mkdir -p $Q

bench_guard() {
  exec 9>&- 2>/dev/null
  while true; do
    local h m t
    h=$(date -u +%H); m=$(date -u +%M); t=$((10#$h * 60 + 10#$m))
    local stop=0 end=0
    if [ $t -ge 425 ] && [ $t -lt 530 ]; then stop=1; end=530; fi
    if [ $t -ge 1135 ] && [ $t -lt 1245 ]; then stop=1; end=1245; fi
    if [ $stop -eq 1 ]; then
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q6] v54 bench_guard KILL $p $kids (window; claim must free) $(date)" >> $Q/queue.log
        kill $p $kids 2>/dev/null; sleep 5; kill -9 $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
      fi
    fi
    sleep 60
  done
}
bench_guard &

# gate: do not touch the chip before the round-3 bench window closes
# (10# prefix: %H%M has leading zeros, which bash -lt would parse octal)
while t=$((10#$(date -u +%H%M))); [ $t -ge 1850 ] && [ $t -lt 2050 ]; do
  sleep 60
done

echo "[q6] v54 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v54 acquired lock $(date)" >> $Q/queue.log

python experiments/reseed_summaries.py >> $Q/queue.log 2>&1

run_watched() {
  local name=$1 tmo=$2 stall=$3 watch=$4; shift 4
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1 &
  local pid=$!
  echo $pid > /tmp/queue_item.pid
  local last
  last=$(date +%s)
  while kill -0 $pid 2>/dev/null; do
    sleep 60
    local now m state
    now=$(date +%s)
    state=$(ps -o stat= -p $pid 2>/dev/null)
    m=$(find "$watch" "$Q/$name.log" -type f -printf '%T@\n' 2>/dev/null \
        | sort -n | tail -1 | cut -d. -f1)
    if [ -n "$m" ] && [ "$m" -gt "$last" ]; then last=$m; fi
    case "$state" in *T*) last=$now ;; esac
    if [ $(( now - last )) -gt "$stall" ]; then
      echo "[q6] $name STALLED $(( now - last ))s, killing $(date)" >> $Q/queue.log
      local kids
      kids=$(ps -o pid= --ppid "$pid" | tr -d ' ')
      kill $pid $kids 2>/dev/null; sleep 5; kill -9 $pid $kids 2>/dev/null
      break
    fi
  done
  wait $pid 2>/dev/null
  local rc=$?
  rm -f /tmp/queue_item.pid
  echo "[q6] $name rc=$rc $(date)" >> $Q/queue.log
  return $rc
}

probe() {
  until timeout 180 python -c "
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform != 'cpu'
x = jax.jit(lambda x: x * 2)(jnp.ones(8))
assert float(np.asarray(x)[0]) == 2.0
" >/dev/null 2>&1; do
    echo "[q6] tpu probe failed, parking $(date)" >> $Q/queue.log
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

NSSUM=runs/ns_production/summary.json

# ---- 1. aux_ds48v3 finish (block-schedule rotation) -------------------
DS48V3="--skip-gen --n-primary 12 --n-primary-aux 6 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --resident-rotate 2 --epochs 40 --tag ds48v3 --variants aux"
for i in 1 2 3; do
  summary_has $NSSUM aux_ds48v3 && break
  probe
  run_watched ns_ds48v3 14400 2700 runs/ns_production \
    python experiments/ns_production.py $DS48V3 --continue-training
done
if ! summary_has $NSSUM aux_ds48v3; then
  probe
  run_watched ns_ds48v3_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS48V3 --eval-only || true
fi

# ---- 2. DR gens -> ds128 leak-check -----------------------------------
for i in 1 2 3; do
  probe
  run_watched dr_gen_all 7200 2400 data python -m sciml_pde_tpu.sim.gen_diff_react \
    --out data/2D_diff-react_test_all.h5 --nsample 100 && break
done
for i in 1 2 3; do
  probe
  run_watched dr_gen_diff 10800 2400 data python -m sciml_pde_tpu.sim.gen_diff_react \
    --out data/2D_diff-react_test_diff.h5 --nsample 450 --sim-type diff && break
done
for i in 1 2; do
  summary_has runs/dr_parity_ds128/summary.json baseline_leak && break
  probe
  run_watched dr_ds128_leak 12000 2700 runs/dr_parity_ds128 \
    python experiments/dr_parity.py --dataset basic_ds128 --epochs 100 \
    --variants baseline --leaky-clip --out runs/dr_parity_ds128 \
    --continue-training
done

# ---- 3. gen aux24 -> aux_ds64v3 ---------------------------------------
for i in 1 2 3; do
  probe
  run_watched ns_gen_aux24 10800 2400 data/ns_production \
    python experiments/ns_production.py --variants none --n-primary 8 \
    --n-primary-aux 8 --n-aux-per 3 --aux-grid 128 && break
done
DS64V3="--skip-gen --n-primary 16 --n-primary-aux 8 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --tag ds64v3 --variants aux"
for i in 1 2; do
  summary_has $NSSUM aux_ds64v3 && break
  probe
  run_watched ns_ds64v3 21600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64V3 --resident-rotate 2 \
    --epochs 40 --continue-training
done
if ! summary_has $NSSUM aux_ds64v3; then
  probe
  run_watched ns_ds64v3_r4 21600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64V3 --resident-rotate 4 \
    --epochs 80 --continue-training
fi
if ! summary_has $NSSUM aux_ds64v3; then
  probe
  run_watched ns_ds64v3_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64V3 --resident-rotate 2 \
    --epochs 40 --eval-only || true
fi

# ---- 4. NS transformer aux extended -----------------------------------
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  probe
  run_watched ns_tf_aux_ext 28800 2700 runs/ns_transformer \
    python experiments/ns_transformer.py --variants aux --epochs 30 \
    --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
    --continue-training --tag ext
fi

# ---- 5. ds32 baseline retries -----------------------------------------
DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native \
  --primary-store-dtype bf16 --remat --tag ds32"
if ! summary_has $NSSUM baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_b16 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants baseline --continue-training
fi
if ! summary_has $NSSUM baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_rot 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants baseline \
    --resident-rotate 2 --epochs 40 --continue-training
fi

# ---- 6. DR seed sweeps + extension gen --------------------------------
for i in 1 2 3; do
  probe
  run_watched dr_gen_ext 14400 2400 data python -m sciml_pde_tpu.sim.gen_diff_react \
    --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100 && break
done
for n in 128 8 32; do
  for s in 99 17; do
    for i in 1 2; do
      summary_has runs/dr_parity_ds$n/summary.json baseline_s$s \
        && summary_has runs/dr_parity_ds$n/summary.json aux_s$s && break
      probe
      run_watched dr_ds${n}_s$s 12000 2700 runs/dr_parity_ds$n \
        python experiments/dr_parity.py --dataset basic_ds$n --epochs 100 \
        --seed $s --out runs/dr_parity_ds$n --continue-training
    done
  done
done
python experiments/dr_seed_figure.py >> $Q/queue.log 2>&1 || true

# ---- 7. DR ds256, lie_ds32, plume3d tf pair, DR-tf boost --------------
for i in 1 2 3; do
  summary_has runs/dr_parity_ds256/summary.json aux && break
  probe
  run_watched dr_ds256 28800 2700 runs/dr_parity_ds256 \
    python experiments/dr_parity.py --dataset basic_ds256 --epochs 100 \
    --out runs/dr_parity_ds256 --continue-training
done
for i in 1 2 3; do
  summary_has $NSSUM lie_ds32 && break
  probe
  run_watched ns_lie_ds32 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants lie --continue-training
done
for v in tf_baseline tf_aux; do
  for i in 1 2 3; do
    summary_has runs/plume3d_parity/summary.json $v && break
    probe
    run_watched plume3d_$v 21600 2700 runs/plume3d_parity \
      python experiments/plume3d_parity.py --variants $v --epochs 20 \
      --batch-size 1 --tf-remat --primary-store-dtype bf16 \
      --continue-training
  done
done
for v in baseline aux; do
  for i in 1 2; do
    summary_has runs/dr_transformer/summary.json ${v}_boost && break
    probe
    run_watched dr_tf_boost_$v 21600 2700 runs/dr_transformer \
      python experiments/dr_transformer.py --variants $v --early-boost 3 \
      --epochs 60 --remat --tag boost --continue-training
  done
done
python experiments/dr_seed_figure.py >> $Q/queue.log 2>&1 || true

echo "[q6] v54 ALL DONE $(date)" >> $Q/queue.log
