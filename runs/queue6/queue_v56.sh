#!/bin/bash
# v56 — v55 + two new decisive items (written after the ds48v3 verdict):
#   - bench_validate: one full bench.py run on chip right after the perf
#     probe — validates the fused bench phase end-to-end BEFORE the
#     round-end driver bench and seeds the tracked last-good fallback
#     with a measured fused-phase result.
#   - aux_ds32rot: ROTATED ds32 aux run ([8,4,12], resident_rotate=2,
#     block schedule, 40 rotated epochs = 20 passes) — measures the
#     rotation + LR-band cost against the landed UNROTATED aux_ds32
#     (r1 0.0267), de-confounding the aux_ds48v3 0.0301 reading
#     (VERDICT r3 #7: measure the data-order deviation, don't assume).
# Order: [orphaned v55 item finishes] -> ds48v3/probe guards ->
#   bench_validate -> dr_gen_all -> dft gate -> aux_ds32rot ->
#   dr_gen_diff -> ds128 leak-check -> aux24 gen -> ds64v3 -> tf ext ->
#   ds32 baseline -> DR sweeps -> ds256/lie/plume3d/boost
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
    if [ $t -ge 275 ] && [ $t -lt 385 ]; then stop=1; end=385; fi
    if [ $t -ge 425 ] && [ $t -lt 530 ]; then stop=1; end=530; fi
    if [ $t -ge 1135 ] && [ $t -lt 1245 ]; then stop=1; end=1245; fi
    if [ $stop -eq 1 ]; then
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q6] v56 bench_guard KILL $p $kids (window; claim must free) $(date)" >> $Q/queue.log
        kill $p $kids 2>/dev/null; sleep 5; kill -9 $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
      fi
    fi
    sleep 60
  done
}
bench_guard &

# watch the ORPHANED previous item while parked on the lock
orphan_watch() {
  local p last now m
  p=$(cat /tmp/queue_item.pid 2>/dev/null)
  [ -z "$p" ] && return
  last=$(date +%s)
  while kill -0 "$p" 2>/dev/null; do
    sleep 120
    now=$(date +%s)
    m=$(find runs experiments/results -maxdepth 2 -type f -printf '%T@\n' 2>/dev/null \
        | sort -n | tail -1 | cut -d. -f1)
    if [ -n "$m" ] && [ "$m" -gt "$last" ]; then last=$m; fi
    if [ $(( now - last )) -gt 1500 ]; then
      local kids
      kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
      echo "[q6] v56 orphan_watch: item $p stalled, killing $(date)" >> $Q/queue.log
      kill $p $kids 2>/dev/null; sleep 5; kill -9 $p $kids 2>/dev/null
      break
    fi
  done
}
orphan_watch &

echo "[q6] v56 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v56 acquired lock $(date)" >> $Q/queue.log

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

# ---- 0. carried guards (ds48v3 landed; perf probe may have run) -------
DS48V3="--skip-gen --n-primary 12 --n-primary-aux 6 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --resident-rotate 2 --epochs 40 --tag ds48v3 --variants aux"
if ! summary_has $NSSUM aux_ds48v3; then
  probe
  run_watched ns_ds48v3 14400 2700 runs/ns_production \
    python experiments/ns_production.py $DS48V3 --continue-training
fi
if [ ! -f experiments/results/perf_probe_r4.json ]; then
  probe
  run_watched perf_probe 3000 900 experiments/results \
    python experiments/perf_probe.py --timeout 420
fi

# ---- 1. bench validation (seed last-good with a fused-phase result) ---
if [ ! -f experiments/results/bench_r4_validate.json ]; then
  probe
  run_watched bench_validate 900 600 experiments/results \
    bash -c "BENCH_DEADLINE_S=600 python bench.py > experiments/results/bench_r4_validate.json"
fi

# ---- 2. DR gen (all) --------------------------------------------------
for i in 1 2 3; do
  [ -f data/2D_diff-react_test_all.h5 ] && \
    python - <<'EOF' && break
import h5py, sys
with h5py.File('data/2D_diff-react_test_all.h5') as f:
    sys.exit(0 if len(f.keys()) >= 100 else 1)
EOF
  probe
  run_watched dr_gen_all 7200 2400 data python -m sciml_pde_tpu.sim.gen_diff_react \
    --out data/2D_diff-react_test_all.h5 --nsample 100
done

# ---- 3. bf16-dft accuracy gate ----------------------------------------
if ! summary_has runs/dft_precision_gate/summary.json verdict; then
  probe
  run_watched dft_gate 7200 2400 runs/dft_precision_gate \
    python experiments/dft_precision_gate.py --data data/ --dataset basic_ds8
fi

# ---- 4. ROTATED ds32 A/B (rotation+LR-band cost, VERDICT #7) ----------
DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native \
  --primary-store-dtype bf16 --remat"
if ! summary_has $NSSUM aux_ds32rot; then
  probe
  run_watched ns_ds32rot 10800 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants aux \
    --resident-rotate 2 --epochs 40 --tag ds32rot --continue-training
fi

# ---- 5. DR gen (diff) + ds128 leak-check ------------------------------
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

# ---- 6. gen aux24 -> aux_ds64v3 ---------------------------------------
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
    --rotate-schedule interleave --epochs 40 --continue-training
done
if ! summary_has $NSSUM aux_ds64v3; then
  probe
  run_watched ns_ds64v3_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64V3 --resident-rotate 2 \
    --rotate-schedule interleave --epochs 40 --eval-only || true
fi

# ---- 7. NS transformer aux extended -----------------------------------
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  probe
  run_watched ns_tf_aux_ext 28800 2700 runs/ns_transformer \
    python experiments/ns_transformer.py --variants aux --epochs 30 \
    --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
    --continue-training --tag ext
fi

# ---- 8. ds32 baseline retries -----------------------------------------
if ! summary_has $NSSUM baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_b16 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --tag ds32 --variants baseline \
    --continue-training
fi
if ! summary_has $NSSUM baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_rot 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --tag ds32 --variants baseline \
    --resident-rotate 2 --epochs 40 --continue-training
fi

# ---- 9. DR seed sweeps + extension gen --------------------------------
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

# ---- 10. DR ds256, lie_ds32, plume3d pairs, DR-tf boost ---------------
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
    python experiments/ns_production.py $DS32 --tag ds32 --variants lie \
    --continue-training
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
# 3D FNO-aux recipe sweep (VERDICT #6): the baseline beat published but
# aux inverted; probe the aux-weight and head-LR axes at the ds8 shape
for rcp in "w03:--aux-weight 0.3" "lrh3:--lr-heads 3e-3"; do
  key="aux_${rcp%%:*}"; args="${rcp#*:}"
  for i in 1 2; do
    summary_has runs/plume3d_parity/summary.json $key && break
    probe
    run_watched plume3d_$key 21600 2700 runs/plume3d_parity \
      python experiments/plume3d_parity.py --variants aux --epochs 20 \
      --batch-size 1 --primary-store-dtype bf16 --remat $args \
      --tag ${rcp%%:*} --continue-training
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

echo "[q6] v56 ALL DONE $(date)" >> $Q/queue.log
