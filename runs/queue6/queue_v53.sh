#!/bin/bash
# v53 (supersedes v51's tail after aux_ds48 landed): the ds48 result
# (r1 0.0265 ~= ds32's 0.0267) shows the PRIMARY-pool axis saturating —
# but ds48 confounded two variables (aux-primary 4->6 files, aux-per
# 3->1).  v53 isolates the AUX-VOLUME axis at the 6-file pool, then
# upgrades the ds64 shot to the reference's aux-rich ratio:
#   0. finish gen to 8 primaries + 18 aux@128^2 (resume-safe)
#   1. aux_ds48v3: [12,6,18] aux-per 3, resident-rotate 2, 40 epochs
#      (matches ds48's 20 full passes) — if r1 drops toward ~0.023,
#      aux volume is the missing axis of the published 0.0175
#   2. gen to 24 aux
#   3. aux_ds64v3: [16,8,24] aux-per 3, rotation — the full shot at the
#      published pool ratio (carries into round 4 via continue_training)
#   4. ds32 baseline retries, tf ext, DR tail (unchanged from v51)
# v51's runner was killed after its gen-stage-2 item spawned; that gen
# continues ORPHANED holding the queue lock, so v53 parks on flock until
# it exits — no double-writer (same maneuver as v48->v49).
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
        echo "[q6] v53 bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q6] v53 bench_guard CONT $p $kids $(date)" >> $Q/queue.log
      fi
    fi
    sleep 60
  done
}
bench_guard &

echo "[q6] v53 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v53 acquired lock $(date)" >> $Q/queue.log

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

# ---- 0. gen: 8 primaries + 18 aux@128^2 (resume-safe) -----------------
for i in 1 2 3; do
  probe
  run_watched ns_gen_aux18 10800 2400 data/ns_production \
    python experiments/ns_production.py --variants none --n-primary 8 \
    --n-primary-aux 6 --n-aux-per 3 --aux-grid 128 && break
done

# ---- 1. aux-volume shot at the 6-file pool: [12,6,18] aux-per 3 -------
DS48V3="--skip-gen --n-primary 12 --n-primary-aux 6 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --resident-rotate 2 --epochs 40 --tag ds48v3 --variants aux"
for i in 1 2 3; do
  summary_has runs/ns_production/summary.json aux_ds48v3 && break
  probe
  run_watched ns_ds48v3 14400 2700 runs/ns_production \
    python experiments/ns_production.py $DS48V3 --continue-training
done
if ! summary_has runs/ns_production/summary.json aux_ds48v3; then
  probe
  run_watched ns_ds48v3_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS48V3 --eval-only || true
fi

# ---- 2. gen to 24 aux (for the ds64 ratio shot) -----------------------
for i in 1 2 3; do
  probe
  run_watched ns_gen_aux24 10800 2400 data/ns_production \
    python experiments/ns_production.py --variants none --n-primary 8 \
    --n-primary-aux 8 --n-aux-per 3 --aux-grid 128 && break
done

# ---- 3. ds64 at the reference aux ratio: [16,8,24] aux-per 3, rotation
DS64V3="--skip-gen --n-primary 16 --n-primary-aux 8 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --resident-rotate 2 --epochs 40 --tag ds64v3 --variants aux"
for i in 1 2 3; do
  summary_has runs/ns_production/summary.json aux_ds64v3 && break
  probe
  run_watched ns_ds64v3 21600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64V3 --continue-training
done
if ! summary_has runs/ns_production/summary.json aux_ds64v3; then
  probe
  run_watched ns_ds64v3_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64V3 --eval-only || true
fi

# ---- 4. NS ds32 baseline retries (unchanged from v51) -----------------
DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native \
  --primary-store-dtype bf16 --remat --tag ds32"
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_b16 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants baseline --continue-training
fi
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_b8 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants baseline --batch-size 8 \
    --continue-training
fi
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_rot 16200 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants baseline \
    --resident-rotate 2 --epochs 40 --continue-training
fi

# ---- 5. NS transformer aux extended (unchanged from v51) --------------
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  probe
  run_watched ns_tf_aux_ext 28800 2700 runs/ns_transformer \
    python experiments/ns_transformer.py --variants aux --epochs 30 \
    --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
    --continue-training --tag ext
fi

# ---- 6. DR tail (unchanged from v51) ----------------------------------
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
for i in 1 2 3; do
  probe
  run_watched dr_gen_ext 14400 2400 data python -m sciml_pde_tpu.sim.gen_diff_react \
    --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100 && break
done
for s in 99 17; do
  for i in 1 2 3; do
    summary_has runs/dr_parity_ds128/summary.json baseline_s$s && break
    probe
    run_watched dr_ds128_s$s 12000 2700 runs/dr_parity_ds128 \
      python experiments/dr_parity.py \
      --dataset basic_ds128 --epochs 100 --seed $s --out runs/dr_parity_ds128 \
      --continue-training
  done
done
for i in 1 2 3; do
  summary_has runs/dr_parity_ds256/summary.json aux && break
  probe
  run_watched dr_ds256 28800 2700 runs/dr_parity_ds256 \
    python experiments/dr_parity.py \
    --dataset basic_ds256 --epochs 100 \
    --out runs/dr_parity_ds256 --continue-training
done

echo "[q6] v53 ALL DONE $(date)" >> $Q/queue.log
