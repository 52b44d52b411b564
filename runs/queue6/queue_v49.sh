#!/bin/bash
# v49 (replaces v48 mid-gen): inserts the ds64-SHAPED ROTATION SHOT —
# the new resident_rotate lever (commit 38db5ae) trains an [16,8,8] aux
# pool (8 primary files = the reference ds64 aux primary pool, 8
# native-128^2 aux) on one chip by rotating a 4-file resident slice per
# epoch; 40 resident epochs = 20 full passes, matching the ds32
# protocol.  The measured primary-pool scaling law (r1 0.0469 -> 0.0353
# -> 0.0267 for 1 -> 2 -> 4 files) predicts r1 ~0.021 at 8 files; the
# published aux r1 is 0.0175 at this primary pool.  This is the open
# flagship gap's best single-chip shot.
#
# Launch protocol: v48's RUNNER was killed while its stage-1 gen item
# kept running orphaned; WAIT_PID below parks until that gen exits, so
# no generation work is lost and no double-writer exists.  Everything
# else inherited from v48 (dual bench-guard windows, guarded items,
# reseeded summaries).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue6
mkdir -p $Q
WAIT_PID=${1:-0}

bench_guard() {
  exec 9>&- 2>/dev/null
  while true; do
    local h m t
    h=$(date -u +%H); m=$(date -u +%M); t=$((10#$h * 60 + 10#$m))
    # windows: 07:05-08:50Z (425..530) and 18:55-20:45Z (1135..1245)
    local stop=0 end=0
    if [ $t -ge 425 ] && [ $t -lt 530 ]; then stop=1; end=530; fi
    if [ $t -ge 1135 ] && [ $t -lt 1245 ]; then stop=1; end=1245; fi
    if [ $stop -eq 1 ]; then
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q6] v49 bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q6] v49 bench_guard CONT $p $kids $(date)" >> $Q/queue.log
      fi
    fi
    sleep 60
  done
}
bench_guard &

echo "[q6] v49 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v49 acquired lock $(date)" >> $Q/queue.log

# park until the orphaned v48 gen item (stage 1) exits
if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "[q6] v49 orphaned gen $WAIT_PID exited $(date)" >> $Q/queue.log
fi

python experiments/reseed_summaries.py >> $Q/queue.log 2>&1

run_item() {  # run_item <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1 &
  echo $! > /tmp/queue_item.pid
  wait $!
  local rc=$?
  rm -f /tmp/queue_item.pid
  echo "[q6] $name rc=$rc $(date)" >> $Q/queue.log
  return $rc
}

probe() {
  until timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
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

# 0a. finish gen stage 1 if the orphan died early (resume-safe, skips done)
probe
run_item ns_gen_stage1b 14400 \
  python experiments/ns_production.py --variants none --n-primary 6 \
  --n-primary-aux 6 --n-aux-per 1 --aux-grid 128

# 1. NS ds48 aux scaling point ([12,6,6]; key aux_ds48)
DS48="--skip-gen --n-primary 12 --n-primary-aux 6 --n-aux-per 1 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --tag ds48 --variants aux"
if ! summary_has runs/ns_production/summary.json aux_ds48; then
  probe
  run_item ns_ds48_aux 14400 \
    python experiments/ns_production.py $DS48 --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_ds48; then
  probe
  run_item ns_ds48_aux_evalonly 3600 \
    python experiments/ns_production.py $DS48 --eval-only || true
fi

# 0b. gen stage 2: primary 6..7 + aux 6..7 (for the ds64rot pool)
probe
run_item ns_gen_stage2 10800 \
  python experiments/ns_production.py --variants none --n-primary 8 \
  --n-primary-aux 8 --n-aux-per 1 --aux-grid 128

# 2. NS ds64-shaped ROTATION aux shot ([16,8,8], resident_rotate=2,
#    40 resident epochs = 20 full passes; key aux_ds64rot)
DS64="--skip-gen --n-primary 16 --n-primary-aux 8 --n-aux-per 1 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --resident-rotate 2 --epochs 40 --tag ds64rot --variants aux"
if ! summary_has runs/ns_production/summary.json aux_ds64rot; then
  probe
  run_item ns_ds64rot_aux 21600 \
    python experiments/ns_production.py $DS64 --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_ds64rot; then
  probe
  run_item ns_ds64rot_aux_evalonly 3600 \
    python experiments/ns_production.py $DS64 --eval-only || true
fi

# 3. NS ds32 baseline: batch 16, batch-8 retry, rotation retry
DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native \
  --primary-store-dtype bf16 --remat --tag ds32"
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_item ns_ds32_baseline_b16 16200 \
    python experiments/ns_production.py $DS32 --variants baseline --continue-training
fi
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_item ns_ds32_baseline_b8 16200 \
    python experiments/ns_production.py $DS32 --variants baseline --batch-size 8 \
    --continue-training
fi
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_item ns_ds32_baseline_rot 16200 \
    python experiments/ns_production.py $DS32 --variants baseline \
    --resident-rotate 2 --epochs 40 --continue-training
fi
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_item ns_ds32_baseline_evalonly 3600 \
    python experiments/ns_production.py $DS32 --variants baseline --eval-only || true
fi

# 4. NS transformer aux, extended run (key ns_aux_ext); wall-clock epochs
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  now=$(date -u +%s)
  cutoff=$(date -u -d "07:05" +%s); [ "$cutoff" -le "$now" ] && cutoff=$((cutoff + 86400))
  avail=$(( cutoff - now ))
  ep=$(( (avail / 60 - 45) / 10 ))
  [ $ep -gt 30 ] && ep=30
  if [ $ep -ge 12 ]; then
    probe
    echo "[q6] tf_aux_ext epochs=$ep avail=${avail}s $(date)" >> $Q/queue.log
    run_item ns_tf_aux_ext $(( avail - 300 )) \
      python experiments/ns_transformer.py --variants aux --epochs $ep \
      --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
      --continue-training --tag ext
    if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
      probe
      run_item ns_tf_aux_ext_evalonly 3600 \
        python experiments/ns_transformer.py --variants aux --epochs $ep \
        --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
        --eval-only --tag ext || true
    fi
  else
    echo "[q6] tf_aux_ext SKIPPED: only ${avail}s to window ($ep ep)" >> $Q/queue.log
  fi
fi

# 5. DR gen family (resume-safe) — only reached if time remains
probe
run_item dr_gen_all 7200 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_all.h5 --nsample 100
probe
run_item dr_gen_diff 10800 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_diff.h5 --nsample 450 --sim-type diff
probe
run_item dr_gen_ext 14400 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100

# 6. DR ds128 seed pair
for s in 99 17; do
  if ! summary_has runs/dr_parity_ds128/summary.json baseline_s$s; then
    probe
    run_item dr_ds128_s$s 12000 python experiments/dr_parity.py \
      --dataset basic_ds128 --epochs 100 --seed $s --out runs/dr_parity_ds128 \
      --continue-training
  fi
done

# 7. DR ds256 pair (device-resident)
if ! summary_has runs/dr_parity_ds256/summary.json aux; then
  probe
  run_item dr_ds256 28800 python experiments/dr_parity.py \
    --dataset basic_ds256 --epochs 100 \
    --out runs/dr_parity_ds256 --continue-training
fi

echo "[q6] v49 ALL DONE $(date)" >> $Q/queue.log
