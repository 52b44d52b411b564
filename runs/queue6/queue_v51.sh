#!/bin/bash
# v51 (replaces v50): same plan, stall budgets raised.  The fs recycle
# destroyed the persistent compile cache, and the 256^2 NS sim chunk
# program takes ~20-25 min of SILENT cold compile before the first byte
# is written — the gen killed at 10:14Z as "wedged" had in fact written
# 1.08 GB; its 09:49-10:0x silence was compile.  v50's 900/1500 s stall
# budgets would have killed every cold compile in a retry loop.  Now:
# gen 2400 s, train 2700 s — true tunnel wedges still get reaped.
# ---- v50 header (kept for the watchdog rationale):
# v50 (replaces v49 during a tunnel outage): same plan as v49 (gen stage 1
# -> ds48 aux -> gen stage 2 -> ds64-rotation aux shot -> ds32 baseline ->
# tf ext -> DR tail) plus TWO hardening changes learned ~10:00Z:
#
#  1. WEDGE WATCHDOG (run_watched): this session's tunnel wedged
#     progressively — dispatch/compile RPCs kept working while
#     device->host transfers hung forever (even a 4-byte fetch), so gen
#     sat 20 min at 96 bytes written twice, and a plain `timeout` would
#     have burned its full 4 h on a parked process.  run_watched kills an
#     item when its log AND its watch path go quiet past a stall budget,
#     and the caller loop probes + retries (gens are resume-safe, trains
#     --continue-training).  SIGSTOPped items (bench_guard windows) reset
#     the stall timer instead of dying.
#  2. All multi-attempt items are guarded by their summary key, so a
#     retry after a landed run is a no-op.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue6
mkdir -p $Q

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
        echo "[q6] v51 bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q6] v51 bench_guard CONT $p $kids $(date)" >> $Q/queue.log
      fi
    fi
    sleep 60
  done
}
bench_guard &

echo "[q6] v51 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v51 acquired lock $(date)" >> $Q/queue.log

python experiments/reseed_summaries.py >> $Q/queue.log 2>&1

# run_watched <name> <timeout_s> <stall_s> <watch_path> <cmd...>
# kills the item if neither its log nor watch_path changed for stall_s
# (a SIGSTOPped item resets the timer — bench_guard windows must not
# look like stalls).  rc 0 = item exited cleanly.
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
assert float(np.asarray(x)[0]) == 2.0  # transfers must work, not just dispatch
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

mkdir -p data/ns_production

# 0a. gen stage 1 (resume-safe; retry until clean exit)
for i in 1 2 3 4 5 6; do
  probe
  run_watched ns_gen_stage1 14400 2400 data/ns_production \
    python experiments/ns_production.py --variants none --n-primary 6 \
    --n-primary-aux 6 --n-aux-per 1 --aux-grid 128 && break
done

# 1. NS ds48 aux ([12,6,6]; key aux_ds48)
DS48="--skip-gen --n-primary 12 --n-primary-aux 6 --n-aux-per 1 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --tag ds48 --variants aux"
for i in 1 2 3; do
  summary_has runs/ns_production/summary.json aux_ds48 && break
  probe
  run_watched ns_ds48_aux 14400 2700 runs/ns_production \
    python experiments/ns_production.py $DS48 --continue-training
done
if ! summary_has runs/ns_production/summary.json aux_ds48; then
  probe
  run_watched ns_ds48_aux_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS48 --eval-only || true
fi

# 0b. gen stage 2: primary 6..7 + aux 6..7 (ds64rot pool)
for i in 1 2 3 4; do
  probe
  run_watched ns_gen_stage2 10800 2400 data/ns_production \
    python experiments/ns_production.py --variants none --n-primary 8 \
    --n-primary-aux 8 --n-aux-per 1 --aux-grid 128 && break
done

# 2. NS ds64-shaped ROTATION aux shot ([16,8,8], resident_rotate=2,
#    40 resident epochs = 20 full passes; key aux_ds64rot)
DS64="--skip-gen --n-primary 16 --n-primary-aux 8 --n-aux-per 1 \
  --aux-grid 128 --aux-compute native --primary-store-dtype bf16 \
  --remat --resident-rotate 2 --epochs 40 --tag ds64rot --variants aux"
for i in 1 2 3; do
  summary_has runs/ns_production/summary.json aux_ds64rot && break
  probe
  run_watched ns_ds64rot_aux 21600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64 --continue-training
done
if ! summary_has runs/ns_production/summary.json aux_ds64rot; then
  probe
  run_watched ns_ds64rot_aux_evalonly 3600 2700 runs/ns_production \
    python experiments/ns_production.py $DS64 --eval-only || true
fi

# 3. NS ds32 baseline: batch 16, batch-8 retry, rotation retry
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
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_watched ns_ds32_baseline_evalonly 3600 2700 runs/ns_production \
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
    run_watched ns_tf_aux_ext $(( avail - 300 )) 2700 runs/ns_transformer \
      python experiments/ns_transformer.py --variants aux --epochs $ep \
      --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
      --continue-training --tag ext
    if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
      probe
      run_watched ns_tf_aux_ext_evalonly 3600 2700 runs/ns_transformer \
        python experiments/ns_transformer.py --variants aux --epochs $ep \
        --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
        --eval-only --tag ext || true
    fi
  else
    echo "[q6] tf_aux_ext SKIPPED: only ${avail}s to window ($ep ep)" >> $Q/queue.log
  fi
fi

# 5. DR gen family (resume-safe)
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

# 6. DR ds128 seed pair
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

# 7. DR ds256 pair (device-resident)
for i in 1 2 3; do
  summary_has runs/dr_parity_ds256/summary.json aux && break
  probe
  run_watched dr_ds256 28800 2700 runs/dr_parity_ds256 \
    python experiments/dr_parity.py \
    --dataset basic_ds256 --epochs 100 \
    --out runs/dr_parity_ds256 --continue-training
done

echo "[q6] v51 ALL DONE $(date)" >> $Q/queue.log
