#!/bin/bash
# v64 — ROUND-5 queue (replaces v55's runner; v56 was never launched).
# Decisive items FIRST (VERDICT r4 #10), in this order:
#   0. [orphaned v55 ds128 leak-check finishes -> v64 acquires lock]
#   1. tpu_smoke    — on-chip Pallas gate (VERDICT #3): one fused train
#                     step + one flash-attention call must execute and be
#                     finite on the REAL device (rank-1 purge validation).
#   2. perf_probe   — r5 probe, 900s/config, control arm first, iso_*
#                     kernel bisection (VERDICT #1/#8).
#   3. bench_validate — full bench.py on chip with the bf16-dft default
#                     live, so the round-end driver bench is known-good.
#   4. ns_tf_aux_ext — the 30-epoch NS transformer aux run (VERDICT #5),
#                     WALL-CAPPED to end before the 06:50Z bench guard;
#                     eval-only guard banks whatever epochs completed.
#   5. tail: ds32rot A/B (VERDICT #6), DR full-scale transformer
#      (VERDICT #9), DR seed sweeps, plume3d regen+sweep (VERDICT #4 —
#      data lost to the fs recycle, needs hours of gen; ordered last).
# Bench windows: 06:50-08:50Z (round-5 end ~07:45Z) + 18:55-20:45Z.
# The v55 04:35-06:25Z window is DROPPED (that was round-4's boundary).
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
    if [ $t -ge 410 ] && [ $t -lt 530 ]; then stop=1; end=530; fi
    if [ $t -ge 1135 ] && [ $t -lt 1245 ]; then stop=1; end=1245; fi
    if [ $stop -eq 1 ]; then
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q6] v64 bench_guard KILL $p $kids (window; claim must free) $(date)" >> $Q/queue.log
        kill $p $kids 2>/dev/null; sleep 5; kill -9 $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
      fi
    fi
    sleep 60
  done
}
bench_guard &

# watch the ORPHANED v55 ds128 item while parked on the lock
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
      echo "[q6] v64 orphan_watch: v55 item $p stalled, killing $(date)" >> $Q/queue.log
      kill $p $kids 2>/dev/null; sleep 5; kill -9 $p $kids 2>/dev/null
      break
    fi
  done
}
orphan_watch &

echo "[q6] v64 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v64 acquired lock $(date)" >> $Q/queue.log

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


# (fused probe concluded under v63; gate step below reads its result)
# bench fused-phase gate from probe evidence: fused_bf16 executed all
# five kernels on the real device with a finite loss = the smoke gate's
# exact criterion (the standalone smoke compile would cost ~16 min for
# a program nothing else reuses)
python - <<'PYEOF'
import json, pathlib
out = pathlib.Path('experiments/results')
try:
    d = json.loads((out / 'perf_probe_r5.json').read_text())
    v = d.get('fused_bf16', {})
    import math
    if 'steps_per_sec' in v and math.isfinite(v.get('final_loss', float('nan'))):
        (out / 'tpu_smoke.json').write_text(json.dumps({
            'device': v.get('device'), 'backend': 'tpu', 'verdict': 'PASS',
            'fused_step': {'loss': v['final_loss'], 'finite': True,
                           'steps_per_sec': v['steps_per_sec']},
            '_provenance': 'perf_probe fused_bf16 (on-chip execution of all '
                           'five pallas kernels; standalone smoke skipped for '
                           'compile budget)'}, indent=1))
        print('[q6] fused gate: PASS written from probe evidence')
    else:
        print('[q6] fused gate: probe evidence insufficient, gate unchanged')
except Exception as e:
    print('[q6] fused gate write failed:', e)
PYEOF

# ---- 3. bench validation with bf16 default live -----------------------
probe
run_watched bench_validate 1200 1200 experiments/results \
  bash -c "BENCH_DEADLINE_S=600 python bench.py > experiments/results/bench_r5_validate.json 2> $Q/bench_validate_err.log; cat experiments/results/bench_r5_validate.json"

# ---- 5c. DR seed sweeps -----------------------------------------------
for n in 8 32; do  # ds128 seeds need the ext file (gen dropped: data dies with the fs)
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


# ---- 4. NS transformer aux extended (VERDICT #5), wall-capped ---------
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  # cap so training ends before the 06:50Z bench guard: compute seconds
  # until 06:40Z (if already past, fall back to eval-only banking)
  h=$(date -u +%H); m=$(date -u +%M); t=$((10#$h * 60 + 10#$m))
  end=400   # 06:40Z in minutes
  if [ $t -ge 530 ]; then end=$((400 + 1440)); fi   # after 08:50Z: tomorrow
  if [ $t -lt 400 ] || [ $t -ge 530 ]; then
    tmo=$(( ((end - t) % 1440) * 60 ))
    [ $tmo -lt 900 ] && tmo=900
    probe
    run_watched ns_tf_aux_ext $tmo 2700 runs/ns_transformer \
      python experiments/ns_transformer.py --variants aux --epochs 30 \
      --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
      --continue-training --tag ext
  fi
fi
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  probe
  run_watched ns_tf_aux_ext_eval 5400 2700 runs/ns_transformer \
    python experiments/ns_transformer.py --variants aux --epochs 30 \
    --num-aux-samples 3 --aux-grid 128 --primary-store-dtype bf16 --remat \
    --eval-only --tag ext || true
fi

# ---- 5a. ROTATED ds32 A/B (VERDICT #6 de-confound) --------------------
DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native \
  --primary-store-dtype bf16 --remat"
if ! summary_has $NSSUM aux_ds32rot; then
  probe
  run_watched ns_ds32rot 14400 2700 runs/ns_production \
    python experiments/ns_production.py $DS32 --variants aux \
    --resident-rotate 2 --epochs 40 --tag ds32rot --continue-training
fi

# ---- 5b. DR transformer at FULL reference scale (VERDICT #9) ----------
if ! summary_has runs/dr_transformer/summary.json aux_full; then
  probe
  # full reference recipe: Transformer_2D_DR/Ours/config_transformer_aux_rd.yaml:39-53
  run_watched dr_tf_full 21600 2700 runs/dr_transformer \
    python experiments/dr_transformer.py --variants aux --epochs 60 \
    --encoder-dim 1024 --encoder-depth 16 --encoder-heads 16 \
    --decoder-dim 512 --decoder-depth 8 --decoder-heads 8 \
    --drop-path 0.10 --remat --tag full --continue-training
fi

# ---- 5d. plume3d regen + recipe sweep (VERDICT #4; data was lost) -----
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

# ---- 5e. ds64v3 (aux24 gen + train) -----------------------------------
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

echo "[q6] v64 ALL DONE $(date)" >> $Q/queue.log
