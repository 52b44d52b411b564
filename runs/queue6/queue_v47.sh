#!/bin/bash
# v47 (replaces v46): adds the ns_ds48_aux scaling point between the ds32
# baseline and the transformer item — [12,6,6]: 6 primary files (24 traj)
# + 6 native-128^2 aux, all already on disk, args ~11.9 GB bf16 (the same
# envelope as the proven ds32 aux run).  The measured primary-pool scaling
# law (r1 0.0469 -> 0.0353 -> 0.0267 for 1 -> 2 -> 4 files) predicts r1
# ~0.023 — the next step toward the published aux 0.0175.  The transformer
# item's wall-clock guard will skip itself if this eats its window (the
# FNO flagship table outranks it).
# ---- v46 header: two fixes over v45 — the NS transformer aux item now
# passes --aux-grid 128 (tonight's generated aux store is ns_aux_2d_128-*;
# the default aux_name expects 256^2 files and would crash at load), and
# the DR ds256 tail item drops --host-stream (stores are only ~3.4+6.8 GB
# fp32 — they fit HBM device-resident; host-stream would hit the staging
# retention leak at ~30 GB/epoch).  Everything else inherited from v45
# (device-resident ds32 pair, wall-clock tf epochs, guarded items).
# --host-stream composition OOM-killed the host, not the chip: on this
# tunneled backend every staged per-step batch's host transfer buffer is
# RETAINED by the tunnel client (RSS grew linearly ~58 MB/s for 37 min to
# 102 GB with the in-flight bound active — ~2000 staged batches, none
# freed), so a 1980-step NS-shape epoch needs ~2x the host RAM it has.
# Post-mortem + HBM accounting in PERFORMANCE.md (host-stream section).
#
# Device-resident ds32 fits proven envelopes:
#   aux  [8,4,12]: 4 primary bf16 (6.3 GB) + 12 native-128^2 aux bf16
#        (4.7 GB) = 11.1 GB args — strictly under the refbatch aux run
#        that trained fine (12.55 GB args, bigger 256^2 aux temps).
#   baseline [8]: 8 primary bf16 (12.6 GB) + batch-16 temps — marginal;
#        batch-8 retry on failure (halves temps; more steps/epoch).
# Then the extended NS transformer aux (wall-clock epoch budget), then
# the DR tail.  plume3d stays dropped (landed; reseeded summaries).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue6
mkdir -p $Q

bench_guard() {
  exec 9>&- 2>/dev/null
  local done=0
  while [ $done -eq 0 ]; do
    local h m t
    h=$(date -u +%H); m=$(date -u +%M); t=$((10#$h * 60 + 10#$m))
    if [ $t -ge 430 ] && [ $t -lt 525 ]; then  # 07:10Z .. 08:45Z
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q6] v47 bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (525 - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q6] v47 bench_guard CONT $p $kids $(date)" >> $Q/queue.log
      fi
      done=1
    fi
    sleep 60
  done
}
bench_guard &

echo "[q6] v47 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v47 acquired lock $(date)" >> $Q/queue.log

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

# device-resident: NO --host-stream
DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native \
  --primary-store-dtype bf16 --remat --tag ds32"

# 1. NS ds32 aux (device-resident; proven envelope)
if ! summary_has runs/ns_production/summary.json aux_ds32; then
  probe
  run_item ns_ds32_aux_dev 14400 \
    python experiments/ns_production.py $DS32 --variants aux --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_ds32; then
  probe
  run_item ns_ds32_aux_evalonly 3600 \
    python experiments/ns_production.py $DS32 --variants aux --eval-only || true
fi

# 2. NS ds32 baseline: batch 16 first, batch-8 retry (halved temps)
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
  run_item ns_ds32_baseline_evalonly 3600 \
    python experiments/ns_production.py $DS32 --variants baseline --eval-only || true
fi

# 2b. NS ds48-shaped aux scaling point ([12,6,6]; no generation needed)
if ! summary_has runs/ns_production/summary.json aux_ds48; then
  probe
  run_item ns_ds48_aux 10800 \
    python experiments/ns_production.py --skip-gen --n-primary 12 \
    --n-primary-aux 6 --n-aux-per 1 --aux-grid 128 --aux-compute native \
    --primary-store-dtype bf16 --remat --tag ds48 --variants aux \
    --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_ds48; then
  probe
  run_item ns_ds48_aux_evalonly 3600 \
    python experiments/ns_production.py --skip-gen --n-primary 12 \
    --n-primary-aux 6 --n-aux-per 1 --aux-grid 128 --aux-compute native \
    --primary-store-dtype bf16 --remat --tag ds48 --variants aux \
    --eval-only || true
fi

# 3. NS transformer aux, extended run (key ns_aux_ext); wall-clock epochs
if ! summary_has runs/ns_transformer/summary.json ns_aux_ext; then
  now=$(date -u +%s)
  cutoff=$(date -u -d "06:30" +%s); [ "$cutoff" -le "$now" ] && cutoff=$((cutoff + 86400))
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

# 4. DR gen family (resume-safe) — only reached if time remains
probe
run_item dr_gen_all 7200 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_all.h5 --nsample 100
probe
run_item dr_gen_diff 10800 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_diff.h5 --nsample 450 --sim-type diff
probe
run_item dr_gen_ext 14400 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100

# 5. DR ds128 seed pair
for s in 99 17; do
  if ! summary_has runs/dr_parity_ds128/summary.json baseline_s$s; then
    probe
    run_item dr_ds128_s$s 12000 python experiments/dr_parity.py \
      --dataset basic_ds128 --epochs 100 --seed $s --out runs/dr_parity_ds128 \
      --continue-training
  fi
done

# 6. DR ds256 pair (host-stream is fine at DR shape: 16x smaller gathers,
#    ~8x fewer steps/epoch than the NS-shape epoch that OOMed the host)
if ! summary_has runs/dr_parity_ds256/summary.json aux; then
  probe
  run_item dr_ds256 28800 python experiments/dr_parity.py \
    --dataset basic_ds256 --epochs 100 \
    --out runs/dr_parity_ds256 --continue-training
fi

echo "[q6] v47 ALL DONE $(date)" >> $Q/queue.log
