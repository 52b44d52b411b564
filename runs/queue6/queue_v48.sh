#!/bin/bash
# v48 (session-9 rewrite; the session-8 copy was lost to the fs recycle —
# only its PROGRESS commit survived).  Fresh fs again: data/ gone, no live
# runner, summaries reseeded.  Plan per the v48 commit message: regen the
# NS family, then the ds48 aux scaling point, the ds32 baseline, the
# extended NS transformer aux, and the DR tail.  Dual bench-guard windows
# (evening 18:55-20:45Z and morning 07:05-08:50Z) — the guard loops
# forever and SIGSTOPs the active item inside either window, since the
# round may end at either boundary.
#
# Generation is staged so the highest-value missing result (aux_ds48)
# unblocks first: the aux loader reads train_subsample[1]=6 primary files
# + train_subsample[2]=6 aux files (data/ns.py), so primary 0..5 + aux
# 0..5 + test 250 suffice; primary 6..7 (ds32 baseline pool) gen later.
# Envelopes (PERFORMANCE.md): ds48 aux [12,6,6] args ~11.9 GB bf16 —
# inside the proven refbatch-aux envelope (12.55 GB); ds32 baseline
# batch 16 is marginal, batch-8 retry follows.
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
        echo "[q6] v48 bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (end - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q6] v48 bench_guard CONT $p $kids $(date)" >> $Q/queue.log
      fi
    fi
    sleep 60
  done
}
bench_guard &

echo "[q6] v48 start pid=$$, waiting on queue lock $(date)" >> $Q/queue.log
exec 9>/tmp/sciml_queue.lock
flock 9
echo "[q6] v48 acquired lock $(date)" >> $Q/queue.log

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

# 0a. gen stage 1: primary 0..5 + aux 0..5 @128^2 + test 250 (resume-safe)
probe
run_item ns_gen_stage1 14400 \
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

# 0b. gen stage 2: primary 6..7 (no new aux)
probe
run_item ns_gen_stage2 7200 \
  python experiments/ns_production.py --variants none --n-primary 8 \
  --n-aux-per 0

# 2. NS ds32 baseline: batch 16 first, batch-8 retry (halved temps)
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
  run_item ns_ds32_baseline_evalonly 3600 \
    python experiments/ns_production.py $DS32 --variants baseline --eval-only || true
fi

# 3. NS transformer aux, extended run (key ns_aux_ext); wall-clock epochs
#    cutoff = next morning bench window start (07:05Z)
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

# 6. DR ds256 pair (device-resident: stores fit HBM; host-stream would
#    hit the staging-retention leak)
if ! summary_has runs/dr_parity_ds256/summary.json aux; then
  probe
  run_item dr_ds256 28800 python experiments/dr_parity.py \
    --dataset basic_ds256 --epochs 100 \
    --out runs/dr_parity_ds256 --continue-training
fi

echo "[q6] v48 ALL DONE $(date)" >> $Q/queue.log
