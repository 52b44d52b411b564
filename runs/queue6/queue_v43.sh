#!/bin/bash
# v43 (fresh filesystem, session 6): the round-3 plan from ROADMAP.md run
# as this session's queue.  Waits on the in-flight ds32 data gen ($1),
# then, in value order:
#   1. NS ds32 AUX  — the open published-gap shot ([8,4,12] native-res
#      128^2 aux, host-stream, bf16 primary store, remat)
#   2. NS ds32 BASELINE (same store/stream config, batch 16)
#   3. plume3d AUX at --batch-size 1 --remat (the two measured OOM modes'
#      fix) — completes the 3D published table
#   4. DR gen family (resume-safe; 100 all + 450 diff + 200 ext)
#   5. DR ds128 seed pair (99, 17) — seed-aggregate hypothesis
#   6. DR ds256 host-stream pair — largest scaling point
# Every train item is guarded on its summary key and followed by an
# --eval-only recovery so a timeout cut still lands its table.
exec 9>/tmp/sciml_queue.lock
flock -n 9 || { echo "lock busy; waiting" >&2; flock 9; }

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue6
mkdir -p $Q
echo "[q6] v43 start pid=$$ (gen pid=$1) $(date)" >> $Q/queue.log

# Driver bench window guard: if the round ends at this session boundary the
# driver runs bench.py on this chip ~07:15Z-08:45Z; SIGSTOP the active item
# so the artifact isn't corrupted by a competing dispatch stream.
bench_guard() {
  exec 9>&-   # do NOT inherit the queue lock fd (holds it past runner exit)
  local done=0
  while [ $done -eq 0 ]; do
    local h m t
    h=$(date -u +%H); m=$(date -u +%M); t=$((10#$h * 60 + 10#$m))
    if [ $t -ge 430 ] && [ $t -lt 525 ]; then  # 07:10Z .. 08:45Z
      local p kids
      p=$(cat /tmp/queue_item.pid 2>/dev/null)
      if [ -n "$p" ] && kill -0 "$p" 2>/dev/null; then
        kids=$(ps -o pid= --ppid "$p" | tr -d ' ')
        echo "[q6] bench_guard STOP $p $kids $(date)" >> $Q/queue.log
        kill -STOP $p $kids 2>/dev/null
        sleep $(( (525 - t) * 60 + 30 ))
        kill -CONT $kids $p 2>/dev/null
        echo "[q6] bench_guard CONT $p $kids $(date)" >> $Q/queue.log
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

# 0. wait for the in-flight ds32 generation
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  echo "[q6] gen finished $(date)" >> $Q/queue.log
fi

DS32="--skip-gen --n-primary 8 --n-primary-aux 4 --n-aux-per 3 \
  --aux-grid 128 --aux-compute native --host-stream \
  --primary-store-dtype bf16 --remat --tag ds32"

# 1. NS ds32 aux
if ! summary_has runs/ns_production/summary.json aux_ds32; then
  probe
  run_item ns_ds32_aux 16200 \
    python experiments/ns_production.py $DS32 --variants aux --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_ds32; then
  probe
  run_item ns_ds32_aux_evalonly 3600 \
    python experiments/ns_production.py $DS32 --variants aux --eval-only || true
fi

# 2. NS ds32 baseline
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_item ns_ds32_baseline 18000 \
    python experiments/ns_production.py $DS32 --variants baseline --continue-training
fi
if ! summary_has runs/ns_production/summary.json baseline_ds32; then
  probe
  run_item ns_ds32_baseline_evalonly 3600 \
    python experiments/ns_production.py $DS32 --variants baseline --eval-only || true
fi

# 3. plume3d aux at batch 1 (OOM fix: halves XLA temps; bf16 aux store)
if ! summary_has runs/plume3d_parity/summary.json aux; then
  probe
  run_item plume3d_aux 14400 \
    python experiments/plume3d_parity.py --variants aux --batch-size 1 \
    --remat --primary-store-dtype bf16 --continue-training
fi
if ! summary_has runs/plume3d_parity/summary.json aux; then
  probe
  run_item plume3d_aux_evalonly 3600 \
    python experiments/plume3d_parity.py --skip-gen --variants aux \
    --batch-size 1 --remat --primary-store-dtype bf16 --eval-only || true
fi

# 4. DR gen family (resume-safe)
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

# 6. DR ds256 pair (host-stream; stores past HBM)
if ! summary_has runs/dr_parity_ds256/summary.json aux; then
  probe
  run_item dr_ds256 28800 python experiments/dr_parity.py \
    --dataset basic_ds256 --epochs 100 --host-stream \
    --out runs/dr_parity_ds256 --continue-training
fi

echo "[q6] v43 ALL DONE $(date)" >> $Q/queue.log
