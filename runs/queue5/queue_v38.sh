#!/bin/bash
# v38: idempotent handoff — every train item is guarded on its
# summary key, so a runner handoff (blocking-flock inheritance) never
# re-runs a landed result.
# v37: v34 + an aux24-native item (aux stream computed AT the 128^2
# store resolution -- discretization-invariant FNO, ~1.5 h vs ~6 h
# upsampled) inserted between aux12 and the transformer item.
# Original v34 header: time-aware reorder of v33 for the round-2 clock (round ends ~19:20Z).
#  - inherits the in-flight ns_aux_refbatch_bf16 (waits on its pid, $1).
#  - aux12 ([2,1,12] @ 128^2 store, ~3 h) replaces aux24 as the in-round
#    aux-volume shot; the full 24-file 128^2 family is still generated so
#    round 3 can run aux24 / tf-aux6@128 without regen.
#  - every train item is followed by an --eval-only guard keyed on its
#    summary entry, so a timeout- or round-boundary-cut run still lands
#    its rollout table from the best-val checkpoint.
#  - bench guard: the driver runs bench.py on the chip at round end; a
#    competing dispatch stream corrupts it.  Between 19:05Z and 20:30Z the
#    guard SIGSTOPs the active item (pid from /tmp/queue_item.pid) and
#    SIGCONTs it after.
exec 9>/tmp/sciml_queue.lock
# v33's in-flight refbatch item inherited the lock fd; a BLOCKING flock
# both waits for it to finish and keeps the no-double-runner guarantee.
flock -n 9 || {
  echo "lock busy (in-flight item from the previous runner); waiting" >&2
  flock 9
}

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue5
mkdir -p $Q
echo "[q5] v38 start pid=$$ (inheriting refbatch pid=$1) $(date)" >> $Q/queue.log

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

# summary_has <file> <key> -> rc 0 if key present
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

# 0. inherit the in-flight refbatch item from v33
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  echo "[q5] inherited refbatch finished $(date)" >> $Q/queue.log
fi
if ! summary_has runs/ns_production/summary.json aux_refbatch; then
  probe
  run_item ns_aux_refbatch_bf16_evalonly 3600 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --tag refbatch --primary-store-dtype bf16 --remat --eval-only || true
fi

# 1. Generate the 24-file 128^2 convection-aux family (reference ds8 volume;
#    aux12 uses files 0-11 now, aux24/tf-aux6 use the rest in round 3)
probe
run_item ns_gen_aux128 10800 \
  python experiments/ns_production.py --variants none \
  --n-primary-aux 1 --n-aux-per 24 --aux-grid 128

# 2. NS FNO aux12: [2,1,12] x 12 aux samples over the 128^2 upsampled
#    store, batch 8 -> 8 primary + 96 aux windows/step in 8 remat'd chunks
if ! summary_has runs/ns_production/summary.json aux_aux12; then
  probe
  run_item ns_aux12 18000 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 1 --n-aux-per 12 --aux-grid 128 --aux-chunks 8 \
    --primary-store-dtype bf16 --remat --tag aux12 --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_aux12; then
  probe
  run_item ns_aux12_evalonly 3600 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 1 --n-aux-per 12 --aux-grid 128 --aux-chunks 8 \
    --primary-store-dtype bf16 --remat --tag aux12 --eval-only || true
fi

# 2b. NS FNO aux24-NATIVE: the full reference aux volume ([2,1,24] x 24
#     samples) with the aux forward AT the 128^2 store resolution
#     (--aux-compute native) — lands the volume ladder's top rung in-round
if ! summary_has runs/ns_production/summary.json aux_aux24nat; then
  probe
  run_item ns_aux24_native 12600 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 1 --n-aux-per 24 --aux-grid 128 --aux-chunks 8 \
    --aux-compute native --primary-store-dtype bf16 --remat --tag aux24nat \
    --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_aux24nat; then
  probe
  run_item ns_aux24_native_evalonly 3600 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 1 --n-aux-per 24 --aux-grid 128 --aux-chunks 8 \
    --aux-compute native --primary-store-dtype bf16 --remat --tag aux24nat \
    --eval-only || true
fi

# 3. NS transformer aux, in-round recipe: 3 resident aux files, reference
#    microbatching (2 x accum 4), 10 epochs.  The step is COMPUTE-bound at
#    ~55 ms per 256^2 ViT window fwd+bwd (measured: baseline 2-window
#    dispatch 0.112 s, crashed 14-window aux dispatch 0.76 s), so an aux
#    epoch costs ~14.5 min regardless of batch size; 10 epochs (~2.4 h)
#    is what lands in-round next to the 30-epoch baseline (the filesystem
#    is typically recycled at the round boundary — a landed row beats a
#    stronger row that evaporates; round 3 extends with
#    --continue-training).
if ! summary_has runs/ns_transformer/summary.json ns_aux; then
  probe
  run_item ns_tf_aux10 12600 \
    python experiments/ns_transformer.py --variants aux --epochs 10 \
    --num-aux-samples 3 --primary-store-dtype bf16 --remat --continue-training
fi
if ! summary_has runs/ns_transformer/summary.json ns_aux; then
  probe
  run_item ns_tf_aux10_evalonly 5400 \
    python experiments/ns_transformer.py --variants aux --epochs 10 \
    --num-aux-samples 3 --primary-store-dtype bf16 --remat --eval-only || true
fi

# 4. BVP at the reference CLI's default 100k iterations
probe
run_item bvp_100k 7200 python experiments/bvp_study.py --iters 100000

# 5. DR gen: base family (resume-safe) + 450-seed decomposed pool +
#    the 100-299 full-physics extension
probe
run_item dr_gen_all 7200 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_all.h5 --nsample 100
probe
run_item dr_gen_diff 10800 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_diff.h5 --nsample 450 --sim-type diff
probe
run_item dr_gen_ext 14400 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100
# 6. DR ds128 seed pair (reference sweeps seeds {16, 99, 17})
for s in 99 17; do
  probe
  run_item dr_ds128_s$s 12000 python experiments/dr_parity.py \
    --dataset basic_ds128 --epochs 100 --seed $s --out runs/dr_parity_ds128
done

# 7. DR ds256 pair (largest grid point; stores past HBM -> host-stream)
probe
run_item dr_ds256 28800 python experiments/dr_parity.py \
  --dataset basic_ds256 --epochs 100 --host-stream --out runs/dr_parity_ds256

# 8. NS FNO aux24 — the reference-exact basic_ds8 recipe ([2,1,24] x 24
#    aux samples), ~6 h; data already on disk from item 1
if ! summary_has runs/ns_production/summary.json aux_aux24; then
  probe
  run_item ns_aux24 25200 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 1 --n-aux-per 24 --aux-grid 128 --aux-chunks 8 \
    --primary-store-dtype bf16 --remat --tag aux24 --continue-training
fi
if ! summary_has runs/ns_production/summary.json aux_aux24; then
  probe
  run_item ns_aux24_evalonly 3600 \
    python experiments/ns_production.py --skip-gen --variants aux \
    --n-primary-aux 1 --n-aux-per 24 --aux-grid 128 --aux-chunks 8 \
    --primary-store-dtype bf16 --remat --tag aux24 --eval-only || true
fi

echo "[q5] v38 ALL DONE $(date)" >> $Q/queue.log
