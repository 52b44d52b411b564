#!/bin/bash
# Round-2 continuation #3 queue (fresh filesystem — all data regenerated).
# Priorities (ROADMAP.md): NS FNO aux @ reference batch -> NS transformer
# aux (last missing published row) -> NS aux-volume (n-aux-per 6) ->
# DR ds128 seed pair -> DR ds256.  Gen staged so the first training jobs
# start as early as possible.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue5
mkdir -p $Q

probe() {
  # park the queue while the tunnel is down instead of burning timeouts
  until timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
jax.jit(lambda x: x * 2)(jnp.ones(8)).block_until_ready()
" >/dev/null 2>&1; do
    echo "[q5] tpu probe failed, parking $(date)" >> $Q/queue.log
    sleep 120
  done
}

echo "[q5] start $(date)" >> $Q/queue.log

# 0. chip profile of the FNO step (decides the fused Pallas spectral conv)
probe
timeout 1800 python experiments/profile_fno_step.py > $Q/profile_fno.log 2>&1
echo "[q5] profile rc=$? $(date)" >> $Q/queue.log

# 1. NS production gen, stage 1: 2 primary + 6 convection aux + 1 test
probe
timeout 14400 python experiments/ns_production.py --variants none \
  > $Q/ns_gen1.log 2>&1
echo "[q5] ns_gen1 rc=$? $(date)" >> $Q/queue.log

# 2. NS FNO aux at the reference batch size (8), bf16 aux store.
#    Baseline refbatch parity already landed (RESULTS.md); this is the twin.
probe
timeout 10800 python experiments/ns_production.py --skip-gen \
  --variants aux --tag refbatch > $Q/ns_aux_refbatch.log 2>&1
rc=$?
echo "[q5] ns_aux_refbatch rc=$rc $(date)" >> $Q/queue.log
if [ $rc -ne 0 ]; then
  probe
  timeout 10800 python experiments/ns_production.py --skip-gen \
    --variants aux --tag refbatch --remat > $Q/ns_aux_refbatch_remat.log 2>&1
  echo "[q5] ns_aux_refbatch_remat rc=$? $(date)" >> $Q/queue.log
fi

# 3. NS transformer aux — the last published table row with no result
#    (baseline row landed; aux was SIGKILLed by host contention last time).
probe
timeout 16000 python experiments/ns_transformer.py --variants aux \
  > $Q/ns_tf_aux.log 2>&1
echo "[q5] ns_tf_aux rc=$? $(date)" >> $Q/queue.log

# 4. NS gen stage 2: aux files 6-11 for the aux-volume study
probe
timeout 10800 python experiments/ns_production.py --variants none \
  --n-aux-per 6 > $Q/ns_gen2.log 2>&1
echo "[q5] ns_gen2 rc=$? $(date)" >> $Q/queue.log

# 5. NS FNO aux-volume: 6 aux per primary (reference uses 24)
probe
timeout 14400 python experiments/ns_production.py --skip-gen \
  --variants aux --n-aux-per 6 --tag aux6 > $Q/ns_aux6.log 2>&1
echo "[q5] ns_aux6 rc=$? $(date)" >> $Q/queue.log

# 6. DR gen: base family + the 100-299 full-physics extension
probe
timeout 7200 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_all.h5 --nsample 100 > $Q/dr_gen_all.log 2>&1
echo "[q5] dr_gen_all rc=$? $(date)" >> $Q/queue.log
probe
# 450 decomposed seeds in one file: covers ds128 (192 aux) AND ds256
# (384 aux) — the loader takes the first N keys of the single aux file
timeout 10800 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_diff.h5 --nsample 450 --sim-type diff \
  > $Q/dr_gen_diff.log 2>&1
echo "[q5] dr_gen_diff rc=$? $(date)" >> $Q/queue.log
probe
timeout 14400 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100 \
  > $Q/dr_gen_ext.log 2>&1
echo "[q5] dr_gen_ext rc=$? $(date)" >> $Q/queue.log

# 7. DR ds128 seed pair (reference sweeps seeds {16, 99, 17}; is the
#    published table a seed aggregate?)
for s in 99 17; do
  probe
  timeout 12000 python experiments/dr_parity.py --dataset basic_ds128 \
    --epochs 100 --seed $s --out runs/dr_parity_ds128 \
    > $Q/dr_ds128_s$s.log 2>&1
  echo "[q5] dr_ds128_s$s rc=$? $(date)" >> $Q/queue.log
done

# 8. DR ds256 pair (largest grid point; stores past HBM -> host-stream)
probe
timeout 28800 python experiments/dr_parity.py --dataset basic_ds256 \
  --epochs 100 --host-stream --out runs/dr_parity_ds256 \
  > $Q/dr_ds256.log 2>&1
echo "[q5] dr_ds256 rc=$? $(date)" >> $Q/queue.log

echo "[q5] ALL DONE $(date)" >> $Q/queue.log
