#!/bin/bash
# v32: recovery from the v30/v31 double-runner race (v30's real PID was
# misidentified; both runners ran concurrently and the NS items of v31
# burned through on missing data).  Single runner, full sequence, with a
# flock guard so a stale runner can never double-launch again.
exec 9>/tmp/sciml_queue.lock
flock -n 9 || { echo "another queue runner holds the lock; exiting" >&2; exit 1; }

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue5
mkdir -p $Q
echo "[q5] v32 start pid=$$ $(date)" >> $Q/queue.log

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

# 1. NS production gen, stage 1: 2 primary + 6 convection aux + 1 test
probe
timeout 14400 python experiments/ns_production.py --variants none \
  >> $Q/ns_gen1.log 2>&1
echo "[q5] ns_gen1 rc=$? $(date)" >> $Q/queue.log

# 2. NS FNO aux at the reference batch size (8), bf16 aux store
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
#    (validated recipe: 6 aux files, bf16 stores, remat)
probe
timeout 16000 python experiments/ns_transformer.py --variants aux \
  --num-aux-samples 6 --primary-store-dtype bf16 --remat \
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

# 6. DR gen: base family (resume-safe) + 450-seed decomposed pool +
#    the 100-299 full-physics extension
probe
timeout 7200 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_all.h5 --nsample 100 >> $Q/dr_gen_all.log 2>&1
echo "[q5] dr_gen_all rc=$? $(date)" >> $Q/queue.log
probe
timeout 10800 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_test_diff.h5 --nsample 450 --sim-type diff \
  > $Q/dr_gen_diff.log 2>&1
echo "[q5] dr_gen_diff rc=$? $(date)" >> $Q/queue.log
probe
timeout 14400 python -m sciml_pde_tpu.sim.gen_diff_react \
  --out data/2D_diff-react_ext_all_100_299.h5 --nsample 200 --seed-start 100 \
  > $Q/dr_gen_ext.log 2>&1
echo "[q5] dr_gen_ext rc=$? $(date)" >> $Q/queue.log

# 7. DR ds128 seed pair (reference sweeps seeds {16, 99, 17})
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

echo "[q5] v32 ALL DONE $(date)" >> $Q/queue.log
