#!/bin/bash
# v31: supersedes v30 from item 2 on (v30's runner was killed mid-item-1;
# its gen child keeps running and v31 waits on it).  Fix vs v30: the NS
# transformer aux run uses the validated 6-aux recipe from the driver's
# own help text (--num-aux-samples 6 --primary-store-dtype bf16 --remat;
# aux store bf16 by default) instead of the 3-aux defaults.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue5
mkdir -p $Q
GEN_PID=${1:-0}

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

# wait for v30's orphaned gen child to release the chip
while [ "$GEN_PID" -gt 0 ] && kill -0 "$GEN_PID" 2>/dev/null; do sleep 30; done
sleep 10
echo "[q5] v31 start $(date)" >> $Q/queue.log

# finish stage-1 gen if the orphan was killed/timed out mid-family
probe
timeout 14400 python experiments/ns_production.py --variants none \
  >> $Q/ns_gen1.log 2>&1
echo "[q5] ns_gen1_finish rc=$? $(date)" >> $Q/queue.log

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

echo "[q5] v31 ALL DONE $(date)" >> $Q/queue.log
