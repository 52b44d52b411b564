#!/bin/bash
# v33: recovery from two HBM OOMs + the aux-volume attack.
#  - v32's ns_aux_refbatch ran WITHOUT the bf16 primary store (fp32
#    primary 5.9 GiB + bf16 aux 8.8 GiB = 14.7 GiB of arguments alone;
#    OOM at compile).  Retry with --primary-store-dtype bf16 --remat.
#  - v32's ns_tf_aux (6 aux files resident) survived epoch 0 then hit a
#    runtime RESOURCE_EXHAUSTED on the first post-validation dispatch —
#    the arena is at the edge because this backend ignores buffer
#    donation.  Retry at --num-aux-samples 3 (frees 4.4 GiB).
#  - NEW: the reference-exact basic_ds8 aux recipe ([2,1,24],
#    num_aux_samples 24 — config_ns.yaml:19,31,64) via the 128^2 bf16 aux
#    store + gather-time upsample + 8-chunk scanned aux stream
#    (commit 48a5bc0).  Store: 24 files x 0.37 GiB = 8.8 GiB resident.
#  - v32 items 4-5 (full-res aux 6-11 gen + device-resident aux6) are
#    SUPERSEDED by the 128^2 path.
exec 9>/tmp/sciml_queue.lock
flock -n 9 || { echo "another queue runner holds the lock; exiting" >&2; exit 1; }

cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue5
mkdir -p $Q
echo "[q5] v33 start pid=$$ $(date)" >> $Q/queue.log

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

# 1. NS FNO aux at reference batch 8, bf16 primary + aux stores, remat
probe
timeout 10800 python experiments/ns_production.py --skip-gen \
  --variants aux --tag refbatch --primary-store-dtype bf16 --remat \
  > $Q/ns_aux_refbatch_bf16.log 2>&1
echo "[q5] ns_aux_refbatch_bf16 rc=$? $(date)" >> $Q/queue.log

# 2. NS transformer aux retry at 3 aux files (runtime-OOM headroom)
probe
timeout 18000 python experiments/ns_transformer.py --variants aux \
  --num-aux-samples 3 --primary-store-dtype bf16 --remat \
  > $Q/ns_tf_aux3.log 2>&1
echo "[q5] ns_tf_aux3 rc=$? $(date)" >> $Q/queue.log

# 3. Generate the 24-file 128^2 convection-aux family (reference ds8 volume)
probe
timeout 10800 python experiments/ns_production.py --variants none \
  --n-primary-aux 1 --n-aux-per 24 --aux-grid 128 \
  > $Q/ns_gen_aux128.log 2>&1
echo "[q5] ns_gen_aux128 rc=$? $(date)" >> $Q/queue.log

# 4. NS FNO aux, reference-exact basic_ds8 recipe: [2,1,24] x 24 aux
#    samples, batch 8 -> 8 primary + 192 aux windows per step, scanned
#    in 8 remat'd chunks over the 128^2-store upsampled stream
probe
timeout 25200 python experiments/ns_production.py --skip-gen \
  --variants aux --n-primary-aux 1 --n-aux-per 24 --aux-grid 128 \
  --aux-chunks 8 --primary-store-dtype bf16 --remat --tag aux24 \
  > $Q/ns_aux24.log 2>&1
echo "[q5] ns_aux24 rc=$? $(date)" >> $Q/queue.log

# 5. BVP at the reference CLI's default 100k iterations
probe
timeout 7200 python experiments/bvp_study.py --iters 100000 \
  > $Q/bvp_100k.log 2>&1
echo "[q5] bvp_100k rc=$? $(date)" >> $Q/queue.log

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

echo "[q5] v33 ALL DONE $(date)" >> $Q/queue.log
