#!/bin/bash
# Round-2 chip queue, phase 3 (reprioritized): aux-recipe validation, the
# fp32 v-channel precision test, and the reference-protocol comparison run
# come before the long ds256 job.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
Q=runs/queue3

# wait for the running plume3d_parity job to release the chip
while kill -0 28036 2>/dev/null; do sleep 30; done
sleep 15
echo "[q3] start $(date)" >> $Q/queue.log

# 1. DR transformer aux at reference full size, NEW recipe
#    (shared head, SWA tail, no fourier term on aux) — wired by the
#    experiment when variant == aux.
timeout 9000 python experiments/dr_transformer.py --dataset basic_ds8 --epochs 60 \
  --encoder-dim 1024 --encoder-depth 16 --encoder-heads 16 \
  --decoder-dim 512 --decoder-depth 8 --decoder-heads 8 \
  --batch-size 4 --lr 3e-4 --aux-weight 0.5 --warmup-frac 0.05 \
  --precision bf16 --drop-path 0.1 --loss nrmse --tag v2 \
  --out runs/dr_transformer_r2 --variants aux > $Q/tf_aux_v2.log 2>&1
echo "[q3] tf_aux_v2 rc=$? $(date)" >> $Q/queue.log

# 2. OFormer + Hyena DR comparison, reference rollout protocol (64x64,
#    10-in / 40-out latent rollout), both models.
timeout 10800 python experiments/comparison_dr.py --epochs 50 \
  --out runs/comparison_dr > $Q/comparison_protocol.log 2>&1
echo "[q3] comparison_protocol rc=$? $(date)" >> $Q/queue.log

# 3. fp32 baseline: tests the precision hypothesis for the dead-v-channel
#    rollout artifact (reference trains fp16-AMP, 10-bit mantissa; our bf16
#    has 7 bits — the tiny normalized inhibitor channel needs ~0.006
#    normalized-space accuracy at the t0=0 window).
timeout 9000 python experiments/dr_transformer.py --dataset basic_ds8 --epochs 60 \
  --encoder-dim 1024 --encoder-depth 16 --encoder-heads 16 \
  --decoder-dim 512 --decoder-depth 8 --decoder-heads 8 \
  --batch-size 4 --lr 3e-4 --warmup-frac 0.05 \
  --precision fp32 --drop-path 0.1 --loss nrmse --tag fp32 \
  --out runs/dr_transformer_r2 --variants baseline > $Q/tf_fp32.log 2>&1
echo "[q3] tf_fp32 rc=$? $(date)" >> $Q/queue.log

# 4. Real-airfoil point-cloud study: compressible-Euler generation at
#    384^2 + irregular ST operator training + held-out eval.
timeout 7200 python experiments/airfoil_flow.py \
  --out runs/airfoil_flow > $Q/airfoil_flow.log 2>&1
echo "[q3] airfoil_flow rc=$? $(date)" >> $Q/queue.log

# 5. DR ds256 parity pair (largest grid point)
timeout 18000 python experiments/dr_parity.py --dataset basic_ds256 \
  --epochs 100 --out runs/dr_parity_ds256 > $Q/dr_parity_ds256.log 2>&1
echo "[q3] dr_parity_ds256 rc=$? $(date)" >> $Q/queue.log

echo "[q3] ALL DONE $(date)" >> $Q/queue.log
