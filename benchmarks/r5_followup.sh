#!/bin/bash
# Round-5 follow-ups that need the chip after the paper matrix:
#  1. disentanglement eval on the recommended-recipe room_full checkpoint
#  2. matmul probe rows anchoring the ROADMAP-3b roofline argument
#  3. bench.py re-measure for the round log
set -u
cd /root/repo

echo "=== DISENTANGLE (room_full rf_fb_s0 checkpoint) ==="
timeout 1800 python -m iinsvae_tpu.cli.evaluate --net semi --disentangle \
  --dataset_env room_full --mode full --seed 0 --supervision_rate 1.0 \
  --kl_free_bits 0.5 --synthetic_n 10000 --batch_size 500 --n_epochs 400 \
  --out_dir saved_results_r5/rf_fb_s0 --model_dir saved_models_r5/rf_fb_s0
echo "=== DISENTANGLE rc=$? ==="

echo "=== MATMUL PROBE ==="
timeout 1800 python benchmarks/matmul_probe.py
echo "=== PROBE rc=$? ==="

echo "=== BENCH ==="
timeout 1800 python bench.py
echo "=== BENCH rc=$? ==="
