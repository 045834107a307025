#!/bin/bash
# Round-5 TPU pipeline, tunnel-outage-robust: probe the tunnel BEFORE EACH
# run (the tunnel can flap mid-pipeline; a hung dial burns the run's whole
# timeout otherwise). Covers the remaining matrix rows (rf_fb seeds), the
# follow-up (disentangle, matmul probe, bench), and the extended-budget
# paper rows. joint_full/joint_paper and the semi paper rows are done.
set -u
cd /root/repo

wait_tunnel() {
  while true; do
    if timeout 90 python -c "import jax,jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
      echo "tunnel up at $(date)"; return
    fi
    echo "tunnel down at $(date)"; sleep 120
  done
}

run() {
  tag=$1; shift
  wait_tunnel
  echo "=== RUN $tag : $* ==="
  t0=$(date +%s)
  timeout 5400 python "$@"
  echo "=== DONE $tag rc=$? wall=$(( $(date +%s) - t0 ))s ==="
}

R5=saved_results_r5
M5=saved_models_r5

for s in 0 1 2 3; do
  run rf_fb_s$s train_semi.py --n_epochs 400 --batch_size 500 --synthetic_n 10000 \
    --dataset_env room_full --mode full --seed $s --supervision_rate 1.0 --kl_free_bits 0.5 \
    --out_dir $R5/rf_fb_s$s --model_dir $M5/rf_fb_s$s
done
echo "=== MATRIX REMAINDER COMPLETE ==="

run disentangle -m iinsvae_tpu.cli.evaluate --net semi --disentangle \
  --dataset_env room_full --mode full --seed 0 --supervision_rate 1.0 \
  --kl_free_bits 0.5 --synthetic_n 10000 --batch_size 500 --n_epochs 400 \
  --out_dir $R5/rf_fb_s0 --model_dir $M5/rf_fb_s0
run matmul_probe benchmarks/matmul_probe.py
run bench bench.py
echo "=== FOLLOWUP COMPLETE ==="

EXT="--n_epochs 800 --decay_epoch 300 --batch_size 500 --synthetic_n 10000 --seed 0 --dataset_env paper --supervision_rate 1.0"
run semi_paper_fb_800 train_semi.py $EXT --mode paper --kl_free_bits 0.5 --out_dir $R5/semi_paper_fb_800 --model_dir $M5/semi_paper_fb_800
run semi_paper_800 train_semi.py $EXT --mode paper --out_dir $R5/semi_paper_800 --model_dir $M5/semi_paper_800
run semi_paper_c2_800 train_semi.py $EXT --mode paper --conv_type 2 --compute_dtype bfloat16 --out_dir $R5/semi_paper_c2_800 --model_dir $M5/semi_paper_c2_800
run semi_paper_fb_torch_800 train_semi.py $EXT --mode paper --kl_free_bits 0.5 --env_conv_init torch --out_dir $R5/semi_paper_fb_torch_800 --model_dir $M5/semi_paper_fb_torch_800
echo "=== PIPELINE COMPLETE ==="
