#!/bin/bash
# Extended-budget paper-mode rows (contingency): the supervised env-branch
# probe shows material-signature learning only STARTS around epoch
# 100-200 — exactly where the reference's LambdaLR decay begins. If the
# 400-epoch rows stay at the plurality share, these 800-epoch/decay-300
# rows separate "cannot learn" from "budget truncates learning".
set -u
cd /root/repo
COMMON="--n_epochs 800 --decay_epoch 300 --batch_size 500 --synthetic_n 10000 --seed 0 --dataset_env paper --supervision_rate 1.0"
R5=saved_results_r5
M5=saved_models_r5

run() {
  tag=$1; shift
  echo "=== RUN $tag : $* ==="
  t0=$(date +%s)
  timeout 5400 python "$@" --out_dir $R5/$tag --model_dir $M5/$tag
  echo "=== DONE $tag rc=$? wall=$(( $(date +%s) - t0 ))s ==="
}

run semi_paper_fb_800   train_semi.py $COMMON --mode paper --kl_free_bits 0.5
run semi_paper_800      train_semi.py $COMMON --mode paper
run semi_paper_c2_800   train_semi.py $COMMON --mode paper --conv_type 2 --compute_dtype bfloat16
run semi_paper_fb_torch_800 train_semi.py $COMMON --mode paper --kl_free_bits 0.5 --env_conv_init torch
echo "=== EXTENDED COMPLETE ==="
