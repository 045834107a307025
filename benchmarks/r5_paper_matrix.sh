#!/bin/bash
# Round-5 paper-protocol matrix on fixture v2 (VERDICT round-4 item 1).
# Re-runs the full round-4 matrix — semi / joint / conv_type=2 / free-bits /
# labels-off / i.i.d. controls (SVM rows come from each run's [final] line)
# — now that the fixture encodes learnable material signatures
# (data/synthetic.py v2). Sequential: one TPU chip.
set -u
cd /root/repo
COMMON="--n_epochs 400 --batch_size 500 --synthetic_n 10000 --seed 0 --dataset_env paper --supervision_rate 1.0"
R5=saved_results_r5
M5=saved_models_r5

run() {
  tag=$1; shift
  echo "=== RUN $tag : $* ==="
  t0=$(date +%s)
  timeout 3600 python "$@" --out_dir $R5/$tag --model_dir $M5/$tag
  rc=$?
  echo "=== DONE $tag rc=$rc wall=$(( $(date +%s) - t0 ))s ==="
}

run semi_paper        train_semi.py $COMMON --mode paper
run semi_full         train_semi.py $COMMON --mode full
run semi_paper_fb     train_semi.py $COMMON --mode paper --kl_free_bits 0.5
run semi_paper_c2     train_semi.py $COMMON --mode paper --conv_type 2 --compute_dtype bfloat16
run semi_paper_c2_nolabel train_semi.py $COMMON --mode paper --conv_type 2 --compute_dtype bfloat16 --supervision_rate 0.0
run joint_paper       run.py $COMMON --mode paper --net_ablation loop
run joint_full        run.py $COMMON --mode full --net_ablation loop

# seed-robust recommended-recipe band on room_full v2 (VERDICT item 4):
# flagship 1-D + --kl_free_bits 0.5, seeds 0-3
for s in 0 1 2 3; do
  run rf_fb_s$s train_semi.py --n_epochs 400 --batch_size 500 --synthetic_n 10000 \
    --dataset_env room_full --mode full --seed $s --supervision_rate 1.0 --kl_free_bits 0.5
done
echo "=== MATRIX COMPLETE ==="
