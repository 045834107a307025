#!/bin/bash
# Resume the round-5 TPU pipeline after a tunnel outage: probes the tunnel
# until it answers, then runs the REMAINING matrix rows (joint_full +
# rf_fb seeds), the follow-up (disentangle, matmul probe, bench), and the
# extended-budget paper rows.
set -u
cd /root/repo

echo "=== waiting for TPU tunnel ==="
while true; do
  if timeout 90 python -c "import jax,jax.numpy as jnp; print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
    echo "tunnel up at $(date)"
    break
  fi
  echo "tunnel still down at $(date)"
  sleep 120
done

COMMON="--n_epochs 400 --batch_size 500 --synthetic_n 10000 --seed 0 --dataset_env paper --supervision_rate 1.0"
R5=saved_results_r5
M5=saved_models_r5

run() {
  tag=$1; shift
  echo "=== RUN $tag : $* ==="
  t0=$(date +%s)
  timeout 5400 python "$@" --out_dir $R5/$tag --model_dir $M5/$tag
  echo "=== DONE $tag rc=$? wall=$(( $(date +%s) - t0 ))s ==="
}

run joint_full run.py $COMMON --mode full --net_ablation loop
for s in 0 1 2 3; do
  run rf_fb_s$s train_semi.py --n_epochs 400 --batch_size 500 --synthetic_n 10000 \
    --dataset_env room_full --mode full --seed $s --supervision_rate 1.0 --kl_free_bits 0.5
done
echo "=== MATRIX REMAINDER COMPLETE ==="

bash benchmarks/r5_followup.sh
echo "=== FOLLOWUP COMPLETE ==="

bash benchmarks/r5_paper_extended.sh
echo "=== PIPELINE COMPLETE ==="
