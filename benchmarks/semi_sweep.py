#!/usr/bin/env python
"""Supervision-rate sweep: train the 6 rate checkpoints on the shared
synthetic fixture and emit the reference's headline semi-supervised figure
via cli/test_semi.py (reference test_semi.py:64-204 + the missing
CDF_plot_semi_test).

Run from a scratch/artifact dir (writes ./saved_models, ./saved_results_semi,
./data). Defaults mirror the head-to-head quality recipe in BASELINE.md
(synthetic_n 10000, room_full, 400 epochs, batch 500).

Usage: python benchmarks/semi_sweep.py [--epochs 400] [--rates 0.1,0.2,...]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--synthetic_n", type=int, default=10000)
    ap.add_argument("--env", default="room_full")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rates", default="0.1,0.2,0.4,0.6,0.8,1.0")
    ap.add_argument("--conv_type", type=int, default=1, choices=[1, 2, 3])
    ap.add_argument("--compute_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()
    rates = [float(r) for r in args.rates.split(",")]

    from iinsvae_tpu.config import Config
    from iinsvae_tpu.cli.common import resolve_data, to_batch_dict, init_state
    from iinsvae_tpu.cli.train_semi import build_model
    from iinsvae_tpu.training.checkpoint import semi_model_dir, save_checkpoint
    from iinsvae_tpu.training.loop import pad_to_batches, make_epoch_runner, make_evaluator
    from iinsvae_tpu.training.steps import (
        make_semi_train_step,
        make_semi_eval_step,
        finalize_metrics,
    )

    base = Config(
        dataset_env=args.env, synthetic_n=args.synthetic_n, seed=args.seed,
        n_epochs=args.epochs, batch_size=args.batch,
        conv_type=args.conv_type, compute_dtype=args.compute_dtype,
    )
    data_train, data_test = resolve_data(base)
    train = pad_to_batches(to_batch_dict(data_train, base.compute_dtype),
                           args.batch)
    steps_per_epoch = train["cir"].shape[0] // args.batch
    test_batch = to_batch_dict(data_test, base.compute_dtype)
    eval_bs = min(500, test_batch["cir"].shape[0])
    padded_test = pad_to_batches(test_batch, eval_bs)
    n_test = test_batch["cir"].shape[0]
    err_gt = np.asarray(test_batch["err"]).reshape(-1)

    model = build_model(base)
    evaluate = make_evaluator(make_semi_eval_step(model), eval_bs)

    results = []
    for rate in rates:
        import dataclasses

        cfg = dataclasses.replace(base, supervision_rate=rate)
        t0 = time.time()
        state = init_state(model, cfg, steps_per_epoch=steps_per_epoch)
        run_epoch = make_epoch_runner(
            make_semi_train_step(model, supervision_rate=rate), args.batch
        )
        key = jax.random.PRNGKey(cfg.seed)
        for epoch in range(args.epochs):
            state, metrics = run_epoch(state, train, jax.random.fold_in(key, epoch))
            if epoch % 100 == 0 or epoch == args.epochs - 1:
                m = jax.tree.map(float, finalize_metrics(metrics))
                print(f"[rate {rate}] epoch {epoch} loss {m['loss']:.4f} "
                      f"rmse {m['rmse']:.4f} acc {m['accuracy']:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        model_path = semi_model_dir(cfg)
        save_checkpoint(model_path, args.epochs, state)
        tm, outs = evaluate(state, padded_test)
        est = np.asarray(outs["err_est"]).reshape(-1)[:n_test]
        rmse = float(np.sqrt(np.mean((est - err_gt) ** 2)))
        acc = float(tm["accuracy"])
        results.append({"rate": rate, "rmse_m": round(rmse, 4),
                        "accuracy": round(acc, 4),
                        "train_seconds": round(time.time() - t0, 1)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"metric": "semi_sweep", "epochs": args.epochs,
                      "results": results}), flush=True)

    # the sweep figure (reference's missing CDF_plot_semi_test)
    from iinsvae_tpu.cli import test_semi as ts

    per_rate = ts.main([
        "--dataset_env", args.env, "--synthetic_n", str(args.synthetic_n),
        "--seed", str(args.seed), "--test_epoch", str(args.epochs),
        "--conv_type", str(args.conv_type),
        "--compute_dtype", args.compute_dtype,
    ])
    print(f"sweep curves: {[r for r, _ in per_rate]}", flush=True)


if __name__ == "__main__":
    main()
