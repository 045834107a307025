#!/usr/bin/env python
"""Driver-level long runs for the soft-restorer and 2-D (conv_type=2) paths
(VERDICT round-1 item 5): train each on the shared synthetic fixture and
record quality, proving the variants CONVERGE rather than merely compile.

Usage: python benchmarks/variant_runs.py [--epochs 400] [--which soft,conv2]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def run_variant(tag: str, cfg, epochs: int, batch: int, run_svm: bool = False,
                param_override=None):
    from iinsvae_tpu.cli.common import resolve_data, to_batch_dict, init_state
    from iinsvae_tpu.cli.train_semi import build_model
    from iinsvae_tpu.training.loop import pad_to_batches, make_epoch_runner, make_evaluator
    from iinsvae_tpu.training.steps import (
        make_semi_train_step,
        make_semi_eval_step,
        finalize_metrics,
    )

    data_train, data_test = resolve_data(cfg)
    train = pad_to_batches(to_batch_dict(data_train, cfg.compute_dtype), batch)
    steps_per_epoch = train["cir"].shape[0] // batch
    test_batch = to_batch_dict(data_test)
    eval_bs = min(500, test_batch["cir"].shape[0])
    padded_test = pad_to_batches(test_batch, eval_bs)
    n_test = test_batch["cir"].shape[0]
    err_gt = np.asarray(test_batch["err"]).reshape(-1)

    model = build_model(cfg)
    state = init_state(model, cfg, steps_per_epoch=steps_per_epoch)
    if param_override is not None:
        state = state.replace(params=param_override(state.params))
    run_epoch = make_epoch_runner(
        make_semi_train_step(model, supervision_rate=cfg.supervision_rate), batch
    )
    evaluate = make_evaluator(make_semi_eval_step(model), eval_bs)

    t0 = time.time()
    key = jax.random.PRNGKey(cfg.seed)
    first = None
    for epoch in range(epochs):
        state, metrics = run_epoch(state, train, jax.random.fold_in(key, epoch))
        if epoch % 50 == 0 or epoch == epochs - 1:
            m = jax.tree.map(float, finalize_metrics(metrics))
            if first is None:
                first = m["loss"]
            print(f"[{tag}] epoch {epoch} loss {m['loss']:.4f} rmse {m['rmse']:.4f} "
                  f"acc {m['accuracy']:.4f} ({time.time() - t0:.0f}s)", flush=True)
    assert m["loss"] < first, f"{tag}: loss did not decrease ({first} -> {m['loss']})"

    tm, outs = evaluate(state, padded_test)
    est = np.asarray(outs["err_est"]).reshape(-1)[:n_test]
    rmse = float(np.sqrt(np.mean((est - err_gt) ** 2)))
    out = {"variant": tag, "rmse_m": round(rmse, 4),
           "accuracy": round(float(tm["accuracy"]), 4), "epochs": epochs,
           "train_seconds": round(time.time() - t0, 1)}
    if run_svm:
        from iinsvae_tpu.baseline.svm import svm_regressor, svm_classifier

        _, _, svm_rmse, _ = svm_regressor(data_train, data_test)
        svm_acc, _, _ = svm_classifier(data_train, data_test)
        out["svm_rmse_m"] = round(float(svm_rmse), 4)
        out["svm_accuracy"] = round(float(svm_acc), 4)
    print(json.dumps(out), flush=True)
    return out


def main():
    from iinsvae_tpu.config import Config

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--synthetic_n", type=int, default=10000)
    ap.add_argument("--which", default="soft,conv2")
    ap.add_argument("--compute_dtype", default="float32")
    args = ap.parse_args()

    base = dict(dataset_env="room_full", synthetic_n=args.synthetic_n, seed=0,
                n_epochs=args.epochs, batch_size=args.batch, supervision_rate=1.0,
                compute_dtype=args.compute_dtype)
    results = []
    which = args.which.split(",")
    if "flagship" in which:
        # the canonical conv_type=1 configuration — re-run whenever its
        # semantics change (round 3: Decoder1d upsample biases added)
        results.append(run_variant(
            f"flagship_1d_{args.compute_dtype}", Config(**base),
            args.epochs, args.batch))
    if "ewine" in which:
        # the second dataset axis (VERDICT round-2 item 6): 152-tap eWine
        # geometry (load_reg_data, reference dataset.py:171-172), NLOS
        # 2-class env, with the SVM baseline on the same features
        ew = dict(base)
        ew.pop("dataset_env")
        results.append(run_variant(
            f"ewine_1d_{args.compute_dtype}",
            Config(dataset_name="ewine", dataset_env="nlos", **ew),
            args.epochs, args.batch, run_svm=True))
    if "soft" in which:
        results.append(run_variant(
            "soft_restorer", Config(use_soft=True, **base), args.epochs, args.batch))
    if "conv2" in which:
        results.append(run_variant(
            f"conv_type2_{args.compute_dtype}", Config(conv_type=2, **base),
            args.epochs, args.batch))
    if "envinit" in which:
        # the opt-in --env_conv_init torch deviation (BASELINE.md round-3
        # init attribution): torch-default conv init on the env branch only
        results.append(run_variant(
            "envinit_torch_1d", Config(env_conv_init="torch", **base),
            args.epochs, args.batch))
    if "envinit2" in which:
        # --env_conv_init torch on the quality-best 2-D config
        results.append(run_variant(
            f"envinit_torch_2d_{args.compute_dtype}",
            Config(conv_type=2, env_conv_init="torch", **base),
            args.epochs, args.batch))
    if "conv3" in which:
        # the column-image variant the reference flags "Not available yet"
        # (models.py:218-255), made functional here
        results.append(run_variant(
            f"conv_type3_{args.compute_dtype}", Config(conv_type=3, **base),
            args.epochs, args.batch))
    print(json.dumps({"metric": "variant_quality", "results": results}), flush=True)


if __name__ == "__main__":
    main()
