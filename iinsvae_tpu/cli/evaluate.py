"""Standalone checkpoint evaluation (the reference's test_gem pipeline,
test.py:26-146, as its own entry point).

  python -m iinsvae_tpu.cli.evaluate --test_epoch 500 --dataset_env room_full
  python -m iinsvae_tpu.cli.evaluate --net joint --net_ablation loop ...

Loads the orbax checkpoint for --test_epoch (or the latest), evaluates the
held-out split, draws the latent scatter + CDF-vs-SVM comparison, and
exports residuals.
"""

from __future__ import annotations

import argparse

from iinsvae_tpu.config import add_args, from_args
from iinsvae_tpu.training.checkpoint import (
    semi_model_dir,
    semi_result_dir,
    joint_model_dir,
    joint_result_dir,
    restore_checkpoint,
    latest_epoch,
)
from iinsvae_tpu.evaluation.evaluate import evaluate_semi, evaluate_joint
from iinsvae_tpu.cli.common import setup_logging, resolve_data, to_batch_dict, init_state


def main(argv=None):
    parser = argparse.ArgumentParser()
    add_args(parser)
    parser.add_argument("--net", type=str, default="semi", choices=["semi", "joint"])
    parser.add_argument(
        "--disentangle", action="store_true",
        help="also run the disentanglement evaluation (env-code swap, prior "
             "decode, range-code invariance — evaluation/disentangle.py; "
             "semi net only)")
    args = parser.parse_args(argv)
    cfg = from_args(args)

    if args.net == "semi":
        from iinsvae_tpu.cli.train_semi import build_model

        model = build_model(cfg)
        model_path = semi_model_dir(cfg)
        result_path = semi_result_dir(cfg)
        eval_fn = evaluate_semi
    else:
        from iinsvae_tpu.cli.run import build_model

        model = build_model(cfg)
        model_path = joint_model_dir(cfg)
        result_path = joint_result_dir(cfg, test=True)
        eval_fn = evaluate_joint

    logger = setup_logging(result_path, "val_log.log")
    epoch = cfg.test_epoch or latest_epoch(model_path)
    if epoch is None or latest_epoch(model_path) is None:
        raise SystemExit(f"No saved models in {model_path}.")
    import os

    if not os.path.isdir(os.path.join(model_path, f"epoch_{epoch}")):
        epoch = latest_epoch(model_path)

    data_train, data_test = resolve_data(cfg)
    state = init_state(model, cfg)
    state = restore_checkpoint(model_path, epoch, state)
    test_batch = to_batch_dict(data_test, cfg.compute_dtype)
    eval_bs = min(500, test_batch["cir"].shape[0])

    m = eval_fn(
        model, state, test_batch, eval_bs,
        result_path=result_path, epoch=epoch,
        dataset_env=cfg.dataset_env, dataset_name=cfg.dataset_name,
        data_raw=(data_train, data_test), run_svm=True, make_plots=True,
    )
    logger.info(f"[test epoch {epoch}] " + " ".join(
        f"[{k}: {v:.6f}]" for k, v in m.items() if isinstance(v, float)))
    if args.disentangle:
        if args.net != "semi":
            raise SystemExit("--disentangle requires --net semi (the VAE path)")
        from iinsvae_tpu.evaluation.disentangle import evaluate_disentanglement

        dm = evaluate_disentanglement(
            model, state, test_batch, eval_bs,
            result_path=result_path, seed=cfg.seed,
        )
        logger.info("[disentangle] " + " ".join(
            f"[{k}: {v:.6f}]" for k, v in dm.items() if isinstance(v, float)))
        m["disentangle"] = dm
    return m


if __name__ == "__main__":
    main()
