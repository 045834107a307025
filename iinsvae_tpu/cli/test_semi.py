"""Supervision-rate sweep evaluation (reference test_semi.py).

Loads (Enc, Res) checkpoints trained at rates 0.1...1.0 and draws the CDF
comparison across rates — the reference calls a ``CDF_plot_semi_test`` that
does not exist anywhere (test_semi.py:203); this is its implementation.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from iinsvae_tpu.config import Config, parse
from iinsvae_tpu.training.checkpoint import semi_model_dir, restore_checkpoint, latest_epoch
from iinsvae_tpu.training.loop import pad_to_batches, make_evaluator
from iinsvae_tpu.training.steps import make_semi_eval_step
from iinsvae_tpu.evaluation.viz import save_cdf_comparison
from iinsvae_tpu.cli.common import setup_logging, resolve_data, to_batch_dict, init_state
from iinsvae_tpu.cli.train_semi import build_model

RATES = (0.1, 0.2, 0.4, 0.6, 0.8, 1.0)
COLORS = ("tab:blue", "tab:orange", "tab:green", "tab:red", "tab:purple", "tab:brown")


def cdf_plot_semi_test(result_path, name, err_gt_arr, per_rate_residuals):
    curves = [(err_gt_arr, "y")]
    legends = ["Original error"]
    for (rate, res), color in zip(per_rate_residuals, COLORS):
        curves.append((res, color))
        legends.append(f"semi {rate:g}")
    return save_cdf_comparison(result_path, name, curves, legends)


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse(argv)
    test_path = os.path.join(cfg.out_dir + "_semi", "test_compare")
    logger = setup_logging(test_path, "test_log_semi_compare.log")

    _, data_test = resolve_data(cfg)
    test_batch = to_batch_dict(data_test, cfg.compute_dtype)
    eval_bs = min(500, test_batch["cir"].shape[0])
    padded = pad_to_batches(test_batch, eval_bs)
    model = build_model(cfg)
    evaluate = make_evaluator(make_semi_eval_step(model), eval_bs)

    err_gt = np.asarray(test_batch["err"])
    n = err_gt.shape[0]
    per_rate = []
    for rate in RATES:
        rate_cfg = dataclasses.replace(cfg, supervision_rate=rate)
        model_path = semi_model_dir(rate_cfg)
        epoch = cfg.test_epoch if cfg.test_epoch else latest_epoch(model_path)
        state = init_state(model, cfg)
        try:
            if latest_epoch(model_path) is None:
                raise FileNotFoundError(model_path)
            if epoch is not None and not os.path.isdir(
                os.path.join(model_path, f"epoch_{epoch}")
            ):
                epoch = latest_epoch(model_path)
            state = restore_checkpoint(model_path, epoch, state)
        except FileNotFoundError:
            logger.info(f"[semi {rate}] no checkpoint under {model_path}; skipped")
            continue
        metrics, outs = evaluate(state, padded)
        err_est = np.asarray(outs["err_est"]).reshape(-1, 1)[:n]
        res = np.abs(err_gt - err_est)
        rmse = float(np.sqrt(np.mean(res**2)))
        logger.info(f"[semi {rate}] [epoch {epoch}] [rmse {rmse:.6f}]")
        per_rate.append((rate, res))

    if per_rate:
        out = cdf_plot_semi_test(
            test_path,
            "CDF_semi_compare_%s_%s.png" % (cfg.dataset_name, cfg.dataset_env),
            err_gt,
            per_rate,
        )
        logger.info(f"wrote {out}")
    return per_rate


if __name__ == "__main__":
    main()
