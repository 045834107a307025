"""Evaluation drivers: metrics + artifacts (reference test.py:26-350).

Produces, per reference test_gem:
  * range RMSE / mean-abs-error / env accuracy over the held-out split
  * latent scatter PNG (reduced ONCE after collection, SURVEY.md §3.3)
  * residual CDF comparison vs the SVM baseline
  * residual exports: .mat (scipy.io, as the reference) and .npz
"""

from __future__ import annotations

import os

import numpy as np
import jax

from iinsvae_tpu.training.loop import pad_to_batches, make_evaluator
from iinsvae_tpu.training.steps import make_semi_eval_step, make_joint_eval_step
from iinsvae_tpu.evaluation.viz import (
    reduce_latents,
    visualize_latents,
    visualize_recon,
    save_cdf_comparison,
)


def _unpad(arr_batched: np.ndarray, weight_batched: np.ndarray) -> np.ndarray:
    """(nb, B, ...) stacked outputs -> (N, ...) real samples only."""
    arr = np.asarray(arr_batched)
    flat = arr.reshape((-1,) + arr.shape[2:])
    w = np.asarray(weight_batched).reshape(-1) > 0
    return flat[w]


def add_plurality_share(metrics: dict, label_gt: np.ndarray) -> dict:
    """Report the majority-class share of the test labels next to accuracy,
    and flag a degenerate env head (accuracy == plurality share means the
    classifier learned nothing — the round-4 paper-mode runs all landed
    exactly there and nothing in the output said so; VERDICT round-4
    weak 6)."""
    labels = np.asarray(label_gt).astype(int).ravel()
    counts = np.bincount(labels, minlength=1)
    share = float(counts.max()) / max(1, counts.sum())
    metrics["plurality_share"] = share
    acc = metrics.get("accuracy")
    if acc is not None and acc <= share + 0.005:
        metrics["env_head_degenerate"] = 1.0
        import logging

        logging.getLogger(__name__).warning(
            "env accuracy %.4f <= plurality-class share %.4f: the env head "
            "is predicting (at most) the majority class — degenerate result",
            acc, share,
        )
    return metrics


def export_residuals(result_path: str, tag: str, res_em, res_svm, original):
    os.makedirs(result_path, exist_ok=True)
    import scipy.io as sio

    sio.savemat(os.path.join(result_path, f"residual_em_{tag}.mat"), {"residual_em": res_em})
    sio.savemat(os.path.join(result_path, f"residual_svm_{tag}.mat"), {"residual_em": res_svm})
    sio.savemat(os.path.join(result_path, f"original_{tag}.mat"), {"residual_em": original})
    np.savez(
        os.path.join(result_path, f"residuals_{tag}.npz"),
        residual_em=res_em, residual_svm=res_svm, original=original,
    )


def evaluate_semi(
    model,
    state,
    data_test: dict,
    batch_size: int = 500,
    result_path: str | None = None,
    epoch: int = 0,
    dataset_env: str = "room_full",
    dataset_name: str = "zenodo",
    data_raw=None,
    run_svm: bool = False,
    make_plots: bool = False,
):
    """Full eval of the IInsVAE path. Returns a metrics dict."""
    padded = pad_to_batches(data_test, batch_size)
    evaluate = make_evaluator(make_semi_eval_step(model), batch_size)
    metrics, outs = evaluate(state, padded)
    metrics = jax.tree.map(float, metrics)

    w = padded["weight"].reshape(-1, batch_size)
    err_gt = _unpad(padded["err"].reshape(-1, batch_size, 1), w)
    err_est = _unpad(outs["err_est"], w)
    label_gt = _unpad(padded["label"].reshape(-1, batch_size, 1), w)
    env_codes = _unpad(outs["env_code"], w)
    res_em = np.abs(err_gt - err_est)
    add_plurality_share(metrics, label_gt)

    artifacts = {}
    if result_path is not None and make_plots:
        feats2d, reducer = reduce_latents(env_codes)
        artifacts["latents_png"] = visualize_latents(
            feats2d, label_gt, result_path, epoch, dataset_env, method=reducer
        )
        cir_gt = _unpad(padded["cir"].reshape(-1, batch_size, padded["cir"].shape[-1]), w)
        recon = _unpad(outs["recon"], w)
        artifacts["recon_png"] = visualize_recon(cir_gt, recon, result_path, epoch)

    if run_svm and data_raw is not None:
        _svm_comparison(
            metrics, artifacts, err_gt, res_em, data_raw,
            result_path, epoch, dataset_env, dataset_name, make_plots,
        )

    metrics["artifacts"] = artifacts
    return metrics


def _svm_comparison(
    metrics, artifacts, err_gt, res_em, data_raw,
    result_path, epoch, dataset_env, dataset_name, make_plots,
):
    """Shared SVM-baseline comparison + CDF + residual exports
    (reference test.py:128-146)."""
    from iinsvae_tpu.baseline.svm import svm_regressor, svm_classifier

    data_train_raw, data_test_raw = data_raw
    res_svm, _err_orig, svm_rmse, _ = svm_regressor(data_train_raw, data_test_raw)
    svm_acc, _, _ = svm_classifier(data_train_raw, data_test_raw)
    metrics["svm_rmse"] = svm_rmse
    metrics["svm_accuracy"] = svm_acc
    if result_path is not None and make_plots:
        artifacts["cdf_png"] = save_cdf_comparison(
            result_path,
            "CDF_%s_%s_%d.png" % (dataset_name, dataset_env, epoch),
            [(err_gt, "y"), (res_em, "purple"), (res_svm, "c")],
            ["Original error", "Our method", "SVM"],
        )
    if result_path is not None:
        export_residuals(
            result_path,
            "%s_%s_%d" % (dataset_name, dataset_env, epoch),
            res_em, res_svm, err_gt,
        )


def evaluate_joint(
    model,
    state,
    data_test: dict,
    batch_size: int = 500,
    result_path: str | None = None,
    epoch: int = 0,
    dataset_env: str = "nlos",
    dataset_name: str = "zenodo",
    data_raw=None,
    run_svm: bool = False,
    make_plots: bool = False,
):
    """Eval of the supervised joint EMNet path (reference test_gem)."""
    padded = pad_to_batches(data_test, batch_size)
    evaluate = make_evaluator(make_joint_eval_step(model), batch_size)
    metrics, (label_est, env_latent, err_est) = evaluate(state, padded)
    metrics = jax.tree.map(float, metrics)

    w = padded["weight"].reshape(-1, batch_size)
    err_gt = _unpad(padded["err"].reshape(-1, batch_size, 1), w)
    est = _unpad(err_est, w)
    label_gt = _unpad(padded["label"].reshape(-1, batch_size, 1), w)
    latents = _unpad(env_latent, w)
    res_em = np.abs(err_gt - est)
    add_plurality_share(metrics, label_gt)

    artifacts = {}
    if result_path is not None and make_plots:
        feats2d, reducer = reduce_latents(latents)
        artifacts["latents_png"] = visualize_latents(
            feats2d, label_gt, result_path, epoch, dataset_env, method=reducer
        )
    if run_svm and data_raw is not None:
        _svm_comparison(
            metrics, artifacts, err_gt, res_em, data_raw,
            result_path, epoch, dataset_env, dataset_name, make_plots,
        )
    metrics["artifacts"] = artifacts
    return metrics
