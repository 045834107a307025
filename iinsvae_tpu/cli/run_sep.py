"""Separated two-stage driver (reference run_sep.py): train the identifier
(sep-E, CE only), then the label-conditional regressor (sep-M, L1 with GT
labels), then evaluate sep-E accuracy and the soft marginalized sep-EM
inference p(dd|r) = sum_k p(k|r) p(dd|r, k) (test.py:282-289)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from iinsvae_tpu.config import Config, parse
from iinsvae_tpu.models import IdentifierSep, RegressorSep
from iinsvae_tpu.training.steps import (
    make_sep_e_train_step,
    make_sep_m_train_step,
    sep_em_marginalized_inference,
)
from iinsvae_tpu.training.loop import pad_to_batches, make_epoch_runner
from iinsvae_tpu.training.checkpoint import sep_model_dir, save_checkpoint, restore_checkpoint
from iinsvae_tpu.evaluation.viz import save_cdf_comparison
from iinsvae_tpu.cli.common import (
    setup_logging,
    resolve_data,
    to_batch_dict,
    init_state,
    EpochLogger,
)


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse(argv)
    model_path = sep_model_dir(cfg)
    result_path = model_path.replace(cfg.model_dir, cfg.out_dir, 1)
    logger = setup_logging(result_path, "training_log_sep.log")
    logger.info(str(cfg.to_dict()))

    data_train, data_test = resolve_data(cfg)
    train = pad_to_batches(to_batch_dict(data_train, cfg.compute_dtype), cfg.batch_size)
    test_batch = to_batch_dict(data_test, cfg.compute_dtype)

    enet = IdentifierSep(
        cir_len=cfg.cir_len, num_classes=cfg.num_classes, env_dim=cfg.env_dim,
        filters=cfg.filters, enet_type=cfg.identifier_type,
        env_conv_init=cfg.env_conv_init,
    )
    mnet = RegressorSep(
        cir_len=cfg.cir_len, num_classes=cfg.num_classes, env_dim=cfg.env_dim,
        filters=cfg.filters, mnet_type=cfg.regressor_type,
    )
    steps_per_epoch = train["cir"].shape[0] // cfg.batch_size
    e_state = init_state(enet, cfg, steps_per_epoch=steps_per_epoch)
    m_state = init_state(mnet, cfg, extra_input=jnp.zeros((2, 1)),
                         steps_per_epoch=steps_per_epoch)
    if cfg.epoch != 0:
        e_state = restore_checkpoint(model_path, cfg.epoch, e_state, tag="ENet")
        m_state = restore_checkpoint(model_path, cfg.epoch, m_state, tag="MNet")

    key = jax.random.PRNGKey(cfg.seed)

    # ---- sep-E: identifier ----
    run_e = make_epoch_runner(make_sep_e_train_step(enet), cfg.batch_size)
    log_e = EpochLogger(logger, cfg.n_epochs, f"[Sep-E Identifier{cfg.identifier_type}]")
    for epoch in range(cfg.epoch, cfg.n_epochs):
        e_state, metrics = run_e(e_state, train, jax.random.fold_in(key, epoch))
        acc = float(metrics["correct"]) / float(metrics["count"])
        log_e(epoch, {"loss": float(metrics["loss"]), "accuracy": acc})
        if cfg.checkpoint_interval != -1 and epoch % cfg.checkpoint_interval == 0:
            save_checkpoint(model_path, epoch, e_state, tag="ENet")
    save_checkpoint(model_path, cfg.n_epochs, e_state, tag="ENet")

    # ---- sep-M: conditional regressor ----
    run_m = make_epoch_runner(make_sep_m_train_step(mnet), cfg.batch_size)
    log_m = EpochLogger(logger, cfg.n_epochs, f"[Sep-M Regressor{cfg.regressor_type}]")
    for epoch in range(cfg.epoch, cfg.n_epochs):
        m_state, metrics = run_m(m_state, train, jax.random.fold_in(key, 10_000 + epoch))
        n = float(metrics["count"])
        log_m(epoch, {
            "loss": float(metrics["loss"]),
            "rmse": float(np.sqrt(float(metrics["se"]) / n)),
            "abs": float(metrics["ae"]) / n,
        })
        if cfg.checkpoint_interval != -1 and epoch % cfg.checkpoint_interval == 0:
            save_checkpoint(model_path, epoch, m_state, tag="MNet")
    save_checkpoint(model_path, cfg.n_epochs, m_state, tag="MNet")

    # ---- sep-E eval + sep-EM soft marginalized inference ----
    cir = test_batch["cir"]
    err_gt = np.asarray(test_batch["err"])
    label_gt = np.asarray(test_batch["label"]).reshape(-1)

    infer = jax.jit(
        lambda es, ms, c: sep_em_marginalized_inference(es, ms, c, cfg.num_classes)
    )
    label_est, env_latent, err_est = infer(e_state, m_state, cir)
    label_est = np.asarray(label_est)
    err_est = np.asarray(err_est)

    accuracy = float(np.mean(np.argmax(label_est, axis=1) == label_gt))
    rmse = float(np.sqrt(np.mean((err_est - err_gt) ** 2)))
    abs_err = float(np.mean(np.abs(err_est - err_gt)))
    from iinsvae_tpu.evaluation.evaluate import add_plurality_share

    sep_metrics = add_plurality_share({"accuracy": accuracy}, label_gt)
    logger.info(
        f"[Sep-EM test] [accuracy: {accuracy:.6f}] [rmse: {rmse:.6f}] "
        f"[abs: {abs_err:.6f}] [plurality_share: {sep_metrics['plurality_share']:.6f}]"
    )

    # hard-assignment ablation: err = mnet(cir, argmax_k p(k|cir)) — the
    # comparison the soft marginalization (reference test.py:282-289) is
    # meant to beat
    hard_lab = jnp.asarray(np.argmax(label_est, axis=1), cir.dtype).reshape(-1, 1)
    err_hard = np.asarray(
        m_state.apply_fn(
            {"params": m_state.params, "batch_stats": m_state.batch_stats},
            cir, hard_lab, train=False,
        )
    )
    rmse_hard = float(np.sqrt(np.mean((err_hard - err_gt) ** 2)))
    logger.info(f"[Sep-EM hard-assignment] [rmse: {rmse_hard:.6f}]")

    res_em = np.abs(err_gt - err_est)
    from iinsvae_tpu.baseline.svm import svm_regressor

    res_svm, err_orig, svm_rmse, _ = svm_regressor(data_train, data_test)
    save_cdf_comparison(
        result_path,
        "CDF_%s_%s_sepEM.png" % (cfg.dataset_name, cfg.dataset_env),
        [(err_gt, "y"), (res_em, "purple"), (res_svm, "c")],
        ["Original error", "Our method", "SVM"],
    )
    return {"accuracy": accuracy, "rmse": rmse, "rmse_hard": rmse_hard,
            "abs": abs_err, "svm_rmse": svm_rmse}


if __name__ == "__main__":
    main()
