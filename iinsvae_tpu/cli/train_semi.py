"""Semi-supervised training driver (reference train_semi.py).

CLI-compatible: the reference's flags plus the drifted aliases all parse
(config.py). The whole epoch runs as one jit (training/loop.py); the
supervision mask is per-sample Bernoulli(supervision_rate) on device.
"""

from __future__ import annotations

import jax

from iinsvae_tpu.config import Config, parse
from iinsvae_tpu.models import IInsVAE
from iinsvae_tpu.training.steps import make_semi_train_step, finalize_metrics
from iinsvae_tpu.training.loop import pad_to_batches, make_epoch_runner
from iinsvae_tpu.training.checkpoint import (
    semi_model_dir,
    semi_result_dir,
    save_checkpoint,
    restore_checkpoint,
    gc_checkpoints,
    update_best,
)
from iinsvae_tpu.evaluation.evaluate import evaluate_semi
from iinsvae_tpu.cli.common import (
    setup_logging,
    resolve_data,
    to_batch_dict,
    init_state,
    EpochLogger,
)


def build_model(cfg: Config) -> IInsVAE:
    return IInsVAE(
        conv_type=cfg.conv_type,
        dim=cfg.dim,
        n_residual=cfg.n_residual,
        n_downsample=cfg.n_downsample,
        style_dim=cfg.env_dim,
        range_dim=cfg.range_dim,
        cir_len=cfg.cir_len,
        num_classes=cfg.num_classes,
        restorer_type=cfg.restorer_type,
        classifier_type=cfg.classifier_type,
        soft=cfg.use_soft,
        expand=cfg.expand,
        env_conv_init=cfg.env_conv_init,
    )


def main(argv=None, cfg: Config | None = None):
    cfg = cfg or parse(argv)
    # multi-host: join the cluster BEFORE anything touches the jax backend
    from iinsvae_tpu.parallel import multihost as mh

    distributed = mh.init_distributed(
        cfg.dist_coordinator, cfg.dist_procs, cfg.dist_rank
    )
    primary = mh.is_primary() if distributed else True
    model_path = semi_model_dir(cfg)
    result_path = semi_result_dir(cfg)
    log_name = "train_log.log" if primary else f"train_log.rank{cfg.dist_rank}.log"
    logger = setup_logging(result_path, log_name)
    logger.info(str(cfg.to_dict()))

    data_train, data_test = resolve_data(cfg)
    train = pad_to_batches(to_batch_dict(data_train, cfg.compute_dtype), cfg.batch_size)
    steps_per_epoch = train["cir"].shape[0] // cfg.batch_size

    model = build_model(cfg)
    state = init_state(model, cfg, steps_per_epoch=steps_per_epoch)
    start_epoch = cfg.epoch
    if cfg.epoch == -1:  # auto-resume from the latest checkpoint
        from iinsvae_tpu.training.checkpoint import latest_epoch

        start_epoch = latest_epoch(model_path) or 0
        cfg.epoch = start_epoch
    if cfg.epoch != 0:
        state = restore_checkpoint(model_path, cfg.epoch, state)
        logger.info(f"resumed from epoch {cfg.epoch}")

    if distributed:
        # multi-host DP over every process's devices (parallel/multihost.py):
        # batches column-sharded over the global 'data' axis so scan steps
        # never reshard rows across hosts; per-shard epoch shuffle; the
        # gradient pmean is the only DCN collective
        from iinsvae_tpu.training.steps import make_semi_grads_fn

        state, train, run_epoch = mh.make_mh_training(
            mh.make_global_mesh(),
            make_semi_grads_fn(model, cfg.supervision_rate, mask_mode=cfg.mask_mode,
                               kl_free_bits=cfg.kl_free_bits),
            state, train, cfg.batch_size,
        )
        logger.info(
            f"[parallel] multi-host DP: {cfg.dist_procs} processes x "
            f"{jax.local_device_count()} devices (rank {jax.process_index()})"
        )
    elif cfg.n_devices > 1:
        # shard_map DP: batch sharded over a 1-axis mesh, params replicated,
        # grads pmean'd — composed inside the whole-epoch scan
        # (tests/test_parallel.py::test_epoch_runner_composes_with_dp_step)
        from iinsvae_tpu.parallel.mesh import make_mesh
        from iinsvae_tpu.parallel.shard import make_dp_train_step, place_dp
        from iinsvae_tpu.training.steps import make_semi_grads_fn

        mesh = make_mesh(
            n_data=cfg.n_devices, n_model=1,
            devices=jax.devices()[: cfg.n_devices],
        )
        train_step = make_dp_train_step(
            make_semi_grads_fn(
                model, cfg.supervision_rate, mask_mode=cfg.mask_mode,
                kl_free_bits=cfg.kl_free_bits,
            ),
            mesh, jit=False,
        )
        state, train = place_dp(mesh, state, train)
        logger.info(f"[parallel] shard_map DP over {cfg.n_devices} devices")
    else:
        train_step = make_semi_train_step(
            model, supervision_rate=cfg.supervision_rate, mask_mode=cfg.mask_mode,
            kl_free_bits=cfg.kl_free_bits,
        )
    if not distributed:
        run_epoch = make_epoch_runner(train_step, cfg.batch_size)

    epoch_log = EpochLogger(
        logger, cfg.n_epochs,
        f"[Model: C{cfg.conv_type}_{cfg.restorer_type}_semi{cfg.supervision_rate}]",
    )
    key = jax.random.PRNGKey(cfg.seed)

    test_batch = to_batch_dict(data_test, cfg.compute_dtype)
    eval_bs = min(500, test_batch["cir"].shape[0])

    from iinsvae_tpu.utils.profiling import profile_trace

    final_state = state
    with profile_trace(cfg.profile_dir or None):
        for epoch in range(cfg.epoch, cfg.n_epochs):
            final_state, metrics = run_epoch(final_state, train, jax.random.fold_in(key, epoch))
            epoch_log(epoch, jax.tree.map(float, finalize_metrics(metrics)))
            if (
                primary
                and cfg.checkpoint_interval != -1
                and epoch % cfg.checkpoint_interval == 0
            ):
                save_checkpoint(model_path, epoch, final_state)
                gc_checkpoints(model_path, cfg.keep_last)
            if (
                primary
                and cfg.sample_interval
                and epoch % cfg.sample_interval == 0
                and epoch > 0
            ):
                m = evaluate_semi(
                    model,
                    mh.localize(final_state) if distributed else final_state,
                    test_batch, eval_bs,
                    result_path=result_path, epoch=epoch,
                    dataset_env=cfg.dataset_env, dataset_name=cfg.dataset_name,
                )
                logger.info(f"[val epoch {epoch}] " + " ".join(
                    f"[{k}: {v:.6f}]" for k, v in m.items() if isinstance(v, float)))
                # best-model tracking keyed on validation range-RMSE
                if update_best(model_path, epoch, m["rmse"]):
                    save_checkpoint(model_path, epoch, final_state)
                    logger.info(f"[best epoch {epoch}] rmse {m['rmse']:.6f}")

    if not primary:
        # non-primary hosts hold identical replicated params; checkpoints
        # and artifacts are the primary's job. Wait for the primary's final
        # eval so the coordinator (process 0) outlives every worker.
        local_state = mh.localize(final_state)
        mh.barrier("train_semi_end")
        return local_state, {}
    save_checkpoint(model_path, cfg.n_epochs, final_state)
    gc_checkpoints(model_path, cfg.keep_last)
    if distributed:
        final_state = mh.localize(final_state)
    m = evaluate_semi(
        model, final_state, test_batch, eval_bs,
        result_path=result_path, epoch=cfg.n_epochs,
        dataset_env=cfg.dataset_env, dataset_name=cfg.dataset_name,
        data_raw=(data_train, data_test), run_svm=True, make_plots=True,
    )
    logger.info("[final] " + " ".join(
        f"[{k}: {v:.6f}]" for k, v in m.items() if isinstance(v, float)))
    if distributed:
        mh.barrier("train_semi_end")
    return final_state, m


if __name__ == "__main__":
    main()
