"""Supervised joint training + test driver (reference run.py).

Builds EMNet ('loop') or EMNetLoop ('loops') per --net_ablation
(run.py:58-74), trains with CE + L1 (train.py:26-156), evaluates with the
test_gem pipeline including SVM comparison (test.py:26-146).
"""

from __future__ import annotations

import jax

from iinsvae_tpu.config import Config, parse
from iinsvae_tpu.models import EMNet, EMNetLoop
from iinsvae_tpu.training.steps import make_joint_train_step, finalize_metrics
from iinsvae_tpu.training.loop import pad_to_batches, make_epoch_runner
from iinsvae_tpu.training.checkpoint import (
    joint_model_dir,
    joint_result_dir,
    save_checkpoint,
    restore_checkpoint,
)
from iinsvae_tpu.evaluation.evaluate import evaluate_joint
from iinsvae_tpu.cli.common import (
    setup_logging,
    resolve_data,
    to_batch_dict,
    init_state,
    EpochLogger,
)


def build_model(cfg: Config):
    cls = {"loop": EMNet, "loops": EMNetLoop}.get(cfg.net_ablation)
    if cls is None:
        raise ValueError("Unknown network arrangement, choices: loop, loops.")
    return cls(
        cir_len=cfg.cir_len,
        num_classes=cfg.num_classes,
        env_dim=cfg.env_dim,
        filters=cfg.filters,
        enet_type=cfg.identifier_type,
        mnet_type=cfg.regressor_type,
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
    model_path = joint_model_dir(cfg)
    train_path = joint_result_dir(cfg)
    test_path = joint_result_dir(cfg, test=True)
    log_name = "training_log.log" if primary else f"training_log.rank{cfg.dist_rank}.log"
    logger = setup_logging(train_path, log_name)
    logger.info(str(cfg.to_dict()))

    data_train, data_test = resolve_data(cfg)
    train = pad_to_batches(to_batch_dict(data_train, cfg.compute_dtype), cfg.batch_size)
    steps_per_epoch = train["cir"].shape[0] // cfg.batch_size

    model = build_model(cfg)
    # steps_per_epoch sizes the LambdaLR decay (stepped per OPTIMIZER step);
    # omitting it made the schedule decay per step instead of per epoch and
    # (pre-clamp) drove the LR negative mid-run
    state = init_state(model, cfg, steps_per_epoch=steps_per_epoch)
    if cfg.epoch != 0:
        state = restore_checkpoint(model_path, cfg.epoch, state)

    if distributed:
        # multi-host DP (parallel/multihost.py): column-sharded epoch
        # batches, only the gradient pmean crosses DCN
        from iinsvae_tpu.training.steps import make_joint_grads_fn

        state, train, run_epoch = mh.make_mh_training(
            mh.make_global_mesh(), make_joint_grads_fn(model),
            state, train, cfg.batch_size,
        )
        logger.info(
            f"[parallel] multi-host DP: {cfg.dist_procs} processes x "
            f"{jax.local_device_count()} devices (rank {jax.process_index()})"
        )
    elif cfg.n_devices > 1:
        from iinsvae_tpu.parallel.mesh import make_mesh
        from iinsvae_tpu.parallel.shard import make_dp_train_step, place_dp
        from iinsvae_tpu.training.steps import make_joint_grads_fn

        mesh = make_mesh(
            n_data=cfg.n_devices, n_model=1,
            devices=jax.devices()[: cfg.n_devices],
        )
        train_step = make_dp_train_step(make_joint_grads_fn(model), mesh, jit=False)
        state, train = place_dp(mesh, state, train)
        logger.info(f"[parallel] shard_map DP over {cfg.n_devices} devices")
    else:
        train_step = make_joint_train_step(model)
    if not distributed:
        run_epoch = make_epoch_runner(train_step, cfg.batch_size)
    epoch_log = EpochLogger(
        logger, cfg.n_epochs,
        f"[Data Env: {cfg.dataset_env}] "
        f"[Identifier{cfg.identifier_type}_Regressor{cfg.regressor_type}]",
    )
    key = jax.random.PRNGKey(cfg.seed)
    test_batch = to_batch_dict(data_test, cfg.compute_dtype)
    eval_bs = min(500, test_batch["cir"].shape[0])

    for epoch in range(cfg.epoch, cfg.n_epochs):
        state, metrics = run_epoch(state, train, jax.random.fold_in(key, epoch))
        epoch_log(epoch, jax.tree.map(float, finalize_metrics(metrics)))
        if (
            primary
            and cfg.checkpoint_interval != -1
            and epoch % cfg.checkpoint_interval == 0
        ):
            save_checkpoint(model_path, epoch, state)
        if (
            primary
            and cfg.sample_interval
            and epoch % cfg.sample_interval == 0
            and epoch > 0
        ):
            m = evaluate_joint(
                model,
                mh.localize(state) if distributed else state,
                test_batch, eval_bs,
                result_path=train_path, epoch=epoch,
                dataset_env=cfg.dataset_env, dataset_name=cfg.dataset_name,
            )
            logger.info(f"[val epoch {epoch}] " + " ".join(
                f"[{k}: {v:.6f}]" for k, v in m.items() if isinstance(v, float)))

    if not primary:
        # non-primary hosts hold identical replicated params; checkpoints
        # and artifacts are the primary's job
        local_state = mh.localize(state)
        mh.barrier("run_end")
        return local_state, {}
    save_checkpoint(model_path, cfg.n_epochs, state)
    if distributed:
        state = mh.localize(state)
    m = evaluate_joint(
        model, state, test_batch, eval_bs,
        result_path=test_path, epoch=cfg.n_epochs,
        dataset_env=cfg.dataset_env, dataset_name=cfg.dataset_name,
        data_raw=(data_train, data_test), run_svm=True, make_plots=True,
    )
    logger.info("[test] " + " ".join(
        f"[{k}: {v:.6f}]" for k, v in m.items() if isinstance(v, float)))
    if distributed:
        mh.barrier("run_end")
    return state, m


if __name__ == "__main__":
    main()
