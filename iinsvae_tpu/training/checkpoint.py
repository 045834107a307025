"""Orbax checkpointing: params + optimizer state + batch stats + step.

The reference torch.saves module weights only, losing optimizer state on
resume (train_semi.py:281-286, SURVEY.md §5.4). Directory naming mirrors
the reference's hyperparameter-encoding scheme (run.py:77-82,
train_semi.py:87-88) so runs remain identifiable; files are orbax
checkpoints named ``epoch_N`` instead of ``*_N.pth``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def semi_model_dir(cfg) -> str:
    # mirrors train_semi.py:87
    return os.path.join(
        cfg.model_dir,
        "%s_mode_%s" % (cfg.dataset_env, cfg.mode),
        "SEMI%f_AE%d_Res%s_Cls%s_Rdim%dEdim%d"
        % (
            cfg.supervision_rate,
            cfg.conv_type,
            cfg.restorer_type,
            cfg.classifier_type,
            cfg.range_dim,
            cfg.env_dim,
        ),
    )


def semi_result_dir(cfg) -> str:
    return semi_model_dir(cfg).replace(cfg.model_dir, cfg.out_dir, 1)


def joint_model_dir(cfg) -> str:
    # mirrors run.py:77
    return os.path.join(
        cfg.model_dir + "_" + cfg.net_ablation,
        "data_%s_%s_mode_%s" % (cfg.dataset_name, cfg.dataset_env, cfg.mode),
        "enet%s_mnet%s" % (cfg.identifier_type, cfg.regressor_type),
    )


def joint_result_dir(cfg, test: bool = False) -> str:
    base = cfg.out_dir + "_" + cfg.net_ablation
    mid = ("test",) if test else ()
    return os.path.join(
        base, *mid,
        "data_%s_%s_mode_%s" % (cfg.dataset_name, cfg.dataset_env, cfg.mode),
        "enet%s_mnet%s" % (cfg.identifier_type, cfg.regressor_type),
    )


def sep_model_dir(cfg) -> str:
    # mirrors run_sep.py:62
    return os.path.join(
        cfg.model_dir + "_sep",
        "data_%s_%s_mode_%s" % (cfg.dataset_name, cfg.dataset_env, cfg.mode),
        "enet%s_mnet%s" % (cfg.identifier_type, cfg.regressor_type),
    )


def _ckpt_path(model_dir: str, epoch: int, tag: str = "") -> str:
    name = f"{tag}_epoch_{epoch}" if tag else f"epoch_{epoch}"
    return os.path.abspath(os.path.join(model_dir, name))


def _state_payload(state) -> dict:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def _checkpointer() -> ocp.StandardCheckpointer:
    """A StandardCheckpointer whose barriers never cross processes.

    Checkpoints here are always host-local numpy (``jax.device_get`` of a
    replicated state), written by the primary only (parallel/multihost.py
    gates the call sites). Under ``jax.distributed`` the default orbax
    barriers are GLOBAL — a primary-only save would deadlock/mismatch the
    other ranks' collectives — so scope orbax to this process alone.
    """
    if jax.process_count() > 1:
        me = jax.process_index()
        return ocp.StandardCheckpointer(
            multiprocessing_options=ocp.options.MultiprocessingOptions(
                primary_host=me, active_processes={me},
                barrier_sync_key_prefix=f"proc{me}",
            )
        )
    return ocp.StandardCheckpointer()


def save_checkpoint(model_dir: str, epoch: int, state, tag: str = "") -> str:
    path = _ckpt_path(model_dir, epoch, tag)
    ckptr = _checkpointer()
    ckptr.save(path, _state_payload(jax.device_get(state)), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(model_dir: str, epoch: int, state, tag: str = "",
                       migrate="auto"):
    """Restore into the structure of ``state`` (a freshly created one).

    ``migrate`` handles pre-rename checkpoints (ROADMAP.md item 0: the
    round-2/3 ``Dense_N/kernel`` -> ``w{j}`` etc. refactors) by mapping
    the old param tree onto the current names (training/migrate.py):
    ``True`` forces the migration path, ``False`` is strict-only, and the
    default ``"auto"`` tries the strict restore first and falls back to
    migration when the on-disk tree does not match — so every CLI resume
    and ``Predictor.from_checkpoint`` transparently accepts old-format
    checkpoints. The optimizer state is NOT migrated — it is keyed to the
    old tree — so a migrated state keeps its freshly initialized
    ``opt_state``; step and params (and batch stats, when present) carry
    over.
    """
    path = _ckpt_path(model_dir, epoch, tag)
    ckptr = _checkpointer()

    def _migrated():
        from iinsvae_tpu.training.migrate import migrate_params

        raw = ckptr.restore(path)
        params = migrate_params(raw["params"], state.params)
        batch_stats = state.batch_stats
        if raw.get("batch_stats") and jax.tree.leaves(state.batch_stats):
            batch_stats = migrate_params(raw["batch_stats"], state.batch_stats)
        # The old opt_state is keyed to the old tree and cannot be migrated,
        # so moments restart fresh — but the optax count MUST carry over:
        # the LambdaLR schedule reads it (optim.py:27), and the resume path
        # (cli/common.py init_state) keeps its offset at 0 precisely
        # because restore normally restores the count. A zero count would
        # silently resume a migrated epoch-N run at the undecayed epoch-0
        # LR (round-4 advisor finding).
        opt_state = state.opt_state
        try:
            import optax.tree_utils as otu

            opt_state = otu.tree_set(
                opt_state, count=jnp.asarray(raw["step"], jnp.int32)
            )
        except Exception:
            logger.warning(
                "migrated restore: could not seed the optimizer count; the "
                "LR schedule will restart from epoch 0"
            )
        return state.replace(
            step=raw["step"], params=params, batch_stats=batch_stats,
            opt_state=opt_state,
        )

    if migrate is True:
        return _migrated()
    try:
        template = jax.tree.map(ocp.utils.to_shape_dtype_struct, _state_payload(state)) \
            if hasattr(ocp.utils, "to_shape_dtype_struct") else _state_payload(state)
        restored = ckptr.restore(path, template)
    except Exception as strict_err:
        if migrate != "auto" or not os.path.exists(path):
            raise
        try:
            out = _migrated()
        except Exception:
            # the strict failure was NOT a pre-rename tree (corruption,
            # version mismatch, wrong model config, ...) — surface the
            # ORIGINAL error, not a misleading migration report
            raise strict_err
        # module logger, not print: under jax.distributed every rank
        # restores, and embedders (serving Predictor.from_checkpoint) need
        # this routed/capturable like the rest of the training logs
        logger.warning(
            "%s: pre-rename param tree detected -> migrated "
            "(training/migrate.py); optimizer moments reset, LR-schedule "
            "count carried over", path,
        )
        return out
    return state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )


def latest_epoch(model_dir: str, tag: str = "") -> Optional[int]:
    prefix = f"{tag}_epoch_" if tag else "epoch_"
    if not os.path.isdir(model_dir):
        return None
    epochs = [
        int(d[len(prefix):])
        for d in os.listdir(model_dir)
        if d.startswith(prefix) and d[len(prefix):].isdigit()
    ]
    return max(epochs) if epochs else None


def list_epochs(model_dir: str, tag: str = "") -> list:
    prefix = f"{tag}_epoch_" if tag else "epoch_"
    if not os.path.isdir(model_dir):
        return []
    return sorted(
        int(d[len(prefix):])
        for d in os.listdir(model_dir)
        if d.startswith(prefix) and d[len(prefix):].isdigit()
    )


# --------------------- retention + best tracking ---------------------
#
# The reference keeps every Nth-epoch .pth forever and has no notion of a
# best model (train_semi.py:281-286). Here: keep-last-N GC plus an atomic
# ``best.json`` pointer {epoch, metric} updated on validation RMSE — the
# pointer is swapped with os.replace so a crash never leaves a torn alias,
# and GC never deletes the pointed-at epoch.

_BEST_FILE = "best.json"


def best_epoch(model_dir: str) -> Optional[dict]:
    """{'epoch': int, 'metric': float} for the current best, or None."""
    import json

    path = os.path.join(model_dir, _BEST_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def update_best(model_dir: str, epoch: int, metric: float) -> bool:
    """Atomically point ``best`` at ``epoch`` when ``metric`` improves
    (lower is better, e.g. val RMSE). Returns True on a new best."""
    import json

    cur = best_epoch(model_dir)
    if cur is not None and cur["metric"] <= metric:
        return False
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, _BEST_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": int(epoch), "metric": float(metric)}, f)
    os.replace(tmp, path)
    return True


def restore_best(model_dir: str, state, tag: str = ""):
    """Restore the best-pointed checkpoint; raises FileNotFoundError when
    no best has been recorded."""
    best = best_epoch(model_dir)
    if best is None:
        raise FileNotFoundError(f"no {_BEST_FILE} under {model_dir}")
    return restore_checkpoint(model_dir, best["epoch"], state, tag=tag)


def gc_checkpoints(model_dir: str, keep_last: int, tag: str = "") -> list:
    """Delete all but the newest ``keep_last`` epoch checkpoints (and never
    the best-pointed epoch). keep_last <= 0 keeps everything (the
    reference's behavior). Returns the removed epochs."""
    import shutil

    if keep_last <= 0:
        return []
    epochs = list_epochs(model_dir, tag)
    protect = set(epochs[-keep_last:])
    best = best_epoch(model_dir)
    if best is not None:
        protect.add(best["epoch"])
    removed = []
    for e in epochs:
        if e not in protect:
            shutil.rmtree(_ckpt_path(model_dir, e, tag), ignore_errors=True)
            removed.append(e)
    return removed
