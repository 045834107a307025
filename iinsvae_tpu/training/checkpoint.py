"""Orbax checkpointing: params + optimizer state + batch stats + step.

The reference torch.saves module weights only, losing optimizer state on
resume (train_semi.py:281-286, SURVEY.md §5.4). Directory naming mirrors
the reference's hyperparameter-encoding scheme (run.py:77-82,
train_semi.py:87-88) so runs remain identifiable; files are orbax
checkpoints named ``epoch_N`` instead of ``*_N.pth``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp


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


def save_checkpoint(model_dir: str, epoch: int, state, tag: str = "") -> str:
    path = _ckpt_path(model_dir, epoch, tag)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _state_payload(jax.device_get(state)), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(model_dir: str, epoch: int, state, tag: str = ""):
    """Restore into the structure of ``state`` (a freshly created one)."""
    path = _ckpt_path(model_dir, epoch, tag)
    ckptr = ocp.StandardCheckpointer()
    template = jax.tree.map(ocp.utils.to_shape_dtype_struct, _state_payload(state)) \
        if hasattr(ocp.utils, "to_shape_dtype_struct") else _state_payload(state)
    restored = ckptr.restore(path, template)
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
