"""jit-compiled train/eval steps.

Each builder closes over a model and returns a pure function
``step(state, batch, key) -> (state, metrics)`` suitable for jit, lax.scan,
and mesh sharding. Batches are dicts of device arrays:

    {"cir": (B, L), "err": (B, 1), "label": (B, 1), "weight": (B,)}

``weight`` carries padding masks so every batch has a static shape (the
reference's variable tail batches recompile / skew metrics; SURVEY.md §7
"dynamic-shape traps").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from iinsvae_tpu.training.losses import semi_loss, joint_loss
from iinsvae_tpu.training.state import TrainState


def _metrics(err_est, err, logits, label, weight):
    w = weight.reshape(-1)
    se = jnp.sum(((err_est - err).reshape(-1) ** 2) * w)
    ae = jnp.sum(jnp.abs(err_est - err).reshape(-1) * w)
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == label.reshape(-1).astype(pred.dtype)) * w)
    # count is the TRUE weight sum (an all-padding shard reports 0); clamping
    # happens only at division time (finalize_metrics / reduce_metrics)
    return {"se": se, "ae": ae, "correct": correct, "count": jnp.sum(w)}


# Metric-accumulation conventions shared by the shard_map DP step
# (parallel/shard.py) and the epoch scan (training/loop.py):
#   * SUM_KEYS are per-shard/per-batch SUMS — reduce by summation;
#   * every other key is a weighted MEAN whose denominator is the metric
#     named in MEAN_DENOMS (default 'count') — reduce as
#     sum(mean * denom) / sum(denom), which is exact under uneven padding
#     or supervision masks across shards/batches (mean-of-means is not);
#   * 'loss' mixes denominators in the semi objective (recon/KL over all
#     samples, res/env over the supervised subset) and is recomposed from
#     its exactly-reduced parts.
SUM_KEYS = ("se", "ae", "correct", "count", "sup_count")
MEAN_DENOMS = {"loss_res": "sup_count", "loss_env": "sup_count"}
_LOSS_PARTS = ("loss_ae", "loss_kl", "loss_res", "loss_env")


def reduce_metrics(metrics: dict, sum_fn: Callable) -> dict:
    """Exactly reduce per-shard / per-batch metric dicts to global values.

    ``sum_fn(v)`` must sum v across the reduction axis (``lax.psum`` over a
    mesh axis, ``jnp.sum`` over a scan axis)."""
    out = {}
    for k, v in metrics.items():
        if k in SUM_KEYS:
            out[k] = sum_fn(v)
    for k, v in metrics.items():
        if k in SUM_KEYS:
            continue
        d = MEAN_DENOMS.get(k, "count")
        if d in metrics:
            out[k] = sum_fn(v * metrics[d]) / jnp.maximum(out[d], 1.0)
        else:
            out[k] = sum_fn(v) / jnp.maximum(sum_fn(jnp.ones_like(v)), 1.0)
    if "loss" in out and all(p in out for p in _LOSS_PARTS):
        out["loss"] = sum(out[p] for p in _LOSS_PARTS)
    return out


def finalize_metrics(acc: dict) -> dict:
    """Accumulated sums -> epoch metrics (exact, not batch-mean-of-means)."""
    n = jnp.maximum(acc["count"], 1.0)
    out = {
        "rmse": jnp.sqrt(acc["se"] / n),
        "abs": acc["ae"] / n,
        "accuracy": acc["correct"] / n,
    }
    for k, v in acc.items():
        if k not in SUM_KEYS:
            out[k] = v
    return out


def make_semi_train_step(
    model,
    supervision_rate: float = 1.0,
    lambda_res: float = 10.0,
    mask_mode: str = "sample",
    kl_free_bits: float = 0.0,
) -> Callable:
    """Semi-supervised step on IInsVAE (reference train_semi.py:163-268).

    mask_mode:
      * 'sample' (default, the documented intent): per-sample
        Bernoulli(rate) labeled mask, drawn on device — no wasted batches.
      * 'batch': one Bernoulli(rate) draw per step masking the whole batch —
        the reference's literal per-batch semantics (train_semi.py:203),
        minus its np.random.randn bug (which made P(labeled)=Phi(rate)).
    The abandoned train_semi_old.py variant (one draw per RUN, loss terms
    multiplied by the constant mask, and a total that double-counts the KL
    while dropping the regression term, train_semi_old.py:115,210) is a
    defect, not a behavior — intentionally not replicated.
    """
    assert mask_mode in ("sample", "batch")
    grads_fn = make_semi_grads_fn(
        model, supervision_rate, lambda_res, mask_mode, kl_free_bits)

    def step(state: TrainState, batch: dict, key: jax.Array):
        grads, metrics, mut = grads_fn(state, batch, key)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mut.get("batch_stats", state.batch_stats))
        return state, metrics

    return step


def make_semi_grads_fn(
    model,
    supervision_rate: float = 1.0,
    lambda_res: float = 10.0,
    mask_mode: str = "sample",
    kl_free_bits: float = 0.0,
) -> Callable:
    """grads_fn(state, batch, key) -> (grads, metrics, mutated collections).

    The update-free half of the semi step, shared by the single-device jit
    step and the shard_map data-parallel step (parallel/shard.py), where
    grads are pmean'd across the mesh before the update.
    """

    def grads_fn(state: TrainState, batch: dict, key: jax.Array):
        k_mask, k_sample, k_drop = jax.random.split(key, 3)
        cir, err, label = batch["cir"], batch["err"], batch["label"]
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(cir.shape[0], cir.dtype)
        mask_shape = (cir.shape[0],) if mask_mode == "sample" else (1,)
        sup_mask = jnp.broadcast_to(
            jax.random.bernoulli(k_mask, supervision_rate, mask_shape),
            (cir.shape[0],),
        ).astype(cir.dtype)

        def loss_fn(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                cir,
                sample_key=k_sample,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            total, aux = semi_loss(
                out, cir, err, label, sup_mask, weight, lambda_res=lambda_res,
                kl_free_bits=kl_free_bits,
            )
            return total, (aux, mut, out)

        (loss, (aux, mut, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        metrics = _metrics(out["err_est"], err, out["logits"], label, weight)
        metrics.update(aux)
        # denominator of the supervised loss terms, for exact cross-shard /
        # cross-batch reduction of their weighted means (reduce_metrics)
        metrics["sup_count"] = jnp.sum(weight.reshape(-1) * sup_mask)
        return grads, metrics, mut

    return grads_fn


def make_semi_eval_step(model) -> Callable:
    def step(state: TrainState, batch: dict):
        cir, err, label = batch["cir"], batch["err"], batch["label"]
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(cir.shape[0], cir.dtype)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            cir,
            sample_key=None,
            train=False,
        )
        metrics = _metrics(out["err_est"], err, out["logits"], label, weight)
        return metrics, out

    return step


def make_joint_train_step(model) -> Callable:
    """Supervised joint step on EMNet/EMNetLoop (reference train.py:26-156)."""
    grads_fn = make_joint_grads_fn(model)

    def step(state: TrainState, batch: dict, key: jax.Array):
        grads, metrics, mut = grads_fn(state, batch, key)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mut.get("batch_stats", state.batch_stats))
        return state, metrics

    return step


def make_joint_grads_fn(model) -> Callable:
    """Update-free half of the joint step, shared by the single-device jit
    step and the shard_map DP step (parallel/shard.py) — mirrors
    make_semi_grads_fn."""

    def grads_fn(state: TrainState, batch: dict, key: jax.Array):
        cir, err, label = batch["cir"], batch["err"], batch["label"]
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(cir.shape[0], cir.dtype)

        def loss_fn(params):
            (label_est, env_latent, err_est), mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                cir,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            total, aux = joint_loss(label_est, err_est, err, label, weight)
            return total, (aux, mut, label_est, err_est)

        (loss, (aux, mut, label_est, err_est)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        metrics = _metrics(err_est, err, label_est, label, weight)
        metrics.update(aux)
        return grads, metrics, mut

    return grads_fn


def make_joint_eval_step(model) -> Callable:
    def step(state: TrainState, batch: dict):
        cir, err, label = batch["cir"], batch["err"], batch["label"]
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(cir.shape[0], cir.dtype)
        label_est, env_latent, err_est = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            cir,
            train=False,
        )
        metrics = _metrics(err_est, err, label_est, label, weight)
        return metrics, (label_est, env_latent, err_est)

    return step


def make_sep_e_train_step(model) -> Callable:
    """Identifier-only CE training (reference train.py:159-268)."""

    def step(state: TrainState, batch: dict, key: jax.Array):
        cir, label = batch["cir"], batch["label"]
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(cir.shape[0], cir.dtype)

        def loss_fn(params):
            (label_est, env_latent), mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                cir,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            from iinsvae_tpu.training.losses import cross_entropy

            loss = cross_entropy(label_est, label, weight)
            return loss, (mut, label_est)

        (loss, (mut, label_est)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mut.get("batch_stats", state.batch_stats))
        pred = jnp.argmax(label_est, axis=-1)
        w = weight.reshape(-1)
        metrics = {
            "loss": loss,
            "correct": jnp.sum((pred == label.reshape(-1).astype(pred.dtype)) * w),
            "count": jnp.sum(w),
        }
        return state, metrics

    return step


def make_sep_m_train_step(model) -> Callable:
    """Label-conditional regressor training (reference train.py:271-382)."""

    def step(state: TrainState, batch: dict, key: jax.Array):
        cir, err, label = batch["cir"], batch["err"], batch["label"]
        weight = batch.get("weight")
        if weight is None:
            weight = jnp.ones(cir.shape[0], cir.dtype)

        def loss_fn(params):
            err_est, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                cir,
                label,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            from iinsvae_tpu.training.losses import l1

            loss = l1(err_est, err, weight)
            return loss, (mut, err_est)

        (loss, (mut, err_est)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=mut.get("batch_stats", state.batch_stats))
        w = weight.reshape(-1)
        metrics = {
            "loss": loss,
            "se": jnp.sum(((err_est - err).reshape(-1) ** 2) * w),
            "ae": jnp.sum(jnp.abs(err_est - err).reshape(-1) * w),
            "count": jnp.sum(w),
        }
        return state, metrics

    return step


def sep_em_marginalized_inference(enet_state, mnet_state, cir, num_classes: int):
    """Two-stage soft inference p(dd|r) = sum_k p(k|r) p(dd|r, k)
    (reference test.py:282-289; softmax applied to the identifier logits —
    the reference uses raw logits as probabilities, a documented defect)."""
    label_est, env_latent = enet_state.apply_fn(
        {"params": enet_state.params, "batch_stats": enet_state.batch_stats},
        cir,
        train=False,
    )
    probs = jax.nn.softmax(label_est, axis=-1)
    ests = []
    for k in range(num_classes):
        lab = jnp.full((cir.shape[0], 1), float(k), cir.dtype)
        est_k = mnet_state.apply_fn(
            {"params": mnet_state.params, "batch_stats": mnet_state.batch_stats},
            cir,
            lab,
            train=False,
        )
        ests.append(est_k)
    err_est = sum(probs[:, k : k + 1] * ests[k] for k in range(num_classes))
    return label_est, env_latent, err_est
