"""Loss terms for the supervised joint and semi-supervised objectives.

Semantics (intent, with reference defects resolved — SURVEY.md §2.4):

* recon: L1(cir, recon)                        (train_semi.py:199)
* kl:    batch-mean KL of the env posterior    (train_semi.py:200)
* res:   L1(err_gt, err_est)                   (train_semi.py:218)
* env:   cross-entropy on 0-based labels. The reference shifts *logits* by
  -1 for non-room_full envs (train_semi.py:222) — a bug; every zenodo loader
  emits 0-based labels, so plain CE is the intent.
* semi-supervision: the reference draws one mask per batch from
  ``np.random.randn`` (train_semi.py:203) — i.e. P(labeled)=Phi(rate), not
  rate, and whole batches are dropped. Intent (flag help train_semi.py:34)
  is a Bernoulli(rate) labeled fraction; we apply it PER SAMPLE on device:
  unlabeled samples contribute recon+KL only, labeled ones add the
  supervised terms. No wasted batches, no recompilation.

Every term also accepts a per-sample weight vector so padded batch tails
(static-shape jit) contribute zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Reference loss weights (train_semi.py:110-114)
LAMBDA_AE = 1.0
LAMBDA_RES = 10.0
LAMBDA_KL = 1.0
LAMBDA_ENV = 1.0


def _wmean(x: jnp.ndarray, w: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Weighted mean over the batch axis; x reduced over non-batch axes first.
    Always accumulates in f32 (inputs may be bf16)."""
    per_sample = x.astype(jnp.float32).reshape(x.shape[0], -1).mean(axis=1)
    if w is None:
        return per_sample.mean()
    w = w.reshape(-1)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def l1(a: jnp.ndarray, b: jnp.ndarray, w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    return _wmean(jnp.abs(a - b), w)


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray, w: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    labels = labels.reshape(-1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if w is None:
        return nll.mean()
    w = w.reshape(-1)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)


def env_kl_per_sample(env_code: jnp.ndarray, free_bits: float = 0.0) -> jnp.ndarray:
    """Per-sample KL from the concatenated (mu, log_sigma) code.

    ``free_bits`` > 0 floors each latent DIMENSION's KL at that value
    (Kingma et al. free bits): dimensions below the floor contribute a
    constant, so the optimizer stops squeezing them toward the prior —
    an opt-in stabilizer for the measured 1-D KL-collapse stall (seed
    variance band 0.57-0.80 env accuracy, BASELINE.md round 4). Default 0
    is the reference's plain KL (train_semi.py:200)."""
    half = env_code.shape[-1] // 2
    mu, ls = env_code[..., :half], env_code[..., half:]
    kl_d = 0.5 * (jnp.exp(2.0 * ls) + mu**2 - 1.0 - 2.0 * ls)
    if free_bits > 0.0:
        kl_d = jnp.maximum(kl_d, free_bits)
    return jnp.sum(kl_d, axis=-1)


def semi_loss(
    outputs: dict,
    cir: jnp.ndarray,
    err: jnp.ndarray,
    label: jnp.ndarray,
    sup_mask: jnp.ndarray,
    sample_weight: Optional[jnp.ndarray] = None,
    lambda_ae: float = LAMBDA_AE,
    lambda_kl: float = LAMBDA_KL,
    lambda_res: float = LAMBDA_RES,
    lambda_env: float = LAMBDA_ENV,
    kl_free_bits: float = 0.0,
):
    """Semi-supervised objective with on-device per-sample label masking.

    sup_mask: (B,) float in {0, 1}; sample_weight: (B,) or None (padding).
    Returns (total, aux dict).
    """
    w = sample_weight if sample_weight is not None else jnp.ones(cir.shape[0], cir.dtype)
    loss_ae = lambda_ae * l1(cir, outputs["recon"], w)
    loss_kl = lambda_kl * _wmean(
        env_kl_per_sample(outputs["env_code"], kl_free_bits)[:, None], w)
    sup_w = w * sup_mask.reshape(-1)
    loss_res = lambda_res * l1(err, outputs["err_est"], sup_w)
    loss_env = lambda_env * cross_entropy(outputs["logits"], label, sup_w)
    total = loss_ae + loss_kl + loss_res + loss_env
    aux = {
        "loss": total,
        "loss_ae": loss_ae,
        "loss_kl": loss_kl,
        "loss_res": loss_res,
        "loss_env": loss_env,
    }
    return total, aux


def joint_loss(
    label_est: jnp.ndarray,
    err_est: jnp.ndarray,
    err: jnp.ndarray,
    label: jnp.ndarray,
    sample_weight: Optional[jnp.ndarray] = None,
    lambda_idy: float = 1.0,
    lambda_reg: float = 1.0,
):
    """Supervised joint objective: CE + L1 (reference train.py:47-91)."""
    w = sample_weight
    loss_idy = lambda_idy * cross_entropy(label_est, label, w)
    loss_reg = lambda_reg * l1(err_est, err, w)
    total = loss_idy + loss_reg
    return total, {"loss": total, "loss_idy": loss_idy, "loss_reg": loss_reg}
