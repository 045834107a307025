"""Supervised joint networks and the separated two-stage variant.

The reference instantiates ``EMNet`` / ``EMNetLoop`` (run.py:59-67) and
``IdentifierSep`` / ``RegressorSep`` (run_sep.py:56-59) but never defines
them — the classes are missing from the repo. The contracts below are
reconstructed from every call site:

  * ``network(cir) -> (label_est, env_latent, err_est)``
    (reference train.py:82, test.py:73)
  * ``enet(cir) -> label_est`` during sep-E training (train.py:203) and
    ``enet(cir) -> (label_est, env_latent)`` at sep-EM test (test.py:282)
  * ``mnet(cir, label) -> err_est`` — a regressor conditioned on the env
    label (train.py:316, test.py:284-289), used at test time to marginalize
    p(dd | r) = sum_k p(k | r) * p(dd | r, k).

Chosen design (documented intent, not a translation): the identifier is
EnvEncoder + Classifier, the regressor is RangeEncoder + Restorer head;
``EMNetLoop`` ("loops" ablation, run.py:63) additionally feeds the predicted
class distribution back into the regressor head — the "loop" that gives the
ablation its name — while ``EMNet`` keeps the two branches independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from iinsvae_tpu.models.encoders import RangeEncoder1d, EnvEncoder1d
from iinsvae_tpu.models.heads import Restorer, Classifier
from iinsvae_tpu.models.layers import Dense
from iinsvae_tpu.models.vae import net_type_name


class _Backbone(nn.Module):
    """Shared trunk: CIR -> (range_code, env_latent)."""

    dim: int = 4
    n_residual: int = 3
    n_downsample: int = 4
    env_dim: int = 16
    range_dim: int = 2
    env_conv_init: str = "reference"  # see models/encoders.py EnvEncoder1d

    @nn.compact
    def __call__(self, cir):
        x = cir.reshape(cir.shape[0], cir.shape[-1], 1)
        range_code = RangeEncoder1d(
            self.dim, self.n_residual, self.n_downsample, self.range_dim,
            name="range_encoder",
        )(x)
        env_latent = EnvEncoder1d(
            self.dim * 4, self.n_downsample - 2, self.env_dim,
            conv_init=self.env_conv_init, name="env_encoder",
        )(x)
        return range_code, env_latent


class EMNet(nn.Module):
    """Joint supervised net: cir -> (label_est, env_latent, err_est)."""

    cir_len: int = 157
    num_classes: int = 5
    env_dim: int = 16
    filters: int = 16
    enet_type: int | str = 1
    mnet_type: int | str = 1
    env_conv_init: str = "reference"

    @nn.compact
    def __call__(self, cir, *, train: bool = False):
        range_code, env_latent = _Backbone(
            env_dim=self.env_dim, env_conv_init=self.env_conv_init,
            name="backbone")(cir)
        label_est = Classifier(
            num_classes=self.num_classes, filters=self.filters,
            net_type=net_type_name(self.enet_type), name="identifier",
        )(env_latent, train=train)
        err_est = Restorer(
            net_type=net_type_name(self.mnet_type), name="regressor",
        )(range_code, train=train)
        return label_est, env_latent, err_est


class EMNetLoop(nn.Module):
    """'loops' ablation: the regressor also sees the class distribution."""

    cir_len: int = 157
    num_classes: int = 5
    env_dim: int = 16
    filters: int = 16
    enet_type: int | str = 1
    mnet_type: int | str = 1
    env_conv_init: str = "reference"

    @nn.compact
    def __call__(self, cir, *, train: bool = False):
        range_code, env_latent = _Backbone(
            env_dim=self.env_dim, env_conv_init=self.env_conv_init,
            name="backbone")(cir)
        label_est = Classifier(
            num_classes=self.num_classes, filters=self.filters,
            net_type=net_type_name(self.enet_type), name="identifier",
        )(env_latent, train=train)
        # loop: inject softmax(label_est) into the range code as extra
        # per-position channels before the regressor head
        probs = jax.nn.softmax(label_est, axis=-1)
        cond = Dense(range_code.shape[-1], name="loop_proj")(probs)
        range_cond = range_code + cond[:, None, :]
        err_est = Restorer(
            net_type=net_type_name(self.mnet_type), name="regressor",
        )(range_cond, train=train)
        return label_est, env_latent, err_est


class IdentifierSep(nn.Module):
    """Sep-E: cir -> (label_est, env_latent) (env branch only)."""

    cir_len: int = 157
    num_classes: int = 2
    env_dim: int = 16
    filters: int = 16
    enet_type: int | str = 1
    env_conv_init: str = "reference"

    @nn.compact
    def __call__(self, cir, *, train: bool = False):
        x = cir.reshape(cir.shape[0], cir.shape[-1], 1)
        env_latent = EnvEncoder1d(16, 2, self.env_dim,
                                  conv_init=self.env_conv_init,
                                  name="env_encoder")(x)
        label_est = Classifier(
            num_classes=self.num_classes, filters=self.filters,
            net_type=net_type_name(self.enet_type), name="identifier",
        )(env_latent, train=train)
        return label_est, env_latent


class RegressorSep(nn.Module):
    """Sep-M: (cir, env_label) -> err_est, the label-conditional regressor
    p(dd | r, k). The label enters as a one-hot embedding added to the range
    code channels."""

    cir_len: int = 157
    num_classes: int = 2
    env_dim: int = 16
    filters: int = 16
    mnet_type: int | str = 1

    @nn.compact
    def __call__(self, cir, label, *, train: bool = False):
        x = cir.reshape(cir.shape[0], cir.shape[-1], 1)
        range_code = RangeEncoder1d(4, 3, 4, 2, name="range_encoder")(x)
        onehot = jax.nn.one_hot(
            jnp.asarray(label).reshape(label.shape[0], -1)[:, 0].astype(jnp.int32),
            self.num_classes,
            dtype=range_code.dtype,
        )
        cond = Dense(range_code.shape[-1], name="label_proj")(onehot)
        range_cond = range_code + cond[:, None, :]
        err_est = Restorer(
            net_type=net_type_name(self.mnet_type), name="regressor",
        )(range_cond, train=train)
        return err_est
