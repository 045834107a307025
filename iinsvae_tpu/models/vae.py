"""IInsVAE: the flagship combined module for the semi-supervised path.

One linen module holding Encoder + Decoder + Restorer + Classifier so the
whole semi-supervised objective (reference train_semi.py:186-225) runs under
a single params pytree / single jit train step.
"""

from __future__ import annotations

from typing import Optional

import jax
import flax.linen as nn

from iinsvae_tpu.models.encoders import Encoder
from iinsvae_tpu.models.decoders import Decoder
from iinsvae_tpu.models.heads import Restorer, Classifier

_NET_TYPE = {1: "Linear", 2: "Conv1d", 3: "Conv2d"}


def net_type_name(t) -> str:
    """Accept both the int CLI vocabulary (1/2/3, utils.py:41-42) and the
    string ctor vocabulary ('Linear'/'Conv1d'/'Conv2d', models.py:97-128)."""
    if isinstance(t, str) and t in ("Linear", "Conv1d", "Conv2d"):
        return t
    if isinstance(t, str) and t.isdigit():
        t = int(t)
    return _NET_TYPE[int(t)]


class IInsVAE(nn.Module):
    conv_type: int = 1
    dim: int = 4
    n_residual: int = 3
    n_downsample: int = 4
    style_dim: int = 8   # env code dim (the CLI's --env_dim)
    range_dim: int = 2   # range code channels (the CLI's --range_dim)
    cir_len: int = 157
    num_classes: int = 5
    restorer_type: str = "Linear"
    classifier_type: str = "Linear"
    soft: bool = False
    expand: bool = False
    # Explicit 2-D lowering choice: encoder 'grouped'/'dense', decoder
    # 'fast'/'dense'. None = the production lowerings ('grouped'/'fast');
    # 'dense' selects the parity-oracle paths (used by tests).
    enc_lowering: Optional[str] = None
    dec_lowering: Optional[str] = None
    shuffle_first: bool = False  # see Decoder2d.shuffle_first
    # env-branch conv init: 'reference' = the reference's weights_init_normal
    # N(0, 0.02); 'torch' = torch's Conv default U(+-1/sqrt(fan_in)) — an
    # opt-in deviation measured +8 points env-ID accuracy at equal range
    # RMSE (benchmarks/init_ablation.py; BASELINE.md round-3 attribution)
    env_conv_init: str = "reference"

    def setup(self):
        self.encoder = Encoder(
            conv_type=self.conv_type, dim=self.dim, n_residual=self.n_residual,
            n_downsample=self.n_downsample, style_dim=self.style_dim,
            out_dim=self.range_dim, expand=self.expand,
            lowering=self.enc_lowering, env_conv_init=self.env_conv_init,
        )
        self.decoder = Decoder(
            conv_type=self.conv_type, dim=self.dim, n_residual=self.n_residual,
            n_upsample=self.n_downsample, in_dim=self.cir_len,
            out_dim=self.range_dim, style_dim=self.style_dim, expand=self.expand,
            lowering=self.dec_lowering, shuffle_first=self.shuffle_first,
        )
        self.restorer = Restorer(
            soft=self.soft, conv_type=self.conv_type, expand=self.expand,
            net_type=net_type_name(self.restorer_type),
        )
        self.classifier = Classifier(
            num_classes=self.num_classes, net_type=net_type_name(self.classifier_type),
        )

    def __call__(self, cir, *, sample_key: Optional[jax.Array] = None, train: bool = False):
        k_env = k_soft = None
        if sample_key is not None:
            k_env, k_soft = jax.random.split(sample_key)
        range_code, env_code, env_code_rv, kl = self.encoder(cir, k_env)
        recon = self.decoder(range_code, env_code)
        err_est = self.restorer(range_code, train=train, sample_key=k_soft)
        logits = self.classifier(env_code, train=train)
        return {
            "recon": recon,
            "err_est": err_est,
            "logits": logits,
            "kl": kl,
            "range_code": range_code,
            "env_code": env_code,
            "env_code_rv": env_code_rv,
        }

    def encode(self, cir, sample_key=None):
        return self.encoder(cir, sample_key)

    def decode(self, range_code, env_code):
        return self.decoder(range_code, env_code)

    def restore(self, range_code, *, train: bool = False, sample_key=None):
        return self.restorer(range_code, train=train, sample_key=sample_key)

    def classify(self, env_code, *, train: bool = False):
        return self.classifier(env_code, train=train)
