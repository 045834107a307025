#!/usr/bin/env python
"""Attribute the round-2 GroupNorm-twin accuracy delta (0.835 vs the exact
twin's 0.776) to its actual cause.

torch ``GroupNorm(1, C)`` computes per-sample whole-tensor statistics — the
SAME reduction set as the reference's custom LayerNorm (models.py:965-985);
the formula differences (biased vs unbiased variance, sqrt(var+eps) vs
std+eps) are O(1/n) with n = L*C >= 1024. What actually differs between the
round-2 twin and exact reference semantics is INITIALIZATION:

  * the custom LayerNorm draws gamma ~ U(0,1) (models.py:977) where
    GroupNorm initializes gamma = 1;
  * the round-2 twin also skipped weights_init_normal, leaving torch's
    default conv init U(+-1/sqrt(k*C_in)) instead of N(0, 0.02)
    (models.py:8-14).

This runner trains the flagship 1-D config on the shared head-to-head
fixture (400 epochs, supervision 1.0) under post-init param overrides that
flip each factor independently:

  base        stock reference init (the 0.777-accuracy configuration)
  gamma_ones  decoder SLN gamma = 1 (the GroupNorm default), rest stock
  conv_torch  conv kernels U(+-1/sqrt(fan_in)) (torch default), rest stock
  both        both overrides (the round-2 twin's effective init)

Usage: python benchmarks/init_ablation.py [--epochs 400] [--which all]
"""

from __future__ import annotations

import argparse
import json
import re

import jax
import jax.numpy as jnp
import numpy as np

from variant_runs import run_variant

GAMMA_RE = re.compile(r"up\d+_gamma$")


def _override(params, *, gamma_ones: bool, conv_torch: bool,
              conv_scope: str = "", seed: int = 17):
    """Rewrite selected leaves of the freshly-initialized param tree.

    Conv kernels are the rank-3 (k, C_in, C_out) leaves named *kernel*
    (rank-2 'kernel' leaves are Dense/Linear layers, which the reference's
    weights_init_normal does not touch — they keep torch-default init on
    both sides already)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    key = jax.random.PRNGKey(seed)
    out = []
    n_gamma = n_conv = 0
    for path, leaf in flat:
        keys = ["%s" % (k.key if hasattr(k, "key") else k) for k in path]
        name = keys[-1]
        full = "/".join(keys)
        if gamma_ones and GAMMA_RE.search(name):
            leaf = jnp.ones_like(leaf)
            n_gamma += 1
        elif (conv_torch and "kernel" in name and leaf.ndim == 3
              and conv_scope in full):
            # torch Conv default: U(+-1/sqrt(fan_in)), fan_in = prod of all
            # but the last (out-channel) axis for (k..., C_in, C_out) kernels
            fan_in = int(np.prod(leaf.shape[:-1]))
            bound = 1.0 / np.sqrt(fan_in)
            key, sub = jax.random.split(key)
            leaf = jax.random.uniform(
                sub, leaf.shape, leaf.dtype, -bound, bound)
            n_conv += 1
        out.append(leaf)
    print(f"[override] gamma leaves -> ones: {n_gamma}, "
          f"conv kernels -> torch default: {n_conv}", flush=True)
    return jax.tree_util.tree_unflatten(treedef, out)


def main():
    from iinsvae_tpu.config import Config

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--synthetic_n", type=int, default=10000)
    ap.add_argument("--which", default="all",
                    help="comma list of base,gamma_ones,conv_torch,both")
    args = ap.parse_args()

    cases = {
        "base": dict(gamma_ones=False, conv_torch=False),
        "gamma_ones": dict(gamma_ones=True, conv_torch=False),
        "conv_torch": dict(gamma_ones=False, conv_torch=True),
        "both": dict(gamma_ones=True, conv_torch=True),
        # torch-default init ONLY on the env branch: the accuracy win
        # without giving up the range path's N(0,0.02) RMSE behavior
        "env_conv_torch": dict(gamma_ones=False, conv_torch=True,
                               conv_scope="env_encoder"),
    }
    which = list(cases) if args.which == "all" else args.which.split(",")

    base_cfg = dict(dataset_env="room_full", synthetic_n=args.synthetic_n,
                    seed=0, n_epochs=args.epochs, batch_size=args.batch,
                    supervision_rate=1.0)
    results = []
    for tag in which:
        flags = cases[tag]
        results.append(run_variant(
            f"init_{tag}", Config(**base_cfg), args.epochs, args.batch,
            param_override=lambda p, f=flags: _override(p, **f)))
    print(json.dumps({"metric": "init_ablation", "results": results}),
          flush=True)


if __name__ == "__main__":
    main()
