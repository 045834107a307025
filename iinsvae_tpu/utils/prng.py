"""Documented PRNG key tree (SURVEY.md §7 'randomness').

The reference draws noise from 3 different global RNGs (torch.randn in the
env encoder, numpy in the soft restorer heads, numpy for the supervision
mask). Here every random draw descends from ONE root seed:

  root = PRNGKey(cfg.seed)
  ├─ fold_in(root, epoch)                 per-epoch key (training/loop.py)
  │   ├─ split[0]  -> shuffle permutation
  │   └─ split[1] + fold_in(step)         per-step key
  │        ├─ split[0] -> supervision mask (Bernoulli)
  │        ├─ split[1] -> env-code reparameterization + soft-restorer noise
  │        └─ dropout rng stream
  └─ PRNGKey(cfg.seed) with {'params'}    init-time parameters

Same seed -> bitwise-identical run, independent of host, process count, or
epoch parallelism.
"""

from __future__ import annotations

import jax


def key_tree(seed: int, epoch: int = 0, step: int = 0):
    """Convenience accessor mirroring the tree above. Returns a dict of the
    keys a single train step consumes."""
    root = jax.random.PRNGKey(seed)
    ek = jax.random.fold_in(root, epoch)
    k_perm, k_epoch = jax.random.split(ek)
    sk = jax.random.fold_in(k_epoch, step)
    k_mask, k_sample, k_drop = jax.random.split(sk, 3)
    return {
        "shuffle": k_perm,
        "mask": k_mask,
        "sample": k_sample,
        "dropout": k_drop,
    }
