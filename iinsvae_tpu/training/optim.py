"""Optimizer and LR schedule.

Reference: Adam(lr=1e-4, betas=(0.5, 0.999)) (run.py:92-96,
train_semi.py:117-122) with the LambdaLR linear decay
``1 - max(0, epoch + offset - decay_start) / (n_epochs - decay_start)``
stepped once per epoch (models.py:17-25, train_semi.py:125-128).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lambda_lr_schedule(
    base_lr: float,
    n_epochs: int,
    decay_start_epoch: int,
    steps_per_epoch: int,
    offset: int = 0,
):
    """Per-step schedule that reproduces the reference's per-epoch decay."""
    assert n_epochs - decay_start_epoch > 0, "Decay must start before the training session ends!"

    def schedule(step):
        epoch = step // steps_per_epoch
        factor = 1.0 - jnp.maximum(0.0, epoch + offset - decay_start_epoch) / (
            n_epochs - decay_start_epoch
        )
        # The reference formula is unclamped below zero (models.py:17-25) but
        # is only ever evaluated for epoch <= n_epochs, where it is >= 0.
        # Clamp so a mis-sized steps_per_epoch (or training past n_epochs)
        # degrades to lr=0 instead of NEGATIVE lr = gradient ascent — the
        # round-3 run.py divergence (BASELINE.md round-3 log).
        return base_lr * jnp.maximum(factor, 0.0)

    return schedule


def make_optimizer(
    lr: float = 1e-4,
    b1: float = 0.5,
    b2: float = 0.999,
    n_epochs: int | None = None,
    decay_start_epoch: int | None = None,
    steps_per_epoch: int = 1,
    offset: int = 0,
) -> optax.GradientTransformation:
    if n_epochs is not None and decay_start_epoch is not None and decay_start_epoch < n_epochs:
        sched = lambda_lr_schedule(lr, n_epochs, decay_start_epoch, steps_per_epoch, offset)
    else:
        # constant schedule — ALWAYS a callable, so the optax state pytree
        # structure is identical whether or not decay is active and
        # checkpoints restore across configs (e.g. a short smoke run
        # reloading into the 500-epoch default).
        def sched(step):
            return lr
    # optax.flatten: run adam over ONE concatenated vector instead of ~80
    # small per-leaf tensors — the per-leaf update chains cost ~0.9 ms/step
    # on v5e (measured; 2.5 -> 1.63 ms/step), the math is identical.
    return optax.flatten(optax.adam(learning_rate=sched, b1=b1, b2=b2))
