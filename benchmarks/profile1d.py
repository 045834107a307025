#!/usr/bin/env python
"""Split the 1-D semi train step's IN-SCAN time: forward loss only, grads
only (no optimizer), full step. Each variant scans a whole 44k-sample epoch
inside one jit (dispatch-amortized, like bench.py); host-value-fetch sync."""

from __future__ import annotations

import time

import numpy as np

N = 44_000
BS = 500
EPOCHS = 10


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.training.steps import make_semi_train_step, make_semi_grads_fn

    rng = np.random.default_rng(0)
    batches = {
        "cir": jnp.asarray(rng.standard_normal((N // BS, BS, 157)), jnp.float32),
        "err": jnp.asarray(np.abs(rng.standard_normal((N // BS, BS, 1))), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (N // BS, BS, 1)), jnp.float32),
        "weight": jnp.ones((N // BS, BS), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    model = IInsVAE(cir_len=157, num_classes=5, style_dim=16)
    variables = model.init({"params": key}, jnp.ones((2, 157)))
    tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500, decay_start_epoch=100,
                        steps_per_epoch=N // BS)
    state = create_train_state(model, variables, tx)
    grads_fn = make_semi_grads_fn(model, 1.0)
    step = make_semi_train_step(model, 1.0)

    @jax.jit
    def epoch_fwd(state, batches, key):
        def body(acc, b):
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                b["cir"], train=False,
            )
            return acc + out["err_est"].sum() + out["logits"].sum() + out["kl"], None
        acc, _ = lax.scan(body, 0.0, batches)
        return acc

    @jax.jit
    def epoch_grads(state, batches, key):
        def body(acc, b):
            grads, metrics, mut = grads_fn(state, b, key)
            # sum EVERY leaf so no part of the backward is dead-code-eliminated
            tot = sum(l.sum() for l in jax.tree_util.tree_leaves(grads))
            return acc + tot + metrics["loss"], None
        acc, _ = lax.scan(body, 0.0, batches)
        return acc

    @jax.jit
    def epoch_full(state, batches, key):
        def body(s, b):
            s, m = step(s, b, key)
            return s, m["loss"]
        s, losses = lax.scan(body, state, batches)
        return losses[-1]

    steps = N // BS

    def timed(fn):
        out = fn(state, batches, key)
        float(np.asarray(out))
        t0 = time.perf_counter()
        for _ in range(EPOCHS):
            out = fn(state, batches, key)
        float(np.asarray(out))
        return (time.perf_counter() - t0) / (EPOCHS * steps)

    t_f = timed(epoch_fwd)
    t_g = timed(epoch_grads)
    t_s = timed(epoch_full)
    print(f"in-scan forward only:   {t_f*1e3:7.3f} ms/step")
    print(f"in-scan grads only:     {t_g*1e3:7.3f} ms/step  (bwd ~{(t_g-t_f)*1e3:.3f})")
    print(f"in-scan full step:      {t_s*1e3:7.3f} ms/step  (adam ~{(t_s-t_g)*1e3:.3f})")


if __name__ == "__main__":
    main()
