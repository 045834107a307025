#!/usr/bin/env python
"""Per-component timing of the conv_type=2 (expanded 2-D) training path.

Times, on the real device, with host-value-fetch synchronization (the
tunneled TPU backend's block_until_ready is unreliable — CLAUDE.md):
  * full semi train step
  * encoder-only forward+backward (sum of outputs as scalar loss)
  * decoder-only forward+backward
Used to decide where the 2-D optimization effort goes (BASELINE.md round log).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timed(fn, *args, n=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(out):
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(np.asarray(leaf).reshape(-1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--compute_dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.models.encoders import Encoder
    from iinsvae_tpu.models.decoders import Decoder
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.training.steps import make_semi_train_step

    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    b = args.batch
    rng = np.random.default_rng(0)
    cir = jnp.asarray(rng.standard_normal((b, 157)), cdt)
    batch = {
        "cir": cir,
        "err": jnp.asarray(np.abs(rng.standard_normal((b, 1))), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (b, 1)), jnp.float32),
        "weight": jnp.ones((b,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    # --- full step ---
    model = IInsVAE(cir_len=157, num_classes=5, style_dim=16, conv_type=2,
                    expand=True)
    variables = model.init({"params": key}, jnp.ones((2, 157)))
    tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500, decay_start_epoch=100,
                        steps_per_epoch=16)
    state = create_train_state(model, variables, tx)
    step = jax.jit(make_semi_train_step(model, 1.0))

    def run_step(state):
        s2, m = step(state, batch, key)
        return m["loss"]

    t_step = timed(run_step, state)
    print(f"full semi step:        {t_step*1e3:8.2f} ms  ({b/t_step:,.0f} samples/sec)")

    # --- encoder fwd+bwd ---
    enc = Encoder(conv_type=2, expand=True, dim=4, style_dim=16)
    evars = enc.init({"params": key}, cir[:2])

    @jax.jit
    def enc_fb(params, x):
        def loss(p):
            rc, cat, rv, kl = enc.apply({"params": p}, x, sample_key=key)
            return jnp.sum(rc.astype(jnp.float32)) + jnp.sum(cat.astype(jnp.float32)) + kl
        return jax.grad(loss)(params)["range_encoder"]

    t_enc = timed(enc_fb, evars["params"], cir)
    print(f"encoder fwd+bwd:       {t_enc*1e3:8.2f} ms")

    # --- decoder fwd+bwd ---
    dec = Decoder(conv_type=2, expand=True, dim=4, style_dim=16)
    rc = jnp.asarray(rng.standard_normal((b, 8, 8, 2)), cdt)
    ec = jnp.asarray(rng.standard_normal((b, 8)), cdt)
    dvars = dec.init({"params": key}, rc[:2], ec[:2])

    @jax.jit
    def dec_fb(params, rc, ec):
        def loss(p):
            out = dec.apply({"params": p}, rc, ec)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(params)["decoder"]

    t_dec = timed(dec_fb, dvars["params"], rc, ec)
    print(f"decoder fwd+bwd:       {t_dec*1e3:8.2f} ms")

    # --- decoder with one residual block: res-tail cost by extrapolation ---
    dec1 = Decoder(conv_type=2, expand=True, style_dim=16, n_residual=1)
    d1vars = dec1.init({"params": key}, rc[:2], ec[:2])

    @jax.jit
    def dec1_fb(params, rc, ec):
        def loss(p):
            out = dec1.apply({"params": p}, rc, ec)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(params)["decoder"]

    t_dec1 = timed(dec1_fb, d1vars["params"], rc, ec)
    per_res = (t_dec - t_dec1) / 2
    print(f"decoder n_residual=1:  {t_dec1*1e3:8.2f} ms  "
          f"(per res block ~{per_res*1e3:.2f} ms, up+final ~{(t_dec1-per_res)*1e3:.2f} ms)")


if __name__ == "__main__":
    main()
