#!/usr/bin/env python
"""Per-component timing of the conv_type=2 (expanded 2-D) training path.

All timings are SCAN-AMORTIZED: the measured computation runs N times
inside one lax.scan per synced call, so the ~33 ms tunnel round trip per
host-value fetch distorts each reported number by RT/N (~0.17 ms at
N=200). Early round-2 numbers used 20 dispatches per sync (+1.65 ms each);
the BASELINE.md table marks which are which.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

REPS = 200


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--shuffle_first", action="store_true",
                    help="A/B: pixel-shuffle before SLN+relu on the "
                         "non-sliced upsample stages (exact reorder)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

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

    def timed_scan(jitted, *args):
        out = jitted(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out = jitted(*args)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / REPS

    # --- full step (scanned; state chains through the scan) ---
    model = IInsVAE(shuffle_first=args.shuffle_first,
                    cir_len=157, num_classes=5, style_dim=16, conv_type=2,
                    expand=True)
    variables = model.init({"params": key}, jnp.ones((2, 157)))
    tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500, decay_start_epoch=100,
                        steps_per_epoch=16)
    state = create_train_state(model, variables, tx)
    step = make_semi_train_step(model, 1.0)

    @jax.jit
    def run_steps(state):
        def body(s, _):
            s, m = step(s, batch, key)
            return s, m["loss"]
        s, losses = lax.scan(body, state, None, length=REPS)
        return losses[-1]

    t_step = timed_scan(run_steps, state)
    print(f"full semi step:        {t_step*1e3:8.3f} ms  ({b/t_step:,.0f} samples/sec)")

    # --- encoder fwd+bwd ---
    enc = Encoder(conv_type=2, expand=True, dim=4, style_dim=16)
    evars = enc.init({"params": key}, cir[:2])

    @jax.jit
    def enc_fb(params, x):
        def loss(p, x):
            rc, cat, rv, kl = enc.apply({"params": p}, x, sample_key=key)
            return jnp.sum(rc.astype(jnp.float32)) + jnp.sum(cat.astype(jnp.float32)) + kl

        def body(acc, _):
            g = jax.grad(loss)(params, x + acc.astype(x.dtype))
            tot = sum(l.sum() for l in jax.tree_util.tree_leaves(g))
            return tot * 1e-30, None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
        return acc

    t_enc = timed_scan(enc_fb, evars["params"], cir)
    print(f"encoder fwd+bwd:       {t_enc*1e3:8.3f} ms")

    # --- decoder fwd+bwd ---
    dec = Decoder(conv_type=2, expand=True, dim=4, style_dim=16,
                  shuffle_first=args.shuffle_first)
    rc = jnp.asarray(rng.standard_normal((b, 8, 8, 2)), cdt)
    ec = jnp.asarray(rng.standard_normal((b, 8)), cdt)
    dvars = dec.init({"params": key}, rc[:2], ec[:2])

    @jax.jit
    def dec_fb(params, rc, ec):
        def loss(p, rc):
            return jnp.sum(dec.apply({"params": p}, rc, ec).astype(jnp.float32))

        def body(acc, _):
            g = jax.grad(loss)(params, rc + acc.astype(rc.dtype))
            tot = sum(l.sum() for l in jax.tree_util.tree_leaves(g))
            return tot * 1e-30, None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
        return acc

    t_dec = timed_scan(dec_fb, dvars["params"], rc, ec)
    print(f"decoder fwd+bwd:       {t_dec*1e3:8.3f} ms")

    # --- decoder fwd only ---
    @jax.jit
    def dec_f(params, rc, ec):
        def body(acc, _):
            out = dec.apply({"params": params}, rc + acc.astype(rc.dtype), ec)
            return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
        return acc

    t_dec_f = timed_scan(dec_f, dvars["params"], rc, ec)
    print(f"decoder fwd only:      {t_dec_f*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
