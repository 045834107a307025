#!/usr/bin/env python
"""A/B the res2d whole-block kernels against the composed grouped
lowering. Times the conv_type=2 encoder fwd+bwd and the full semi step,
scan-amortized (REPS inside one lax.scan per sync; see profile2d.py for
why). Kernels are disabled by monkeypatching their routing predicates
BEFORE any tracing, so each configuration is one fresh process.

Round-3 results (encoder fwd+bwd bf16, batch 500): composed 2.008 ms,
+res2d 1.824 ms. The third kernel this sweep existed to judge — a fused
grouped stride-2 stage (dense prev/cur/next W3 matmuls, strided_conv
row-tile style) — measured 2.592 ms and was DELETED; see ROADMAP item 4
for why it cannot win without im2col inside the kernel.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

REPS = 200


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--no_res2d", action="store_true")
    ap.add_argument("--full_step", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.ops.pallas import res2d

    if args.no_res2d:
        res2d.applicable = lambda *a, **k: False

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.models.encoders import Encoder
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.training.steps import make_semi_train_step

    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    b = args.batch
    rng = np.random.default_rng(0)
    cir = jnp.asarray(rng.standard_normal((b, 157)), cdt)
    key = jax.random.PRNGKey(0)

    def timed_scan(jitted, *a):
        out = jitted(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out = jitted(*a)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / REPS

    tag = f"res2d={not args.no_res2d}"

    enc = Encoder(conv_type=2, expand=True, dim=4, style_dim=16)
    evars = enc.init({"params": key}, cir[:2])

    @jax.jit
    def enc_fb(params, x):
        def loss(p, x):
            rc, cat, rv, kl = enc.apply({"params": p}, x, sample_key=key)
            return (jnp.sum(rc.astype(jnp.float32))
                    + jnp.sum(cat.astype(jnp.float32)) + kl)

        def body(acc, _):
            g = jax.grad(loss)(params, x + acc.astype(x.dtype))
            tot = sum(l.sum() for l in jax.tree_util.tree_leaves(g))
            return tot * 1e-30, None
        acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
        return acc

    t_enc = timed_scan(enc_fb, evars["params"], cir)
    print(f"[{tag}] encoder fwd+bwd: {t_enc*1e3:8.3f} ms", flush=True)

    if args.full_step:
        batch = {
            "cir": cir,
            "err": jnp.asarray(np.abs(rng.standard_normal((b, 1))), jnp.float32),
            "label": jnp.asarray(rng.integers(0, 5, (b, 1)), jnp.float32),
            "weight": jnp.ones((b,), jnp.float32),
        }
        model = IInsVAE(cir_len=157, num_classes=5, style_dim=16, conv_type=2,
                        expand=True)
        variables = model.init({"params": key}, jnp.ones((2, 157)))
        tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500,
                            decay_start_epoch=100, steps_per_epoch=16)
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
        print(f"[{tag}] full semi step:  {t_step*1e3:8.3f} ms "
              f"({b/t_step:,.0f} samples/sec)", flush=True)


if __name__ == "__main__":
    main()
