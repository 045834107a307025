#!/usr/bin/env python
"""Sweep (encoder, decoder) fused-chain grouping plans on the FULL semi
train step (scan-amortized, end-value sync — same recipe as bench.py).

The generic chain kernel (ops/pallas/chain.py) made the grouping a tunable;
this measures candidate plans in one process so the compile cache and the
tunnel dial are amortized across candidates.

Usage: python benchmarks/plan_sweep.py [--batch 500] [--reps 200]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.models import encoders as enc_mod
    from iinsvae_tpu.models import decoders as dec_mod
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.training.steps import make_semi_train_step

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()
    b, reps = args.batch, args.reps

    rng = np.random.default_rng(0)
    batch = {
        "cir": jnp.asarray(rng.standard_normal((b, 157)), jnp.float32),
        "err": jnp.asarray(np.abs(rng.standard_normal((b, 1))), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 5, (b, 1)), jnp.float32),
        "weight": jnp.ones((b,), jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    model = IInsVAE(cir_len=157, num_classes=5, style_dim=16)
    variables = model.init({"params": key}, jnp.ones((2, 157)))
    tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500, decay_start_epoch=100,
                        steps_per_epoch=88)
    state0 = create_train_state(model, variables, tx)
    step = make_semi_train_step(model, 0.1)

    def timed(state):
        @jax.jit
        def run_steps(state):
            def body(s, _):
                s, m = step(s, batch, key)
                return s, m["loss"]
            s, losses = lax.scan(body, state, None, length=reps)
            return losses[-1]

        float(run_steps(state))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_steps(state))
            best = min(best, time.perf_counter() - t0)
        return best / reps

    # encoder stack: 0-4 convs, (5,6)(7,8)(9,10) res pairs, 11 head
    # decoder stack: 0 in, (1,2)(3,4)(5,6) res pairs, 7-10 sln ups, 11 out, 12 pool
    candidates = [
        ("current", (2, 2, 1, 2, 2, 2, 1), (1, 2, 2, 2, 6)),
        ("enc_fine_dec_fine", (1,) * 5 + (2, 2, 2, 1), (1, 2, 2, 2, 1, 1, 1, 1, 1, 1)),
        ("enc_3conv", (3, 2, 2, 2, 2, 1), (1, 2, 2, 2, 6)),
        ("enc_res_merged", (2, 2, 1, 2, 2, 3), (1, 2, 2, 2, 6)),
        ("dec_in_merged", (2, 2, 1, 2, 2, 2, 1), (3, 2, 2, 6)),
        ("dec_tail_split", (2, 2, 1, 2, 2, 2, 1), (1, 2, 2, 2, 4, 2)),
        ("dec_tail_33", (2, 2, 1, 2, 2, 2, 1), (1, 2, 2, 2, 3, 3)),
        ("big_groups", (5, 6, 1), (1, 6, 6)),
    ]

    results = []
    for name, ep, dp in candidates:
        enc_mod.set_enc1d_plan(ep)
        dec_mod.set_dec1d_plan(dp)
        ms = timed(state0) * 1e3
        row = {"plan": name, "enc": list(ep), "dec": list(dp),
               "step_ms": round(ms, 4), "sps": round(b / ms * 1e3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["step_ms"])
    print(json.dumps({"metric": "plan_sweep_best", **best}))


if __name__ == "__main__":
    main()
