#!/usr/bin/env python
"""Batch-size scaling sweep for the semi train step (deployment lever).

bench.py pins batch 500 to match the reference's training config
(utils.py:20-28), but batch size is a free parameter for anyone training
on a TPU: the 1-D flagship step is launch-bound (BASELINE.md round-3
composition: 0.70 ms/step of which ~0.4 ms is launch overhead), so the
per-sample cost should fall substantially as the batch grows and each
launch amortizes over more rows. This sweep measures ms/step and
samples/sec at batch in {500, 1000, 2000, 4000} for conv_type 1 (f32,
the flagship) and conv_type 2 (bf16, the quality-best path), with the
same scan-amortized end-only-sync recipe as bench.py (CLAUDE.md: every
synced dispatch costs ~33 ms through the tunnel; timings sync via a host
value fetch because block_until_ready is unreliable on this backend).

Quality note: large-batch TRAINING changes the steps-per-epoch/LR
trade-off (fewer, less noisy updates) — this sweep measures throughput
only; bench.py's batch-500 number remains the reference-comparable one.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conv_type", type=int, default=1, choices=[1, 2])
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "float32", "bfloat16"])
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[500, 1000, 2000, 4000])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.training.steps import make_semi_train_step

    # conv_type=2's phase convs are MXU-bound -> bf16 by default there;
    # the 1-D path is launch-bound and bf16-neutral (BASELINE.md)
    dtype_name = args.compute_dtype or (
        "bfloat16" if args.conv_type == 2 else "float32")
    cdt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    key = jax.random.PRNGKey(0)
    # compute dtype rides on the data (the model computes in the input
    # dtype), same convention as bench.py / infer_bench.py
    model = IInsVAE(cir_len=157, num_classes=5, style_dim=16,
                    conv_type=args.conv_type, expand=args.conv_type == 2)
    variables = model.init({"params": key}, jnp.ones((2, 157)))
    step = make_semi_train_step(model, 1.0)

    rng = np.random.default_rng(0)
    print(f"conv_type={args.conv_type} dtype={dtype_name}")
    for b in args.batches:
        # keep the timed region ~100-250 ms per sync: long enough that the
        # one ~33 ms tunnel round trip distorts <0.2 ms/step equivalent
        reps = max(20, min(200, 100_000 // b)) if args.conv_type == 1 else \
            max(10, 20_000 // b)
        batch = {
            "cir": jnp.asarray(rng.standard_normal((b, 157)), cdt),
            "err": jnp.asarray(np.abs(rng.standard_normal((b, 1))),
                               jnp.float32),
            "label": jnp.asarray(rng.integers(0, 5, (b, 1)), jnp.float32),
            "weight": jnp.ones((b,), jnp.float32),
        }
        tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500,
                            decay_start_epoch=100, steps_per_epoch=16)
        state = create_train_state(model, variables, tx)

        @jax.jit
        def run_steps(state, batch):
            def body(s, i):
                s, m = step(s, batch, jax.random.fold_in(key, i))
                return s, m["loss"]
            _, losses = lax.scan(body, state, jnp.arange(reps))
            return losses[-1]

        float(run_steps(state, batch))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_steps(state, batch))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        print(f"  batch {b:5d}: {ms:8.3f} ms/step  "
              f"{b / (ms / 1e3):12,.0f} samples/sec  (reps={reps})")


if __name__ == "__main__":
    main()
