#!/usr/bin/env python
"""Batch-inference throughput, device-resident data, scanned jit forward
(the serving.Predictor.predict_dataset compute path) — 1-D and expanded-2-D
variants. Host-value-fetch sync (tunnel gotcha, CLAUDE.md)."""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=44000)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--conv_type", type=int, default=1)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.models import IInsVAE

    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    n = (args.n // args.batch) * args.batch
    cir = jnp.asarray(rng.standard_normal((n, 157)), cdt)
    batches = cir.reshape(-1, args.batch, 157)

    model = IInsVAE(cir_len=157, num_classes=5, style_dim=16,
                    conv_type=args.conv_type, expand=args.conv_type == 2)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 157)))

    @jax.jit
    def run(variables, batches):
        def body(_, chunk):
            out = model.apply(variables, chunk)
            return _, (out["err_est"], jnp.argmax(out["logits"], -1))
        _, (err, cls) = lax.scan(body, None, batches)
        return err, cls

    err, _ = run(variables, batches)
    float(err.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(args.reps):
        err, cls = run(variables, batches)
    float(err.reshape(-1)[0])
    dt = time.perf_counter() - t0
    sps = n * args.reps / dt
    print(f"conv_type={args.conv_type} {args.compute_dtype}: "
          f"{sps:,.0f} samples/sec ({n} samples x {args.reps}, batch {args.batch})")


if __name__ == "__main__":
    main()
