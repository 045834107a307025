#!/usr/bin/env python
"""Ceiling check: the im2col-equivalent matmuls of the decoder phase-conv
stages — if these run much faster than XLA's conv (~4 TF/s), an in-VMEM
patch-building Pallas kernel is worth building."""

from __future__ import annotations

import time

import numpy as np

SHAPES = [  # (M, K, N) == (B*H*W, 9*C_in, 4*C_out)
    (500 * 8 * 8, 576, 128),
    (500 * 16 * 16, 288, 64),
    (500 * 32 * 32, 144, 32),
    (500 * 64 * 64, 72, 16),
    # W-tiled variant for the last stage: rows carry 16 output cols,
    # N = 16 cols x 16 ch, K = 3dh x 18w x 8ci
    (500 * 64 * 4, 432, 256),
]
REPS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        for m, k, n in SHAPES:
            rng = np.random.default_rng(0)
            a = jnp.asarray(rng.standard_normal((m, k)), dt)
            b = jnp.asarray(rng.standard_normal((k, n)), dt)

            @jax.jit
            def run(a, b):
                def body(acc, _):
                    y = jnp.dot(a + acc, b, preferred_element_type=jnp.float32)
                    return y.mean().astype(a.dtype), None
                acc, _ = lax.scan(body, jnp.zeros((), dt), None, length=REPS)
                return acc

            out = run(a, b)
            float(out)
            t0 = time.perf_counter()
            float(run(a, b))
            dtm = (time.perf_counter() - t0) / REPS
            gf = 2 * m * k * n / 1e9
            print(f"{dt_name} ({m},{k})@({k},{n}): {dtm*1e3:6.3f} ms ({gf/dtm/1e3:5.1f} TF/s)")


if __name__ == "__main__":
    main()
