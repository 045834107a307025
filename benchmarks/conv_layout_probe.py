#!/usr/bin/env python
"""Probe XLA TPU conv lowerings for the decoder's phase-conv stage shapes:
NHWC vs NCHW dimension numbers, f32 vs bf16. In-scan timing (20 reps per
measure), host-value sync."""

from __future__ import annotations

import time

import numpy as np

STAGES = [  # (H, W, C_in, C_out4)
    (8, 8, 64, 128),
    (16, 16, 32, 64),
    (32, 32, 16, 32),
    (64, 64, 8, 16),
]
B = 500
REPS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        for h, w, ci, co in STAGES:
            rng = np.random.default_rng(0)
            x = jnp.asarray(rng.standard_normal((B, h, w, ci)), dt)
            k = jnp.asarray(rng.standard_normal((3, 3, ci, co)), dt)

            @jax.jit
            def nhwc(x, k):
                def body(acc, _):
                    y = lax.conv_general_dilated(
                        x, k, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return acc + y.mean(), None
                acc, _ = lax.scan(body, jnp.zeros((), dt), None, length=REPS)
                return acc

            xc = jnp.transpose(x, (0, 3, 1, 2))
            kc = jnp.transpose(k, (3, 2, 0, 1))

            @jax.jit
            def nchw(xc, kc):
                def body(acc, _):
                    y = lax.conv_general_dilated(
                        xc, kc, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=("NCHW", "OIHW", "NCHW"))
                    return acc + y.mean(), None
                acc, _ = lax.scan(body, jnp.zeros((), dt), None, length=REPS)
                return acc

            for name, fn, args in [("NHWC", nhwc, (x, k)), ("NCHW", nchw, (xc, kc))]:
                out = fn(*args)
                float(out)
                t0 = time.perf_counter()
                out = fn(*args)
                float(out)
                dtm = (time.perf_counter() - t0) / REPS
                gf = B * h * w * 9 * ci * co * 2 / 1e9
                print(f"{dt_name} stage {h}x{w} {ci}->{co} {name}: "
                      f"{dtm*1e3:6.3f} ms  ({gf/dtm/1e3:5.1f} TF/s)")


if __name__ == "__main__":
    main()
