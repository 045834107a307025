#!/usr/bin/env python
"""Probe: would int8 quantized inference beat bf16 on the 2-D decoder's
phase convs?

The conv_type=2 inference forward is MXU-bound in its decoder phase convs
(BASELINE.md: isolated probes show them at 45-140 TF/s bf16). The v5e MXU
doubles throughput at int8 (394 TOPS vs 197 TF/s bf16), so a quantized
serving path COULD buy up to 2x on those stages — but only if (a) XLA's
int8 conv lowering actually engages the int8 MXU path through this
backend and (b) the dynamic-quantization overhead (per-tensor amax +
scale + cast of the activations; weights are pre-quantized per-channel)
doesn't eat the win on these mid-size fields.

This measures exactly that, stage by stage, BEFORE any quantized-serving
feature is built (the same A/B-first discipline as benchmarks/ab2d.py —
several plausible kernels were measured and rejected; see ROADMAP item 4).
Shapes are the decoder's four phase-folded upsample stages at batch 500
(subpixel.py: 3x3 conv on the low-res grid, 4x phase output channels).

Scan-amortized, host-value-fetch sync (CLAUDE.md tunnel gotchas).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


# (H, W, C_in, C_out_phase): decoder stages 1-4 after phase folding
STAGES = [
    (8, 8, 64, 128),    # 64 -> 4*32
    (16, 16, 32, 64),   # 32 -> 4*16
    (32, 32, 16, 32),   # 16 -> 4*8
    (64, 64, 8, 16),    # 8  -> 4*4
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    def conv(x, k, pet=None):
        return lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    rng = np.random.default_rng(0)
    b = args.batch
    print(f"batch={b} reps={args.reps} dev={jax.devices()[0].platform}")
    for (h, w, ci, co) in STAGES:
        x_f = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.bfloat16)
        k_f = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1,
                          jnp.bfloat16)
        # per-tensor weight scale is enough for the probe (the real feature
        # would use per-output-channel); symmetric int8
        k_q = jnp.clip(jnp.round(k_f.astype(jnp.float32) / 0.001), -127, 127
                       ).astype(jnp.int8)

        def run_timed(fn, x0):
            @jax.jit
            def loop(x):
                # scalar acc perturbs the input each rep (the sibling
                # probes' pattern) so the conv is loop-VARIANT — a body
                # that returns its carry unchanged lets XLA hoist the conv
                # out of the while loop and measures nothing
                def body(acc, _):
                    y = fn(x + acc.astype(x.dtype))
                    return y.reshape(-1)[0].astype(jnp.float32) * 1e-30, None
                acc, _ = lax.scan(
                    body, jnp.zeros((), jnp.float32), None, length=args.reps)
                return acc
            float(loop(x0))  # compile+warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x0))
                best = min(best, time.perf_counter() - t0)
            return best / args.reps * 1e3

        def bf16_stage(x):
            return conv(x, k_f)

        def int8_stage(x):
            # dynamic per-tensor activation quant (the part that costs)
            s = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                          ).astype(jnp.int8)
            acc = conv(xq, k_q, pet=jnp.int32)
            return (acc.astype(jnp.float32) * (s * 0.001)).astype(jnp.bfloat16)

        def int8_prequant_stage(x):
            # upper bound: activations already int8 (static calibration,
            # quant fused into the previous stage's epilogue)
            xq = jnp.clip(jnp.round(x.astype(jnp.float32)), -127, 127
                          ).astype(jnp.int8)
            return conv(xq, k_q, pet=jnp.int32)

        ms_bf = run_timed(bf16_stage, x_f)
        ms_dq = run_timed(int8_stage, x_f)
        ms_sq = run_timed(int8_prequant_stage, x_f)
        gflop = 2 * b * h * w * ci * co * 9 / 1e9
        print(f"  {h:3d}x{w:3d}x{ci:3d}->{co:3d}: bf16 {ms_bf:7.3f} ms "
              f"({gflop/ms_bf:6.1f} TF/s) | int8 dyn {ms_dq:7.3f} | "
              f"int8 pre {ms_sq:7.3f} ({gflop/ms_sq:6.1f} TOP/s-equiv)")


if __name__ == "__main__":
    main()
