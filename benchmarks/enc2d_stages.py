#!/usr/bin/env python
"""Prefix-split timing of RangeEncoder2d's grouped lowering (ROADMAP item 3
data): time the pool+in-conv, each stride-2 stage, the residual tail, and the
out conv cumulatively, fwd and fwd+bwd, scan-amortized (tunnel methodology of
profile2d.py). Stage structure: reference models.py:179-215."""

from __future__ import annotations

import argparse
import time

import numpy as np

REPS = 200


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--no_pallas_res", action="store_true",
                    help="force the grouped (non-Pallas) residual tail")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.models.encoders import RangeEncoder2d
    from iinsvae_tpu.ops import colgroups as cg
    from iinsvae_tpu.ops import conv as conv_ops
    from iinsvae_tpu.ops.pallas import fused as pf
    from iinsvae_tpu.ops.pallas import res2d
    import flax.linen as nn

    cdt = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    b = args.batch
    rng = np.random.default_rng(0)
    cir = jnp.asarray(rng.standard_normal((b, 157)), cdt)
    key = jax.random.PRNGKey(0)

    module = RangeEncoder2d(dim=4)

    def field(x):
        return cg.constant_field(x.reshape(x.shape[0], -1, 1), x.shape[1])

    variables = module.init({"params": key}, field(cir[:2]))
    params = variables["params"]

    # re-create the grouped forward stage by stage so prefixes are timeable
    def prefix_fwd(p, x, n_stages):
        """n_stages: 1=pool+in conv, 2..5=+down0..3, 6=+res tail, 7=+out."""
        xg = cg.pool_constant_field(field(x), 128)
        xg = cg.relu_grouped(cg.instance_norm_grouped(cg.conv2d_grouped(
            xg, p["in_kernel"], p["in_bias"], padding=3, pad_mode="reflect")))
        stages = 1
        for j in range(4):
            if stages >= n_stages:
                return xg.data
            xg = cg.relu_grouped(cg.instance_norm_grouped(cg.conv2d_grouped(
                xg, p[f"down{j}_kernel"], p[f"down{j}_bias"],
                stride=2, padding=1)))
            stages += 1
        if stages >= n_stages:
            return xg.data
        bh, hh, gh, ch = xg.data.shape
        use_pallas = (pf.pallas_enabled() and not args.no_pallas_res
                      and res2d.applicable(hh, xg.width, ch, bh))
        if use_pallas:
            xd = xg.expand()
            for i in range(3):
                xd = res2d.fused_res_block_2d(
                    xd, p[f"res{i}_kernel1"], p[f"res{i}_kernel2"], norm="in")
            stages += 1
            if stages >= n_stages:
                return xd
            return nn.relu(conv_ops.conv2d(xd, p["out_kernel"], p["out_bias"]))
        for i in range(3):
            y = cg.conv2d_grouped(xg, p[f"res{i}_kernel1"], p[f"res{i}_bias1"],
                                  padding=1, pad_mode="reflect")
            y = cg.relu_grouped(cg.instance_norm_grouped(y))
            y = cg.conv2d_grouped(y, p[f"res{i}_kernel2"], p[f"res{i}_bias2"],
                                  padding=1, pad_mode="reflect")
            xg = cg.add_grouped(xg, cg.instance_norm_grouped(y))
        stages += 1
        if stages >= n_stages:
            return xg.data
        return cg.relu_grouped(cg.conv2d_grouped(
            xg, p["out_kernel"], p["out_bias"])).expand()

    # parity guard: the re-created full forward must match the module
    ref = module.apply({"params": params}, field(cir[:4]))
    got = prefix_fwd(params, cir[:4], 7)
    np.testing.assert_allclose(np.asarray(ref, np.float32),
                               np.asarray(got, np.float32), rtol=2e-2, atol=2e-2)

    def timed(jitted, *a):
        out = jitted(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out = jitted(*a)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        return best / REPS

    names = ["pool+in", "+down0", "+down1", "+down2", "+down3",
             "+res tail", "+out conv"]
    prev_f = prev_b = 0.0
    for n in range(1, 8):
        @jax.jit
        def fwd_only(p, x, n=n):
            def body(acc, _):
                out = prefix_fwd(p, x + acc.astype(x.dtype), n)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
            acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
            return acc

        @jax.jit
        def fwd_bwd(p, x, n=n):
            def loss(pp, xx):
                return jnp.sum(prefix_fwd(pp, xx, n).astype(jnp.float32))

            def body(acc, _):
                g = jax.grad(loss)(p, x + acc.astype(x.dtype))
                return sum(l_.sum() for l_ in jax.tree_util.tree_leaves(g)) * 1e-30, None
            acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
            return acc

        tf = timed(fwd_only, params, cir)
        tb = timed(fwd_bwd, params, cir)
        print(f"{names[n-1]:<10} fwd {tf*1e3:7.3f} ms (+{(tf-prev_f)*1e3:6.3f})"
              f"   f+b {tb*1e3:7.3f} ms (+{(tb-prev_b)*1e3:6.3f})", flush=True)
        prev_f, prev_b = tf, tb


if __name__ == "__main__":
    main()
