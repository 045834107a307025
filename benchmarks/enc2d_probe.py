#!/usr/bin/env python
"""Split the conv_type=2 Encoder's time: RangeEncoder2d vs EnvEncoder2d,
forward and fwd+bwd, scan-amortized (see profile2d.py for the tunnel
timing methodology). Data for ROADMAP item 3 (2-D encoder launch count)."""

from __future__ import annotations

import argparse
import time

import numpy as np

REPS = 200


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from iinsvae_tpu.models.encoders import RangeEncoder2d, EnvEncoder2d
    from iinsvae_tpu.ops import colgroups as cg

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

    def bench(name, module, out_reduce):
        l = cir.shape[1]

        def field(x):
            # the Encoder facade's grouped lowering input (encoders.py)
            return cg.constant_field(x.reshape(x.shape[0], l, 1), l)

        variables = module.init({"params": key}, field(cir[:2]))
        params = variables["params"]

        @jax.jit
        def fwd_only(p, x):
            def body(acc, _):
                out = module.apply({"params": p}, field(x + acc.astype(x.dtype)))
                return out_reduce(out) * 1e-30, None
            acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
            return acc

        @jax.jit
        def fwd_bwd(p, x):
            def loss(pp, xx):
                return out_reduce(module.apply({"params": pp}, field(xx)))

            def body(acc, _):
                g = jax.grad(loss)(p, x + acc.astype(x.dtype))
                tot = sum(l_.sum() for l_ in jax.tree_util.tree_leaves(g))
                return tot * 1e-30, None
            acc, _ = lax.scan(body, jnp.zeros(()), None, length=REPS)
            return acc

        tf = timed_scan(fwd_only, params, cir)
        tb = timed_scan(fwd_bwd, params, cir)
        print(f"{name:<18} fwd {tf*1e3:7.3f} ms   fwd+bwd {tb*1e3:7.3f} ms")

    bench("RangeEncoder2d", RangeEncoder2d(dim=4),
          lambda o: jnp.sum(o.astype(jnp.float32)))
    bench("EnvEncoder2d", EnvEncoder2d(dim=16, style_dim=16),
          lambda o: jnp.sum(o.astype(jnp.float32)))


if __name__ == "__main__":
    main()
