#!/usr/bin/env python
"""Measure fused-chain stage GROUPINGS at flagship shapes (ROADMAP 1).

For each candidate grouping of the 1-D encoder/decoder stage stacks, time
forward+backward through the generic chain kernel (ops/pallas/chain.py),
scan-amortized (200 iterations per sync — the tunnel costs ~33 ms per
synced dispatch, CLAUDE.md). Prints one JSON line per candidate.

Usage: python benchmarks/chain_probe.py [--batch 500] [--iters 200]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_fn(fn, args, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args):
        def body(c, _):
            out = fn(*c[1:])
            # chain the scan through a scalar so iterations serialize
            s = jnp.sum(out) * 1e-20
            return (c[0] + s,) + tuple(
                a + s if i == 0 else a for i, a in enumerate(c[1:])
            ), None

        c, _ = jax.lax.scan(body, (jnp.float32(0.0),) + tuple(args), None,
                            length=iters)
        return c[0]

    r = run(args)
    float(r)  # compile + warm
    t0 = time.perf_counter()
    float(run(args))
    dt = (time.perf_counter() - t0) / iters
    return dt * 1e3  # ms


def grad_fn(chain_call):
    import jax

    def f(*args):
        return jax.value_and_grad(lambda a: chain_call(*a).sum())(args)[1][0]

    return f


def main():
    import jax
    import jax.numpy as jnp

    from iinsvae_tpu.ops.pallas.chain import Stage, fused_chain

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=500)
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    b = args.batch
    rng = np.random.default_rng(0)

    def mat(k, n, scale=0.05):
        return jnp.asarray(rng.normal(size=(k, n)) * scale, jnp.float32)

    # ---- encoder conv stack: 5 IN stages, all n=512 after stage 1 ----
    enc_stage_dims = [
        (128, 128, 4), (512, 64, 8), (512, 32, 16), (512, 16, 32), (512, 8, 64)
    ]  # (k_in, l_out, c_out)
    enc_ms = [mat(k, l * c) for (k, l, c) in enc_stage_dims]
    enc_stages = [
        Stage(n=l * c, norm="in", act="relu", l_out=l, c_out=c)
        for (_, l, c) in enc_stage_dims
    ]
    x_enc = jnp.asarray(rng.normal(size=(b, 128)), jnp.float32)

    def grouped_call(stages, ms, groups):
        """Split (stages, ms) into chained groups; returns f(x, m0) for
        grad-vs-m0 timing (m0 participates so backward runs end-to-end)."""

        def f(x, m0):
            mats = [m0] + list(ms[1:])
            y, o = x, 0
            for gsize in groups:
                st = tuple(stages[o : o + gsize])
                y = fused_chain(y, st, [{"m": m} for m in mats[o : o + gsize]])
                o += gsize
            return y

        return f

    results = []
    for name, groups in [
        ("enc_[2,2,1]_current", (2, 2, 1)),
        ("enc_[3,2]", (3, 2)),
        ("enc_[2,3]", (2, 3)),
        ("enc_[5]", (5,)),
        ("enc_[1,1,1,1,1]", (1, 1, 1, 1, 1)),
    ]:
        f = grouped_call(enc_stages, enc_ms, groups)
        ms_time = bench_fn(grad_fn(f), (x_enc, enc_ms[0]), args.iters)
        results.append({"probe": name, "fb_ms": round(ms_time, 4)})
        print(json.dumps(results[-1]), flush=True)

    # ---- encoder res tail: 3 IN res blocks (+1x1 head) at (8, 64) ----
    n = 512
    res_ms = [mat(n, n) for _ in range(6)]
    head_m = mat(n, 16)
    res_stage = lambda skip: Stage(
        n=n, norm="in", act="relu" if skip is None else "none",
        l_out=8, c_out=64, res_from=skip,
    )

    def res_groups_call(block_groups, with_head):
        def f(x, m0):
            mats = [m0] + res_ms[1:]
            y, blk = x, 0
            for gsize in block_groups:
                st, ins = [], []
                base = 0
                for g in range(gsize):
                    st.append(Stage(n=n, norm="in", act="relu", l_out=8, c_out=64))
                    st.append(Stage(n=n, norm="in", act="none", l_out=8,
                                    c_out=64, res_from=base))
                    ins.append({"m": mats[(blk + g) * 2]})
                    ins.append({"m": mats[(blk + g) * 2 + 1]})
                    base += 2
                if with_head and blk + gsize == 3 and gsize == block_groups[-1]:
                    st.append(Stage(n=16, norm="none", act="relu"))
                    ins.append({"m": head_m})
                y = fused_chain(y, tuple(st), ins)
                blk += gsize
            if not with_head:
                y = fused_chain(
                    y, (Stage(n=16, norm="none", act="relu"),), [{"m": head_m}]
                )
            return y

        return f

    x_res = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    for name, groups, head in [
        ("res_[1,1,1]+head_current", (1, 1, 1), False),
        ("res_[1,1,1+head]", (1, 1, 1), True),
        ("res_[2,1]+head", (2, 1), False),
        ("res_[1,2+head]", (1, 2), True),
        ("res_[3]+head", (3,), False),
    ]:
        f = res_groups_call(groups, head)
        ms_time = bench_fn(grad_fn(f), (x_res, res_ms[0]), args.iters)
        results.append({"probe": name, "fb_ms": round(ms_time, 4)})
        print(json.dumps(results[-1]), flush=True)

    # ---- decoder: in-stage + 3 AdaIN res blocks ----
    g_aff = jnp.asarray(rng.normal(size=(b, 512)), jnp.float32)

    def dec_res_call(merge_in):
        m_in = mat(16, n)
        bias_in = jnp.asarray(rng.normal(size=(1, n)) * 0.1, jnp.float32)

        def f(x, m0):
            mats = [m0] + res_ms[1:]
            ins_stage = {"m": m_in, "bias": bias_in}
            st_in = Stage(n=n, norm="none", act="relu", bias=True)
            if merge_in:
                st = [st_in]
                ins = [ins_stage]
                st.append(Stage(n=n, norm="in", act="relu", l_out=8, c_out=64,
                                affine="sample"))
                st.append(Stage(n=n, norm="in", act="none", l_out=8, c_out=64,
                                affine="sample", res_from=1))
                ins.append({"m": mats[0], "gamma": g_aff, "beta": g_aff})
                ins.append({"m": mats[1], "gamma": g_aff, "beta": g_aff})
                y = fused_chain(x, tuple(st), ins)
                blocks = [(mats[2], mats[3]), (mats[4], mats[5])]
            else:
                y = fused_chain(x, (st_in,), [ins_stage])
                blocks = [(mats[0], mats[1]), (mats[2], mats[3]), (mats[4], mats[5])]
            for m1, m2 in blocks:
                y = fused_chain(
                    y,
                    (Stage(n=n, norm="in", act="relu", l_out=8, c_out=64,
                           affine="sample"),
                     Stage(n=n, norm="in", act="none", l_out=8, c_out=64,
                           affine="sample", res_from=0)),
                    [{"m": m1, "gamma": g_aff, "beta": g_aff},
                     {"m": m2, "gamma": g_aff, "beta": g_aff}],
                )
            return y

        return f

    x_dec = jnp.asarray(rng.normal(size=(b, 16)), jnp.float32)
    for name, merge in [("dec_in+[1,1,1]_current", False), ("dec_[in+1,1,1]", True)]:
        f = dec_res_call(merge)
        ms_time = bench_fn(grad_fn(f), (x_dec, res_ms[0]), args.iters)
        results.append({"probe": name, "fb_ms": round(ms_time, 4)})
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"metric": "chain_groupings", "results": results}))


if __name__ == "__main__":
    main()
