"""Parity tests for the generic fused-chain kernel (ops/pallas/chain.py)
against the composed reference ops and the specialized mega-kernels it
subsumes (fused_in_pair, fused_adain_res_block, fused_sln_chain,
fused_mlp_chain)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from iinsvae_tpu.ops.pallas.chain import Stage, fused_chain


def _in_norm(d, l, c):
    d3 = d.reshape(d.shape[0], l, c)
    mu = jnp.mean(d3, axis=1, keepdims=True)
    v = jnp.mean((d3 - mu) ** 2, axis=1, keepdims=True)
    return ((d3 - mu) * jax.lax.rsqrt(v + 1e-5)).reshape(d.shape)


def _sln(d, n):
    mu = jnp.mean(d, axis=1, keepdims=True)
    sd = jnp.std(d, axis=1, keepdims=True, ddof=1)
    return (d - mu) / (sd + 1e-5)


def test_chain_in_pair_matches_composed(rng):
    b, k0 = 6, 128
    l1, c1, l2, c2 = 64, 4, 32, 8
    x = jnp.asarray(rng.normal(size=(b, k0)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(k0, l1 * c1)) * 0.1, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(l1 * c1, l2 * c2)) * 0.1, jnp.float32)

    def composed(x, m1, m2):
        y = jax.nn.relu(_in_norm(x @ m1, l1, c1))
        return jax.nn.relu(_in_norm(y @ m2, l2, c2))

    def chained(x, m1, m2):
        stages = (
            Stage(n=l1 * c1, norm="in", act="relu", l_out=l1, c_out=c1),
            Stage(n=l2 * c2, norm="in", act="relu", l_out=l2, c_out=c2),
        )
        return fused_chain(x, stages, [{"m": m1}, {"m": m2}])

    np.testing.assert_allclose(
        chained(x, m1, m2), composed(x, m1, m2), rtol=2e-4, atol=2e-5
    )
    gw = jax.grad(lambda a, b2: composed(x, a, b2).sum(), argnums=(0, 1))(m1, m2)
    gg = jax.grad(lambda a, b2: chained(x, a, b2).sum(), argnums=(0, 1))(m1, m2)
    for a, w in zip(gg, gw):
        np.testing.assert_allclose(a, w, rtol=2e-3, atol=2e-4)


def test_chain_adain_res_block_matches_composed(rng):
    b, l, c = 5, 8, 64
    n = l * c
    x = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(n, n)) * 0.05, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(n, n)) * 0.05, jnp.float32)
    g1 = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    g2 = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(b, c)), jnp.float32)

    def composed(x, m1, m2, g1, b1, g2, b2):
        y = _in_norm(x @ m1, l, c) * jnp.tile(g1, (1, l)) + jnp.tile(b1, (1, l))
        y = jax.nn.relu(y)
        y = _in_norm(y @ m2, l, c) * jnp.tile(g2, (1, l)) + jnp.tile(b2, (1, l))
        return x + y

    def chained(x, m1, m2, g1, b1, g2, b2):
        stages = (
            Stage(n=n, norm="in", act="relu", l_out=l, c_out=c, affine="sample"),
            Stage(n=n, norm="in", act="none", l_out=l, c_out=c,
                  affine="sample", res_from=0),
        )
        return fused_chain(
            x, stages,
            [
                {"m": m1, "gamma": jnp.tile(g1, (1, l)), "beta": jnp.tile(b1, (1, l))},
                {"m": m2, "gamma": jnp.tile(g2, (1, l)), "beta": jnp.tile(b2, (1, l))},
            ],
        )

    np.testing.assert_allclose(
        chained(x, m1, m2, g1, b1, g2, b2),
        composed(x, m1, m2, g1, b1, g2, b2),
        rtol=2e-4, atol=2e-5,
    )
    args = (m1, m2, g1, b1, g2, b2)
    gw = jax.grad(lambda *a: composed(x, *a).sum(), argnums=tuple(range(6)))(*args)
    gg = jax.grad(lambda *a: chained(x, *a).sum(), argnums=tuple(range(6)))(*args)
    for a, w in zip(gg, gw):
        np.testing.assert_allclose(a, w, rtol=2e-3, atol=2e-4)


def test_chain_sln_tail_matches_composed(rng):
    """SLN stages with conv bias + channel affine + relu, then a biased tanh
    stage and a pool matmul stage — the decoder-tail shape."""
    b, n0 = 4, 128
    n1, n2, n_mid, n_out = 256, 256, 128, 37
    l1, c1 = 16, 16  # channel tiling for stage affines/biases
    l2, c2 = 32, 8
    x = jnp.asarray(rng.normal(size=(b, n0)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(n0, n1)) * 0.1, jnp.float32)
    cb1 = jnp.asarray(rng.normal(size=(c1,)) * 0.3, jnp.float32)
    ga1 = jnp.asarray(rng.uniform(size=(c1,)), jnp.float32)
    be1 = jnp.asarray(rng.normal(size=(c1,)) * 0.1, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(n1, n2)) * 0.1, jnp.float32)
    cb2 = jnp.asarray(rng.normal(size=(c2,)) * 0.3, jnp.float32)
    ga2 = jnp.asarray(rng.uniform(size=(c2,)), jnp.float32)
    be2 = jnp.asarray(rng.normal(size=(c2,)) * 0.1, jnp.float32)
    mo = jnp.asarray(rng.normal(size=(n2, n_mid)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(n_mid,)) * 0.1, jnp.float32)
    pool = jnp.asarray(rng.normal(size=(n_mid, n_out)) * 0.1, jnp.float32)

    def composed(x, m1, m2, mo):
        d = x @ m1 + jnp.tile(cb1, l1)
        y = jax.nn.relu(_sln(d, n1) * jnp.tile(ga1, l1) + jnp.tile(be1, l1))
        d = y @ m2 + jnp.tile(cb2, l2)
        y = jax.nn.relu(_sln(d, n2) * jnp.tile(ga2, l2) + jnp.tile(be2, l2))
        return jnp.tanh(y @ mo + bo) @ pool

    def chained(x, m1, m2, mo):
        stages = (
            Stage(n=n1, norm="sln", act="relu", bias=True, affine="chan"),
            Stage(n=n2, norm="sln", act="relu", bias=True, affine="chan"),
            Stage(n=n_mid, norm="none", act="tanh", bias=True),
            Stage(n=n_out, norm="none", act="none"),
        )
        return fused_chain(
            x, stages,
            [
                {"m": m1, "bias": jnp.tile(cb1, l1),
                 "gamma": jnp.tile(ga1, l1).reshape(1, -1),
                 "beta": jnp.tile(be1, l1).reshape(1, -1)},
                {"m": m2, "bias": jnp.tile(cb2, l2),
                 "gamma": jnp.tile(ga2, l2).reshape(1, -1),
                 "beta": jnp.tile(be2, l2).reshape(1, -1)},
                {"m": mo, "bias": bo},
                {"m": pool},
            ],
        )

    np.testing.assert_allclose(
        chained(x, m1, m2, mo), composed(x, m1, m2, mo), rtol=2e-4, atol=2e-5
    )
    gw = jax.grad(lambda *a: composed(x, *a).sum(), argnums=(0, 1, 2))(m1, m2, mo)
    gg = jax.grad(lambda *a: chained(x, *a).sum(), argnums=(0, 1, 2))(m1, m2, mo)
    for a, w in zip(gg, gw):
        np.testing.assert_allclose(a, w, rtol=2e-3, atol=2e-4)


def test_chain_mlp_leaky_matches_composed(rng):
    b, dims = 6, (16, 512, 256, 1)
    x = jnp.asarray(rng.normal(size=(b, dims[0])), jnp.float32)
    ws = [jnp.asarray(rng.normal(size=(dims[i], dims[i + 1])) * 0.1, jnp.float32)
          for i in range(3)]
    bs = [jnp.asarray(rng.normal(size=(dims[i + 1],)) * 0.1, jnp.float32)
          for i in range(3)]

    def composed(x, ws):
        y = x
        for i in range(3):
            y = y @ ws[i] + bs[i]
            if i < 2:
                y = jnp.where(y > 0, y, 0.2 * y)
        return y

    def chained(x, ws):
        stages = (
            Stage(n=dims[1], act="leaky:0.2", bias=True),
            Stage(n=dims[2], act="leaky:0.2", bias=True),
            Stage(n=dims[3], act="none", bias=True),
        )
        return fused_chain(
            x, stages, [{"m": w, "bias": b_} for w, b_ in zip(ws, bs)]
        )

    np.testing.assert_allclose(
        chained(x, ws), composed(x, ws), rtol=2e-4, atol=2e-5
    )
    gw = jax.grad(lambda *a: composed(x, list(a)).sum(), argnums=(0, 1, 2))(*ws)
    gg = jax.grad(lambda *a: chained(x, list(a)).sum(), argnums=(0, 1, 2))(*ws)
    for a, w in zip(gg, gw):
        np.testing.assert_allclose(a, w, rtol=2e-3, atol=2e-4)


def test_chain_batch_grid_matches_whole_batch(rng, monkeypatch):
    """Large batches run on a sample-aligned batch grid with accumulated
    weight grads (the run_sep eval-batch-2000 VMEM OOM regression): force
    chunking via a small budget and check value+grad parity vs whole-batch."""
    from iinsvae_tpu.ops.pallas import chain as ch

    b, l, c = 32, 8, 64
    n = l * c
    x = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(n, n)) * 0.05, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(n, n)) * 0.05, jnp.float32)
    ga = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    be = jnp.asarray(rng.normal(size=(b, n)) * 0.1, jnp.float32)
    cb = jnp.asarray(rng.normal(size=(1, n)) * 0.1, jnp.float32)

    stages = (
        Stage(n=n, norm="in", act="relu", l_out=l, c_out=c, affine="sample"),
        Stage(n=n, norm="sln", act="relu", bias=True, affine="chan"),
        Stage(n=n, norm="in", act="none", l_out=l, c_out=c, res_from=0),
    )

    def f(x, m1, m2, ga):
        return ch.fused_chain(
            x, stages,
            [{"m": m1, "gamma": ga, "beta": be},
             {"m": m2, "bias": cb, "gamma": cb + 1.0, "beta": cb},
             {"m": m1}],
        )

    whole = f(x, m1, m2, ga)
    gw = jax.grad(lambda *a: f(*a).sum(), argnums=(0, 1, 2, 3))(x, m1, m2, ga)

    # live(8) fits, live(32) doesn't -> chunk 8, grid 4 (the constant
    # mirrors _chain_chunk's (5k+4) row-block estimate)
    mat_bytes = 3 * n * n * 4
    budget = (5 * 3 + 4) * 8 * n * 4 + 2 * mat_bytes + 1
    monkeypatch.setattr(ch, "_VMEM_BUDGET", budget)
    assert ch._chain_chunk(b, stages, mat_bytes) == 8
    chunked = f(x, m1, m2, ga)
    gc = jax.grad(lambda *a: f(*a).sum(), argnums=(0, 1, 2, 3))(x, m1, m2, ga)

    np.testing.assert_allclose(chunked, whole, rtol=1e-5, atol=1e-6)
    for a, w in zip(gc, gw):
        np.testing.assert_allclose(a, w, rtol=1e-4, atol=1e-5)


def test_chain_matches_specialized_kernels(rng):
    """The generic chain reproduces fused_in_pair bit-for-bit-ish on the
    encoder pair shapes (same algebra, same kernel structure)."""
    from iinsvae_tpu.ops.pallas.fused import fused_in_pair

    b, k0 = 4, 128
    l1, c1, l2, c2 = 64, 4, 32, 8
    x = jnp.asarray(rng.normal(size=(b, k0)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(k0, l1 * c1)) * 0.1, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(l1 * c1, l2 * c2)) * 0.1, jnp.float32)

    want = fused_in_pair(x, m1, m2, l1=l1, c1=c1, l2=l2, c2=c2, centered=False)
    stages = (
        Stage(n=l1 * c1, norm="in", act="relu", l_out=l1, c_out=c1),
        Stage(n=l2 * c2, norm="in", act="relu", l_out=l2, c_out=c2),
    )
    got = fused_chain(x, stages, [{"m": m1}, {"m": m2}])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
