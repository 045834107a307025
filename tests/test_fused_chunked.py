"""Row-chunked lowering of the whole-batch fused kernels.

Past ~512 rows the fused chains exceed the TPU's ~16 MB scoped-VMEM limit
(measured: fused_sln_chain at batch 2000 wants 22 MB), so the public
entries in ops/pallas/fused.py split oversized batches onto <=512-row
calls of the SAME kernel via lax.map (exact: all fused math is per-sample
independent). These tests pin chunked == whole-batch for forward values
AND weight/input gradients, covering both the exact-divisor path
(b=530 -> 2 x 265) and the zero-pad path (b=521 prime -> pad to 2 x 512).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.ops.pallas import fused as pf


def _with_whole_batch(monkeypatch, fn, *args):
    """Run fn with chunking disabled (whole-batch reference)."""
    monkeypatch.setattr(pf, "_CHUNK_ROWS", 1 << 30)
    out = fn(*args)
    monkeypatch.undo()
    return out


@pytest.mark.parametrize("b", [530, 521])
def test_dense_layer_chunked(rng, monkeypatch, b):
    l_in, c_in, l_out, c_out = 16, 8, 16, 8
    x = jnp.asarray(rng.normal(size=(b, l_in * c_in)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(l_in * c_in, l_out * c_out)) * 0.2,
                    jnp.float32)

    def f(x, m):
        return pf.fused_dense_layer(
            x, m, l_out=l_out, c_out=c_out, norm="in", act="relu"
        ).sum()

    ref = _with_whole_batch(
        monkeypatch, jax.value_and_grad(f, argnums=(0, 1)), x, m)
    got = jax.value_and_grad(f, argnums=(0, 1))(x, m)
    assert pf._split_rows(b)[0] < b  # the chunked path actually engaged
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    np.testing.assert_allclose(got[1][0], ref[1][0], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(got[1][1], ref[1][1], rtol=5e-4, atol=5e-4)


def test_in_pair_chunked(rng, monkeypatch):
    b, l1, c1 = 530, 16, 8
    l2, c2 = 8, 16
    x = jnp.asarray(rng.normal(size=(b, 32 * 4)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(32 * 4, l1 * c1)) * 0.2, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(l1 * c1, l2 * c2)) * 0.2, jnp.float32)

    def f(x, m1, m2):
        return pf.fused_in_pair(x, m1, m2, l1=l1, c1=c1, l2=l2, c2=c2).sum()

    ref = _with_whole_batch(
        monkeypatch, jax.value_and_grad(f, argnums=(0, 1, 2)), x, m1, m2)
    got = jax.value_and_grad(f, argnums=(0, 1, 2))(x, m1, m2)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    for g, r in zip(got[1], ref[1]):
        np.testing.assert_allclose(g, r, rtol=5e-4, atol=5e-4)


def test_sln_chain_chunked(rng, monkeypatch):
    b = 530
    l0, d = 8, 16  # two upsample stages: (8,16) -> (16,8) -> (32,4)
    ns = (16 * 8, 32 * 4)
    n_mid, n_out = 32, 20
    x = jnp.asarray(rng.normal(size=(b, l0 * d)), jnp.float32)
    ms = tuple(
        jnp.asarray(rng.normal(size=s) * 0.2, jnp.float32)
        for s in [(l0 * d, ns[0]), (ns[0], ns[1])]
    )
    gammas = tuple(
        jnp.asarray(rng.uniform(size=(1, n)), jnp.float32) for n in ns)
    betas = tuple(
        jnp.asarray(rng.normal(size=(1, n)) * 0.1, jnp.float32) for n in ns)
    biases = tuple(
        jnp.asarray(rng.normal(size=(n,)) * 0.1, jnp.float32) for n in ns)
    mo = jnp.asarray(rng.normal(size=(ns[1], n_mid)) * 0.2, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(1, n_mid)) * 0.1, jnp.float32)
    pool = jnp.asarray(rng.normal(size=(n_mid, n_out)) * 0.2, jnp.float32)

    def f(x, ms, mo):
        return pf.fused_sln_chain(
            x, ms, gammas, betas, mo, bo, pool, biases=biases
        ).sum()

    ref = _with_whole_batch(
        monkeypatch, jax.value_and_grad(f, argnums=(0, 1, 2)), x, ms, mo)
    got = jax.value_and_grad(f, argnums=(0, 1, 2))(x, ms, mo)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    np.testing.assert_allclose(got[1][0], ref[1][0], rtol=5e-4, atol=5e-4)
    for g, r in zip(got[1][1], ref[1][1]):
        np.testing.assert_allclose(g, r, rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(got[1][2], ref[1][2], rtol=5e-4, atol=5e-4)


def test_mlp_chain_chunked(rng, monkeypatch):
    b = 530
    dims = [16, 64, 32, 1]
    x = jnp.asarray(rng.normal(size=(b, dims[0])), jnp.float32)
    ws = tuple(
        jnp.asarray(rng.normal(size=(dims[j], dims[j + 1])) * 0.3, jnp.float32)
        for j in range(3)
    )
    bs = tuple(
        jnp.asarray(rng.normal(size=(dims[j + 1],)) * 0.1, jnp.float32)
        for j in range(3)
    )

    def f(x, ws):
        return pf.fused_mlp_chain(x, ws, bs, (0.2, 0.2, 1.0)).sum()

    ref = _with_whole_batch(
        monkeypatch, jax.value_and_grad(f, argnums=(0, 1)), x, ws)
    got = jax.value_and_grad(f, argnums=(0, 1))(x, ws)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    np.testing.assert_allclose(got[1][0], ref[1][0], rtol=5e-4, atol=5e-4)
    for g, r in zip(got[1][1], ref[1][1]):
        np.testing.assert_allclose(g, r, rtol=5e-4, atol=5e-4)


def test_adain_res_chunked(rng, monkeypatch):
    """fused_adain_layer with per-sample affines AND residual — all four
    operands row-chunk together."""
    b, l, c = 530, 8, 16
    n = l * c
    x = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    m = jnp.asarray(rng.normal(size=(n, n)) * 0.2, jnp.float32)
    gam = jnp.asarray(rng.uniform(size=(b, n)), jnp.float32)
    bet = jnp.asarray(rng.normal(size=(b, n)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)

    def f(x, m, gam):
        return pf.fused_adain_layer(
            x, m, gam, bet, l_out=l, c_out=c, act="none", residual=res
        ).sum()

    ref = _with_whole_batch(
        monkeypatch, jax.value_and_grad(f, argnums=(0, 1, 2)), x, m, gam)
    got = jax.value_and_grad(f, argnums=(0, 1, 2))(x, m, gam)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    for g, r in zip(got[1], ref[1]):
        np.testing.assert_allclose(g, r, rtol=5e-4, atol=5e-4)


def test_adain_res_block_chunked(rng, monkeypatch):
    """fused_adain_res_block: whole block with four per-sample affines —
    five batched operands row-chunk together, m1/m2 closed over."""
    b, l, c = 530, 8, 16
    n = l * c
    x = jnp.asarray(rng.normal(size=(b, n)), jnp.float32)
    m1 = jnp.asarray(rng.normal(size=(n, n)) * 0.2, jnp.float32)
    m2 = jnp.asarray(rng.normal(size=(n, n)) * 0.2, jnp.float32)
    g1, g2 = (jnp.asarray(rng.uniform(size=(b, n)), jnp.float32)
              for _ in range(2))
    b1, b2 = (jnp.asarray(rng.normal(size=(b, n)) * 0.1, jnp.float32)
              for _ in range(2))

    def f(x, m1, g1):
        return pf.fused_adain_res_block(
            x, m1, m2, g1, b1, g2, b2, l_out=l, c_out=c
        ).sum()

    ref = _with_whole_batch(
        monkeypatch, jax.value_and_grad(f, argnums=(0, 1, 2)), x, m1, g1)
    got = jax.value_and_grad(f, argnums=(0, 1, 2))(x, m1, g1)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-5)
    for g, r in zip(got[1], ref[1]):
        np.testing.assert_allclose(g, r, rtol=5e-4, atol=5e-4)


def test_split_rows_policy():
    assert pf._split_rows(500) == (500, 0)      # flagship: untouched
    assert pf._split_rows(512) == (512, 0)
    assert pf._split_rows(1000) == (500, 0)
    assert pf._split_rows(2000) == (500, 0)
    assert pf._split_rows(4096) == (512, 0)
    c, pad = pf._split_rows(521)                # prime: zero-pad
    assert c == 512 and (521 + pad) % 512 == 0
