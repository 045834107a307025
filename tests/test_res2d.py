"""Parity of the fused 8x8 residual-block kernel (ops/pallas/res2d.py)
against the composed dense op sequence — forward and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.ops import conv as conv_ops
from iinsvae_tpu.ops import norms as norm_ops
from iinsvae_tpu.ops.pallas.res2d import assemble_w3, fused_res_block_2d


def _oracle_block(x, k1, k2, norm, g1=None, b1=None, g2=None, b2=None):
    """The reference op sequence (models.py:988-1045 semantics, dense)."""
    y = conv_ops.conv2d(x, k1, None, padding=1, pad_mode="reflect")
    y = norm_ops.adain(y, g1, b1) if norm == "adain" else norm_ops.instance_norm(y)
    y = jax.nn.relu(y)
    y = conv_ops.conv2d(y, k2, None, padding=1, pad_mode="reflect")
    y = norm_ops.adain(y, g2, b2) if norm == "adain" else norm_ops.instance_norm(y)
    return x + y


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    b, h, w, c = 6, 8, 8, 16  # w*c = 128 lanes
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32)
    g1 = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    g2 = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    return x, k1, k2, g1, b1, g2, b2


def test_assemble_w3_matches_conv(data):
    x, k1, *_ = data
    b, h, w, c = x.shape
    w3 = assemble_w3(k1, w)
    x2 = x.reshape(b * h, w * c)
    # apply only the center H-tap on interior rows and compare
    wc = w * c
    y_mid = x2 @ w3[wc : 2 * wc]
    ref = conv_ops.conv2d(x, k1[1:2], None, padding=((0, 0), (1, 1)),
                          pad_mode="reflect")
    np.testing.assert_allclose(
        np.asarray(y_mid.reshape(b, h, w, c)), np.asarray(ref),
        rtol=1e-5, atol=1e-5,
    )


def test_in_forward_parity(data):
    x, k1, k2, *_ = data
    got = fused_res_block_2d(x, k1, k2, norm="in")
    want = _oracle_block(x, k1, k2, "in")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_adain_forward_parity(data):
    x, k1, k2, g1, b1, g2, b2 = data
    got = fused_res_block_2d(x, k1, k2, norm="adain",
                             gamma1=g1, beta1=b1, gamma2=g2, beta2=b2)
    want = _oracle_block(x, k1, k2, "adain", g1, b1, g2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_in_grad_parity(data):
    x, k1, k2, *_ = data

    def loss_fused(x, k1, k2):
        y = fused_res_block_2d(x, k1, k2, norm="in")
        return jnp.sum(y * y * 0.01)

    def loss_ref(x, k1, k2):
        y = _oracle_block(x, k1, k2, "in")
        return jnp.sum(y * y * 0.01)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k1, k2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k1, k2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_adain_grad_parity(data):
    x, k1, k2, g1, b1, g2, b2 = data

    def loss_fused(args):
        x, k1, k2, g1, b1, g2, b2 = args
        y = fused_res_block_2d(x, k1, k2, norm="adain",
                               gamma1=g1, beta1=b1, gamma2=g2, beta2=b2)
        return jnp.sum(y * y * 0.01)

    def loss_ref(args):
        x, k1, k2, g1, b1, g2, b2 = args
        y = _oracle_block(x, k1, k2, "adain", g1, b1, g2, b2)
        return jnp.sum(y * y * 0.01)

    args = (x, k1, k2, g1, b1, g2, b2)
    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_gridded_batch_matches_single_chunk(data, monkeypatch):
    """Force a multi-step batch grid and check identical results (weight
    grads accumulate across grid steps)."""
    import iinsvae_tpu.ops.pallas.res2d as r2

    x, k1, k2, *_ = data
    whole = fused_res_block_2d(x, k1, k2, norm="in")
    monkeypatch.setattr(r2, "_chunk", lambda b, lanes: 2)
    r2._make_block.cache_clear()
    try:
        split = fused_res_block_2d(x, k1, k2, norm="in")
        g_whole = jax.grad(
            lambda k: jnp.sum(fused_res_block_2d(x, k, k2, norm="in") ** 2)
        )(k1)
    finally:
        monkeypatch.undo()
        r2._make_block.cache_clear()
    g_ref = jax.grad(
        lambda k: jnp.sum(fused_res_block_2d(x, k, k2, norm="in") ** 2)
    )(k1)
    np.testing.assert_allclose(np.asarray(split), np.asarray(whole),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_whole), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-4)


def test_res2d_near_constant_segment_finite():
    """Variance via E[x^2]-E[x]^2 cancels catastrophically on large
    near-constant segments; the sign of the error is accumulation-order-
    dependent, so a backend update can flip it negative -> rsqrt NaN
    (observed on the 2026-08-20 v5e backend update, BASELINE.md round-4
    log). The clamp in _in_stats must keep the kernel finite."""
    import numpy as np
    import jax.numpy as jnp
    from iinsvae_tpu.ops.pallas import res2d

    rng = np.random.default_rng(0)
    x = np.asarray(rng.standard_normal((4, 8, 8, 64)), np.float32)
    x[1, :, :, 7] = 100.0   # exactly constant, large magnitude
    x[2, :, :, :] = 50.0    # whole sample constant
    k1 = np.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.02, np.float32)
    k2 = np.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.02, np.float32)
    y = res2d.fused_res_block_2d(jnp.asarray(x), jnp.asarray(k1), jnp.asarray(k2), norm="in")
    assert bool(jnp.isfinite(y).all())
