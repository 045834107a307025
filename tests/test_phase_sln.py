"""Parity: fused channels-first upsample stage (ops/pallas/phase_sln.py)
vs the composed oracle (subpixel phase conv -> sample_layer_norm -> relu),
forward and gradients. Reference semantics: models.py:509-517."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.ops import subpixel as sp
from iinsvae_tpu.ops.norms import sample_layer_norm
from iinsvae_tpu.ops.pallas import phase_sln


@pytest.fixture(autouse=True)
def _enable_phase_sln():
    # default is OFF (measured rejection — see phase_sln.py); parity tests
    # opt in explicitly
    phase_sln.set_enabled(True)
    yield
    phase_sln.set_enabled(False)


def _oracle(x_cf, k5, bias, gamma, beta):
    """Channels-last composed stage; returns the PRE-shuffle phase field
    re-laid channels-first to match the kernel's output."""
    x = x_cf.transpose(0, 2, 3, 1)  # (B, H, W, C)
    z = sp.upsample_conv5_phase(x, k5, bias)  # (B, H, W, 4C')
    z = sample_layer_norm(z, jnp.tile(gamma, 4), jnp.tile(beta, 4))
    z = jax.nn.relu(z)
    return z.transpose(0, 3, 1, 2)  # (B, 4C', H, W)


def _mk(b, ci, h, w, dtype=jnp.float32, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 5)
    co = ci // 2
    x = jax.random.normal(ks[0], (b, ci, h, w), dtype)
    k5 = (jax.random.normal(ks[1], (5, 5, ci, co), jnp.float32) * 0.1).astype(dtype)
    bias = jax.random.normal(ks[2], (co,), dtype) * 0.1
    gamma = jax.random.uniform(ks[3], (co,), dtype)
    beta = jax.random.normal(ks[4], (co,), dtype) * 0.1
    return x, k5, bias, gamma, beta


@pytest.mark.parametrize("geom", [(3, 8, 16, 16), (2, 4, 32, 32)])
def test_forward_parity(geom):
    b, ci, h, w = geom
    x, k5, bias, gamma, beta = _mk(b, ci, h, w)
    got = phase_sln.fused_upsample_sln(x, k5, bias, gamma, beta)
    want = _oracle(x, k5, bias, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_shuffle_parity():
    b, ci, h, w = 2, 8, 16, 16
    x, k5, bias, gamma, beta = _mk(b, ci, h, w, seed=3)
    z = phase_sln.fused_upsample_sln(x, k5, bias, gamma, beta)
    got = phase_sln.pixel_shuffle2_cf(z)  # (B, C', 2H, 2W)
    zl = _oracle(x, k5, bias, gamma, beta).transpose(0, 2, 3, 1)
    want = sp.pixel_shuffle2(zl).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_grad_parity():
    b, ci, h, w = 2, 8, 16, 16
    x, k5, bias, gamma, beta = _mk(b, ci, h, w, seed=1)

    def loss_fused(x, k5, bias, gamma, beta):
        y = phase_sln.fused_upsample_sln(x, k5, bias, gamma, beta)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.13))

    def loss_oracle(x, k5, bias, gamma, beta):
        y = _oracle(x, k5, bias, gamma, beta)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.13))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, k5, bias, gamma, beta)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(x, k5, bias, gamma, beta)
    for a, b_, name in zip(gf, go, ["dx", "dk5", "dbias", "dgamma", "dbeta"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=3e-3, atol=3e-4, err_msg=name
        )


def test_grid_accumulation():
    """Batch larger than one chunk: weight grads accumulate across the
    sample grid exactly (forced tiny budget via many samples)."""
    b, ci, h, w = 6, 4, 16, 16
    x, k5, bias, gamma, beta = _mk(b, ci, h, w, seed=2)

    def loss(fn):
        def f(k5):
            y = fn(x, k5, bias, gamma, beta)
            return jnp.sum(y**2)
        return f

    gf = jax.grad(loss(phase_sln.fused_upsample_sln))(k5)
    go = jax.grad(loss(_oracle))(k5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(go),
                               rtol=3e-3, atol=3e-4)


def test_bf16_forward():
    b, ci, h, w = 2, 8, 16, 16
    x, k5, bias, gamma, beta = _mk(b, ci, h, w, dtype=jnp.bfloat16, seed=4)
    got = phase_sln.fused_upsample_sln(x, k5, bias, gamma, beta)
    want = _oracle(x, k5, bias, gamma, beta)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=6e-2, atol=6e-2,
    )


def test_applicable_gate():
    # default OFF: measured 2.65x decoder regression vs the XLA path
    # (phase_sln.py module comment) — never engages unless opted in
    phase_sln.set_enabled(False)
    assert not phase_sln.applicable(16, 16, 32)
    phase_sln.set_enabled(True)
    assert not phase_sln.applicable(8, 8, 64)  # 64 lanes: XLA path
    assert phase_sln.applicable(16, 16, 32)
    assert phase_sln.applicable(64, 64, 8)
    assert not phase_sln.applicable(16, 16, 32, b=500)  # interpret cap
