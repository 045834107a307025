"""The 1-D flagship has three lowerings per module — 'handbuilt'
(round-2 specialized kernels, the TPU default), 'chain' (generic fused-
chain builder), and the composed dense path (pallas disabled) — all the
same math. These tests pin fwd + grad parity across the three.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.models import encoders as enc_mod
from iinsvae_tpu.models import decoders as dec_mod
from iinsvae_tpu.ops.pallas import fused as pf


@pytest.fixture(autouse=True)
def _restore_impls():
    yield
    enc_mod.set_enc1d_impl("handbuilt")
    dec_mod.set_dec1d_impl("handbuilt")
    pf.set_pallas_enabled(True)


def _enc_out_and_grad(x):
    enc = enc_mod.RangeEncoder1d(dim=4, n_residual=3, n_downsample=4, out_dim=2)
    variables = enc.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(p, x):
        return jnp.sum(enc.apply({"params": p}, x) ** 2)

    out = enc.apply(variables, x)
    g = jax.grad(loss)(variables["params"], x)
    return out, g


def _dec_out_and_grad(rc, ec):
    dec = dec_mod.Decoder1d(dim=4, n_residual=3, n_upsample=4, in_dim=157,
                            out_dim=2, style_dim=8)
    variables = dec.init({"params": jax.random.PRNGKey(0)}, rc, ec)

    def loss(p, rc):
        return jnp.sum(dec.apply({"params": p}, rc, ec) ** 2)

    out = dec.apply(variables, rc, ec)
    g = jax.grad(loss)(variables["params"], rc)
    return out, g


def _assert_trees_close(a, b, atol):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for ta, tb in zip(la, lb):
        np.testing.assert_allclose(np.asarray(ta), np.asarray(tb),
                                   atol=atol, rtol=1e-4)


def test_enc1d_impls_agree():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((8, 157, 1)), jnp.float32)
    enc_mod.set_enc1d_impl("handbuilt")
    out_h, g_h = _enc_out_and_grad(x)
    enc_mod.set_enc1d_impl("chain")
    out_c, g_c = _enc_out_and_grad(x)
    pf.set_pallas_enabled(False)
    out_d, g_d = _enc_out_and_grad(x)
    pf.set_pallas_enabled(True)
    _assert_trees_close(out_h, out_c, atol=1e-4)
    _assert_trees_close(out_h, out_d, atol=1e-4)
    _assert_trees_close(g_h, g_c, atol=1e-3)
    _assert_trees_close(g_h, g_d, atol=1e-3)


def test_enc1d_impls_agree_bf16():
    # the flagship --compute_dtype bfloat16 option drives the same
    # lowerings at bf16 inputs; parity band widened for bf16 rounding
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((8, 157, 1)), jnp.bfloat16)
    enc_mod.set_enc1d_impl("handbuilt")
    out_h, g_h = _enc_out_and_grad(x)
    enc_mod.set_enc1d_impl("chain")
    out_c, g_c = _enc_out_and_grad(x)
    _assert_trees_close(
        jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), out_h),
        jax.tree_util.tree_map(lambda t: t.astype(jnp.float32), out_c),
        atol=5e-2)


def test_dec1d_impls_agree():
    rng = np.random.default_rng(1)
    rc = jnp.asarray(rng.standard_normal((8, 8, 2)), jnp.float32)
    ec = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    dec_mod.set_dec1d_impl("handbuilt")
    out_h, g_h = _dec_out_and_grad(rc, ec)
    dec_mod.set_dec1d_impl("chain")
    out_c, g_c = _dec_out_and_grad(rc, ec)
    pf.set_pallas_enabled(False)
    out_d, g_d = _dec_out_and_grad(rc, ec)
    pf.set_pallas_enabled(True)
    _assert_trees_close(out_h, out_c, atol=1e-4)
    _assert_trees_close(out_h, out_d, atol=1e-4)
    _assert_trees_close(g_h, g_c, atol=1e-3)
    _assert_trees_close(g_h, g_d, atol=1e-3)


def test_impl_field_overrides_module_default():
    # the construction-time ``impl`` field wins over the set_*_impl module
    # default, so a model built with an explicit lowering keeps it even if
    # the global is flipped after tracing began (ADVICE round-2 item 1)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 157, 1)), jnp.float32)
    enc_mod.set_enc1d_impl("handbuilt")
    enc_chain = enc_mod.RangeEncoder1d(dim=4, impl="chain")
    v = enc_chain.init({"params": jax.random.PRNGKey(0)}, x)
    out_field = enc_chain.apply(v, x)
    enc_mod.set_enc1d_impl("chain")
    enc_default = enc_mod.RangeEncoder1d(dim=4)
    out_global = enc_default.apply(v, x)
    _assert_trees_close(out_field, out_global, atol=1e-6)

    rc = jnp.asarray(rng.standard_normal((4, 8, 2)), jnp.float32)
    ec = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    dec_mod.set_dec1d_impl("handbuilt")
    dec_chain = dec_mod.Decoder1d(impl="chain")
    vd = dec_chain.init({"params": jax.random.PRNGKey(1)}, rc, ec)
    out_dfield = dec_chain.apply(vd, rc, ec)
    dec_mod.set_dec1d_impl("chain")
    out_dglobal = dec_mod.Decoder1d().apply(vd, rc, ec)
    _assert_trees_close(out_dfield, out_dglobal, atol=1e-6)
