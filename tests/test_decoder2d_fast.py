"""Parity of the fast Decoder2d lowering (W-folded residual tail, 4-phase
subpixel upsample convs, column-0-only final stage) against the dense
reference op sequence — one parameter set, two lowerings."""

import jax
import jax.numpy as jnp
import numpy as np

from iinsvae_tpu.models.decoders import Decoder, Decoder2d
from iinsvae_tpu.ops import subpixel as sp
from iinsvae_tpu.ops import conv as conv_ops


def test_phase_kernel_incidence_partition():
    # every (phase, tap) lands in exactly one cell: rows sum to 1
    ph = sp._phase_incidence_np(5)
    np.testing.assert_array_equal(ph.sum(axis=1), np.ones((2, 5)))


def test_upsample_conv5_phase_matches_dense():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 6))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (5, 5, 6, 3))
    bias = jax.random.normal(jax.random.PRNGKey(2), (3,))
    got = sp.pixel_shuffle2(sp.upsample_conv5_phase(x, kernel, bias))
    up = conv_ops.upsample_nearest2d(x, 2)
    want = conv_ops.conv2d(up, kernel, bias, padding=2)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_conv3_im2col_matches_xla():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 4))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 6))
    got = sp.conv3_im2col(x, kernel)
    want = conv_ops.conv2d(x, kernel, None, padding=1)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _decoder_io(key):
    rc = jax.random.normal(key, (3, 8, 8, 2))
    ec = jax.random.normal(jax.random.fold_in(key, 1), (3, 8))
    return rc, ec


def test_decoder2d_fast_vs_dense():
    rc, ec = _decoder_io(jax.random.PRNGKey(0))
    dense = Decoder2d(lowering="dense")
    fast = Decoder2d(lowering="fast")
    variables = dense.init(jax.random.PRNGKey(1), rc, ec)
    full = dense.apply(variables, rc, ec)  # (B, 157, 157, 1)
    col0 = fast.apply(variables, rc, ec)  # (B, 157)
    assert full.shape == (3, 157, 157, 1) and col0.shape == (3, 157)
    np.testing.assert_allclose(col0, full[:, :, 0, 0], rtol=5e-4, atol=5e-5)


def test_decoder_facade_fast_vs_dense():
    rc, ec = _decoder_io(jax.random.PRNGKey(2))
    dec_d = Decoder(conv_type=2, expand=True, lowering="dense")
    dec_f = Decoder(conv_type=2, expand=True, lowering="fast")
    variables = dec_d.init(jax.random.PRNGKey(1), rc, ec)
    out_dense = dec_d.apply(variables, rc, ec)
    out_fast = dec_f.apply(variables, rc, ec)
    np.testing.assert_allclose(out_fast, out_dense, rtol=5e-4, atol=5e-5)


def test_decoder_facade_fast_grad_matches_dense():
    # small config — see test_colgroups.py's grad test note
    rc, ec = _decoder_io(jax.random.PRNGKey(3))
    dec_d = Decoder(conv_type=2, expand=True, dim=2, n_residual=1,
                    lowering="dense")
    dec_f = Decoder(conv_type=2, expand=True, dim=2, n_residual=1,
                    lowering="fast")
    variables = dec_d.init(jax.random.PRNGKey(1), rc, ec)

    def loss(dec):
        def inner(params, rc_in, ec_in):
            return jnp.sum(dec.apply({"params": params}, rc_in, ec_in) ** 2)
        return inner

    g_dense, gx_dense = jax.grad(loss(dec_d), argnums=(0, 1))(
        variables["params"], rc, ec)
    g_fast, gx_fast = jax.grad(loss(dec_f), argnums=(0, 1))(
        variables["params"], rc, ec)
    np.testing.assert_allclose(gx_fast, gx_dense, rtol=5e-3, atol=1e-4)
    flat_d = jax.tree_util.tree_leaves_with_path(g_dense)
    flat_f = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_fast)}
    for k, vd in flat_d:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            flat_f[ks], vd, rtol=5e-3, atol=2e-4,
            err_msg=f"grad mismatch at {ks}")


def test_decoder2d_shuffle_first_exact():
    # conv -> shuffle -> SLN(per-channel) -> relu is an exact reorder of
    # conv -> SLN(tiled) -> relu -> shuffle (whole-tensor per-sample stats
    # are layout-invariant); the A/B knob must not change the output
    rc, ec = _decoder_io(jax.random.PRNGKey(4))
    fast = Decoder2d(lowering="fast")
    reordering = Decoder2d(lowering="fast", shuffle_first=True)
    variables = fast.init(jax.random.PRNGKey(1), rc, ec)
    base = fast.apply(variables, rc, ec)
    reordered = reordering.apply(variables, rc, ec)
    np.testing.assert_allclose(reordered, base, rtol=2e-5, atol=2e-5)


def test_conv2d_column_image_routes_to_1d():
    # (k,1) kernels on (B, L, 1, C) column images (conv_type=3) must match
    # the general XLA conv lowering exactly
    from jax import lax
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 1, 3))
    kernel = jax.random.normal(jax.random.PRNGKey(1), (4, 1, 3, 5))
    bias = jax.random.normal(jax.random.PRNGKey(2), (5,))
    got = conv_ops.conv2d(x, kernel, bias, stride=(2, 1),
                          padding=((1, 1), (0, 0)))
    want = lax.conv_general_dilated(
        x, kernel, window_strides=(2, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
