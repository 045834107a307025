"""Pallas fused-kernel parity tests (interpret mode on the CPU platform).

The fused path must be numerically equivalent (float noise only) to the
composed dense-conv + norm + act path for both forward values and VJPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.ops.dense_conv import conv1d_dense, dense_conv_matrix
from iinsvae_tpu.ops.norms import instance_norm
from iinsvae_tpu.ops.pallas.fused import fused_dense_layer, set_pallas_enabled
from iinsvae_tpu.models import IInsVAE


@pytest.fixture(autouse=True)
def _reset_pallas():
    set_pallas_enabled(True)
    yield
    set_pallas_enabled(True)


def _ref_layer(x2, kernel, l_in, c_in, norm, act, stride, padding, pad_mode, residual=None, bias=None):
    x = x2.reshape(x2.shape[0], l_in, c_in)
    y = conv1d_dense(x, kernel, bias, stride=stride, padding=padding, pad_mode=pad_mode)
    if norm == "in":
        y = instance_norm(y)
    if act == "relu":
        y = jax.nn.relu(y)
    elif act == "tanh":
        y = jnp.tanh(y)
    if residual is not None:
        y = y + residual.reshape(y.shape)
    return y.reshape(y.shape[0], -1)


@pytest.mark.parametrize(
    "l_in,c_in,c_out,k,stride,pad,pad_mode,norm,act,res,bias",
    [
        (128, 1, 4, 7, 1, 3, "reflect", "in", "relu", False, False),
        (128, 4, 8, 4, 2, 1, "zero", "in", "relu", False, False),
        (8, 64, 64, 3, 1, 1, "reflect", "in", "relu", False, False),
        (8, 64, 64, 3, 1, 1, "reflect", "in", "none", True, False),
        (128, 1, 4, 7, 1, 3, "reflect", "none", "relu", False, True),
        (8, 64, 2, 1, 1, 0, "zero", "none", "relu", False, True),
        (128, 4, 1, 7, 1, 3, "reflect", "none", "tanh", False, True),
    ],
)
def test_fused_layer_matches_composed(rng, l_in, c_in, c_out, k, stride, pad, pad_mode, norm, act, res, bias):
    b = 6
    l_out = (l_in + 2 * pad - k) // stride + 1
    x2 = jnp.asarray(rng.normal(size=(b, l_in * c_in)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(k, c_in, c_out)) * 0.2, jnp.float32)
    residual = (
        jnp.asarray(rng.normal(size=(b, l_out * c_out)), jnp.float32) if res else None
    )
    bias_v = jnp.asarray(rng.normal(size=(c_out,)), jnp.float32) if bias else None

    def fused(x2, kernel, *extra):
        m = dense_conv_matrix(kernel, l_in, stride=stride, padding=pad, pad_mode=pad_mode)
        fb = jnp.tile(bias_v, l_out) if bias else None
        return fused_dense_layer(
            x2, m, l_out=l_out, c_out=c_out, norm=norm, act=act,
            residual=residual, bias=fb,
        )

    got = fused(x2, kernel)
    want = _ref_layer(x2, kernel, l_in, c_in, norm, act, stride, pad, pad_mode, residual, bias_v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    # VJP parity
    g1 = jax.grad(lambda a, w: fused(a, w).sum())(x2, kernel)
    g0 = jax.grad(
        lambda a, w: _ref_layer(a, w, l_in, c_in, norm, act, stride, pad, pad_mode, residual, bias_v).sum()
    )(x2, kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-3, atol=1e-4)
    gk1 = jax.grad(lambda w: fused(x2, w).sum())(kernel)
    gk0 = jax.grad(
        lambda w: _ref_layer(x2, w, l_in, c_in, norm, act, stride, pad, pad_mode, residual, bias_v).sum()
    )(kernel)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0), rtol=1e-3, atol=2e-4)


def test_full_model_fused_vs_unfused_grads(rng):
    x = jnp.asarray(rng.normal(size=(8, 157)), jnp.float32)
    m = IInsVAE(cir_len=157, num_classes=5)
    v = m.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(p, on):
        set_pallas_enabled(on)
        out = m.apply({"params": p, "batch_stats": {}}, x)
        return out["recon"].sum() + out["err_est"].sum() + out["logits"].sum() + out["kl"]

    l1, g1 = jax.value_and_grad(lambda p: loss(p, True))(v["params"])
    l0, g0 = jax.value_and_grad(lambda p: loss(p, False))(v["params"])
    assert abs(float(l1) - float(l0)) < 1e-3
    # scale-aware: per leaf, the worst element must be within 2e-3 of the
    # leaf's grad magnitude (reduction-order float noise only)
    def ok(a, b):
        d = float(jnp.max(jnp.abs(a - b)))
        s = float(jnp.max(jnp.abs(b)))
        return d <= 1e-5 + 2e-3 * s
    bad = [
        jax.tree_util.keystr(p)
        for (p, a), b in zip(jax.tree_util.tree_leaves_with_path(g1), jax.tree.leaves(g0))
        if not ok(a, b)
    ]
    assert not bad, bad


@pytest.mark.parametrize(
    "b,l_in,c_in,c_out",
    [
        (6, 128, 16, 32),   # env stage 2: channel-doubling, 128-lane rows
        (6, 64, 32, 64),    # env stage 3
        (5, 128, 16, 32),   # odd batch -> single-sample grid chunks
        (12, 64, 64, 128),  # c_out == 128 lane-filling edge
        (6, 32, 64, 64),    # env stage 4: constant-depth, 256-lane rows
        (7, 16, 64, 64),    # env stage 5 (flagship n_downsample=4)
    ],
)
def test_fused_strided_conv_matches_composed(rng, b, l_in, c_in, c_out):
    from iinsvae_tpu.ops.pallas.strided_conv import applicable, fused_strided_conv

    assert applicable(l_in, c_in, c_out, 4, 2, 1, "zero")
    x = jnp.asarray(rng.normal(size=(b, l_in, c_in)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(4, c_in, c_out)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c_out,)), jnp.float32)

    def fused(x, kernel, bias):
        return fused_strided_conv(x, kernel, bias, l_in=l_in, c_in=c_in)

    def ref(x, kernel, bias):
        return jax.nn.relu(
            conv1d_dense(x, kernel, bias, stride=2, padding=1, pad_mode="zero")
        )

    got, want = fused(x, kernel, bias), ref(x, kernel, bias)
    assert got.shape == (b, l_in // 2, c_out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)

    for arg in range(3):
        g1 = jax.grad(lambda *a: fused(*a).sum(), argnums=arg)(x, kernel, bias)
        g0 = jax.grad(lambda *a: ref(*a).sum(), argnums=arg)(x, kernel, bias)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g0), rtol=1e-3, atol=2e-4,
            err_msg=f"grad argnum {arg}",
        )


def test_env_encoder_routes_wide_stages_to_strided_kernel(rng, monkeypatch):
    """The flagship env encoder's two 2048-wide stages must hit the
    strided-conv kernel (not the im2col fallback)."""
    import iinsvae_tpu.ops.pallas.strided_conv as sc
    from iinsvae_tpu.models.encoders import EnvEncoder1d

    calls = []
    orig = sc.fused_strided_conv

    def spy(x, kernel, bias, *, l_in, c_in):
        calls.append((l_in, c_in))
        return orig(x, kernel, bias, l_in=l_in, c_in=c_in)

    monkeypatch.setattr(sc, "fused_strided_conv", spy)
    enc = EnvEncoder1d(dim=16, n_downsample=2, style_dim=16)
    x = jnp.asarray(rng.normal(size=(4, 157, 1)), jnp.float32)
    v = enc.init({"params": jax.random.PRNGKey(0)}, x)
    enc.apply(v, x)
    assert (128, 16) in calls and (64, 32) in calls, calls


@pytest.mark.parametrize("b", [6, 16])
def test_fused_adain_res_block_matches_composed(rng, b):
    """Whole AdaIN residual block kernel == composed conv/adain/relu math,
    values and every VJP (x, both convs, all four per-sample affines)."""
    from iinsvae_tpu.ops.norms import adain
    from iinsvae_tpu.ops.pallas.fused import fused_adain_res_block

    l, c = 8, 64
    x2 = jnp.asarray(rng.normal(size=(b, l * c)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(3, c, c)) * 0.2, jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, c, c)) * 0.2, jnp.float32)
    affs = [jnp.asarray(rng.normal(size=(b, c)), jnp.float32) for _ in range(4)]
    g1, b1, g2, b2 = affs

    def fused(x2, k1, k2, g1, b1, g2, b2):
        m1 = dense_conv_matrix(k1, l, padding=1, pad_mode="reflect")
        m2 = dense_conv_matrix(k2, l, padding=1, pad_mode="reflect")
        return fused_adain_res_block(
            x2, m1, m2,
            jnp.tile(g1, (1, l)), jnp.tile(b1, (1, l)),
            jnp.tile(g2, (1, l)), jnp.tile(b2, (1, l)),
            l_out=l, c_out=c,
        )

    def composed(x2, k1, k2, g1, b1, g2, b2):
        x = x2.reshape(b, l, c)
        y = conv1d_dense(x, k1, None, padding=1, pad_mode="reflect")
        y = jax.nn.relu(adain(y, g1, b1))
        y = conv1d_dense(y, k2, None, padding=1, pad_mode="reflect")
        return (x + adain(y, g2, b2)).reshape(b, l * c)

    args = (x2, k1, k2, g1, b1, g2, b2)
    np.testing.assert_allclose(
        np.asarray(fused(*args)), np.asarray(composed(*args)), rtol=1e-4, atol=1e-4
    )
    for i in range(7):
        ga = jax.grad(lambda *a: fused(*a).sum(), argnums=i)(*args)
        gb = jax.grad(lambda *a: composed(*a).sum(), argnums=i)(*args)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-3, atol=3e-4,
            err_msg=f"grad argnum {i}",
        )


def test_fused_in_pair_matches_composed(rng):
    from iinsvae_tpu.ops.pallas.fused import fused_in_pair
    from iinsvae_tpu.ops import dense_conv as dense_ops
    from iinsvae_tpu.ops.norms import instance_norm

    x = jnp.asarray(rng.normal(size=(6, 128, 1)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(7, 1, 4)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(4, 4, 8)) * 0.1, jnp.float32)

    def composed(x, k1, k2):
        y = dense_ops.conv1d_dense(x, k1, None, padding=3, pad_mode="reflect")
        y = jax.nn.relu(instance_norm(y))
        y = dense_ops.conv1d_dense(y, k2, None, stride=2, padding=1)
        return jax.nn.relu(instance_norm(y))

    def paired(x, k1, k2):
        m1 = dense_ops.dense_conv_matrix(k1, 128, padding=3,
                                         pad_mode="reflect", centered=True)
        m2 = dense_ops.dense_conv_matrix(k2, 128, stride=2, padding=1,
                                         centered=True)
        out = fused_in_pair(x.reshape(6, 128), m1, m2,
                            l1=128, c1=4, l2=64, c2=8, centered=True)
        return out.reshape(6, 64, 8)

    want = composed(x, k1, k2)
    got = paired(x, k1, k2)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # gradients through both stages' kernels
    gw = jax.grad(lambda a, b: composed(x, a, b).sum(), argnums=(0, 1))(k1, k2)
    gg = jax.grad(lambda a, b: paired(x, a, b).sum(), argnums=(0, 1))(k1, k2)
    for a, b in zip(gg, gw):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_fused_sln_chain_matches_composed(rng):
    from iinsvae_tpu.ops.pallas.fused import fused_sln_chain
    from iinsvae_tpu.ops import dense_conv as dense_ops
    from iinsvae_tpu.ops.norms import sample_layer_norm
    from iinsvae_tpu.ops.conv import upsample_nearest1d, conv1d
    from iinsvae_tpu.ops.pooling import adaptive_avg_pool_matrix, adaptive_avg_pool1d

    b, l0, c0 = 4, 8, 16
    x = jnp.asarray(rng.normal(size=(b, l0, c0)), jnp.float32)
    ks, cbs, gs, bs, d = [], [], [], [], c0
    for j in range(2):
        ks.append(jnp.asarray(rng.normal(size=(5, d, d // 2)) * 0.1, jnp.float32))
        cbs.append(jnp.asarray(rng.normal(size=(d // 2,)) * 0.3, jnp.float32))
        gs.append(jnp.asarray(rng.uniform(size=(d // 2,)), jnp.float32))
        bs.append(jnp.asarray(rng.normal(size=(d // 2,)) * 0.1, jnp.float32))
        d //= 2
    ko = jnp.asarray(rng.normal(size=(7, d, 1)) * 0.1, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(1,)), jnp.float32)
    in_dim = 37

    def composed(x, ks, cbs, ko):
        for j in range(2):
            x = upsample_nearest1d(x, 2)
            x = conv1d(x, ks[j], cbs[j], padding=2)
            x = sample_layer_norm(x, gs[j], bs[j])
            x = jax.nn.relu(x)
        x = jnp.tanh(conv1d(x, ko, bo, padding=3, pad_mode="reflect"))
        return adaptive_avg_pool1d(x, in_dim).reshape(x.shape[0], in_dim)

    def chained(x, ks, cbs, ko):
        l = l0
        ms, biases, gammas, betas = [], [], [], []
        for j in range(2):
            ms.append(dense_ops.dense_upconv_matrix(ks[j], l, padding=2))
            l *= 2
            biases.append(jnp.tile(cbs[j], l).reshape(1, -1))
            gammas.append(jnp.tile(gs[j], l).reshape(1, -1))
            betas.append(jnp.tile(bs[j], l).reshape(1, -1))
        m_out = dense_ops.dense_conv_matrix(ko, l, padding=3, pad_mode="reflect")
        pool = adaptive_avg_pool_matrix(l, in_dim)
        return fused_sln_chain(
            x.reshape(x.shape[0], -1), tuple(ms), tuple(gammas), tuple(betas),
            m_out, jnp.tile(bo, l).reshape(1, -1), pool, biases=tuple(biases))

    want = composed(x, ks, cbs, ko)
    got = chained(x, ks, cbs, ko)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    gw = jax.grad(
        lambda a, cb, o: composed(x, [a, ks[1]], [cb, cbs[1]], o).sum(),
        argnums=(0, 1, 2))(ks[0], cbs[0], ko)
    gg = jax.grad(
        lambda a, cb, o: chained(x, [a, ks[1]], [cb, cbs[1]], o).sum(),
        argnums=(0, 1, 2))(ks[0], cbs[0], ko)
    for a, w in zip(gg, gw):
        np.testing.assert_allclose(a, w, rtol=2e-3, atol=2e-4)


def test_fused_mlp_chain_heads_match_composed(rng):
    from iinsvae_tpu.models.heads import Restorer, Classifier
    from iinsvae_tpu.ops.pallas.fused import set_pallas_enabled

    rc = jnp.asarray(rng.normal(size=(6, 8, 2)), jnp.float32)
    ec = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    r = Restorer(net_type="Linear")
    c = Classifier(num_classes=5, net_type="Linear")
    try:
        rv = r.init(jax.random.PRNGKey(0), rc)
        cv = c.init(jax.random.PRNGKey(1), ec)
        out_f = r.apply(rv, rc)
        log_f = c.apply(cv, ec)
        set_pallas_enabled(False)
        out_c = r.apply(rv, rc)
        log_c = c.apply(cv, ec)
    finally:
        set_pallas_enabled(True)
    np.testing.assert_allclose(out_f, out_c, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(log_f, log_c, rtol=2e-5, atol=2e-6)

    # grads through the chain
    def loss(params, on):
        set_pallas_enabled(on)
        return jnp.sum(r.apply({"params": params}, rc) ** 2)

    try:
        g1 = jax.grad(loss)(rv["params"], True)
        g0 = jax.grad(loss)(rv["params"], False)
    finally:
        set_pallas_enabled(True)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)

