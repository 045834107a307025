"""Golden-shape tests for the model zoo (shapes from reference models.py
comments, cited in SURVEY.md §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.models import (
    Encoder, Decoder, Restorer, Classifier, IInsVAE,
    EMNet, EMNetLoop, IdentifierSep, RegressorSep,
)
from iinsvae_tpu.models.encoders import env_kl, split_env_stats


B = 4


def _init_apply(module, *args, method=None, rngs=None, **kwargs):
    variables = module.init(rngs or {"params": jax.random.PRNGKey(0)}, *args, **kwargs)
    out = module.apply(variables, *args, **kwargs)
    return variables, out


@pytest.mark.parametrize("cir_len", [157, 152])
def test_encoder_1d_shapes(cir_len):
    x = jnp.ones((B, cir_len))
    enc = Encoder(conv_type=1)
    _, (range_code, env_code, rv, kl) = _init_apply(enc, x, jax.random.PRNGKey(1))
    assert range_code.shape == (B, 8, 2)  # reference models.py:176 — (B, 2, 8) NCW
    assert env_code.shape == (B, 8)       # reference models.py:285 — (B, 8, 1)
    assert rv.shape == (B, 4)             # reference models.py:289
    assert kl.shape == ()
    assert np.isfinite(float(kl))


def test_encoder_decoder_roundtrip_1d():
    x = jnp.ones((B, 157))
    enc = Encoder(conv_type=1)
    venc, (range_code, env_code, _, _) = _init_apply(enc, x, None)
    dec = Decoder(conv_type=1, in_dim=157)
    _, recon = _init_apply(dec, range_code, env_code)
    assert recon.shape == (B, 157)
    assert np.all(np.abs(np.asarray(recon)) <= 1.0 + 1e-6)  # tanh-bounded then pooled


def test_encoder_2d_shapes():
    x = jnp.ones((B, 152))
    enc = Encoder(conv_type=2, expand=True)
    _, (range_code, env_code, _, _) = _init_apply(enc, x, None)
    assert range_code.shape == (B, 8, 8, 2)  # reference models.py:215
    assert env_code.shape == (B, 8)

    dec = Decoder(conv_type=2, in_dim=152, expand=True)
    _, recon = _init_apply(dec, range_code, env_code)
    assert recon.shape == (B, 152)


@pytest.mark.parametrize("net_type", ["Linear", "Conv1d", "Conv2d"])
def test_restorer_shapes(net_type):
    code = jnp.ones((B, 8, 2))
    res = Restorer(net_type=net_type, conv_type=1)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = res.init(rngs, code)
    out = res.apply(variables, code)
    assert out.shape == (B, 1)


def test_restorer_soft_samples():
    code = jnp.ones((B, 8, 2))
    res = Restorer(net_type="Linear", soft=True)
    variables = res.init({"params": jax.random.PRNGKey(0)}, code)
    a = res.apply(variables, code, sample_key=jax.random.PRNGKey(1))
    b = res.apply(variables, code, sample_key=jax.random.PRNGKey(2))
    det = res.apply(variables, code)  # no key -> returns mu
    assert a.shape == (B, 1) and det.shape == (B, 1)
    assert not np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("net_type", ["Linear", "Conv1d", "Conv2d"])
def test_classifier_shapes(net_type):
    env = jnp.ones((B, 16))
    cls = Classifier(num_classes=5, net_type=net_type)
    variables = cls.init({"params": jax.random.PRNGKey(0)}, env)
    out = cls.apply(variables, env)
    assert out.shape == (B, 5)


def test_kl_hand_computed():
    # mu = 0, log_sigma = 0 -> KL = 0
    cat = jnp.zeros((B, 8))
    mu, ls = split_env_stats(cat)
    assert float(env_kl(mu, ls)) == pytest.approx(0.0)
    # mu = 1, log_sigma = 0 -> 0.5 * sum(1 + 1 - 1 - 0) = 0.5 * D
    mu = jnp.ones((B, 4))
    ls = jnp.zeros((B, 4))
    assert float(env_kl(mu, ls)) == pytest.approx(0.5 * 4)


def test_iinsvae_full_forward():
    m = IInsVAE(cir_len=157, num_classes=5)
    x = jnp.ones((B, 157))
    variables = m.init({"params": jax.random.PRNGKey(0)}, x)
    out = m.apply(variables, x, sample_key=jax.random.PRNGKey(1))
    assert out["recon"].shape == (B, 157)
    assert out["err_est"].shape == (B, 1)
    assert out["logits"].shape == (B, 5)
    assert out["range_code"].shape == (B, 8, 2)
    assert out["env_code"].shape == (B, 8)


def test_emnet_contract():
    """network(cir) -> (label_est, env_latent, err_est) (reference train.py:82)."""
    for cls in (EMNet, EMNetLoop):
        m = cls(cir_len=157, num_classes=5, env_dim=16)
        x = jnp.ones((B, 157))
        variables = m.init({"params": jax.random.PRNGKey(0)}, x)
        label_est, env_latent, err_est = m.apply(variables, x)
        assert label_est.shape == (B, 5)
        assert env_latent.shape == (B, 16)
        assert err_est.shape == (B, 1)


def test_sep_contracts():
    enet = IdentifierSep(num_classes=2, env_dim=16)
    x = jnp.ones((B, 157))
    v = enet.init({"params": jax.random.PRNGKey(0)}, x)
    label_est, env_latent = enet.apply(v, x)
    assert label_est.shape == (B, 2) and env_latent.shape == (B, 16)

    mnet = RegressorSep(num_classes=2)
    lab = jnp.zeros((B, 1))
    vm = mnet.init({"params": jax.random.PRNGKey(0)}, x, lab)
    err = mnet.apply(vm, x, lab)
    assert err.shape == (B, 1)
    # conditioning on different labels changes the estimate
    err1 = mnet.apply(vm, x, jnp.ones((B, 1)))
    assert not np.allclose(np.asarray(err), np.asarray(err1))


def test_conv2_bf16_train_grads():
    """The 2-D path must be trainable end-to-end in bfloat16 (the conv's
    widened preferred_element_type used to break its transpose)."""
    import jax
    import jax.numpy as jnp

    from iinsvae_tpu.models import IInsVAE

    m = IInsVAE(cir_len=157, num_classes=5, conv_type=2, expand=True, style_dim=16)
    x = jnp.ones((2, 157), jnp.bfloat16)
    v = m.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(p):
        out, _ = m.apply(
            {"params": p, "batch_stats": {}}, x, train=True,
            sample_key=jax.random.PRNGKey(1), mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return out["recon"].astype(jnp.float32).sum() + out["kl"]

    g = jax.grad(loss)(v["params"])
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


def test_env_conv_init_option():
    """--env_conv_init torch re-initializes ONLY the env branch's conv
    kernels with torch's U(+-1/sqrt(fan_in)) default; the range branch keeps
    the reference's weights_init_normal N(0, 0.02) either way (BASELINE.md
    round-3 init attribution)."""
    import numpy as np
    from iinsvae_tpu.models.encoders import Encoder

    x = jnp.ones((2, 157))
    p_ref = Encoder(env_conv_init="reference").init(
        {"params": jax.random.PRNGKey(0)}, x)["params"]
    p_torch = Encoder(env_conv_init="torch").init(
        {"params": jax.random.PRNGKey(0)}, x)["params"]

    # env in-conv: (7, 1, 16), fan_in 7 -> torch bound 0.378 (uniform std
    # ~0.22), far above the reference's N(0, 0.02)
    k_ref = np.asarray(p_ref["env_encoder"]["ConvINAct_0"]["kernel"])
    k_torch = np.asarray(p_torch["env_encoder"]["ConvINAct_0"]["kernel"])
    assert np.abs(k_ref).max() < 0.12  # ~5 sigma of N(0, 0.02)
    assert np.abs(k_torch).max() > 0.15
    assert np.abs(k_torch).max() <= 1.0 / np.sqrt(7) + 1e-6

    # range branch identical under both settings
    np.testing.assert_array_equal(
        np.asarray(p_ref["range_encoder"]["in_kernel"]),
        np.asarray(p_torch["range_encoder"]["in_kernel"]))

    # CLI flag parses and reaches the model builder
    from iinsvae_tpu.config import parse
    from iinsvae_tpu.cli.train_semi import build_model
    cfg = parse(["--env_conv_init", "torch"])
    assert build_model(cfg).env_conv_init == "torch"
