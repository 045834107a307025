"""Model-level parity of the two remaining 1-D lowerings: the fused Pallas
path (production) vs the composed dense-matmul path (oracle; also the
off-TPU / big-batch fallback). One param set, identical math.

Replaces the round-3 three-way routing tests (test_impl_routing.py): the
generic chain builder and phase-SLN kernels were measured slower and
removed in round 4 (VERDICT round-3 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np

from iinsvae_tpu.models import IInsVAE
from iinsvae_tpu.ops.pallas import fused as pf

L = 157


def _outputs(model, variables, x, key):
    out = model.apply(variables, x, sample_key=key)
    return out["recon"], out["err_est"], out["logits"], out["kl"]


def test_fused_matches_composed_forward(monkeypatch):
    model = IInsVAE(cir_len=L, num_classes=5)
    x = jnp.asarray(np.random.RandomState(0).randn(4, L), jnp.float32)
    key = jax.random.PRNGKey(7)
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)

    fused = _outputs(model, variables, x, key)
    monkeypatch.setattr(pf, "pallas_enabled", lambda: False)
    composed = _outputs(model, variables, x, key)
    for a, b, name in zip(fused, composed, ("recon", "err", "logits", "kl")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"fused vs composed mismatch in {name}")


def test_fused_matches_composed_grads(monkeypatch):
    model = IInsVAE(cir_len=L, num_classes=5)
    x = jnp.asarray(np.random.RandomState(1).randn(3, L), jnp.float32)
    key = jax.random.PRNGKey(9)
    variables = model.init({"params": jax.random.PRNGKey(2)}, x)

    def loss(params):
        out = model.apply({"params": params}, x, sample_key=key)
        return (
            jnp.abs(out["recon"] - x).mean()
            + out["kl"]
            + jnp.sum(out["err_est"] ** 2)
            + jnp.sum(out["logits"] ** 2) * 1e-2
        )

    g_fused = jax.grad(loss)(variables["params"])
    monkeypatch.setattr(pf, "pallas_enabled", lambda: False)
    g_composed = jax.grad(loss)(variables["params"])

    flat_f = jax.tree_util.tree_leaves_with_path(g_fused)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_composed)}
    assert len(flat_f) == len(flat_c)
    for k, vf in flat_f:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(vf), np.asarray(flat_c[ks]), rtol=5e-3, atol=2e-4,
            err_msg=f"grad mismatch at {ks}")


def test_big_batch_falls_back_to_composed():
    # past MAX_FUSED_BATCH the model must route to the composed path and
    # still agree with the small-batch fused outputs row-for-row
    model = IInsVAE(cir_len=L, num_classes=5)
    rng = np.random.RandomState(3)
    x_small = jnp.asarray(rng.randn(4, L), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(4)}, x_small)
    big = pf.MAX_FUSED_BATCH + 4
    x_big = jnp.concatenate(
        [x_small, jnp.asarray(rng.randn(big - 4, L), jnp.float32)])
    out_small = model.apply(variables, x_small)
    out_big = model.apply(variables, x_big)
    np.testing.assert_allclose(
        np.asarray(out_big["recon"][:4]), np.asarray(out_small["recon"]),
        rtol=5e-4, atol=5e-5)
