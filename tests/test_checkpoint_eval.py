"""Checkpoint roundtrip + evaluation-artifact tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.models import IInsVAE
from iinsvae_tpu.training.optim import make_optimizer
from iinsvae_tpu.training.state import create_train_state
from iinsvae_tpu.training.steps import make_semi_train_step
from iinsvae_tpu.training.checkpoint import save_checkpoint, restore_checkpoint, latest_epoch
from iinsvae_tpu.evaluation.evaluate import evaluate_semi
from iinsvae_tpu.evaluation.viz import cdf_curve
from iinsvae_tpu.data.synthetic import synthetic_arrays

L = 157


def _state(model):
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, L)))
    return create_train_state(model, v, make_optimizer(n_epochs=10, decay_start_epoch=5))


def test_checkpoint_roundtrip(tmp_path):
    model = IInsVAE(cir_len=L, num_classes=5)
    state = _state(model)
    batch = {
        "cir": jnp.ones((8, L)), "err": jnp.ones((8, 1)),
        "label": jnp.zeros((8, 1)), "weight": jnp.ones((8,)),
    }
    step = jax.jit(make_semi_train_step(model, 1.0))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, 1, state)
    assert latest_epoch(path) == 1

    fresh = _state(model)
    restored = restore_checkpoint(path, 1, fresh)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1

    # restored state trains on
    s2, m = step(restored, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_evaluate_semi_artifacts(tmp_path):
    cir, err, label, _ = synthetic_arrays(n=120, option="room_full")
    cir = (cir - cir.mean(0)) / (cir.std(0) + 1e-9)
    data = {
        "cir": jnp.asarray(cir, jnp.float32),
        "err": jnp.asarray(err, jnp.float32),
        "label": jnp.asarray(label, jnp.float32),
    }
    model = IInsVAE(cir_len=L, num_classes=5)
    state = _state(model)
    raw = (
        (cir[:80], err[:80], label[:80]),
        (cir[80:], err[80:], label[80:]),
    )
    m = evaluate_semi(
        model, state, data, batch_size=40,
        result_path=str(tmp_path), epoch=3,
        dataset_env="room_full", data_raw=raw, run_svm=True, make_plots=True,
    )
    assert np.isfinite(m["rmse"]) and "svm_rmse" in m
    assert os.path.exists(tmp_path / "latent_env_epoch3.png")
    assert os.path.exists(tmp_path / "CDF_zenodo_room_full_3.png")
    assert os.path.exists(tmp_path / "residuals_zenodo_room_full_3.npz")
    npz = np.load(tmp_path / "residuals_zenodo_room_full_3.npz")
    assert npz["residual_em"].shape[0] == 120  # unpadded


def test_cdf_curve_properties(rng):
    err = rng.normal(size=2000)
    x, cdf = cdf_curve(err, num=200)
    assert x.shape == (201,) and cdf.shape == (201,)
    assert cdf[-1] == pytest.approx(1.0)
    assert np.all(np.diff(cdf) >= 0)
    # median of |err| should sit near cdf=0.5
    med = np.median(np.abs(err))
    idx = np.searchsorted(x, med)
    assert abs(cdf[idx] - 0.5) < 0.05


@pytest.mark.parametrize("conv_type,expand", [(2, True), (3, False)])
def test_train_step_2d_variants(conv_type, expand):
    model = IInsVAE(cir_len=152, num_classes=2, conv_type=conv_type, expand=expand)
    state = _state(model)
    batch = {
        "cir": jax.random.normal(jax.random.PRNGKey(1), (4, 152)),
        "err": jnp.ones((4, 1)), "label": jnp.zeros((4, 1)), "weight": jnp.ones((4,)),
    }
    step = jax.jit(make_semi_train_step(model, 1.0))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_bf16_step_finite():
    model = IInsVAE(cir_len=L, num_classes=5)
    state = _state(model)
    batch = {
        "cir": jax.random.normal(jax.random.PRNGKey(1), (8, L)).astype(jnp.bfloat16),
        "err": jnp.ones((8, 1)), "label": jnp.zeros((8, 1)), "weight": jnp.ones((8,)),
    }
    step = jax.jit(make_semi_train_step(model, 1.0))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_disentangle_eval_smoke(tmp_path):
    """evaluate_disentanglement runs end-to-end on an untrained tiny model:
    metric keys present, rates in [0,1], artifacts written."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state
    from iinsvae_tpu.evaluation.disentangle import evaluate_disentanglement

    model = IInsVAE(cir_len=157, num_classes=4, style_dim=8)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 157)))
    state = create_train_state(
        model, variables, make_optimizer(n_epochs=2, decay_start_epoch=1))

    rng = np.random.default_rng(0)
    batch = {
        "cir": rng.normal(size=(64, 157)).astype(np.float32),
        "err": np.abs(rng.normal(size=(64, 1))).astype(np.float32),
        "label": rng.integers(0, 4, size=(64, 1)).astype(np.float32),
    }
    m = evaluate_disentanglement(
        model, state, batch, batch_size=32, result_path=str(tmp_path))
    for k in ("swap_recon_delta", "env_transfer_rate", "env_keep_rate",
              "range_drift_self", "range_drift_swap", "prior_class_coverage"):
        assert k in m, k
    assert 0.0 <= m["env_transfer_rate"] <= 1.0
    assert 0.0 <= m["prior_class_coverage"] <= 1.0 + 1e-9
    import os
    assert os.path.exists(m["artifacts"]["env_swap_png"])
    assert os.path.exists(m["artifacts"]["prior_decode_png"])
