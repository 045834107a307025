"""Serving predictor + ewine end-to-end pipeline tests."""

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp
import pytest

from iinsvae_tpu.models import IInsVAE
from iinsvae_tpu.serving import Predictor
from iinsvae_tpu.training.optim import make_optimizer
from iinsvae_tpu.training.state import create_train_state


def _predictor(batch_size=32):
    model = IInsVAE(cir_len=157, num_classes=5)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 157)))
    state = create_train_state(model, v, make_optimizer())
    return Predictor(model, state, batch_size=batch_size)


def test_predictor_shapes_and_padding(rng):
    p = _predictor(batch_size=32)
    cir = rng.normal(size=(50, 157)).astype(np.float32)  # forces a padded tail
    pred = p(cir)
    assert pred.err_est.shape == (50, 1)
    assert pred.label_probs.shape == (50, 5)
    np.testing.assert_allclose(pred.label_probs.sum(axis=1), 1.0, rtol=1e-5)
    assert pred.label.shape == (50,)
    # padding must not change results: compare against exact-batch call
    p2 = _predictor(batch_size=50)
    pred2 = p2(cir)
    np.testing.assert_allclose(pred.err_est, pred2.err_est, rtol=1e-4, atol=1e-5)


def test_mitigate():
    p = _predictor(batch_size=16)
    cir = np.ones((8, 157), np.float32)
    d = np.full(8, 10.0)
    out = p.mitigate(cir, d)
    pred = p(cir)
    np.testing.assert_allclose(out, 10.0 - pred.err_est)


@pytest.fixture()
def ewine_dir(tmp_path, rng):
    """Synthetic ewine-format CSV tree."""
    n, taps = 40, 180
    for sub, fname in [("dataset1", "tag_room0.csv"), ("dataset1", "tag_room1.csv")]:
        rows = np.zeros((n, 18 + taps))
        rows[:, 0:4] = rng.uniform(0, 10, (n, 4))
        rows[:, 4] = rng.uniform(0, 14, n)
        rows[:, 5] = rng.integers(0, 2, n)
        rows[:, 8] = rng.integers(0, 10, n)
        rows[:, 17] = rng.uniform(1000, 2000, n)
        rows[:, 18:] = rng.uniform(0, 5000, (n, taps))
        d = tmp_path / "data" / "data_ewine" / sub
        d.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(rows, columns=[f"c{i}" for i in range(rows.shape[1])]).to_csv(
            d / fname, index=False
        )
    return tmp_path


def test_ewine_end_to_end_pipeline(ewine_dir):
    from iinsvae_tpu.data.splits import err_mitigation_dataset

    root = [
        str(ewine_dir / "data" / "data_ewine" / "dataset1" / "tag_room0.csv"),
        str(ewine_dir / "data" / "data_ewine" / "dataset1" / "tag_room1.csv"),
    ]
    train, test, _, _ = err_mitigation_dataset(
        root, dataset_name="ewine", split_factor=0.8, scaling=True, mode="full"
    )
    assert train[0].shape == (64, 152)
    assert test[0].shape == (16, 152)
    assert set(np.unique(train[2]).astype(int)) <= {0, 1}

    # one train step on ewine shapes
    from iinsvae_tpu.training.steps import make_semi_train_step

    model = IInsVAE(cir_len=152, num_classes=2)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 152)))
    state = create_train_state(model, v, make_optimizer())
    batch = {
        "cir": jnp.asarray(train[0][:16]),
        "err": jnp.asarray(train[1][:16]),
        "label": jnp.asarray(train[2][:16]),
        "weight": jnp.ones((16,)),
    }
    step = jax.jit(make_semi_train_step(model, 1.0))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_export_serving_roundtrip(tmp_path):
    """AOT deployment artifact: export the jitted forward as StableHLO +
    weights, reload WITHOUT model code, and match the live Predictor."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.serving import Predictor, load_serving
    from iinsvae_tpu.training.optim import make_optimizer
    from iinsvae_tpu.training.state import create_train_state

    model = IInsVAE(cir_len=157, num_classes=5, style_dim=16)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 157)))
    state = create_train_state(
        model, variables, make_optimizer(n_epochs=2, decay_start_epoch=1))
    pred = Predictor(model, state, batch_size=8)

    art = str(tmp_path / "serving_artifact")
    pred.export_serving(art)

    fn = load_serving(art)
    cirs = np.random.default_rng(0).normal(size=(8, 157)).astype(np.float32)
    err, probs, env_code = fn(cirs)
    want = pred(cirs)
    np.testing.assert_allclose(np.asarray(err), want.err_est, atol=1e-5)
    np.testing.assert_allclose(np.asarray(probs), want.label_probs, atol=1e-5)
    np.testing.assert_allclose(np.asarray(env_code), want.env_code, atol=1e-5)
