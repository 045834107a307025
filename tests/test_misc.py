"""Coverage for mask modes, prng tree, profiling utils, serving bulk path."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.models import IInsVAE
from iinsvae_tpu.training.optim import make_optimizer
from iinsvae_tpu.training.state import create_train_state
from iinsvae_tpu.training.steps import make_semi_train_step
from iinsvae_tpu.utils.prng import key_tree
from iinsvae_tpu.utils.profiling import StepTimer, device_sync


def _setup():
    model = IInsVAE(cir_len=157, num_classes=5)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 157)))
    return model, create_train_state(model, v, make_optimizer())


def _batch(b=64):
    k = jax.random.PRNGKey(3)
    return {
        "cir": jax.random.normal(k, (b, 157)),
        "err": jnp.abs(jax.random.normal(k, (b, 1))),
        "label": jnp.zeros((b, 1)),
        "weight": jnp.ones((b,)),
    }


def test_mask_mode_batch_is_all_or_nothing():
    """mask_mode='batch': the supervised L1 term is either the full-batch
    mean or exactly 0 — never a partial-batch mix."""
    model, state = _setup()
    batch = _batch(64)
    step = jax.jit(make_semi_train_step(model, supervision_rate=0.5, mask_mode="batch"))
    res_vals = set()
    st = state
    for i in range(12):
        st, m = step(st, batch, jax.random.fold_in(jax.random.PRNGKey(0), i))
        res_vals.add(round(float(m["loss_res"]), 6))
    assert 0.0 in res_vals, "batch mode never dropped a batch at rate 0.5"
    assert len(res_vals - {0.0}) >= 1


def test_mask_mode_sample_rate():
    """mask_mode='sample': expected labeled fraction ~ rate."""
    keys = [jax.random.fold_in(jax.random.PRNGKey(1), i) for i in range(50)]
    fracs = [
        float(jax.random.bernoulli(jax.random.split(k, 3)[0], 0.3, (500,)).mean())
        for k in keys
    ]
    assert abs(np.mean(fracs) - 0.3) < 0.02


def test_key_tree_deterministic_and_distinct():
    a = key_tree(0, epoch=1, step=2)
    b = key_tree(0, epoch=1, step=2)
    c = key_tree(0, epoch=1, step=3)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    assert not np.array_equal(np.asarray(a["mask"]), np.asarray(c["mask"]))
    # distinct roles get distinct keys
    vals = {tuple(np.asarray(v).tolist()) for v in a.values()}
    assert len(vals) == 4


def test_step_timer():
    t = StepTimer(total_steps=4)
    time.sleep(0.01)
    out = t.tick()
    assert out["step_time_s"] > 0
    assert out["eta_s"] >= 0
    assert device_sync(jnp.ones(3)) == 1.0


def test_predict_dataset_matches_call(rng):
    from iinsvae_tpu.serving import Predictor

    model, state = _setup()
    p = Predictor(model, state, batch_size=32)
    cir = rng.normal(size=(70, 157)).astype(np.float32)
    a = p(cir)
    b = p.predict_dataset(cir)
    np.testing.assert_allclose(a.err_est, b.err_est, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a.label_probs, b.label_probs, rtol=1e-4, atol=1e-5)


def test_emnet_loop_differs_from_emnet():
    from iinsvae_tpu.models import EMNet, EMNetLoop

    x = jax.random.normal(jax.random.PRNGKey(2), (4, 157))
    m1 = EMNet(cir_len=157, num_classes=5)
    m2 = EMNetLoop(cir_len=157, num_classes=5)
    v1 = m1.init({"params": jax.random.PRNGKey(0)}, x)
    # the loop variant has the extra loop_proj params
    v2 = m2.init({"params": jax.random.PRNGKey(0)}, x)
    assert "loop_proj" in v2["params"]
    assert "loop_proj" not in v1["params"]


def test_config_paper_env_num_classes():
    from iinsvae_tpu.config import Config

    cfg = Config(dataset_env="paper")
    assert cfg.num_classes == 4  # train_semi.py:60-61 names it


def test_paper_env_loads_as_obstacle_part():
    """dataset_env='paper' resolves to the obstacle_part material-group
    selection in the loader (reference train_semi.py:62 gives it
    num_classes=4) instead of crashing — the env the paper-mode cross-room
    protocol runs with."""
    import numpy as np
    from iinsvae_tpu.data.synthetic import synthetic_arrays

    cir_a, err_a, lab_a, room_a = synthetic_arrays(600, seed=3, option="paper")
    cir_b, err_b, lab_b, room_b = synthetic_arrays(600, seed=3, option="obstacle_part")
    np.testing.assert_array_equal(lab_a, lab_b)
    np.testing.assert_allclose(cir_a, cir_b)
    assert set(np.unique(lab_a.astype(int))) <= {0, 1, 2, 3}


def test_top_level_api_surface():
    """The lazy package API (PEP 562) resolves every advertised symbol to
    the same object as its home module, and dir() lists them."""
    import iinsvae_tpu
    from iinsvae_tpu.models import IInsVAE
    from iinsvae_tpu.config import Config
    from iinsvae_tpu.serving import Predictor

    assert iinsvae_tpu.IInsVAE is IInsVAE
    assert iinsvae_tpu.Config is Config
    assert iinsvae_tpu.Predictor is Predictor
    assert set(iinsvae_tpu.__all__) <= set(dir(iinsvae_tpu))
    # dir() lists real module attributes too, not only the lazy exports
    # (ADVICE round 3): introspection/tab-completion must see both
    assert {"__name__", "__doc__", "__version__"} <= set(dir(iinsvae_tpu))
    import iinsvae_tpu.cli  # noqa: F401 — imported submodules appear in dir()
    assert "cli" in dir(iinsvae_tpu)
    try:
        iinsvae_tpu.no_such_symbol
    except AttributeError:
        pass
    else:  # pragma: no cover
        raise AssertionError("missing-attribute must raise AttributeError")


def test_plurality_share_flags_degenerate_head():
    import numpy as np
    from iinsvae_tpu.evaluation.evaluate import add_plurality_share

    labels = np.array([0] * 6 + [1] * 3 + [2] * 1)
    m = add_plurality_share({"accuracy": 0.60}, labels)
    assert abs(m["plurality_share"] - 0.6) < 1e-9
    assert m.get("env_head_degenerate") == 1.0  # acc == share -> degenerate
    m2 = add_plurality_share({"accuracy": 0.75}, labels)
    assert "env_head_degenerate" not in m2
