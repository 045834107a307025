"""Multi-device mesh tests on the 8-virtual-CPU platform (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.models import IInsVAE
from iinsvae_tpu.parallel.mesh import (
    make_mesh,
    batch_shardings,
    shard_train_step,
    shard_state,
    state_shardings,
)
from iinsvae_tpu.training.optim import make_optimizer
from iinsvae_tpu.training.state import create_train_state
from iinsvae_tpu.training.steps import make_semi_train_step

L = 157


def _setup(num_classes=5):
    model = IInsVAE(cir_len=L, num_classes=num_classes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, L)))
    state = create_train_state(model, variables, make_optimizer())
    return model, state


def _batch(b=32):
    k = jax.random.PRNGKey(7)
    return {
        "cir": jax.random.normal(k, (b, L)),
        "err": jnp.abs(jax.random.normal(k, (b, 1))),
        "label": jnp.zeros((b, 1)),
        "weight": jnp.ones((b,)),
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}


@pytest.mark.parametrize("n_model", [1, 2])
def test_sharded_semi_step_matches_single_device(n_model):
    model, state = _setup()
    batch = _batch(32)
    step = make_semi_train_step(model, supervision_rate=1.0)
    key = jax.random.PRNGKey(0)

    # single-device reference
    s1, m1 = jax.jit(step)(state, batch, key)

    # sharded
    mesh = make_mesh(n_model=n_model)
    model2, state2 = _setup()
    state2 = shard_state(mesh, state2)
    batch_sh = {
        k: jax.device_put(v, s)
        for (k, v), s in zip(batch.items(), batch_shardings(mesh, batch).values())
    }
    sharded = shard_train_step(step, mesh, state2, batch)
    s2, m2 = sharded(state2, batch_sh, key)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    # params stay in sync
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5)


def test_tp_rule_shards_wide_dense():
    model, state = _setup()
    mesh = make_mesh(n_model=2)
    sh = state_shardings(mesh, state)
    specs = jax.tree.leaves(
        jax.tree.map(lambda s: s.spec, sh.params,
                     is_leaf=lambda x: hasattr(x, "spec"))
    )
    assert any("model" in str(s) for s in specs), "no TP-sharded kernel found"


def test_shard_map_dp_matches_single_device():
    from iinsvae_tpu.parallel.shard import make_dp_train_step, place_dp
    from iinsvae_tpu.training.steps import make_semi_grads_fn

    model, state = _setup()
    batch = _batch(32)
    s1, m1 = jax.jit(make_semi_train_step(model, 1.0))(state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8, n_model=1)
    model2, state2 = _setup()
    step = make_dp_train_step(make_semi_grads_fn(model2, 1.0), mesh)
    s_sh, b_sh = place_dp(mesh, state2, batch)
    s2, m2 = step(s_sh, b_sh, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    assert float(m2["count"]) == 32.0
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-4, atol=1e-5)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
