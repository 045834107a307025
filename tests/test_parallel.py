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


def test_shard_map_dp_exact_metrics_uneven_padding():
    """Sharded loss == single-device loss when ALL padding lands in one
    shard (mean-of-per-shard-means would be off by ~12%; VERDICT r1 weak 2)."""
    from iinsvae_tpu.parallel.shard import make_dp_train_step, place_dp
    from iinsvae_tpu.training.steps import make_semi_grads_fn, make_semi_train_step

    model, state = _setup()
    batch = _batch(32)
    # zero out the last 8 samples -> the 8th shard (batch 32 / 8 devices = 4
    # per shard) plus half the 7th carries only padding
    batch["weight"] = jnp.concatenate([jnp.ones((26,)), jnp.zeros((6,))])

    s1, m1 = jax.jit(make_semi_train_step(model, 1.0))(
        state, batch, jax.random.PRNGKey(0)
    )

    mesh = make_mesh(n_data=8, n_model=1)
    model2, state2 = _setup()
    step = make_dp_train_step(make_semi_grads_fn(model2, 1.0), mesh)
    s_sh, b_sh = place_dp(mesh, state2, batch)
    s2, m2 = step(s_sh, b_sh, jax.random.PRNGKey(0))

    assert float(m2["count"]) == 26.0
    for k in ("loss", "loss_ae", "loss_kl", "loss_res", "loss_env"):
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=3e-4, err_msg=k
        )


def test_epoch_runner_composes_with_dp_step():
    """Whole-epoch lax.scan over the shard_map DP step (SURVEY §7 item 5):
    multi-chip TRAINING, not just one step, matches the single-device epoch."""
    from iinsvae_tpu.parallel.shard import make_dp_train_step, place_dp
    from iinsvae_tpu.training.loop import make_epoch_runner, pad_to_batches
    from iinsvae_tpu.training.steps import make_semi_grads_fn, make_semi_train_step

    n, bs = 49, 16  # padded tail exercises the weight mask
    k = jax.random.PRNGKey(11)
    data = pad_to_batches(
        {
            "cir": jax.random.normal(k, (n, L)),
            "err": jnp.abs(jax.random.normal(k, (n, 1))),
            "label": jnp.zeros((n, 1)),
        },
        bs,
    )

    model, state1 = _setup()
    run1 = make_epoch_runner(make_semi_train_step(model, 1.0), bs, shuffle=False)
    s1, m1 = run1(state1, data, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8, n_model=1)
    model2, state2 = _setup()
    dp_step = make_dp_train_step(make_semi_grads_fn(model2, 1.0), mesh, jit=False)
    # fold the same per-step key path, but pre-shard state + data
    s_sh, data_sh = place_dp(mesh, state2, data)
    run2 = make_epoch_runner(dp_step, bs, shuffle=False)
    s2, m2 = run2(s_sh, data_sh, jax.random.PRNGKey(0))

    assert float(m2["count"]) == float(m1["count"]) == n
    assert np.isfinite(float(m2["loss"]))
    # the DP step folds the key per shard (decorrelated reparam/dropout
    # draws), so after a 4-step epoch parity is to noise tolerance only
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=2e-3, atol=3e-4)


def test_encoder_prior_sample():
    from iinsvae_tpu.models.encoders import Encoder

    enc = Encoder(style_dim=8)
    z = enc.sample(jax.random.PRNGKey(0), 5)
    assert z.shape == (5, 8)
    # standard normal prior, not reparameterized posterior
    big = enc.sample(jax.random.PRNGKey(1), 4096)
    assert abs(float(big.mean())) < 0.05 and abs(float(big.std()) - 1.0) < 0.05


def test_graft_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_dryrun_reexecs_on_small_platform():
    """dryrun_multichip(4) from a 1-device process must self-provision a
    4-device CPU subprocess instead of asserting (VERDICT r1 item 1)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, {r!r}); import jax; "
        "assert jax.device_count() == 1; "
        "import __graft_entry__ as g; g.dryrun_multichip(4); print('REEXEC_OK')"
    ).format(r=repo)
    # ~220 s standalone on this 1-core image, but the subprocess shares the
    # core with whatever else the suite/driver is running — 600 s flaked
    # twice under contention (round-3 logs); the margin is deliberate
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=repo,
        capture_output=True, text=True, timeout=2400,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "REEXEC_OK" in out.stdout


def test_shard_map_dp_conv_type2_grouped():
    """The expanded-2D path (grouped encoder + fast decoder lowerings) under
    shard_map data parallelism: static column-group structure must compose
    with the mesh, and the sharded loss must match single-device."""
    from iinsvae_tpu.parallel.shard import make_dp_train_step, place_dp
    from iinsvae_tpu.training.steps import make_semi_grads_fn

    def setup2d():
        model = IInsVAE(cir_len=L, num_classes=5, conv_type=2, expand=True,
                        style_dim=16)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.ones((2, L)))
        return model, create_train_state(model, variables, make_optimizer())

    model, state = setup2d()
    batch = _batch(16)
    s1, m1 = jax.jit(make_semi_train_step(model, 1.0))(
        state, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8, n_model=1)
    model2, state2 = setup2d()
    step = make_dp_train_step(make_semi_grads_fn(model2, 1.0), mesh)
    s_sh, b_sh = place_dp(mesh, state2, batch)
    s2, m2 = step(s_sh, b_sh, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)


def test_collective_count_mesh_invariant():
    """Compiled per-step collective count must not scale with mesh size
    (VERDICT round-4 item 8: catches accidental per-step resharding)."""
    import __graft_entry__ as g

    counts = g.assert_collective_count_mesh_invariant()
    # at minimum the DP gradient all-reduce must be present
    assert counts[2]["all-reduce"] >= 1


@pytest.mark.slow
def test_graft_dryrun_multichip_16():
    """16-virtual-device run (VERDICT round-4 item 8): the dryrun
    self-provisions a 16-device CPU subprocess from this 8-device env."""
    import __graft_entry__ as g

    g.dryrun_multichip(16)
