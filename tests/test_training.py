"""Training-layer tests: loss numerics, schedule, one-epoch smoke,
loss-decreases, and the multi-device mesh path."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iinsvae_tpu.config import Config
from iinsvae_tpu.models import IInsVAE, EMNet
from iinsvae_tpu.training.losses import semi_loss, joint_loss, l1, cross_entropy
from iinsvae_tpu.training.optim import make_optimizer, lambda_lr_schedule
from iinsvae_tpu.training.state import create_train_state
from iinsvae_tpu.training.steps import (
    make_semi_train_step,
    make_semi_eval_step,
    make_joint_train_step,
    finalize_metrics,
)
from iinsvae_tpu.training.loop import pad_to_batches, make_epoch_runner, make_evaluator
from iinsvae_tpu.data.synthetic import synthetic_arrays


B, L = 16, 157


def _data(n=64, env="room_full"):
    cir, err, label, _ = synthetic_arrays(n=n, option=env)
    # scale roughly like the real pipeline
    cir = (cir - cir.mean(0)) / (cir.std(0) + 1e-9)
    return {
        "cir": jnp.asarray(cir, jnp.float32),
        "err": jnp.asarray(err, jnp.float32),
        "label": jnp.asarray(label, jnp.float32),
    }


def _semi_state(num_classes=5, steps_per_epoch=4):
    model = IInsVAE(cir_len=L, num_classes=num_classes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, L)))
    tx = make_optimizer(1e-4, 0.5, 0.999, n_epochs=500, decay_start_epoch=100,
                        steps_per_epoch=steps_per_epoch)
    return model, create_train_state(model, variables, tx)


def test_l1_and_ce_hand_computed():
    a = jnp.array([[1.0], [2.0]])
    b = jnp.array([[0.0], [4.0]])
    assert float(l1(a, b)) == pytest.approx(1.5)
    w = jnp.array([1.0, 0.0])
    assert float(l1(a, b, w)) == pytest.approx(1.0)

    logits = jnp.array([[0.0, 0.0], [10.0, 0.0]])
    labels = jnp.array([0, 0])
    want = (np.log(2.0) + -np.log(np.exp(10) / (np.exp(10) + 1))) / 2
    assert float(cross_entropy(logits, labels)) == pytest.approx(want, rel=1e-5)


def test_lambda_lr_schedule_matches_reference():
    # reference models.py:24-25: 1 - max(0, e - 100) / 400 per epoch
    sched = lambda_lr_schedule(1e-4, 500, 100, steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(1e-4)
    assert float(sched(999)) == pytest.approx(1e-4)  # epoch 99
    assert float(sched(3000)) == pytest.approx(1e-4 * (1 - 200 / 400))  # epoch 300
    assert float(sched(4990)) == pytest.approx(1e-4 * (1 - 399 / 400))
    # past n_epochs the factor clamps at 0 — it must NEVER go negative
    # (negative lr = gradient ascent; the round-3 run.py divergence)
    assert float(sched(5000)) == pytest.approx(0.0)
    assert float(sched(50_000)) == 0.0


def test_semi_loss_masking():
    out = {
        "recon": jnp.zeros((4, L)),
        "err_est": jnp.ones((4, 1)),
        "logits": jnp.zeros((4, 5)),
        "kl": jnp.zeros(()),
        "env_code": jnp.zeros((4, 8)),
    }
    cir = jnp.zeros((4, L))
    err = jnp.ones((4, 1))
    label = jnp.zeros((4, 1))
    # fully unsupervised: res/env terms vanish, recon/kl exact zero
    total, aux = semi_loss(out, cir, err, label, sup_mask=jnp.zeros(4))
    assert float(aux["loss_res"]) == 0.0
    assert float(aux["loss_ae"]) == 0.0
    assert float(aux["loss_kl"]) == 0.0
    # fully supervised: err matches -> res 0; CE = log(5) at uniform logits
    total, aux = semi_loss(out, cir, err, label, sup_mask=jnp.ones(4))
    assert float(aux["loss_res"]) == 0.0
    assert float(aux["loss_env"]) == pytest.approx(np.log(5), rel=1e-5)


def test_semi_train_step_decreases_loss():
    model, state = _semi_state()
    data = _data(n=B)
    batch = {**data, "weight": jnp.ones(B)}
    step = jax.jit(make_semi_train_step(model, supervision_rate=1.0))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        state, m = step(state, batch, jax.random.fold_in(key, i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_joint_train_step_runs():
    model = EMNet(cir_len=L, num_classes=5)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, L)))
    tx = make_optimizer()
    from iinsvae_tpu.training.state import create_train_state

    state = create_train_state(model, variables, tx)
    data = _data(n=B)
    batch = {**data, "weight": jnp.ones(B)}
    step = jax.jit(make_joint_train_step(model))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))


def test_pad_to_batches_weights():
    data = _data(n=50)
    padded = pad_to_batches(data, 16)
    assert padded["cir"].shape[0] == 64
    assert float(padded["weight"].sum()) == 50.0


def test_epoch_runner_and_evaluator():
    model, state = _semi_state()
    data = pad_to_batches(_data(n=70), 16)
    run_epoch = make_epoch_runner(make_semi_train_step(model, 0.5), batch_size=16)
    state, acc = run_epoch(state, data, jax.random.PRNGKey(0))
    metrics = finalize_metrics(jax.tree.map(jnp.asarray, acc))
    assert float(acc["count"]) == 70.0
    assert np.isfinite(float(metrics["rmse"]))

    evaluate = make_evaluator(make_semi_eval_step(model), batch_size=16)
    m, outs = evaluate(state, data)
    assert float(m["accuracy"]) <= 1.0
    assert outs["recon"].shape == (5, 16, L)  # stacked over batches


def test_metrics_match_manual():
    model, state = _semi_state()
    data = pad_to_batches(_data(n=32), 16)
    evaluate = make_evaluator(make_semi_eval_step(model), batch_size=16)
    m, outs = evaluate(state, data)
    err_est = np.asarray(outs["err_est"]).reshape(-1, 1)
    err = np.asarray(data["err"])
    want_rmse = np.sqrt(np.mean((err_est - err) ** 2))
    assert float(m["rmse"]) == pytest.approx(want_rmse, rel=1e-5)


def test_checkpoint_gc_and_best_tracking(tmp_path):
    """keep-last-N retention + atomic best pointer (VERDICT r1 item 8)."""
    from iinsvae_tpu.training.checkpoint import (
        best_epoch,
        gc_checkpoints,
        list_epochs,
        restore_best,
        restore_checkpoint,
        save_checkpoint,
        update_best,
    )

    model = IInsVAE(cir_len=157, num_classes=5)
    v = model.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 157)))
    state = create_train_state(model, v, make_optimizer())
    d = str(tmp_path / "ckpts")

    rmse = {10: 0.5, 20: 0.3, 30: 0.4, 40: 0.35, 50: 0.32}
    for e, m in rmse.items():
        save_checkpoint(d, e, state.replace(step=jnp.asarray(e)))
        update_best(d, e, m)

    # best is epoch 20 (0.3), not overwritten by later, worse epochs
    assert best_epoch(d) == {"epoch": 20, "metric": 0.3}

    removed = gc_checkpoints(d, keep_last=2)
    # newest 2 (40, 50) survive, plus the protected best (20)
    assert removed == [10, 30]
    assert list_epochs(d) == [20, 40, 50]

    best_state = restore_best(d, state)
    assert int(best_state.step) == 20
    latest = restore_checkpoint(d, 50, state)
    assert int(latest.step) == 50

    # keep_last <= 0 keeps everything (the reference's behavior)
    assert gc_checkpoints(d, keep_last=0) == []
    assert list_epochs(d) == [20, 40, 50]


def test_restore_best_missing(tmp_path):
    from iinsvae_tpu.training.checkpoint import restore_best

    with pytest.raises(FileNotFoundError):
        restore_best(str(tmp_path / "none"), None)


def test_training_is_bit_deterministic():
    """Two whole-epoch runs from the same seed must produce bit-identical
    params — guards the explicit PRNG key plumbing (shuffle, supervision
    mask, reparameterization, dropout) against hidden global-state or
    host-randomness leaks. The resume-equals-continuous CLI test depends
    on this property; this pins it at the library layer."""
    data = _data(48)

    def run():
        _, state = _semi_state()
        run_epoch = make_epoch_runner(
            make_semi_train_step(IInsVAE(cir_len=L, num_classes=5), 0.5),
            batch_size=16)
        key = jax.random.PRNGKey(7)
        for _ in range(3):
            key, ek = jax.random.split(key)
            state, _ = run_epoch(state, data, ek)
        return state.params

    p1, p2 = run(), run()
    chex.assert_trees_all_equal(p1, p2)


def test_kl_free_bits_floors_per_dim():
    """free_bits floors each latent dim's KL: at the prior (mu=0, ls=0)
    per-dim KL is 0, so the floored sum is n_dims * fb and its gradient
    w.r.t. the code is ZERO (collapse pressure removed); above the floor
    the term is unchanged."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from iinsvae_tpu.training.losses import env_kl_per_sample

    at_prior = jnp.zeros((3, 16))  # mu=0, log_sigma=0 -> per-dim KL 0
    plain = env_kl_per_sample(at_prior)
    floored = env_kl_per_sample(at_prior, free_bits=0.25)
    np.testing.assert_allclose(np.asarray(plain), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(floored), 8 * 0.25, rtol=1e-6)
    g = jax.grad(lambda c: env_kl_per_sample(c, free_bits=0.25).sum())(at_prior)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    rng = np.random.RandomState(0)
    big = jnp.asarray(rng.randn(3, 16) * 3.0, jnp.float32)  # far from prior
    np.testing.assert_allclose(
        np.asarray(env_kl_per_sample(big, free_bits=1e-4)),
        np.asarray(env_kl_per_sample(big)), rtol=1e-5)
