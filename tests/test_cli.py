"""CLI main() smoke tests (VERDICT round-2 item 7).

Every user-facing entry point runs end-to-end on a tiny synthetic config:
exit cleanly, write the reference's checkpoint/result directory layout,
resume, and produce the evaluation artifacts. The reference's own history
of shipped-broken entries (run.py:168 ``daat_raw=`` typo, test_semi.py:203
missing ``CDF_plot_semi_test``) is the class of regression these guard
against.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest


def _argv(tmp, **over):
    base = {
        "n_epochs": 2,
        "batch_size": 64,
        "synthetic_n": 240,
        "checkpoint_interval": 1,
        "sample_interval": 0,
        "dataset_env": "room_full",
        "data_root": os.path.join(tmp, "data", "dataset.pkl"),
        "out_dir": os.path.join(tmp, "saved_results"),
        "model_dir": os.path.join(tmp, "saved_models"),
    }
    base.update(over)
    argv = []
    for k, v in base.items():
        if v is None:
            argv.append(f"--{k}")
        else:
            argv.extend([f"--{k}", str(v)])
    return argv


@pytest.fixture(scope="module")
def semi_run(tmp_path_factory):
    """Train the semi path 2 epochs once; several tests read its artifacts."""
    from iinsvae_tpu.cli.train_semi import main

    tmp = str(tmp_path_factory.mktemp("cli_semi"))
    state, metrics = main(argv=_argv(tmp))
    return tmp, state, metrics


def test_train_semi_main_end_to_end(semi_run):
    from iinsvae_tpu.config import parse
    from iinsvae_tpu.training.checkpoint import semi_model_dir, semi_result_dir, latest_epoch

    tmp, state, metrics = semi_run
    assert np.isfinite(metrics["rmse"]) and 0.0 <= metrics["accuracy"] <= 1.0

    cfg = parse(_argv(tmp))
    model_path = semi_model_dir(cfg)
    result_path = semi_result_dir(cfg)
    # final checkpoint at n_epochs, log file, and the eval artifacts exist
    assert latest_epoch(model_path) == 2
    assert os.path.isfile(os.path.join(result_path, "train_log.log"))
    assert glob.glob(os.path.join(result_path, "*.png")), "no eval artifacts"
    assert glob.glob(os.path.join(result_path, "*.mat")) or glob.glob(
        os.path.join(result_path, "*.npz")
    ), "no residual exports"


def test_train_semi_main_auto_resume(semi_run):
    from iinsvae_tpu.cli.train_semi import main
    from iinsvae_tpu.config import parse
    from iinsvae_tpu.training.checkpoint import semi_model_dir, latest_epoch

    tmp = semi_run[0]
    # --epoch -1 resumes from the latest checkpoint (2) and runs 1 more epoch
    state, metrics = main(argv=_argv(tmp, n_epochs=3, epoch=-1))
    cfg = parse(_argv(tmp))
    assert latest_epoch(semi_model_dir(cfg)) == 3
    assert np.isfinite(metrics["rmse"])


def test_evaluate_main_reads_semi_checkpoint(semi_run):
    from iinsvae_tpu.cli.evaluate import main

    tmp = semi_run[0]
    # --ae_type is the test_semi.py alias of --conv_type — exercised here
    m = main(argv=_argv(tmp, test_epoch=2, ae_type=1))
    assert np.isfinite(m["rmse"]) and 0.0 <= m["accuracy"] <= 1.0


def test_evaluate_main_missing_checkpoint_exits(tmp_path):
    from iinsvae_tpu.cli.evaluate import main

    with pytest.raises(SystemExit):
        main(argv=_argv(str(tmp_path), test_epoch=500))


def test_test_semi_sweep_main(semi_run):
    from iinsvae_tpu.cli.test_semi import main
    from iinsvae_tpu.config import parse

    tmp = semi_run[0]
    # only the rate-0.1 checkpoints exist; others must be skipped gracefully
    per_rate = main(argv=_argv(tmp, test_epoch=2))
    assert len(per_rate) == 1 and per_rate[0][0] == 0.1
    cfg = parse(_argv(tmp))
    out = os.path.join(
        cfg.out_dir + "_semi", "test_compare",
        "CDF_semi_compare_zenodo_room_full.png",
    )
    assert os.path.isfile(out)


def test_train_semi_main_n_devices(tmp_path):
    """--n_devices shards the epoch over the virtual 8-CPU mesh
    (VERDICT round-2 item 8: the user-facing multi-device surface)."""
    from iinsvae_tpu.cli.train_semi import main

    state, metrics = main(argv=_argv(str(tmp_path), n_devices=4, batch_size=64))
    assert np.isfinite(metrics["rmse"]) and 0.0 <= metrics["accuracy"] <= 1.0


def test_n_devices_must_divide_batch():
    from iinsvae_tpu.config import parse

    with pytest.raises(ValueError):
        parse(["--n_devices", "3", "--batch_size", "500"])


def test_env_conv_init_torch_rejected_on_conv_type_2():
    """--env_conv_init torch + conv_type=2 NaNs within the first epochs
    (measured f32 and bf16, BASELINE.md round-3 scope caveat) — parse()
    rejects the combination instead of letting it surface as a runtime NaN
    (VERDICT round-3 item 4). The alias --ae_type 2 is caught too."""
    from iinsvae_tpu.config import parse

    with pytest.raises(ValueError, match="NaN"):
        parse(["--env_conv_init", "torch", "--conv_type", "2"])
    with pytest.raises(ValueError, match="NaN"):
        parse(["--env_conv_init", "torch", "--ae_type", "2"])
    # the measured-good combinations still parse
    assert parse(["--env_conv_init", "torch", "--conv_type", "1"]).env_conv_init == "torch"
    assert parse(["--env_conv_init", "torch", "--conv_type", "3"]).conv_type == 3
    assert parse(["--conv_type", "2"]).env_conv_init == "reference"


@pytest.mark.parametrize("ablation", ["loop", "loops"])
def test_run_main_joint(tmp_path, ablation):
    from iinsvae_tpu.cli.run import main
    from iinsvae_tpu.config import parse
    from iinsvae_tpu.training.checkpoint import joint_model_dir, joint_result_dir, latest_epoch

    tmp = str(tmp_path)
    state, m = main(argv=_argv(tmp, net_ablation=ablation))
    assert np.isfinite(m["rmse"]) and 0.0 <= m["accuracy"] <= 1.0
    cfg = parse(_argv(tmp, net_ablation=ablation))
    assert latest_epoch(joint_model_dir(cfg)) == 2
    test_path = joint_result_dir(cfg, test=True)
    assert glob.glob(os.path.join(test_path, "*.png")), "no test_gem artifacts"


def test_run_sep_main(tmp_path):
    from iinsvae_tpu.cli.run_sep import main
    from iinsvae_tpu.config import parse
    from iinsvae_tpu.training.checkpoint import sep_model_dir

    tmp = str(tmp_path)
    m = main(argv=_argv(tmp))
    assert 0.0 <= m["accuracy"] <= 1.0 and np.isfinite(m["rmse"])
    cfg = parse(_argv(tmp))
    model_path = sep_model_dir(cfg)
    # both ENet and MNet checkpoints written
    names = os.listdir(model_path)
    assert any("ENet" in n for n in names) and any("MNet" in n for n in names)
    result_path = model_path.replace(cfg.model_dir, cfg.out_dir, 1)
    assert os.path.isfile(
        os.path.join(result_path, "CDF_zenodo_room_full_sepEM.png")
    )


def test_serve_main_selftest(semi_run, capsys):
    """`serve.py` self-test mode: checkpoint -> Predictor -> native batch
    server -> N concurrent-path requests, end to end."""
    from iinsvae_tpu.cli.serve import main

    tmp, _, _ = semi_run
    main(argv=["--selftest_n", "16", "--serve_batch", "8",
               "--deadline_ms", "2", "--probs"] + _argv(tmp))
    out = capsys.readouterr().out
    assert "self-test ok: 16 requests" in out
    # --probs wires the richer payload through serve_predictor
    assert "payload=err,label+5" in out


def test_resume_matches_continuous_run_with_active_decay(tmp_path):
    """Resume must continue the LR schedule, not double-count it: a run
    checkpointed at epoch 2 and resumed to 4 lands on EXACTLY the params
    of an uninterrupted 4-epoch run (decay active from epoch 1, so any
    schedule offset error shifts the LR and diverges the trajectories —
    the pre-fix bug resumed at the 2N-epoch decay point)."""
    import jax

    from iinsvae_tpu.cli.train_semi import main

    common = dict(n_epochs=4, decay_epoch=1, checkpoint_interval=2)
    tmp_a = str(tmp_path / "continuous")
    state_a, _ = main(argv=_argv(tmp_a, **common))

    tmp_b = str(tmp_path / "resumed")
    main(argv=_argv(tmp_b, **{**common, "n_epochs": 2}))
    state_b, _ = main(argv=_argv(tmp_b, **common, epoch=2))

    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_baseline_main(tmp_path):
    """`baseline.py` main (reference baseline.py:73-113): features -> SVR/SVC
    on the synthetic split, CDF artifact written, sane return contract."""
    from iinsvae_tpu.cli.baseline import main
    from iinsvae_tpu.config import parse

    tmp = str(tmp_path)
    m = main(argv=_argv(tmp))
    assert np.isfinite(m["svm_rmse"]) and m["svm_rmse"] > 0
    assert 0.0 <= m["svm_accuracy"] <= 1.0
    cfg = parse(_argv(tmp))
    out = os.path.join(
        cfg.out_dir,
        "data_%s_%s_mode_%s" % (cfg.dataset_name, cfg.dataset_env, cfg.mode),
        "SVR",
        "CDF_svm.png",
    )
    assert os.path.isfile(out), "baseline CDF artifact missing"


def test_inspect_data_main(tmp_path, capsys):
    """`inspect_data` main (the reference's manual smoke mains,
    data_tools.py:453-486 / dataset.py:139-241): prints shapes/ranges/class
    counts and writes the sample-CIR plot."""
    from iinsvae_tpu.cli.inspect_data import main

    tmp = str(tmp_path)
    data_train, data_test = main(argv=_argv(tmp))
    assert data_train[0].shape[1] == 157  # zenodo tap count
    out = capsys.readouterr().out
    assert "pipeline time" in out and "item shapes" in out
    assert glob.glob(os.path.join(tmp, "saved_results", "zenodo_sample_*.png"))
