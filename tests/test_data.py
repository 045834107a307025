"""Data layer tests on the synthetic Zenodo-shaped fixture."""

import numpy as np
import pytest

from iinsvae_tpu.data.synthetic import synthetic_zenodo_frame, synthetic_arrays
from iinsvae_tpu.data.zenodo import load_pkl_data, OBSTACLE_ONEHOT, label_dictionary
from iinsvae_tpu.data.splits import err_mitigation_dataset, Standardizer
from iinsvae_tpu.data.ewine import extract_reg_arrays
from iinsvae_tpu.config import Config, NUM_CLASSES, parse


@pytest.fixture(scope="module")
def pkl_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "dataset.pkl"
    synthetic_zenodo_frame(n=2000, seed=0).to_pickle(path)
    return str(path)


def test_frame_schema(pkl_path):
    import pandas as pd

    df = pd.read_pickle(pkl_path)
    assert list(df.columns) == ["CIR", "Error", "Room", "Obstacles"]
    assert len(df["CIR"].iloc[0]) == 157
    assert set(df["Room"].unique()) <= {0, 1, 2, 3, 4}


@pytest.mark.parametrize("env", ["nlos", "room_full", "obstacle_full", "room_part", "obstacle_part", "room_full_rough", "room_full_rough2", "obstacle_part2"])
def test_env_selection(pkl_path, env):
    cir, err, label, room = load_pkl_data(pkl_path, option=env)
    n_classes = NUM_CLASSES[env]
    assert cir.shape[1] == 157
    assert err.shape == (cir.shape[0], 1)
    labels = set(np.unique(label).astype(int))
    assert labels <= set(range(n_classes))
    assert len(label_dictionary(env)) == n_classes
    # labels are 0-based — the CE shift bug (train_semi.py:222) must stay dead
    assert min(labels) == 0


def test_nlos_counts(pkl_path):
    import pandas as pd

    df = pd.read_pickle(pkl_path)
    n_los = (df["Obstacles"] == "0000000000").sum()
    cir, err, label, room = load_pkl_data(pkl_path, option="nlos")
    assert (label == 0).sum() == n_los
    assert (label == 1).sum() == len(df) - n_los  # every obstacle matched (bug fix)


def test_full_split_and_scaling(pkl_path):
    train, test, _, _ = err_mitigation_dataset(
        pkl_path, dataset_env="room_full", split_factor=0.8, scaling=True, mode="full"
    )
    n = train[0].shape[0] + test[0].shape[0]
    assert train[0].shape[0] == int(n * 0.8)
    # StandardScaler: train taps ~ N(0,1)
    np.testing.assert_allclose(train[0].mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(train[0].std(axis=0), 1.0, atol=1e-3)


def test_paper_split_holds_out_medium_room(pkl_path):
    train, test, _, _ = err_mitigation_dataset(
        pkl_path, dataset_env="room_full", scaling=False, mode="paper"
    )
    # test labels are all Room==2; train has none
    assert np.all(test[2] == 2)
    assert not np.any(train[2] == 2)


def test_standardizer_matches_sklearn(rng):
    from sklearn.preprocessing import StandardScaler

    x = rng.normal(size=(100, 7)).astype(np.float64) * 3 + 5
    t = rng.normal(size=(20, 7))
    ours = Standardizer.fit(x)
    sk = StandardScaler().fit(x)
    np.testing.assert_allclose(ours.transform(t), sk.transform(t), rtol=1e-6, atol=1e-8)


def test_ewine_extract(rng):
    # synthetic ewine-like rows: 18 meta cols + 200 cir taps
    n, taps = 16, 200
    rows = np.zeros((n, 18 + taps))
    rows[:, 0:2] = rng.uniform(0, 10, (n, 2))  # tag xy
    rows[:, 2:4] = rng.uniform(0, 10, (n, 2))  # anchor xy
    rows[:, 4] = rng.uniform(0, 14, n)  # measured d
    rows[:, 5] = rng.integers(0, 2, n)  # nlos
    rows[:, 8] = rng.integers(0, 30, n)  # fp_idx
    rows[:, 17] = rng.uniform(1000, 2000, n)  # max amp
    rows[:, 18:] = rng.uniform(0, 5000, (n, taps))
    cir, err, label = extract_reg_arrays(rows)
    assert cir.shape == (n, 152)
    i = 3
    fp = int(rows[i, 8])
    np.testing.assert_allclose(cir[i], rows[i, fp + 15 : fp + 15 + 152] / rows[i, 17])
    d_gt = np.hypot(rows[i, 0] - rows[i, 2], rows[i, 1] - rows[i, 3])
    assert err[i, 0] == pytest.approx(abs(d_gt - rows[i, 4]))


def test_config_union_cli():
    cfg = parse(["--dataset_env", "room_full", "--conv_type", "1", "--restorer_type", "2"])
    assert cfg.num_classes == 5
    assert cfg.cir_len == 157
    assert cfg.restorer_type == "Conv1d"
    assert cfg.range_code_shape == (8, 2)
    # test_semi.py's --ae_type aliases --conv_type
    cfg2 = parse(["--ae_type", "2"])
    assert cfg2.conv_type == 2 and cfg2.expand


def test_config_dist_validation():
    # multi-host flags must arrive as a complete set
    with pytest.raises(ValueError, match="dist_coordinator"):
        parse(["--dist_procs", "2"])
    with pytest.raises(ValueError, match="dist_coordinator"):
        parse(["--dist_procs", "2", "--dist_coordinator", "h:1"])  # no rank
    # --n_devices is the single-host path; mutually exclusive
    with pytest.raises(ValueError, match="single-host"):
        parse([
            "--dist_procs", "2", "--dist_coordinator", "h:1",
            "--dist_rank", "0", "--n_devices", "2",
        ])
    cfg = parse([
        "--dist_procs", "2", "--dist_coordinator", "h:1", "--dist_rank", "1",
    ])
    assert cfg.dist_procs == 2 and cfg.dist_rank == 1


def test_synthetic_arrays_direct():
    cir, err, label, room = synthetic_arrays(n=256, option="nlos")
    assert cir.shape == (256, 157)


@pytest.mark.slow
def test_pipeline_at_reference_scale(tmp_path):
    """Full-scale pipeline check: reference-documented split sizes
    (44,126 / 11,032 at 55,158 samples, dataset.py:193) and a load+split
    budget orders of magnitude under the reference's ~270 s anchor."""
    import time

    path = tmp_path / "dataset.pkl"
    synthetic_zenodo_frame(n=55158, seed=0).to_pickle(path)
    t0 = time.time()
    train, test, _, _ = err_mitigation_dataset(
        str(path), dataset_env="room_full", split_factor=0.8, scaling=True, mode="full"
    )
    dt = time.time() - t0
    assert train[0].shape == (44126, 157)
    assert test[0].shape == (11032, 157)
    # generous bound: still ~4.5x under the reference's ~270 s anchor, but
    # tolerant of a contended single-core CI box (observed >30 s only when
    # a TPU compile job shared the core)
    assert dt < 60.0, f"pipeline took {dt:.1f}s"


def test_fixture_v2_material_signal():
    """Fixture v2 (round 5): the material signature must (a) survive
    per-sample normalization — the model's first LayerNorm destroys
    absolute amplitude, which is what made v1 signal-limited at the 0.40
    plurality share (BASELINE.md round 4) — and (b) be absent in v1, so
    the two generators remain distinct ablation levers."""
    import numpy as np

    accs = {}
    for v in (1, 2):
        cir, _, label, _ = synthetic_arrays(n=4000, seed=0, option="paper", version=v)
        x = (cir - cir.mean(1, keepdims=True)) / (cir.std(1, keepdims=True) + 1e-8)
        fx = np.abs(np.fft.rfft(x, axis=1))
        y = label.ravel().astype(int)
        k = int(0.8 * len(y))
        # nearest-class-centroid probe in FFT space: fast, deterministic
        cents = np.stack([fx[:k][y[:k] == c].mean(0) for c in np.unique(y)])
        pred = np.argmin(
            ((fx[k:][:, None, :] - cents[None]) ** 2).sum(-1), axis=1
        )
        accs[v] = float((np.unique(y)[pred] == y[k:]).mean())
    plur = 0.45  # generous plurality-share bound for this draw
    assert accs[1] < 0.55, f"v1 unexpectedly separable: {accs}"
    assert accs[2] > plur + 0.15, f"v2 signal too weak: {accs}"


def test_fixture_v1_bit_stable(tmp_path):
    """version=1 must keep producing the pre-round-5 fixture bit-for-bit
    (continuity with BASELINE rounds 1-4 rows)."""
    import numpy as np

    a = synthetic_zenodo_frame(n=64, seed=3, version=1)
    b = synthetic_zenodo_frame(n=64, seed=3, version=1)
    assert np.allclose(np.vstack(a["CIR"].to_numpy()), np.vstack(b["CIR"].to_numpy()))
    # v2 differs from v1 on NLOS rows (the signature) for the same seed
    c = synthetic_zenodo_frame(n=64, seed=3, version=2)
    assert not np.allclose(
        np.vstack(a["CIR"].to_numpy()), np.vstack(c["CIR"].to_numpy())
    )


def test_ensure_dataset_versioned_filenames(tmp_path):
    from iinsvae_tpu.data.synthetic import ensure_dataset

    root = str(tmp_path / "dataset.pkl")
    p1 = ensure_dataset(root, n=64, seed=0, version=1)
    p2 = ensure_dataset(root, n=64, seed=0, version=2)
    assert p1 != p2 and "_v2_" in p2 and "_v2_" not in p1


def test_fixture_version_plumbs_through_cli(tmp_path, monkeypatch):
    """--fixture_version reaches ensure_dataset through resolve_data."""
    from iinsvae_tpu.config import parse
    from iinsvae_tpu.cli.common import resolve_data

    monkeypatch.chdir(tmp_path)
    for v in (1, 2):
        cfg = parse([
            "--dataset_env", "nlos", "--synthetic_n", "128",
            "--fixture_version", str(v), "--no_data_cache",
            "--data_root", str(tmp_path / "dz" / "dataset.pkl"),
        ])
        train, test = resolve_data(cfg)
        assert train[0].shape[1] == 157
    names = sorted(p.name for p in (tmp_path / "dz").glob("*.pkl"))
    assert any("_v2_" in n for n in names) and any("_v2_" not in n for n in names), names
