"""Native (C++) data-plane parity tests. Skipped when no toolchain."""

import numpy as np
import pytest

from iinsvae_tpu.runtime import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib not built (no g++?)"
)


def test_csv_parse_matches_pandas(tmp_path, rng):
    import pandas as pd

    arr = rng.normal(size=(50, 12))
    path = tmp_path / "t.csv"
    pd.DataFrame(arr, columns=[f"c{i}" for i in range(12)]).to_csv(path, index=False)
    got = native.read_csv(str(path))
    np.testing.assert_allclose(got, arr, rtol=1e-12)


def test_features_match_jnp(rng):
    from iinsvae_tpu.ops.features import feature_extraction_np

    cir = np.abs(rng.normal(size=(64, 157))).astype(np.float64) * 3
    got = native.features(cir)
    want = feature_extraction_np(cir.astype(np.float32))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_ewine_extract_matches_python(rng):
    from iinsvae_tpu.data.ewine import extract_reg_arrays

    n, taps = 20, 200
    rows = np.zeros((n, 18 + taps))
    rows[:, 0:4] = rng.uniform(0, 10, (n, 4))
    rows[:, 4] = rng.uniform(0, 14, n)
    rows[:, 5] = rng.integers(0, 2, n)
    rows[:, 8] = rng.integers(0, 30, n)
    rows[:, 17] = rng.uniform(1000, 2000, n)
    rows[:, 18:] = rng.uniform(0, 5000, (n, taps))
    cir_n, err_n, lab_n = native.ewine_extract(rows)
    cir_p, err_p, lab_p = extract_reg_arrays(rows)
    np.testing.assert_allclose(cir_n, cir_p, rtol=1e-12)
    np.testing.assert_allclose(err_n, err_p, rtol=1e-12)
    np.testing.assert_allclose(lab_n, lab_p)


def test_standardizer_matches_python(rng):
    from iinsvae_tpu.data.splits import Standardizer as PyStd

    x = rng.normal(size=(100, 9)) * 4 + 2
    t = rng.normal(size=(30, 9))
    ours = native.Standardizer.fit(x)
    ref = PyStd.fit(x)
    np.testing.assert_allclose(ours.transform(t), ref.transform(t), rtol=1e-10)


def test_mmap_cache_roundtrip(tmp_path, rng):
    """Native binary cache: write once, mmap back zero-copy, exact values."""
    from iinsvae_tpu.runtime.cache import read_cache, write_cache

    arrays = {
        "train_cir": rng.normal(size=(64, 157)).astype(np.float32),
        "train_err": rng.normal(size=(64, 1)).astype(np.float32),
        "labels": rng.integers(0, 5, (64,)).astype(np.int64),
        "stats": rng.normal(size=(2, 3, 4)).astype(np.float64),
    }
    path = str(tmp_path / "cache" / "split.iinsc")
    assert write_cache(path, arrays)
    got = read_cache(path)
    assert set(got) == set(arrays)
    for k, v in arrays.items():
        assert got[k].dtype == v.dtype and got[k].shape == v.shape, k
        np.testing.assert_array_equal(np.asarray(got[k]), v)
    assert read_cache(str(tmp_path / "missing.iinsc")) is None


def test_cache_key_invalidates_on_source_change(tmp_path):
    from iinsvae_tpu.runtime.cache import cache_key

    src = tmp_path / "dataset.pkl"
    src.write_bytes(b"one")
    k1 = cache_key(str(src), env="nlos", seed=0)
    assert k1 == cache_key(str(src), env="nlos", seed=0)
    assert k1 != cache_key(str(src), env="nlos", seed=1)
    import os, time
    time.sleep(0.01)
    src.write_bytes(b"two+")
    assert k1 != cache_key(str(src), env="nlos", seed=0)


def test_resolve_data_cache_hit(tmp_path, monkeypatch):
    """Second resolve_data call must come from the mmap cache and match."""
    import iinsvae_tpu.data.splits as splits
    from iinsvae_tpu.cli.common import resolve_data
    from iinsvae_tpu.config import Config

    monkeypatch.chdir(tmp_path)
    cfg = Config(dataset_env="nlos", synthetic_n=600, seed=3)
    tr1, te1 = resolve_data(cfg)

    calls = []
    orig = splits.err_mitigation_dataset

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr("iinsvae_tpu.cli.common.err_mitigation_dataset", spy)
    tr2, te2 = resolve_data(cfg)
    assert not calls, "cache miss: err_mitigation_dataset re-ran"
    for a, b in zip(tr1 + te1, tr2 + te2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    cfg2 = Config(dataset_env="nlos", synthetic_n=600, seed=3, data_cache=False)
    resolve_data(cfg2)
    assert calls, "--no_data_cache must bypass the cache"
