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
