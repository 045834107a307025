"""ctypes bindings for the native host data plane (runtime_native/).

Auto-builds the shared library with the repo Makefile on first use when a
toolchain is present; every entry point has a pure-python fallback so the
framework works without it. The TPU compute path never goes through here —
this is the host-side loader/feature runtime (the reference's pandas +
python-loop pipeline, ~270 s per load, dataset.py:192).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "runtime_native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libiinsvae_io.so")

_lib = None
_tried = False

_i64 = ctypes.c_int64
_p_i64 = ctypes.POINTER(ctypes.c_int64)
_p_d = ctypes.POINTER(ctypes.c_double)


def build_native(quiet: bool = True) -> bool:
    """Compile libiinsvae_io.so with make/g++. Returns success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        build_native()
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.iins_read_csv.restype = _p_d
    lib.iins_read_csv.argtypes = [ctypes.c_char_p, ctypes.c_int, _p_i64, _p_i64]
    lib.iins_free.argtypes = [_p_d]
    lib.iins_ewine_extract.argtypes = [_p_d, _i64, _i64, _p_d, _p_d, _p_d]
    lib.iins_features.argtypes = [_p_d, _i64, _i64, _p_d]
    lib.iins_standardize_fit.argtypes = [_p_d, _i64, _i64, _p_d, _p_d]
    lib.iins_standardize_apply.argtypes = [_p_d, _i64, _i64, _p_d, _p_d]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(_p_d)


def read_csv(path: str, skip_header: bool = True) -> np.ndarray:
    """CSV -> (rows, cols) float64 array; native parser with pandas fallback."""
    lib = _load()
    if lib is None:
        import pandas as pd

        return pd.read_csv(path, sep=",", header=0 if skip_header else None).values.astype(
            np.float64
        )
    rows = _i64(0)
    cols = _i64(0)
    ptr = lib.iins_read_csv(
        path.encode(), 1 if skip_header else 0, ctypes.byref(rows), ctypes.byref(cols)
    )
    if not ptr:
        raise IOError(f"native csv parse failed: {path}")
    n, d = rows.value, cols.value
    out = np.ctypeslib.as_array(ptr, shape=(n, d)).copy()
    lib.iins_free(ptr)
    return out


def ewine_extract(rows: np.ndarray):
    """(N, cols) raw ewine rows -> (cir (N,152), err (N,1), label (N,1))."""
    lib = _load()
    rows = np.ascontiguousarray(rows, dtype=np.float64)
    if lib is None:
        from iinsvae_tpu.data.ewine import extract_reg_arrays

        return extract_reg_arrays(rows)
    n, cols = rows.shape
    if cols < max(18, 152):  # same contract as extract_reg_arrays
        raise ValueError(
            f"ewine rows need >= {max(18, 152)} columns "
            f"(metadata + one CIR window), got {cols}"
        )
    cir = np.empty((n, 152), dtype=np.float64)
    err = np.empty((n, 1), dtype=np.float64)
    label = np.empty((n, 1), dtype=np.float64)
    lib.iins_ewine_extract(_as_c(rows), n, cols, _as_c(cir), _as_c(err), _as_c(label))
    return cir, err, label


def features(cir: np.ndarray) -> np.ndarray:
    """(N, L) CIRs -> (N, 6) features [Er, T_EMD, T_RMS, Kur, R_T, M_AMP]."""
    lib = _load()
    cir = np.ascontiguousarray(cir, dtype=np.float64)
    if lib is None:
        from iinsvae_tpu.ops.features import feature_extraction_np

        return feature_extraction_np(cir).astype(np.float64)
    n, l = cir.shape
    out = np.empty((n, 6), dtype=np.float64)
    lib.iins_features(_as_c(cir), n, l, _as_c(out))
    return out


@dataclass
class Standardizer:
    mean: np.ndarray
    std: np.ndarray

    @classmethod
    def fit(cls, x: np.ndarray) -> "Standardizer":
        lib = _load()
        x = np.ascontiguousarray(x, dtype=np.float64)
        n, d = x.shape
        if lib is None:
            from iinsvae_tpu.data.splits import Standardizer as PyStd

            s = PyStd.fit(x)
            return cls(mean=np.asarray(s.mean), std=np.asarray(s.std))
        mean = np.empty(d, dtype=np.float64)
        std = np.empty(d, dtype=np.float64)
        lib.iins_standardize_fit(_as_c(x), n, d, _as_c(mean), _as_c(std))
        return cls(mean=mean, std=std)

    def transform(self, x: np.ndarray) -> np.ndarray:
        lib = _load()
        x = np.ascontiguousarray(x, dtype=np.float64).copy()
        if lib is None:
            return (x - self.mean) / self.std
        n, d = x.shape
        lib.iins_standardize_apply(_as_c(x), n, d, _as_c(self.mean), _as_c(self.std))
        return x
