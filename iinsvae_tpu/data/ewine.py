"""eWine UWB CSV loader (reference data_tools.py:14-109), vectorized.

CSV row layout (reference data_tools.py:93-107):
  cols 0-1: tag (x, y); cols 2-3: anchor (x, y); col 4: measured distance;
  col 5: NLOS label; col 8: first-path index; col 17: max amplitude;
  the CIR taps start at column ``fp_idx + 15`` and run for 152 taps.

Defects resolved: the reference returns an undefined ``err_arr``
(data_tools.py:109, the array is named ``error_arr``) and has a stray ':'
(data_tools.py:47). The per-row python loop is replaced by a vectorized
take-along-axis gather.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

CIR_LEN = 152


def load_data_from_file(filepath: str) -> np.ndarray:
    """CSV -> rows. Uses the native C++ parser (runtime_native/) when built;
    pandas otherwise."""
    from iinsvae_tpu.runtime import native

    if native.native_available():
        return native.read_csv(filepath)
    return pd.read_csv(filepath, sep=",", header=0).values


def load_data_from_folder(folderpath: str) -> np.ndarray:
    arrays = []
    for dirpath, _dirnames, filenames in os.walk(folderpath):
        for fname in sorted(filenames):
            if fname.endswith(".csv"):
                arrays.append(load_data_from_file(os.path.join(dirpath, fname)))
        break  # reference walks only the top level (data_tools.py:45-57)
    if not arrays:
        raise FileNotFoundError(f"No csv files in {folderpath}")
    return np.vstack(arrays)


def extract_reg_arrays(input_arr: np.ndarray):
    """(rows, cols) -> (cir (N,152), err (N,1), label (N,1)), vectorized.

    The first-path index (col 8) comes from FILE DATA: the 152-tap window is
    clamped into the row (NaN fp reads from 0), so malformed/hostile CSVs
    can neither wrap with negative indices nor index out of bounds — the
    clamp is the identity on valid rows. Same semantics as the native plane
    (runtime_native/iinsvae_io.cc::iins_ewine_extract, parity-tested).
    """
    input_arr = np.asarray(input_arr, dtype=np.float64)
    cols = input_arr.shape[1]
    if cols < max(18, CIR_LEN):
        raise ValueError(
            f"ewine rows need >= {max(18, CIR_LEN)} columns "
            f"(metadata + one CIR window), got {cols}"
        )
    d_gt = np.sqrt(
        (input_arr[:, 0] - input_arr[:, 2]) ** 2 + (input_arr[:, 1] - input_arr[:, 3]) ** 2
    )
    err = np.abs(d_gt - input_arr[:, 4]).reshape(-1, 1)
    label = input_arr[:, 5:6]
    fp = input_arr[:, 8]
    start_f = np.where(np.isfinite(fp), fp, 0.0) + 15.0
    start = np.clip(start_f, 0, cols - CIR_LEN).astype(np.int64)
    idx = start[:, None] + np.arange(CIR_LEN)[None, :]
    cir = np.take_along_axis(input_arr, idx, axis=1) / input_arr[:, 17:18]
    return cir, err, label


def load_cls_data(paths, seed: int = 0):
    """NLOS-classification view of the same rows: (cir, label).

    The reference imports this from data_tools for the ewine path
    (dataset.py:24) but never defines it anywhere — reconstructed from the
    call site's unpack ``label, cir = load_cls_data(...)``.
    """
    cir, _err, label = load_reg_data(paths, seed=seed)
    return cir, label


def load_reg_data(paths, seed: int = 0):
    """Load one or more csv files/folders, shuffle rows, extract arrays."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    arrays = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            arrays.append(load_data_from_folder(p))
        else:
            arrays.append(load_data_from_file(p))
    input_arr = np.vstack(arrays)
    rng = np.random.default_rng(seed)
    rng.shuffle(input_arr)
    from iinsvae_tpu.runtime import native

    if native.native_available():
        return native.ewine_extract(input_arr)
    return extract_reg_arrays(input_arr)
