"""Synthetic Zenodo-shaped fixture (SURVEY.md §4: the real dataset.pkl is
not in the repo — data/data_zenodo/ holds only the README).

Generates physically-plausible UWB CIRs: a noise floor, a first-path pulse
whose delay/attenuation depend on the environment, and an exponentially
decaying multipath tail. Ranging error correlates with obstacle presence so
the learning task is non-trivial; rooms shift the multipath decay so the
env code has signal to classify.

Two fixture versions (``version=``):

* **v1** (rounds 1-4): obstacle material encoded ONLY as first-path
  amplitude (0.45+0.04·idx) and a coarse delay (+idx//2). Round 4's
  three-lever ablation proved this is below the learnability floor: the
  model's per-sample LayerNorm destroys absolute amplitude and the delay
  groups overlap across materials, so every method (semi/joint/conv_type=2/
  free-bits/SVM) lands at the 0.40 plurality share on the paper protocol
  (BASELINE.md round 4). Kept selectable for continuity with those rows.
* **v2** (round 5, default): each obstacle additionally leaves a
  *scale-invariant* material signature — a damped resonance
  ``ratio·exp(-dt/tau)·cos(2π f·dt + phase)`` after the first path, with
  material-characteristic frequency ``f`` (metal ring fast, glass slower,
  wood slower still, plastic/polystyrene barely) and per-sample jitter on
  frequency/amplitude/phase. Frequency content survives both the per-tap
  StandardScaler and the model's per-sample LayerNorm, so a conv encoder
  can learn material ID; the SVM's classic time-domain features (energy,
  rise time, delay spread, kurtosis — ops/features.py) capture it only
  weakly, so the baseline does not saturate. Decay constants are kept in a
  narrow band (4-11 taps) so delay-spread alone does not give the class
  away. Physically this models the UWB literature's observation that
  through-material propagation imposes material-dependent frequency
  selectivity on the received pulse.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from iinsvae_tpu.data.zenodo import OBSTACLE_ONEHOT, LOS_STR

CIR_LEN = 157

# v2 per-obstacle damped-resonance signature: idx -> (freq cycles/tap,
# tau taps, echo amplitude ratio vs first path). Same-material obstacles
# (obstacle_part groups, zenodo.py:44-50) share a frequency band: metal
# {0: 0.34, 3: 0.36}, glass 0.22, wood 0.13 (plywood 0.14), plastic 0.06.
_MATERIAL_SIG = {
    0: (0.34, 12.0, 0.95),  # metal window
    1: (0.22, 10.0, 0.70),  # glass plate
    2: (0.13, 9.0, 0.60),   # wood door
    3: (0.36, 13.0, 1.00),  # metal plate
    4: (0.28, 10.0, 0.75),  # LCD TV
    5: (0.10, 7.0, 0.45),   # cardboard box
    6: (0.14, 8.0, 0.55),   # plywood plate
    7: (0.06, 7.0, 0.50),   # plastic
    8: (0.05, 5.0, 0.30),   # polystyrene plate
    9: (0.18, 9.0, 0.80),   # wall
}

DEFAULT_FIXTURE_VERSION = 2


def synthetic_zenodo_frame(n: int = 4096, seed: int = 0, version: int = DEFAULT_FIXTURE_VERSION) -> pd.DataFrame:
    """A DataFrame with the dataset.pkl schema: CIR (157 floats), Error (m),
    Room (int 0-4), Obstacles (10-char one-hot string or all-zero LOS)."""
    if version not in (1, 2):
        raise ValueError(f"unknown fixture version {version!r} (1 or 2)")
    rng = np.random.default_rng(seed)
    rooms = rng.integers(0, 5, size=n)
    # ~40% LOS, rest uniformly one of 10 obstacles
    is_los = rng.random(n) < 0.4
    obstacle_idx = rng.integers(0, 10, size=n)
    obstacles = np.where(is_los, LOS_STR, np.asarray(OBSTACLE_ONEHOT)[obstacle_idx])

    t = np.arange(CIR_LEN, dtype=np.float64)
    # first-path delay shifts with obstacle (NLOS delays + attenuates)
    fp_delay = 20 + rng.integers(0, 6, size=n) + np.where(is_los, 0, 4 + obstacle_idx // 2)
    amp = np.where(is_los, 1.0, 0.45 + 0.04 * obstacle_idx) * (
        1.0 + 0.1 * rng.standard_normal(n)
    )
    # room-dependent multipath decay constant
    decay = 6.0 + 3.0 * rooms + rng.uniform(0, 1, size=n)

    dt = t[None, :] - fp_delay[:, None]
    pulse = np.exp(-0.5 * (dt / 1.5) ** 2)
    tail = np.where(dt > 0, np.exp(-dt / decay[:, None]), 0.0) * (
        0.35 + 0.1 * rng.random((n, CIR_LEN))
    )
    noise = 0.02 * np.abs(rng.standard_normal((n, CIR_LEN)))
    cir = amp[:, None] * (pulse + tail) + noise
    if version >= 2:
        # material resonance: damped cosine after the first path, with
        # per-sample jitter so the class is a *band*, not a delta. LOS
        # samples carry no obstacle, hence no signature.
        sig = np.array([_MATERIAL_SIG[i] for i in range(10)])  # (10, 3)
        f = sig[obstacle_idx, 0] * (1.0 + 0.08 * rng.standard_normal(n))
        tau = sig[obstacle_idx, 1] * (1.0 + 0.15 * rng.standard_normal(n))
        ratio = sig[obstacle_idx, 2] * (1.0 + 0.20 * rng.standard_normal(n))
        tau = np.clip(tau, 2.0, None)
        phase = rng.uniform(0, 2 * np.pi, size=n)
        ring = np.where(
            dt > 0,
            np.exp(-dt / tau[:, None]) * np.cos(2 * np.pi * f[:, None] * dt + phase[:, None]),
            0.0,
        )
        cir = cir + np.where(is_los, 0.0, amp * ratio)[:, None] * ring
    cir = cir * rng.uniform(800, 1200)  # raw zenodo CIRs are O(1e3-1e4)

    err = np.abs(
        0.05
        + np.where(is_los, 0.02, 0.15 + 0.02 * obstacle_idx) * (fp_delay - 20) / 6.0
        + 0.03 * rng.standard_normal(n)
    )

    return pd.DataFrame(
        {
            "CIR": [row for row in cir],
            "Error": err,
            "Room": rooms.astype(np.int64),
            "Obstacles": obstacles,
        }
    )


def synthetic_arrays(n: int = 4096, seed: int = 0, option: str = "room_full", version: int = DEFAULT_FIXTURE_VERSION):
    """Direct (cir, err, label, room) arrays without a pickle round-trip."""
    from iinsvae_tpu.data.zenodo import load_pkl_data  # reuse selection
    import tempfile

    frame = synthetic_zenodo_frame(n, seed, version=version)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "dataset.pkl")
        frame.to_pickle(path)
        return load_pkl_data(path, option=option, seed=seed)


def synthetic_ewine_csv(path: str, n: int = 512, seed: int = 0, taps: int = 200) -> str:
    """Write one synthetic eWine-format measurement CSV (column layout per
    reference data_tools.py:93-107): tag/anchor coords, measured distance,
    NLOS label, first-path index at col 8, max amplitude at col 17, raw CIR
    taps from col 18."""
    rng = np.random.default_rng(seed)
    rows = np.zeros((n, 18 + taps))
    rows[:, 0:2] = rng.uniform(0, 10, (n, 2))       # tag xy
    rows[:, 2:4] = rng.uniform(0, 10, (n, 2))       # anchor xy
    d_gt = np.hypot(rows[:, 0] - rows[:, 2], rows[:, 1] - rows[:, 3])
    nlos = rng.integers(0, 2, n)
    rows[:, 5] = nlos
    rows[:, 4] = d_gt + np.abs(0.05 + 0.25 * nlos * rng.random(n) + 0.03 * rng.standard_normal(n))
    rows[:, 8] = rng.integers(0, taps - 170, n)     # first-path index
    rows[:, 17] = rng.uniform(1000, 2000, n)        # max amplitude
    t = np.arange(taps)
    fp = rows[:, 8:9] + 15
    pulse = np.exp(-0.5 * ((t[None, :] - fp - 5) / 2.0) ** 2)
    tail = np.where(t[None, :] > fp, np.exp(-(t[None, :] - fp) / (8 + 6 * nlos[:, None])), 0)
    rows[:, 18:] = rows[:, 17:18] * (pulse + 0.4 * tail) + 20 * np.abs(rng.standard_normal((n, taps)))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pd.DataFrame(rows, columns=[f"c{i}" for i in range(rows.shape[1])]).to_csv(path, index=False)
    return path


def ensure_ewine_dataset(base_dir: str = "./data/data_ewine", n: int = 2048, seed: int = 0):
    """Create a synthetic eWine CSV tree (dataset1/tag_room{0,1}.csv) when no
    real one exists; returns the csv paths."""
    paths = [
        os.path.join(base_dir, "dataset1", "tag_room0.csv"),
        os.path.join(base_dir, "dataset1", "tag_room1.csv"),
    ]
    for i, p in enumerate(paths):
        if not os.path.exists(p):
            synthetic_ewine_csv(p, n=n // 2, seed=seed + i)
    return paths


def ensure_dataset(root: str, n: int = 4096, seed: int = 0, version: int = DEFAULT_FIXTURE_VERSION) -> str:
    """Return ``root`` if the real dataset.pkl exists; otherwise write a
    synthetic fixture UNDER A DISTINCT NAME next to it and return that path
    — never the real path, so a later run can't mistake the fixture for the
    downloaded dataset. The v1 filename is kept unversioned so pre-round-5
    cached fixtures stay valid for --fixture_version 1 runs."""
    if os.path.exists(root):
        return root
    base, ext = os.path.splitext(root)
    vtag = "" if version == 1 else f"_v{version}"
    synth = f"{base}_synthetic{vtag}_{n}_{seed}{ext or '.pkl'}"
    if not os.path.exists(synth):
        os.makedirs(os.path.dirname(synth) or ".", exist_ok=True)
        synthetic_zenodo_frame(n, seed, version=version).to_pickle(synth)
    return synth
