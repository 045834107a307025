"""Zenodo "Deep UWB" pickle loader (DOI 10.5281/zenodo.4290069).

Table-driven reimplementation of the reference's 220-line copy-paste
selection blocks (reference data_tools.py:114-337), with the defect ledger
resolved to intent (SURVEY.md §2.4):

* ``nlos``: the reference's one-hot string generator emits 11-char strings
  from the third obstacle on (data_tools.py:130-146) and indexes a stale
  variable (``ds_nlos`` vs ``ds_nlos_i``); intent is LOS = '0000000000',
  NLOS = any one-hot obstacle.
* ``room_part``: "small room" re-selects Room==1 (data_tools.py:269);
  intent is Room==3 per the dataset README room encoding.
* ``obstacle_full``: ds_2 is built from ds_1 (data_tools.py:180); intent is
  the glass-plate selection.
* returns are (cir, err, label, room) consistently — the reference's
  4-tuple unpacked as 3 (dataset.py:28) crashes the canonical path.

Obstacle label order follows the reference exactly: label k selects the
one-hot string with the '1' in position 10-k-1 from the right
(data_tools.py:172-240), giving the class names in ``label_dictionary``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# one-hot obstacle strings in reference label order 0..9 (data_tools.py:170-240)
OBSTACLE_ONEHOT = [
    "0000000001",  # 0 metal window
    "0000000010",  # 1 glass plate
    "0000000100",  # 2 wood door
    "0000001000",  # 3 metal plate
    "0000010000",  # 4 LCD TV
    "0000100000",  # 5 cardboard box
    "0001000000",  # 6 plywood plate
    "0010000000",  # 7 plastic
    "0100000000",  # 8 polystyrene plate
    "1000000000",  # 9 wall
]
LOS_STR = "0000000000"

# material groups for obstacle_part (reference data_tools.py:286-324)
_OBSTACLE_PART = {
    0: ["0000000001", "0000001000"],  # metal (window + plate)
    1: ["0000000100"],                # wood
    2: ["0010000000"],                # plastic
    3: ["0000000010"],                # glass
}

ZENODO_ENVS = (
    "nlos",
    "room_full",
    "obstacle_full",
    "room_part",
    "obstacle_part",
    "room_full_rough",
    "room_full_rough2",
    "obstacle_part2",
    "paper",
)


def label_dictionary(dataset_env: str) -> dict:
    """int -> class-name maps (reference data_tools.py:417-442)."""
    if dataset_env == "nlos":
        return {0: "los", 1: "nlos"}
    if dataset_env == "room_full":
        return {0: "cross-room", 1: "big room", 2: "medium room", 3: "small room", 4: "outdoor"}
    if dataset_env == "obstacle_full":
        return {
            0: "metal window", 1: "glass plate", 2: "wood door", 3: "metal plate",
            4: "LCD TV", 5: "cardboard box", 6: "plywood plate", 7: "plastic",
            8: "polystyrene plate", 9: "wall",
        }
    if dataset_env == "room_part":
        return {0: "big room", 1: "medium room", 2: "small room"}
    if dataset_env in ("obstacle_part", "paper"):
        return {0: "metal", 1: "wood", 2: "plastic", 3: "glass"}
    # extensions named (with class counts only) in reference train_semi.py:46-63
    if dataset_env == "room_full_rough":
        return {0: "cross-room", 1: "indoor", 2: "outdoor"}
    if dataset_env == "room_full_rough2":
        return {0: "indoor", 1: "outdoor"}
    if dataset_env == "obstacle_part2":
        return {0: "metal", 1: "non-metal"}
    raise ValueError(f"Unknown environment: {dataset_env}")


def label_int2str(dataset_env: str, label_int: int) -> str:
    return label_dictionary(dataset_env)[int(label_int)]


def _select(data: pd.DataFrame, obstacles=None, rooms=None) -> pd.DataFrame:
    if obstacles is not None:
        data = data.loc[data["Obstacles"].isin(obstacles)]
    if rooms is not None:
        data = data.loc[data["Room"].isin(rooms)]
    return data


def _stack(frames_and_labels):
    """[(df, label_int), ...] -> (cir, err, label, room) float arrays."""
    cirs, errs, labels, rooms = [], [], [], []
    for df, lab in frames_and_labels:
        if len(df) == 0:
            continue
        cirs.append(np.vstack(df["CIR"].to_numpy()))
        errs.append(np.asarray(df["Error"].to_numpy(), dtype=np.float64).reshape(-1, 1))
        rooms.append(np.asarray(df["Room"].to_numpy(), dtype=np.float64).reshape(-1, 1))
        if lab == "room":
            labels.append(np.asarray(df["Room"].to_numpy(), dtype=np.float64).reshape(-1, 1))
        else:
            labels.append(np.full((len(df), 1), float(lab)))
    cir = np.vstack(cirs)
    err = np.vstack(errs)
    label = np.vstack(labels)
    room = np.vstack(rooms)
    return cir, err, label, room


def load_pkl_data(filepath: str, option: str | None = None, seed: int = 0):
    """Load + select + shuffle. Returns (cir, err, label, room), shapes
    (N, 157), (N, 1), (N, 1), (N, 1)."""
    option = option or "nlos"
    data = pd.read_pickle(filepath)

    if option == "nlos":
        parts = [(_select(data, obstacles=[LOS_STR]), 0),
                 (_select(data, obstacles=OBSTACLE_ONEHOT), 1)]
    elif option == "room_full":
        parts = [(data, "room")]
    elif option == "obstacle_full":
        parts = [(_select(data, obstacles=[s]), k) for k, s in enumerate(OBSTACLE_ONEHOT)]
    elif option == "room_part":
        parts = [(_select(data, rooms=[1]), 0),
                 (_select(data, rooms=[2]), 1),
                 (_select(data, rooms=[3]), 2)]
    elif option in ("obstacle_part", "paper"):
        # 'paper' is the paper protocol's env: reference train_semi.py:62
        # maps it to num_classes=4 — the obstacle_part material groups —
        # normally combined with mode='paper' cross-room splitting
        parts = [(_select(data, obstacles=strs), k) for k, strs in _OBSTACLE_PART.items()]
    elif option == "room_full_rough":
        parts = [(_select(data, rooms=[0]), 0),
                 (_select(data, rooms=[1, 2, 3]), 1),
                 (_select(data, rooms=[4]), 2)]
    elif option == "room_full_rough2":
        parts = [(_select(data, rooms=[0, 1, 2, 3]), 0),
                 (_select(data, rooms=[4]), 1)]
    elif option == "obstacle_part2":
        metal = _OBSTACLE_PART[0]
        non_metal = [s for s in OBSTACLE_ONEHOT if s not in metal]
        parts = [(_select(data, obstacles=metal), 0),
                 (_select(data, obstacles=non_metal), 1)]
    else:
        raise ValueError(f"Unknown environment option: {option}")

    cir, err, label, room = _stack(parts)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(cir.shape[0])
    return cir[perm], err[perm], label[perm], room[perm]
