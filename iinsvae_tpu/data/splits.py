"""Train/test assembly: split modes, scaling, feature extraction
(reference dataset.py:15-89).

* mode='full': first split_factor fraction is train (dataset.py:33-36).
* mode='paper': the medium room (Room == 2) is held out as the test set,
  everything else trains (dataset.py:37-56) — the reference does this with
  a 25k-iteration python vstack loop; here it is two boolean masks.
* scaling: StandardScaler semantics — per-tap mean/std fit on train,
  applied to both splits (dataset.py:73-76).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class Standardizer:
    mean: np.ndarray
    std: np.ndarray

    @classmethod
    def fit(cls, x: np.ndarray) -> "Standardizer":
        mean = x.mean(axis=0)
        std = x.std(axis=0)  # biased, matching sklearn StandardScaler
        return cls(mean=mean, std=np.where(std == 0.0, 1.0, std))

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (x - self.mean) / self.std

    def inverse(self, x: np.ndarray) -> np.ndarray:
        return x * self.std + self.mean


def err_mitigation_dataset(
    root,
    dataset_name: str = "zenodo",
    dataset_env: str | None = None,
    split_factor: float = 0.8,
    scaling: bool = False,
    mode: str = "full",
    feature_flag: bool = False,
    seed: int = 0,
):
    """Returns (train, test, train_features, test_features) where train/test
    are (cir, err, label) float arrays — the reference's contract
    (dataset.py:85-89) with the swapped-unpack defect fixed."""
    if dataset_name == "ewine":
        from iinsvae_tpu.data.ewine import load_reg_data

        cir, err, label = load_reg_data(root, seed=seed)
        room = np.zeros_like(label)
    elif dataset_name == "zenodo":
        from iinsvae_tpu.data.zenodo import load_pkl_data

        dataset_env = dataset_env or "room_full"
        cir, err, label = (None, None, None)
        cir, err, label, room = load_pkl_data(root, option=dataset_env, seed=seed)
    else:
        raise ValueError(f"Unknown dataset: {dataset_name}")

    if mode == "full":
        n_train = int(cir.shape[0] * split_factor)
        tr = slice(0, n_train)
        te = slice(n_train, None)
        train_cir, test_cir = cir[tr], cir[te]
        train_err, test_err = err[tr], err[te]
        train_label, test_label = label[tr], label[te]
    elif mode == "paper":
        # hold out the medium room (Room == 2) as the test split
        test_mask = room.reshape(-1) == 2
        train_cir, test_cir = cir[~test_mask], cir[test_mask]
        train_err, test_err = err[~test_mask], err[test_mask]
        train_label, test_label = label[~test_mask], label[test_mask]
    else:
        raise ValueError(f"Unknown split mode: {mode}")

    train_features = test_features = None
    if feature_flag:
        from iinsvae_tpu.ops.features import feature_extraction_np

        train_features = feature_extraction_np(train_cir)
        test_features = feature_extraction_np(test_cir)

    if scaling:
        scaler = Standardizer.fit(train_cir)
        train_cir = scaler.transform(train_cir)
        test_cir = scaler.transform(test_cir)

    train = (
        np.ascontiguousarray(train_cir, dtype=np.float32),
        np.ascontiguousarray(train_err, dtype=np.float32),
        np.ascontiguousarray(train_label, dtype=np.float32),
    )
    test = (
        np.ascontiguousarray(test_cir, dtype=np.float32),
        np.ascontiguousarray(test_err, dtype=np.float32),
        np.ascontiguousarray(test_label, dtype=np.float32),
    )
    return train, test, train_features, test_features


def as_batch_dict(split) -> dict:
    """(cir, err, label) -> the batch dict the train steps consume."""
    cir, err, label = split
    return {"cir": cir, "err": err, "label": label}
