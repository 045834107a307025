"""Dataset façade + device pipeline.

``UWBDataset`` keeps the reference's item API ({"CIR","Err","Label"},
reference dataset.py:93-136) for users porting code over; the actual
training path never iterates items — the whole split goes to HBM once and
the epoch loop batches on device (training/loop.py).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class UWBDataset:
    """Array-backed dataset with the reference's __getitem__ contract."""

    def __init__(self, data):
        cir, err, label = data
        self.cir = np.asarray(cir, dtype=np.float32)
        self.err = np.asarray(err, dtype=np.float32)
        self.label = np.asarray(label, dtype=np.float32)

    def __getitem__(self, index: int) -> dict:
        i = index % len(self.cir)
        return {
            "CIR": self.cir[i],
            "Err": self.err[i % len(self.err)],
            "Label": self.label[i % len(self.label)],
        }

    def __len__(self) -> int:
        return len(self.cir)

    def as_device_batches(self) -> dict:
        """The dict the jit training loop consumes, resident on device."""
        return {
            "cir": jnp.asarray(self.cir),
            "err": jnp.asarray(self.err),
            "label": jnp.asarray(self.label),
        }

    def batches(self, batch_size: int, shuffle: bool = False, seed: int = 0):
        """Host-side batch iterator (eval/debug convenience)."""
        n = len(self)
        order = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for i in range(0, n, batch_size):
            idx = order[i : i + batch_size]
            yield {
                "CIR": self.cir[idx],
                "Err": self.err[idx],
                "Label": self.label[idx],
            }
