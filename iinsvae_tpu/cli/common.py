"""Shared driver plumbing: logging, data resolution, state construction."""

from __future__ import annotations

import logging
import os
import sys
import time

import jax
import jax.numpy as jnp

from iinsvae_tpu.config import Config
from iinsvae_tpu.data.splits import err_mitigation_dataset
from iinsvae_tpu.training.optim import make_optimizer
from iinsvae_tpu.training.state import create_train_state

EWINE_DEFAULT_PATHS = [
    "./data/data_ewine/dataset1/tag_room0.csv",
    "./data/data_ewine/dataset1/tag_room1.csv",
    "./data/data_ewine/dataset2/tag_room0.csv",
    "./data/data_ewine/dataset2/tag_room1/",
]


def setup_logging(result_path: str, filename: str) -> logging.Logger:
    os.makedirs(result_path, exist_ok=True)
    logger = logging.getLogger(filename)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fh = logging.FileHandler(os.path.join(result_path, filename))
    fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
    logger.addHandler(fh)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(logging.Formatter("%(message)s"))
    logger.addHandler(sh)
    logger.info("Started")
    return logger


def resolve_data(cfg: Config):
    """Load train/test splits, falling back to the synthetic fixture when
    the real dataset is absent (it is not shipped in the reference repo —
    SURVEY.md §7 'data availability')."""
    if cfg.dataset_name == "zenodo":
        root = cfg.data_root
        if not os.path.exists(root):
            if not cfg.allow_synthetic:
                raise FileNotFoundError(
                    f"{root} not found; download the Zenodo dataset "
                    "(DOI 10.5281/zenodo.4290069) or drop --no_synthetic"
                )
            from iinsvae_tpu.data.synthetic import ensure_dataset

            root = ensure_dataset(root, n=cfg.synthetic_n, seed=cfg.seed,
                                  version=getattr(cfg, "fixture_version", 2))
            print(f"[data] dataset.pkl absent -> synthetic fixture at {root}")
    else:
        root = [p for p in EWINE_DEFAULT_PATHS if os.path.exists(p)]
        if not root:
            if not cfg.allow_synthetic:
                raise FileNotFoundError("no ewine csvs found under ./data/data_ewine/")
            from iinsvae_tpu.data.synthetic import ensure_ewine_dataset

            root = ensure_ewine_dataset(n=cfg.synthetic_n, seed=cfg.seed)
            print(f"[data] no ewine csvs -> synthetic fixture at {root[0]} ...")

    env = cfg.dataset_env if cfg.dataset_name == "zenodo" else None

    # memory-mapped binary cache of the assembled split (native mmap plane,
    # runtime/cache.py): first run parses + writes, later runs fault pages
    # in on demand — no pandas/pickle work at all.
    cache_path = None
    if getattr(cfg, "data_cache", True):
        from iinsvae_tpu.runtime.cache import cache_key, read_cache, write_cache

        src = root if isinstance(root, str) else root[0]
        key = cache_key(
            src, name=cfg.dataset_name, env=env, split=cfg.split_factor,
            mode=cfg.mode, seed=cfg.seed,
        )
        cache_path = os.path.join(os.path.dirname(src) or ".", "cache", key + ".iinsc")
        cached = read_cache(cache_path)
        if cached is not None:
            return (
                (cached["train_cir"], cached["train_err"], cached["train_label"]),
                (cached["test_cir"], cached["test_err"], cached["test_label"]),
            )

    data_train, data_test, ftr, fte = err_mitigation_dataset(
        root,
        dataset_name=cfg.dataset_name,
        dataset_env=env,
        split_factor=cfg.split_factor,
        scaling=True,
        mode=cfg.mode,
        seed=cfg.seed,
    )
    if cache_path is not None:
        from iinsvae_tpu.runtime.cache import write_cache

        write_cache(cache_path, {
            "train_cir": data_train[0], "train_err": data_train[1],
            "train_label": data_train[2],
            "test_cir": data_test[0], "test_err": data_test[1],
            "test_label": data_test[2],
        })
    return data_train, data_test


def to_batch_dict(split, compute_dtype: str = "float32") -> dict:
    cir, err, label = split
    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    return {
        "cir": jnp.asarray(cir, dtype),
        "err": jnp.asarray(err, jnp.float32),
        "label": jnp.asarray(label, jnp.float32),
    }


def init_state(model, cfg: Config, example_batch_size: int = 2, steps_per_epoch: int = 1,
               extra_input=None):
    rngs = {"params": jax.random.PRNGKey(cfg.seed)}
    x = jnp.ones((example_batch_size, cfg.cir_len))
    if extra_input is not None:
        variables = model.init(rngs, x, extra_input)
    else:
        variables = model.init(rngs, x)
    # offset stays 0 even when resuming (--epoch N): restore_checkpoint
    # restores the optax schedule count (= N * steps_per_epoch), which
    # already encodes the progress — adding cfg.epoch on top made the LR
    # resume at the 2N-epoch decay point and hit the zero clamp early.
    # (The reference NEEDS LambdaLR's offset because torch restarts its
    # scheduler from 0 on resume; orbax restores ours.)
    tx = make_optimizer(
        cfg.lr, cfg.b1, cfg.b2,
        n_epochs=cfg.n_epochs, decay_start_epoch=cfg.decay_epoch,
        steps_per_epoch=steps_per_epoch,
    )
    return create_train_state(model, variables, tx)


class EpochLogger:
    """Reference-style progress lines with ETA (train.py:117-129)."""

    def __init__(self, logger, n_epochs: int, header: str):
        self.logger = logger
        self.n_epochs = n_epochs
        self.header = header
        self.t0 = time.time()
        self.done = 0

    def __call__(self, epoch: int, metrics: dict):
        self.done += 1
        elapsed = time.time() - self.t0
        eta = elapsed / self.done * (self.n_epochs - epoch - 1)
        parts = " ".join(
            f"[{k}: {v:.6f}]" for k, v in metrics.items() if isinstance(v, float)
        )
        self.logger.info(
            f"{self.header} [Epoch {epoch}/{self.n_epochs}] {parts} "
            f"[epoch time: {elapsed / self.done:.3f}s ETA: {eta:.0f}s]"
        )
