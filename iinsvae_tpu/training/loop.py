"""Epoch-level training loop: the whole epoch is ONE jit call.

The datasets are tiny by TPU standards (55k x 157 floats ~ 35 MB,
SURVEY.md §7), so the entire train split lives in HBM and an epoch is a
``lax.scan`` over pre-batched views — shuffle (on-device permutation),
batching, and every train step run inside a single compiled program. Host
work per epoch is one dispatch; this is where the >=50x-over-CPU-reference
throughput comes from, not kernel heroics.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from iinsvae_tpu.training.steps import SUM_KEYS, finalize_metrics, reduce_metrics


def pad_to_batches(data: dict, batch_size: int) -> dict:
    """Pad arrays to a multiple of batch_size, adding a 'weight' mask so
    padded samples contribute nothing to losses or metrics."""
    n = data["cir"].shape[0]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    out = {}
    for k, v in data.items():
        widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = jnp.pad(jnp.asarray(v), widths)
    weight = jnp.ones((n,), out["cir"].dtype)
    out["weight"] = jnp.pad(weight, (0, pad))
    return out


def make_epoch_runner(train_step: Callable, batch_size: int, shuffle: bool = True):
    """Returns jitted run_epoch(state, data, key) -> (state, metrics).

    data: dict of flat arrays padded to a multiple of batch_size
    (pad_to_batches). Shuffling is an on-device permutation.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state, data, key):
        n = data["cir"].shape[0]
        nb = n // batch_size
        k_perm, k_steps = jax.random.split(key)
        if shuffle:
            perm = jax.random.permutation(k_perm, n)
            data_s = {k: v[perm] for k, v in data.items()}
        else:
            data_s = data
        batched = {
            k: v.reshape((nb, batch_size) + v.shape[1:]) for k, v in data_s.items()
        }

        def body(carry, batch_and_idx):
            st = carry
            batch, i = batch_and_idx
            st, m = train_step(st, batch, jax.random.fold_in(k_steps, i))
            return st, m

        state, ms = jax.lax.scan(body, state, (batched, jnp.arange(nb)))
        # exact epoch metrics: per-batch weighted means recombined with
        # their true denominators (the padded tail batch would otherwise
        # skew a mean of per-batch means)
        acc = reduce_metrics(ms, jnp.sum)
        return state, acc

    return run_epoch


def make_evaluator(eval_step: Callable, batch_size: int):
    """Returns jitted evaluate(state, data) -> (metrics, outputs).

    Outputs (err_est, logits/env codes) come back stacked over the full
    split so downstream CDF/latent viz reduce ONCE, not per batch — the
    reference runs UMAP inside the batch loop (test.py:89, SURVEY.md §3.3).
    """

    @jax.jit
    def evaluate(state, data):
        n = data["cir"].shape[0]
        nb = n // batch_size
        batched = {
            k: v.reshape((nb, batch_size) + v.shape[1:]) for k, v in data.items()
        }

        def body(_, batch):
            m, out = eval_step(state, batch)
            return None, (m, out)

        _, (ms, outs) = jax.lax.scan(body, None, batched)
        acc = {k: jnp.sum(v) for k, v in ms.items() if k in SUM_KEYS}
        return acc, outs

    def run(state, data):
        acc, outs = evaluate(state, data)
        metrics = finalize_metrics(acc)
        return metrics, outs

    return run


def train_epochs(
    state,
    run_epoch: Callable,
    data: dict,
    n_epochs: int,
    key: jax.Array,
    start_epoch: int = 0,
    log_fn: Optional[Callable] = None,
    eval_fn: Optional[Callable] = None,
    eval_interval: int = 0,
    checkpoint_fn: Optional[Callable] = None,
    checkpoint_interval: int = 0,
):
    """Host-side multi-epoch driver with the reference's intervals
    (sample_interval / checkpoint_interval semantics, train.py:135-156)."""
    for epoch in range(start_epoch, n_epochs):
        state, metrics = run_epoch(state, data, jax.random.fold_in(key, epoch))
        if log_fn is not None:
            log_fn(epoch, jax.tree.map(float, finalize_metrics(metrics)))
        if eval_fn is not None and eval_interval and epoch % eval_interval == 0:
            eval_fn(epoch, state)
        if (
            checkpoint_fn is not None
            and checkpoint_interval
            and epoch % checkpoint_interval == 0
        ):
            checkpoint_fn(epoch, state)
    return state
