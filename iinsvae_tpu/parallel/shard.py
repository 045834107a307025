"""shard_map data-parallel training step with explicit collectives.

Two multi-chip lowerings exist in this framework:

* parallel/mesh.py: jit + NamedSharding annotations — XLA's SPMD partitioner
  inserts the collectives. Ideal for pure-XLA programs.
* this module: `shard_map` with an explicit gradient `pmean` — each device
  runs the per-shard step body (INCLUDING the Pallas fused kernels, which
  the SPMD partitioner would otherwise have to treat as an opaque
  custom-call and replicate around) on its local batch shard, then gradients
  and metric sums ride ICI once per step.

Params/opt state replicated, batch sharded over 'data' — the correct layout
for a ~1M-param conv VAE (SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Callable

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from iinsvae_tpu.training.steps import reduce_metrics


def make_dp_train_step(
    grads_fn: Callable, mesh: Mesh, axis: str = "data", jit: bool = True
) -> Callable:
    """Wrap an update-free grads_fn into a shard_map DP step.

    Returns step(state, batch, key) -> (state, metrics); batch arrays must
    be shardable on axis 0 by mesh.shape[axis]. Pass jit=False to get the
    traceable step for composition inside an outer jit (e.g. the whole-epoch
    lax.scan runner, training/loop.py) — the outer jit then owns donation.
    """

    def local(state, batch, key):
        # decorrelate per-shard randomness (mask / dropout / reparam)
        key = jax.random.fold_in(key, lax.axis_index(axis))
        grads, metrics, mut = grads_fn(state, batch, key)
        grads = lax.pmean(grads, axis)
        # exact global metrics: sums psum'd, weighted means recombined with
        # their true denominators (uneven padding / supervision masks across
        # shards would skew a pmean of per-shard means)
        out_metrics = reduce_metrics(metrics, lambda v: lax.psum(v, axis))
        new_bs = jax.tree.map(
            lambda x: lax.pmean(x, axis), mut.get("batch_stats", state.batch_stats)
        )
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_bs)
        return state, out_metrics

    def step(state, batch, key):
        batch_specs = {
            k: P(axis, *([None] * (v.ndim - 1))) for k, v in batch.items()
        }
        fn = shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return fn(state, batch, key)

    return jax.jit(step, donate_argnums=(0,)) if jit else step


def place_dp(mesh: Mesh, state, batch: dict, axis: str = "data"):
    """Device-put state replicated and batch sharded for make_dp_train_step."""
    rep = NamedSharding(mesh, P())
    state = jax.tree.map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "ndim") else x, state,
        is_leaf=lambda x: hasattr(x, "ndim"),
    )
    batch = {
        k: jax.device_put(v, NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1)))))
        for k, v in batch.items()
    }
    return state, batch
