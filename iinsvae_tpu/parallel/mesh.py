"""Device mesh + sharding layer.

The reference has NO distributed code at all (SURVEY.md §5.8); this module
is the TPU-native parallel runtime built in its place:

* a 2-D ``Mesh`` over ICI with axes ('data', 'model'),
* batches sharded over 'data' (pure DP — correct for a ~1M-param conv VAE:
  params are tiny, activations dominate),
* the wide Restorer/MLP Dense kernels sharded over 'model' (TP) so multi-
  chip slices also split the largest matmuls,
* gradient/metric reductions are inserted by XLA's SPMD partitioner from
  the sharding annotations — no hand-written collectives on the jit path
  (psum and friends live only in the Pallas kernels).

Everything works identically on 1 chip, a v5e slice, or a host-simulated
CPU mesh (tests/conftest.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults to all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (
        f"mesh {n_data}x{n_model} != {n_total} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0, ndim: int = 2) -> NamedSharding:
    """Shard a batch array's batch axis over 'data'."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def batch_shardings(mesh: Mesh, batch: dict, batch_axis: int = 0) -> dict:
    return {
        k: batch_sharding(mesh, batch_axis, v.ndim) for k, v in batch.items()
    }


# Dense kernels at least this wide on the output dim get TP-sharded.
_TP_MIN_DIM = 128


def param_sharding_rules(mesh: Mesh):
    """Path-based sharding rule: wide Dense kernels -> P(None, 'model');
    everything else replicated. Returns fn(path, leaf) -> NamedSharding."""
    n_model = mesh.shape["model"]

    def rule(path, leaf) -> NamedSharding:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (
            n_model > 1
            and name == "kernel"
            and leaf.ndim == 2
            and leaf.shape[-1] >= _TP_MIN_DIM
            and leaf.shape[-1] % n_model == 0
        ):
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return rule


def state_shardings(mesh: Mesh, state):
    """Sharding pytree for a TrainState: params (and their mirrored opt
    state) per the TP rule, scalars/batch_stats replicated."""
    rule = param_sharding_rules(mesh)

    def params_sh(tree):
        return jax.tree_util.tree_map_with_path(rule, tree)

    replicated = NamedSharding(mesh, P())
    p_sh = params_sh(state.params)

    # make_optimizer wraps adam in optax.flatten (training/optim.py), so
    # its mu/nu are FLAT vectors, not param-tree mirrors: the kernel rule
    # below never fires on them and the whole opt state stays replicated.
    # That is deliberate — at ~1M params a replicated opt state costs a few
    # MB per chip and avoids a gather in the flattened update. The rule is
    # kept path-based so an unflattened optimizer would still TP-shard any
    # mirrored wide kernels.
    def leaf_rule(path, leaf):
        if hasattr(leaf, "ndim") and leaf.ndim == 2:
            return rule(path, leaf)
        return replicated

    opt_sh = jax.tree_util.tree_map_with_path(leaf_rule, state.opt_state)

    return state.replace(
        step=replicated,
        params=p_sh,
        batch_stats=jax.tree.map(lambda _: replicated, state.batch_stats),
        opt_state=opt_sh,
    )


def shard_state(mesh: Mesh, state):
    """Place an (unsharded) TrainState onto the mesh."""
    sh = state_shardings(mesh, state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s) if hasattr(x, "ndim") else x,
        state,
        sh,
        is_leaf=lambda x: hasattr(x, "ndim"),
    )


def shard_train_step(step_fn, mesh: Mesh, state, example_batch: dict):
    """jit a (state, batch, key) -> (state, metrics) step with explicit
    shardings; XLA inserts the DP grad all-reduce and TP collectives."""
    st_sh = state_shardings(mesh, state)
    b_sh = batch_shardings(mesh, example_batch)
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step_fn,
        in_shardings=(st_sh, b_sh, replicated),
        out_shardings=(st_sh, replicated),
        donate_argnums=(0,),
    )
