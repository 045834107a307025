"""Multi-host (DCN) distributed runtime.

The reference is single-process, single-device (SURVEY.md §5.8 — no
torch.distributed/NCCL/MPI anywhere); parallel/{mesh,shard}.py is the
single-host multi-chip runtime built in its place. This module adds the
multi-HOST layer for pod slices, designed so the only cross-host (DCN)
traffic is the once-per-step gradient ``pmean``:

* ``jax.distributed.initialize`` wiring (coordinator / num_processes /
  process_id), one line per train driver via ``init_distributed``;
* a global ``('data', 'model')`` mesh laid out process-major, so a 'model'
  (TP) axis never crosses a process boundary — TP collectives ride ICI;
* per-process epoch data: every batch is COLUMN-sharded over the global
  'data' axis (`shard_epoch_data`), so a scan step never reshards rows
  across hosts, and the per-epoch shuffle is per-shard (each device
  permutes its own rows — no cross-device traffic, statistically
  equivalent for DP since shard assignment is itself a fixed partition of
  an already-shuffled split);
* ``make_mh_epoch_runner``: the whole-epoch ``lax.scan`` (training/loop.py)
  composed with the shard_map DP step over the global mesh;
* primary-process gating for host-side effects (checkpoints, artifacts).

There is no multi-host hardware in this environment; the layer is
exercised for real by tests/test_multihost.py — two separate processes,
4 virtual CPU devices each, Gloo cross-process collectives — asserting
loss decrease and bit-identical replicated params on both processes.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from iinsvae_tpu.training.steps import reduce_metrics


def init_distributed(
    coordinator: str = "",
    num_processes: int = 1,
    process_id: int = -1,
    local_device_ids=None,
) -> bool:
    """Join the jax.distributed cluster. Returns True when multi-process.

    No-op (returns False) for num_processes <= 1 so single-host runs never
    pay the coordinator dial. Must be called before any other jax API
    touches the backend (jax.distributed's own requirement).
    """
    if num_processes is None or num_processes <= 1:
        return False
    if not coordinator or process_id < 0:
        raise ValueError(
            "--dist_procs > 1 needs --dist_coordinator host:port and --dist_rank"
        )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_primary() -> bool:
    """True on the process that owns host-side effects (logs/checkpoints)."""
    return jax.process_index() == 0


def make_global_mesh(n_model: int = 1) -> Mesh:
    """A ('data', 'model') mesh over ALL processes' devices, process-major.

    Devices are ordered by (process_index, local order) and the 'model'
    axis is the fastest-varying, so any TP group is contained within one
    process (ICI); only the DP reduction crosses DCN.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_local = jax.local_device_count()
    assert n_local % n_model == 0, (
        f"n_model={n_model} must divide local device count {n_local} "
        "(TP groups must not cross a host boundary)"
    )
    arr = np.asarray(devices).reshape(len(devices) // n_model, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def process_column(mesh: Mesh, axis: str = "data") -> tuple[int, int]:
    """(start_shard, n_shards) of this process's block along the mesh axis.

    The process-major layout makes each process's shards contiguous; this
    is the column block `shard_epoch_data` cuts out of the batched arrays.
    """
    ax = mesh.axis_names.index(axis)
    dev = np.moveaxis(mesh.devices, ax, 0)
    flat = dev.reshape(dev.shape[0], -1)
    mine = [i for i in range(flat.shape[0])
            if flat[i, 0].process_index == jax.process_index()]
    assert mine and mine == list(range(mine[0], mine[0] + len(mine))), (
        "process devices are not contiguous along the data axis; "
        "build the mesh with make_global_mesh"
    )
    return mine[0], len(mine)


def shard_epoch_data(mesh: Mesh, batched: dict, axis: str = "data") -> dict:
    """Assemble global (nb, batch, ...) epoch arrays, batch axis sharded.

    `batched` holds this process's FULL padded epoch (every process loads
    the same tiny split — 35 MB at zenodo scale; at real pod scale slice
    rows with `process_column` before calling). Each process contributes
    its own column block of every batch, so a scan step's batch is already
    laid out P('data') — no per-step resharding, host rows never move.
    """
    start, n_mine = process_column(mesh, axis)
    n_shards = mesh.shape[axis]
    out = {}
    for k, v in batched.items():
        nb, bs = v.shape[0], v.shape[1]
        assert bs % n_shards == 0, (
            f"batch size {bs} not divisible by the {n_shards}-way data axis"
        )
        lbs = bs // n_shards
        local = np.asarray(v[:, start * lbs:(start + n_mine) * lbs])
        sh = NamedSharding(mesh, P(None, axis, *([None] * (v.ndim - 2))))
        out[k] = jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(local)
        )
    return out


def place_replicated(mesh: Mesh, tree):
    """Replicate a host-identical pytree onto every device of the mesh.

    Every process passes the SAME values (e.g. params from a shared-seed
    init) — the multi-controller contract for replicated global arrays.
    """
    rep = NamedSharding(mesh, P())

    def put(x):
        if not hasattr(x, "ndim"):
            return x
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    return jax.tree.map(put, tree, is_leaf=lambda x: hasattr(x, "ndim"))


def barrier(name: str = "iinsvae_barrier") -> None:
    """Block until every process reaches this point (e.g. before process
    exit, so the coordinator on process 0 outlives the workers' last
    collective)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def localize(tree):
    """Fully-replicated global arrays -> host numpy (for process-local work:
    evaluation, serving, export). Each process reads its own replica."""

    def get(x):
        if hasattr(x, "addressable_data"):
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree.map(get, tree, is_leaf=lambda x: hasattr(x, "ndim"))


def make_mh_training(mesh: Mesh, grads_fn: Callable, state, train: dict,
                     batch_size: int):
    """One-call driver integration: place a replicated state on the global
    mesh, column-shard the padded epoch arrays, and build the whole-epoch
    runner over the shard_map DP step.

    ``train`` holds flat padded arrays (pad_to_batches output); returns
    ``(state, batched_train, run_epoch)`` with run_epoch(state, train, key)
    — the same call shape as training.loop.make_epoch_runner, so drivers
    swap it in without touching their epoch loop.
    """
    from iinsvae_tpu.parallel.shard import make_dp_train_step

    state = place_replicated(mesh, state)
    nb = train["cir"].shape[0] // batch_size
    batched = {
        k: np.asarray(v).reshape((nb, batch_size) + v.shape[1:])
        for k, v in train.items()
    }
    train = shard_epoch_data(mesh, batched)
    dp_step = make_dp_train_step(grads_fn, mesh, jit=False)
    return state, train, make_mh_epoch_runner(dp_step, mesh)


def make_mh_epoch_runner(
    dp_step: Callable, mesh: Mesh, axis: str = "data"
) -> Callable:
    """Whole-epoch lax.scan over a shard_map DP step on the global mesh.

    run_epoch(state, batched, key) -> (state, summed metrics), where
    `batched` is the dict from shard_epoch_data (nb, batch, ...) and
    dp_step comes from parallel.shard.make_dp_train_step(..., jit=False).
    The per-epoch shuffle permutes each shard's rows locally (across the
    epoch's batches) inside shard_map — zero cross-device traffic.
    """

    def _specs(d):
        return {
            k: P(None, axis, *([None] * (v.ndim - 2))) for k, v in d.items()
        }

    def _local_shuffle(key, d):
        kk = jax.random.fold_in(key, lax.axis_index(axis))
        nb, lbs = d["cir"].shape[:2]
        perm = jax.random.permutation(kk, nb * lbs)
        return {
            k: v.reshape((nb * lbs,) + v.shape[2:])[perm].reshape(v.shape)
            for k, v in d.items()
        }

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state, batched, key):
        k_perm, k_steps = jax.random.split(key)
        specs = _specs(batched)
        data_s = shard_map(
            functools.partial(_local_shuffle, k_perm),
            mesh=mesh,
            in_specs=(specs,),
            out_specs=specs,
            check_vma=False,
        )(batched)
        nb = data_s["cir"].shape[0]

        def body(st, xs):
            batch, i = xs
            st, m = dp_step(st, batch, jax.random.fold_in(k_steps, i))
            return st, m

        state, ms = lax.scan(body, state, (data_s, jnp.arange(nb)))
        return state, reduce_metrics(ms, jnp.sum)

    return run_epoch
