"""Train state: params + optimizer state + batch stats + step, one pytree.

Unlike the reference (which checkpoints only module weights and loses the
optimizer state, train_semi.py:281-286), the whole state is a single pytree
that orbax checkpoints and jit shards transparently.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def create_train_state(module, variables, tx) -> TrainState:
    import jax.numpy as jnp

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if isinstance(batch_stats, FrozenDict):
        batch_stats = batch_stats.unfreeze()
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=module.apply,
    )
