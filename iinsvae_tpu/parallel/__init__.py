from iinsvae_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding_rules,
    state_shardings,
    shard_train_step,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_sharding_rules",
    "state_shardings",
    "shard_train_step",
]
