from iinsvae_tpu.ops.pallas.fused import (
    fused_dense_layer,
    set_pallas_enabled,
    pallas_enabled,
)

__all__ = ["fused_dense_layer", "set_pallas_enabled", "pallas_enabled"]
