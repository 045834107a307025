from iinsvae_tpu.ops.pooling import (
    adaptive_avg_pool_matrix,
    adaptive_avg_pool1d,
    adaptive_avg_pool2d,
)
from iinsvae_tpu.ops.conv import conv1d, conv2d, reflect_pad1d, upsample_nearest1d
from iinsvae_tpu.ops.norms import instance_norm, adain, sample_layer_norm

__all__ = [
    "adaptive_avg_pool_matrix",
    "adaptive_avg_pool1d",
    "adaptive_avg_pool2d",
    "conv1d",
    "conv2d",
    "reflect_pad1d",
    "upsample_nearest1d",
    "instance_norm",
    "adain",
    "sample_layer_norm",
]
