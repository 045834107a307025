"""Subpixel (phase-folded) lowering of the decoder's upsample stages.

The 2-D decoder's hot stages are ``nearest_upsample(2) -> Conv2d(5x5,
pad=2)`` on tiny-channel fields (reference models.py:509-517) — the worst
possible shape for the TPU MXU (C_in as low as 8 against a 128-wide
systolic array, and 4x the pixels of the pre-upsample grid).

Both problems cancel at once by folding the upsample into the kernel:
for output phase (p, q) in {0,1}^2,

    y[2i+p, 2j+q] = sum_{a,b in {-1,0,1}} Kp[p,q][a,b] . x[i+a, j+b]
    Kp[p,q][a,b]  = sum_{t: floor((p+t-2)/2)=a} sum_{s: floor((q+s-2)/2)=b} K[t,s]

i.e. ONE 3x3 conv on the LOW-res grid producing 4*C_out phase channels,
then a pixel shuffle. Exact (nearest upsampling maps logical index u to
u//2, and the zero-pad condition u<0 | u>=2H is exactly i+a<0 | i+a>=H);
fp-reassociation only (taps pre-summed per cell). 9/25 of the logical
tap-pixel products and 4x the output-channel width.

The 3x3 conv goes to XLA's native conv lowering, which builds its im2col
patches in VMEM. (An explicit host-level im2col — 9 shifted slices
concatenated on channels — materializes 9x the field in HBM, up to 590 MB
at the last stage at batch 500, and measured 2x SLOWER than the dense
reference path; conv3_im2col below is kept as the parity oracle only.)
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _phase_incidence_np(k: int = 5) -> np.ndarray:
    """PH[p, a, t] = 1 where upsampled tap t of phase p reads cell offset
    a-1 (a in {0,1,2} for offsets {-1,0,1})."""
    ph = np.zeros((2, 3, k), dtype=np.float32)
    for p in range(2):
        for t in range(k):
            a = (p + t - (k // 2)) // 2  # floor division
            ph[p, a + 1, t] = 1.0
    return ph


def phase_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(5, 5, C_in, C_out) -> (3, 3, C_in, 4*C_out) phase-folded kernel.
    Output channel order is (p, q, c_out)."""
    k, k2, c_in, c_out = kernel.shape
    assert k == 5 and k2 == 5, "phase folding implemented for 5x5 kernels"
    ph = jnp.asarray(_phase_incidence_np(k), kernel.dtype)
    kp = jnp.einsum("pat,qbs,tscd->abcpqd", ph, ph, kernel)
    return kp.reshape(3, 3, c_in, 4 * c_out)


def conv3_im2col(x: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """3x3 stride-1 zero-pad-1 conv as one im2col matmul.

    x: (B, H, W, C); kernel: (3, 3, C, C'). Nine static shifted slices of
    the padded field concatenated on channels, then a single dot.
    """
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.concatenate(
        [xp[:, i : i + h, j : j + w, :] for i in range(3) for j in range(3)],
        axis=-1,
    )  # (B, H, W, 9C)
    c_out = kernel.shape[-1]
    wmat = kernel.reshape(9 * c, c_out).astype(x.dtype)
    y = jnp.einsum(
        "bhwp,po->bhwo", patches, wmat, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def upsample_conv5_phase(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """nearest_up2 + conv5(pad 2) in phase-channel layout.

    x: (B, H, W, C); kernel (5, 5, C, C'). Returns (B, H, W, 4*C') with
    channel order (p, q, c'); pixel_shuffle2 restores (B, 2H, 2W, C')."""
    from iinsvae_tpu.ops import conv as conv_ops

    kp = phase_kernel(kernel)
    full_bias = None if bias is None else jnp.tile(bias, 4)
    return conv_ops.conv2d(x, kp, full_bias, padding=1)


def pixel_shuffle2(z: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4C) with (p, q, c) channel order -> (B, 2H, 2W, C)."""
    b, h, w, c4 = z.shape
    c = c4 // 4
    z = z.reshape(b, h, w, 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)  # b, h, p, w, q, c
    return z.reshape(b, 2 * h, 2 * w, c)
