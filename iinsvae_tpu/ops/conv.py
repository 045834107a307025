"""Convolutions, lowered the TPU way.

The reference's compute is dominated by small Conv1d stacks over a 128-tap
sequence (reference models.py:140-298, 405-471). On TPU the right lowering
for these is im2col + matmul: with batch B the matmul LHS has B * L_out rows,
which tiles cleanly onto the 128x128 MXU, while a direct small-conv lowering
wastes the systolic array. XLA fuses the (static) patch gathers into the dot.

Layouts are channels-last everywhere: 1d activations are (B, L, C), kernels
are (K, C_in, C_out); 2d activations are (B, H, W, C), kernels
(KH, KW, C_in, C_out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def reflect_pad1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflection padding on the length axis of (..., L, C)."""
    if pad == 0:
        return x
    cfg = [(0, 0, 0)] * x.ndim
    # jnp.pad 'reflect' matches torch ReflectionPad semantics
    widths = [(0, 0)] * x.ndim
    widths[-2] = (pad, pad)
    del cfg
    return jnp.pad(x, widths, mode="reflect")


def reflect_pad2d(x: jnp.ndarray, pad) -> jnp.ndarray:
    """Reflection padding on the H and W axes of (..., H, W, C).

    pad: int (both axes) or ((ph_lo, ph_hi), (pw_lo, pw_hi))."""
    if isinstance(pad, int):
        pad = ((pad, pad), (pad, pad))
    widths = [(0, 0)] * x.ndim
    widths[-3] = tuple(pad[0])
    widths[-2] = tuple(pad[1])
    if all(w == (0, 0) for w in widths):
        return x
    return jnp.pad(x, widths, mode="reflect")


def _im2col1d(x: jnp.ndarray, k: int, stride: int) -> jnp.ndarray:
    """(B, L, C) -> (B, L_out, K*C) patches for a kernel of width k."""
    b, l, c = x.shape
    l_out = (l - k) // stride + 1
    # K static slices, each a strided view; XLA folds these into the dot.
    cols = [
        lax.slice(x, (0, i, 0), (b, i + (l_out - 1) * stride + 1, c), (1, stride, 1))
        for i in range(k)
    ]
    return jnp.concatenate(cols, axis=-1).reshape(b, l_out, k * c)


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride: int = 1,
    padding: int = 0,
    pad_mode: str = "zero",
    preferred_dtype=jnp.float32,
) -> jnp.ndarray:
    """1-D convolution as an im2col matmul.

    x: (B, L, C_in); kernel: (K, C_in, C_out). Returns (B, L_out, C_out).
    """
    k, c_in, c_out = kernel.shape
    if padding:
        if pad_mode == "reflect":
            x = reflect_pad1d(x, padding)
        else:
            widths = [(0, 0)] * x.ndim
            widths[-2] = (padding, padding)
            x = jnp.pad(x, widths)
    patches = _im2col1d(x, k, stride)  # (B, L_out, K*C_in)
    w = kernel.reshape(k * c_in, c_out)
    y = jnp.einsum(
        "blp,po->blo", patches, w.astype(x.dtype),
        preferred_element_type=preferred_dtype,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    *,
    stride=1,
    padding=0,
    pad_mode: str = "zero",
) -> jnp.ndarray:
    """2-D convolution (NHWC x HWIO -> NHWC) via XLA's conv lowering.

    The 2-D variants (conv_type=2, reference models.py:179-215) run on
    128x128 feature maps where XLA's native TPU conv lowering is already
    matmul-shaped; no hand im2col needed.
    """
    strides = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        pads = ((padding, padding), (padding, padding))
    else:
        pads = tuple(tuple(p) for p in padding)
    kh, kw = kernel.shape[:2]
    if (
        kw == 1
        and x.shape[-2] == 1
        and strides[1] == 1
        and pads[1] == (0, 0)
        and pads[0][0] == pads[0][1]
    ):
        # column-image (k,1) conv (the conv_type=3 NoExpand variants,
        # reference models.py:218-255): exactly a 1-D conv — route through
        # the 1-D lowering instead of a W=1 XLA conv.
        b = x.shape[0]
        y = conv1d(
            x.reshape(b, x.shape[1], x.shape[-1]),
            kernel.reshape(kh, kernel.shape[2], kernel.shape[3]),
            bias,
            stride=strides[0],
            padding=pads[0][0],
            pad_mode=pad_mode,
        )
        return y[:, :, None, :]
    if pad_mode == "reflect" and any(p != (0, 0) for p in pads):
        x = reflect_pad2d(x, pads)
        pads = ((0, 0), (0, 0))
    # no preferred_element_type=f32: the TPU MXU already accumulates bf16
    # operands in f32 internally, and a widened output dtype breaks the
    # conv transpose under bf16 (f32 cotangent vs bf16 operands)
    y = lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=strides,
        padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def upsample_nearest1d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsampling on (B, L, C) (torch nn.Upsample(2))."""
    return jnp.repeat(x, factor, axis=-2)


def upsample_nearest2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsampling on (B, H, W, C)."""
    x = jnp.repeat(x, factor, axis=-3)
    x = jnp.repeat(x, factor, axis=-2)
    return x
