"""Pallas TPU kernel: decoder upsample stage — phase conv + per-sample
LayerNorm + relu fused, channels-first (ROADMAP 3b).

The 2-D decoder's upsample stages run ``subpixel phase conv -> SLN ->
relu`` (reference models.py:509-517 semantics, lowered per
ops/subpixel.py). Measured on the widest stage (64x64x16, batch 500 f32):
the XLA conv is 0.69 ms and the SLN+relu another 1.15 ms — both
HBM-bound, and the conv->SLN boundary forces a full round trip of the
131 MB field through HBM (a standalone Pallas SLN was built and REJECTED
in round 2: XLA's own SLN already streams at bandwidth; the win is only
in FUSING with the conv producer).

This kernel computes the whole stage per sample inside VMEM:

  * layout: CHANNELS-FIRST — per sample the field is a (C, H*W) block
    (C on sublanes, the flattened image on lanes). This is the only
    wide-lane layout where the conv contraction (over C_in, just 8-64
    wide) maps to the MXU without the W-fold band-sparsity FLOP blowup
    that killed the dense lane-mix approach for W >= 16 fields
    (ROADMAP 4, measured/rejected);
  * the 9 taps of the 3x3 zero-pad phase conv are LANE rolls of the
    (C_in, H*W) block (shift dh*W + dw, edge rows/columns masked to
    zero — the exact zero-pad condition), each contracted with its
    (4C_out, C_in) kernel slice — 9 small MXU dots, exact FLOPs;
  * SLN statistics are per-sample scalars over the whole (4C_out, H*W)
    output — two row+sublane reductions; unbiased var via
    (sum(d^2) - n*mean^2)/(n-1), denominator (std + eps), exactly
    ops/norms.py::sample_layer_norm;
  * per-channel bias/gamma/beta ride as (4C_out, 1) columns broadcast
    over lanes.

Backward recomputes d from x inside the kernel (the stage input is 2x
smaller than its output, so saving the pre-norm activation would cost
more HBM than the recompute's 9 small dots) and emits dx, the
accumulated (9*4C_out, C_in) kernel grad, and per-channel bias/affine
grads. Net HBM traffic per direction: read x + write out — the two
intermediate passes (conv-out write + SLN read) are gone.

The 8x8 entry stage (H*W = 64 lanes) stays on the XLA path: its lanes
fall under the 128-lane tile and its field is small; see applicable().
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iinsvae_tpu.ops.pallas.fused import _EPS, _interpret, _ld

_LANE_PAD = 128  # per-channel columns ride as (4C_out, _LANE_PAD) tiles

# Live-VMEM budget per grid step (same ceiling story as chain.py: past
# ~10-12 MB monolithic kernels pipeline worse than separate launches).
_VMEM_BUDGET = 8 * 2**20


def _shift2(x, dh, dw, h, w):
    """xs[c, (i, j)] = x[c, (i+dh, j+dw)], zero outside the (h, w) grid.

    x: (C, h*w) f32 (Mosaic rolls are 32-bit only). One lane roll by
    dh*w + dw, then the out-of-grid output positions are zeroed — for a
    flattened (i, j) lane axis the roll wraps rows/images, and the edge
    mask is exactly the zero-pad condition.
    """
    hw = h * w
    o = dh * w + dw
    y = x if o == 0 else pltpu.roll(x, shift=(-o) % hw, axis=1)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    ii = idx // w
    jj = idx - ii * w
    keep = None
    if dh == -1:
        keep = ii >= 1
    elif dh == 1:
        keep = ii <= h - 2
    if dw == -1:
        kw = jj >= 1
        keep = kw if keep is None else jnp.logical_and(keep, kw)
    elif dw == 1:
        kw = jj <= w - 2
        keep = kw if keep is None else jnp.logical_and(keep, kw)
    return y if keep is None else jnp.where(keep, y, 0.0)


def _sumall(v):
    """(R, N) -> (1, 1) full reduction (lane then sublane, keepdims)."""
    return jnp.sum(jnp.sum(v, axis=1, keepdims=True), axis=0, keepdims=True)


_TAPS = tuple((dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1))


def _conv9(xs_list, kt):
    """d = sum_t KT[t] @ xs[t]; kt (9*C4, Ci) tap-major, xs (Ci, HW) f32.
    Dot operands cast to kt's native dtype (bf16 hits the MXU full-rate),
    f32 accumulation."""
    c4 = kt.shape[0] // 9
    dt = kt.dtype
    d = None
    for t, xs in enumerate(xs_list):
        p = jnp.dot(
            kt[t * c4 : (t + 1) * c4, :],
            xs.astype(dt),
            preferred_element_type=jnp.float32,
        )
        d = p if d is None else d + p
    return d


def _stats(d, n):
    """mean, std (unbiased), t = 1/(std+eps) — sample_layer_norm exact."""
    mu = _sumall(d) / n
    sq = _sumall(d * d)
    var = (sq - n * mu * mu) / (n - 1)
    s = jnp.sqrt(jnp.maximum(var, 0.0))
    t = 1.0 / (s + _EPS)
    return mu, s, t


def _fwd_kernel(h, w, ci, co4, cs, refs):
    x_ref, kt_ref, b_ref, g_ref, be_ref, out_ref = refs
    hw = h * w
    n = co4 * hw
    kt = kt_ref[:]
    bias = _ld(b_ref)[:, :1]
    gam = _ld(g_ref)[:, :1]
    bet = _ld(be_ref)[:, :1]
    x = _ld(x_ref)
    for si in range(cs):
        xs0 = x[si * ci : (si + 1) * ci, :]
        xs = [_shift2(xs0, dh, dw, h, w) for dh, dw in _TAPS]
        d = _conv9(xs, kt) + bias
        mu, _, t = _stats(d, n)
        yh = (d - mu) * t
        out = jnp.maximum(yh * gam + bet, 0.0)
        out_ref[si * co4 : (si + 1) * co4, :] = out.astype(out_ref.dtype)


def _bwd_kernel(h, w, ci, co4, cs, refs):
    (g_ref, x_ref, kt_ref, b_ref, gm_ref, be_ref,
     dx_ref, dkt_ref, db_ref, dg_ref, dbe_ref) = refs
    hw = h * w
    n = co4 * hw
    kt = kt_ref[:]
    xdt = x_ref.dtype
    bias = _ld(b_ref)[:, :1]
    gam = _ld(gm_ref)[:, :1]
    bet = _ld(be_ref)[:, :1]
    x = _ld(x_ref)
    g = _ld(g_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dkt_ref[:] = jnp.zeros_like(dkt_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbe_ref[:] = jnp.zeros_like(dbe_ref)

    for si in range(cs):
        xs0 = x[si * ci : (si + 1) * ci, :]
        xs = [_shift2(xs0, dh, dw, h, w) for dh, dw in _TAPS]
        d = _conv9(xs, kt) + bias
        mu, s, t = _stats(d, n)
        c = d - mu
        yh = c * t
        pre = yh * gam + bet
        gy = g[si * co4 : (si + 1) * co4, :]
        ga = jnp.where(pre > 0, gy, 0.0)
        dg_ref[:] = dg_ref[:] + jnp.sum(ga * yh, axis=1, keepdims=True).astype(
            dg_ref.dtype
        )
        dbe_ref[:] = dbe_ref[:] + jnp.sum(ga, axis=1, keepdims=True).astype(
            dbe_ref.dtype
        )
        gyh = ga * gam
        # SLN backward with centering: c = d - mean(d), var = sum(c^2)/(n-1),
        # t = 1/(sqrt(var)+eps); dvar term then re-centering of dc.
        gt_ = _sumall(gyh * c)
        gvar = gt_ * (-(t * t)) / (2.0 * s)
        dc = gyh * t + c * (2.0 * gvar / (n - 1))
        gd = dc - _sumall(dc) / n
        db_ref[:] = db_ref[:] + jnp.sum(gd, axis=1, keepdims=True).astype(
            db_ref.dtype
        )
        gdn = gd.astype(xdt)
        dxp = None
        for ti, (dh, dw) in enumerate(_TAPS):
            kt_t = kt[ti * co4 : (ti + 1) * co4, :]
            dkt_ref[ti * co4 : (ti + 1) * co4, :] += jnp.dot(
                gdn, xs[ti].astype(xdt).T, preferred_element_type=jnp.float32
            ).astype(dkt_ref.dtype)
            dxs = jnp.dot(kt_t.T, gdn, preferred_element_type=jnp.float32)
            # adjoint of _shift2: mask the OUTPUT-side coords, roll back
            idx = jax.lax.broadcasted_iota(jnp.int32, dxs.shape, 1)
            ii = idx // w
            jj = idx - ii * w
            keep = None
            if dh == -1:
                keep = ii >= 1
            elif dh == 1:
                keep = ii <= h - 2
            if dw == -1:
                kw = jj >= 1
                keep = kw if keep is None else jnp.logical_and(keep, kw)
            elif dw == 1:
                kw = jj <= w - 2
                keep = kw if keep is None else jnp.logical_and(keep, kw)
            if keep is not None:
                dxs = jnp.where(keep, dxs, 0.0)
            o = dh * w + dw
            if o != 0:
                dxs = pltpu.roll(dxs, shift=o % hw, axis=1)
            dxp = dxs if dxp is None else dxp + dxs
        dx_ref[si * ci : (si + 1) * ci, :] = dxp.astype(dx_ref.dtype)


def _chunk(b: int, ci: int, hw: int) -> int:
    """Samples per grid step under the VMEM budget. The backward keeps the
    9 shifted input copies plus ~8 output-sized rows live per sample."""
    per_sample = (9 * ci + 8 * 2 * ci) * hw * 4
    if b * per_sample <= _VMEM_BUDGET:
        return b
    for c in range(b - 1, 0, -1):
        if b % c == 0 and c * per_sample <= _VMEM_BUDGET:
            return c
    return 1


@functools.lru_cache(maxsize=None)
def _make_stage(h: int, w: int, ci: int, co4: int):
    hw = h * w

    def _row(rows_per_step, n):
        return pl.BlockSpec(
            (rows_per_step, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    def _full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def _tile(col):
        return jnp.tile(col.reshape(-1, 1), (1, _LANE_PAD))

    def fwd_call(x2, kt, bias, gamma, beta):
        b = x2.shape[0] // ci
        cs = _chunk(b, ci, hw)
        grid = (b // cs,)
        bt, gt_, bet = _tile(bias), _tile(gamma), _tile(beta)
        return pl.pallas_call(
            lambda *refs: _fwd_kernel(h, w, ci, co4, cs, refs),
            grid=grid,
            out_shape=jax.ShapeDtypeStruct((b * co4, hw), x2.dtype),
            in_specs=[
                _row(cs * ci, hw), _full(kt.shape),
                _full(bt.shape), _full(gt_.shape), _full(bet.shape),
            ],
            out_specs=_row(cs * co4, hw),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=_interpret(),
        )(x2, kt, bt, gt_, bet)

    def bwd_call(g, x2, kt, bias, gamma, beta):
        b = x2.shape[0] // ci
        cs = _chunk(b, ci, hw)
        grid = (b // cs,)
        bt, gt_, bet = _tile(bias), _tile(gamma), _tile(beta)
        out_shape = (
            jax.ShapeDtypeStruct(x2.shape, x2.dtype),       # dx
            jax.ShapeDtypeStruct(kt.shape, kt.dtype),       # dkt (acc)
            jax.ShapeDtypeStruct(bt.shape, jnp.float32),    # dbias (acc col)
            jax.ShapeDtypeStruct(gt_.shape, jnp.float32),   # dgamma (acc col)
            jax.ShapeDtypeStruct(bet.shape, jnp.float32),   # dbeta (acc col)
        )
        res = pl.pallas_call(
            lambda *refs: _bwd_kernel(h, w, ci, co4, cs, refs),
            grid=grid,
            out_shape=out_shape,
            in_specs=[
                _row(cs * co4, hw), _row(cs * ci, hw), _full(kt.shape),
                _full(bt.shape), _full(gt_.shape), _full(bet.shape),
            ],
            out_specs=(
                _row(cs * ci, hw), _full(kt.shape), _full(bt.shape),
                _full(gt_.shape), _full(bet.shape),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
            interpret=_interpret(),
        )(g, x2, kt, bt, gt_, bet)
        dx, dkt, dbt, dgt, dbet = res
        # every lane of the (C4, _LANE_PAD) accumulators holds the full
        # per-channel value; lane 0 is the gradient
        return (
            dx, dkt,
            dbt[:, 0].astype(bias.dtype),
            dgt[:, 0].astype(gamma.dtype),
            dbet[:, 0].astype(beta.dtype),
        )

    @jax.custom_vjp
    def stage(x2, kt, bias, gamma, beta):
        return fwd_call(x2, kt, bias, gamma, beta)

    def stage_fwd(x2, kt, bias, gamma, beta):
        out = fwd_call(x2, kt, bias, gamma, beta)
        return out, (x2, kt, bias, gamma, beta)

    def stage_bwd(saved, g):
        return bwd_call(g, *saved)

    stage.defvjp(stage_fwd, stage_bwd)
    return stage


# A/B toggle (benchmarks/profile2d.py --no_phase_sln flips it OFF, or
# set_enabled(True) to opt IN): read at trace time, not a jit cache key —
# set before tracing.
#
# DEFAULT OFF — measured REJECTION (round 3, v5e, batch 500 bf16,
# benchmarks/profile2d.py A/B): decoder fwd+bwd 13.45 ms with this kernel
# vs 5.07 ms on the XLA path (full semi step 15.3 vs 7.05 ms). The
# channels-first per-sample grid serializes the batch (500 sequential
# programs over small (C, H*W) blocks), and the 9 masked-roll tap dots are
# each too small to fill the MXU — XLA's fused phase-conv lowering
# (45-140 TF/s isolated probes, BASELINE.md) plus its streamed SLN wins
# decisively. Kept selectable + parity-tested (tests/test_phase_sln.py)
# as the documented negative result for ROADMAP item 3b.
_ENABLED = False


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def applicable(h: int, w: int, c_in: int, b: int | None = None) -> bool:
    """Lane axis (H*W) must fill whole 128-lane tiles; the 8x8 entry stage
    (64 lanes) stays on the XLA path. Interpret mode (CPU tests) caps the
    batch — the per-sample tap loop is far too slow off-TPU."""
    ok = _ENABLED and (h * w) % 128 == 0 and c_in >= 2
    if b is not None and _interpret():
        ok = ok and b <= 64
    return ok


def fused_upsample_sln(
    x: jnp.ndarray,
    kernel5: jnp.ndarray,
    bias: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
) -> jnp.ndarray:
    """One decoder upsample stage, channels-first, fused each way.

    x: (B, C_in, H, W) — the pre-upsample field, channels-first.
    kernel5: (5, 5, C_in, C_out) raw conv kernel (C_out = C_in // 2).
    bias/gamma/beta: (C_out,) per-channel params of the conv + SLN affine.

    Returns (B, 4*C_out, H, W) — the phase-channel field after SLN + relu,
    channel order (p, q, c); pixel-shuffle to (B, C_out, 2H, 2W) outside.
    Exact same math as upsample_conv5_phase -> sample_layer_norm(tile 4)
    -> relu (parity-tested, tests/test_phase_sln.py).
    """
    from iinsvae_tpu.ops.subpixel import phase_kernel

    b, ci, h, w = x.shape
    assert applicable(h, w, ci), (h, w, ci)
    kp = phase_kernel(kernel5)  # (3, 3, C_in, 4*C_out), differentiable
    co4 = kp.shape[-1]
    # (9*4C_out, C_in) tap-major: KT[(t, co), ci] = kp[dh, dw, ci, co]
    kt = kp.transpose(0, 1, 3, 2).reshape(9 * co4, ci)
    bias4 = jnp.tile(bias, 4)
    gamma4 = jnp.tile(gamma, 4)
    beta4 = jnp.tile(beta, 4)
    x2 = x.reshape(b * ci, h * w)
    out2 = _make_stage(h, w, ci, co4)(x2, kt, bias4, gamma4, beta4)
    return out2.reshape(b, co4, h, w)


def pixel_shuffle2_cf(z: jnp.ndarray) -> jnp.ndarray:
    """(B, 4C, H, W) channels-first, (p, q, c) order -> (B, C, 2H, 2W)."""
    b, c4, h, w = z.shape
    c = c4 // 4
    z = z.reshape(b, 2, 2, c, h, w)
    z = z.transpose(0, 3, 4, 1, 5, 2)  # b, c, h, p, w, q
    return z.reshape(b, c, 2 * h, 2 * w)
