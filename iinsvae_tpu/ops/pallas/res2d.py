"""Pallas TPU kernel: whole 8x8 IN/AdaIN residual blocks of the expanded
2-D path as ONE kernel forward and ONE backward (ROADMAP 2).

The conv_type=2 encoder/decoder tails run 3x3 reflect-pad residual blocks
on (B, 8, 8, 64) fields (reference models.py:474-539 decoder /
models.py:179-215 encoder tail semantics). The spatial extent is far too
small for XLA's conv to tile the MXU, so round 2 lowered them W-folded
through the grouped machinery (ops/colgroups.py) — im2col matmuls whose
patch tensors round-trip HBM, ~20 HLO ops per block. This kernel does the
whole block VMEM-resident:

  * layout: rows = B*H (sample-major), lanes = W*C = 512. The W-axis tap
    mixing (with reflect edges) is folded into three lane-mix matrices
    Wp/Wc/Wn — one per H-tap — assembled OUTSIDE the kernel from the
    (3, 3, C, C) conv kernel via the colgroups tap incidence (differentiable
    einsum; the custom VJP returns dW3 and autodiff maps it back);
  * the H-axis taps (reflect pad 1) are one-sublane rolls with the
    first/last row of each 8-row sample block swapped to its reflect
    neighbour — no HBM patch tensor;
  * IN/AdaIN statistics span each sample's whole (H, W) field = the 8
    sublane rows x 8 lane groups: per-row partial sums are one (512, 64)
    matmul, the cross-sublane segment sum is a 3-step XOR butterfly
    (rolls by 1, 2, 4 masked to the 8-aligned blocks), and the broadcast
    back is one (64, 512) matmul;
  * conv biases are intentionally NOT inputs: a per-channel bias followed
    by IN/AdaIN is exactly cancelled by the mean subtraction and carries
    zero gradient (the composed lowering reproduces this by computing and
    then normalizing it away; here it is simply omitted — parity-tested).

Backward is one kernel per block producing dx, the six dW blocks
(accumulated across the sample-aligned batch grid), and per-row AdaIN
affine partials (summed to per-sample outside).

norm='in' (no affine) serves the RangeEncoder2d tail; norm='adain'
(per-sample gamma/beta rows) serves the Decoder2d tail.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iinsvae_tpu.ops.pallas.fused import _EPS, _interpret, _ld

H = 8  # rows per sample; the butterfly assumes a power of two


@functools.lru_cache(maxsize=None)
def _reflect_incidence_np(w: int) -> np.ndarray:
    """A[w_out, t, w_in] = 1 where output column w_out tap t (of 3, pad 1,
    reflect) reads input column w_in."""
    a = np.zeros((w, 3, w), dtype=np.float32)
    for j in range(w):
        for t in range(3):
            u = j + t - 1
            if u < 0:
                u = -u
            elif u >= w:
                u = 2 * w - 2 - u
            a[j, t, u] = 1.0
    return a


def assemble_w3(kernel: jnp.ndarray, w: int) -> jnp.ndarray:
    """(3, 3, C, C') conv kernel -> (3*W*C, W*C') stacked [Wp; Wc; Wn]
    lane-mix matrices (H-tap major). Differentiable."""
    kh, kw, c_in, c_out = kernel.shape
    assert kh == 3 and kw == 3
    a = jnp.asarray(_reflect_incidence_np(w), kernel.dtype)
    # W3[dh, (w_in, ci), (w_out, co)] = sum_t A[w_out, t, w_in] K[dh, t, ci, co]
    w3 = jnp.einsum("otg,htcd->hgcod", a, kernel)
    return w3.reshape(3 * w * c_in, w * c_out)


@functools.lru_cache(maxsize=None)
def _stat_mats_np(w: int, c: int):
    """(S, Bc): per-row per-channel mean partial (W*C, C) with the 1/(H*W)
    fold, unweighted per-channel sum (W*C, C), and broadcast (C, W*C)."""
    s_u = np.zeros((w * c, c), dtype=np.float32)
    for j in range(w):
        for ch in range(c):
            s_u[j * c + ch, ch] = 1.0
    return s_u / (H * w), s_u, s_u.T.copy()


def _shifts(x):
    """Reflect-padded H-tap neighbours: xprev = row h-1 (row 1 at h=0),
    xnext = row h+1 (row 6 at h=7); 8-row sample blocks."""
    r = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    first = (r % H) == 0
    last = (r % H) == H - 1
    up = pltpu.roll(x, shift=1, axis=0)      # [i] = x[i-1]
    dn = pltpu.roll(x, shift=x.shape[0] - 1, axis=0)  # [i] = x[i+1]
    return jnp.where(first, dn, up), jnp.where(last, up, dn), first, last


def _shift_adjoint(up_part, dn_part, first, last):
    """dx contribution of values routed through (xprev, xnext)."""
    n = up_part.shape[0]
    roll1 = lambda v: pltpu.roll(v, shift=1, axis=0)
    rollm1 = lambda v: pltpu.roll(v, shift=n - 1, axis=0)
    dx = roll1(jnp.where(first, up_part, 0.0)) + rollm1(
        jnp.where(first, 0.0, up_part)
    )
    dx += rollm1(jnp.where(last, dn_part, 0.0)) + roll1(
        jnp.where(last, 0.0, dn_part)
    )
    return dx


def _seg8_sum(t):
    """Per-row value -> sum over the row's 8-aligned sublane block (XOR
    butterfly: rolls by 1, 2, 4 never cross an 8-aligned boundary)."""
    n = t.shape[0]
    r = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
    for d in (1, 2, 4):
        hi = pltpu.roll(t, shift=n - d, axis=0)  # [i] = t[i+d]
        lo = pltpu.roll(t, shift=d, axis=0)      # [i] = t[i-d]
        t = t + jnp.where((r // d) % 2 == 0, hi, lo)
    return t


def _conv3(x32, w3, wc_lanes):
    """x32 f32 (Mosaic's roll only supports 32-bit data); the dot operands
    are cast to w3's NATIVE dtype so bf16 hits the MXU at full rate,
    accumulating f32 via preferred_element_type."""
    dt = w3.dtype
    xp, xn, _, _ = _shifts(x32)
    return (
        jnp.dot(xp.astype(dt), w3[:wc_lanes], preferred_element_type=jnp.float32)
        + jnp.dot(x32.astype(dt), w3[wc_lanes : 2 * wc_lanes],
                  preferred_element_type=jnp.float32)
        + jnp.dot(xn.astype(dt), w3[2 * wc_lanes :],
                  preferred_element_type=jnp.float32)
    )


def _in_stats(d, s_mean, bc):
    """d (R, W*C) -> (xn, mu_b, rr_b) with mu/rsqrt broadcast to lanes.

    v is computed two-pass (E[x^2] - E[x]^2), which can go NEGATIVE by
    catastrophic cancellation for near-constant segments — and the sign
    of the error depends on the compiler's accumulation order, so a
    backend update can flip a previously-fine (sample, channel) into
    rsqrt(negative) = NaN (observed on the v5e remote-compile update of
    2026-08-20: 19/500 decoder rows went NaN at epoch 0 on data that had
    trained fine; BASELINE.md round-4 log). Clamp at 0 before the eps —
    exact for true variances, and the only change for cancelled ones is
    NaN -> the composed lowering's answer."""
    mu = _seg8_sum(jnp.dot(d, s_mean, preferred_element_type=jnp.float32))
    q = _seg8_sum(jnp.dot(d * d, s_mean, preferred_element_type=jnp.float32))
    v = jnp.maximum(q - mu * mu, 0.0)
    rr = jax.lax.rsqrt(v + _EPS)
    mu_b = jnp.dot(mu, bc, preferred_element_type=jnp.float32)
    rr_b = jnp.dot(rr, bc, preferred_element_type=jnp.float32)
    return (d - mu_b) * rr_b, mu_b, rr_b


def _in_bwd(gxn, d, xn, rr_b, s_sum, bc, n_seg):
    """dL/dd for IN over the (H, W) segment (uniform weights 1/n_seg):
    gd = rr * (gxn - (G1 + xn * H2) / n_seg), G1/H2 segment sums."""
    g1 = _seg8_sum(jnp.dot(gxn, s_sum, preferred_element_type=jnp.float32))
    h2 = _seg8_sum(jnp.dot(gxn * xn, s_sum, preferred_element_type=jnp.float32))
    g1_b = jnp.dot(g1, bc, preferred_element_type=jnp.float32)
    h2_b = jnp.dot(h2, bc, preferred_element_type=jnp.float32)
    return rr_b * (gxn - (g1_b + xn * h2_b) / n_seg)


def _fwd_kernel(wcl, norm, refs):
    if norm == "adain":
        x_ref, w13, w23, g1r, b1r, g2r, b2r, sm, su, bc, out_ref, d1_ref, d2_ref = refs
    else:
        x_ref, w13, w23, sm, su, bc, out_ref, d1_ref, d2_ref = refs
    x = _ld(x_ref)  # f32 for the rolls; dots cast to native dtype inside
    s_mean, bcm = _ld(sm), _ld(bc)
    d1 = _conv3(x, w13[:], wcl)
    d1_ref[:] = d1.astype(d1_ref.dtype)
    xn1, _, _ = _in_stats(d1, s_mean, bcm)
    if norm == "adain":
        a1 = xn1 * jnp.dot(_ld(g1r), bcm, preferred_element_type=jnp.float32) \
            + jnp.dot(_ld(b1r), bcm, preferred_element_type=jnp.float32)
    else:
        a1 = xn1
    y1 = jnp.maximum(a1, 0.0)
    d2 = _conv3(y1, w23[:], wcl)
    d2_ref[:] = d2.astype(d2_ref.dtype)
    xn2, _, _ = _in_stats(d2, s_mean, bcm)
    if norm == "adain":
        a2 = xn2 * jnp.dot(_ld(g2r), bcm, preferred_element_type=jnp.float32) \
            + jnp.dot(_ld(b2r), bcm, preferred_element_type=jnp.float32)
    else:
        a2 = xn2
    out_ref[:] = (x + a2).astype(out_ref.dtype)


def _bwd_kernel(wcl, norm, n_seg, refs):
    if norm == "adain":
        (g_ref, x_ref, d1_ref, d2_ref, w13r, w23r, g1r, b1r, g2r, b2r,
         sm, su, bc,
         dx_ref, dw13, dw23, dg1, db1, dg2, db2) = refs
    else:
        (g_ref, x_ref, d1_ref, d2_ref, w13r, w23r, sm, su, bc,
         dx_ref, dw13, dw23) = refs
    g = _ld(g_ref)
    x = _ld(x_ref)  # f32 for the rolls; dots cast to native dtype below
    xdt = x_ref.dtype
    d1, d2 = _ld(d1_ref), _ld(d2_ref)
    w13, w23 = w13r[:], w23r[:]
    s_mean, s_sum, bcm = _ld(sm), _ld(su), _ld(bc)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw13[:] = jnp.zeros_like(dw13)
        dw23[:] = jnp.zeros_like(dw23)

    # recompute forward chain values
    xn1, _, rr1 = _in_stats(d1, s_mean, bcm)
    if norm == "adain":
        g1b = jnp.dot(_ld(g1r), bcm, preferred_element_type=jnp.float32)
        a1 = xn1 * g1b + jnp.dot(_ld(b1r), bcm, preferred_element_type=jnp.float32)
    else:
        a1 = xn1
    y1 = jnp.maximum(a1, 0.0)
    xn2, _, rr2 = _in_stats(d2, s_mean, bcm)

    # ---- reverse ----
    ga2 = g  # out = x + a2
    if norm == "adain":
        g2b = jnp.dot(_ld(g2r), bcm, preferred_element_type=jnp.float32)
        dg2[:] = jnp.dot(ga2 * xn2, s_sum,
                         preferred_element_type=jnp.float32).astype(dg2.dtype)
        db2[:] = jnp.dot(ga2, s_sum,
                         preferred_element_type=jnp.float32).astype(db2.dtype)
        gxn2 = ga2 * g2b
    else:
        gxn2 = ga2
    gd2 = _in_bwd(gxn2, d2, xn2, rr2, s_sum, bcm, n_seg).astype(xdt)

    # conv2 backward
    y1p, y1n, first, last = _shifts(y1)
    dw23[:] += jnp.concatenate(
        [
            jnp.dot(y1p.astype(xdt).T, gd2, preferred_element_type=jnp.float32),
            jnp.dot(y1.astype(xdt).T, gd2, preferred_element_type=jnp.float32),
            jnp.dot(y1n.astype(xdt).T, gd2, preferred_element_type=jnp.float32),
        ],
        axis=0,
    ).astype(dw23.dtype)
    up = jnp.dot(gd2, w23[:wcl].T, preferred_element_type=jnp.float32)
    ct = jnp.dot(gd2, w23[wcl : 2 * wcl].T, preferred_element_type=jnp.float32)
    dn = jnp.dot(gd2, w23[2 * wcl :].T, preferred_element_type=jnp.float32)
    dy1 = ct + _shift_adjoint(up, dn, first, last)

    ga1 = jnp.where(a1 > 0, dy1, 0.0)
    if norm == "adain":
        dg1[:] = jnp.dot(ga1 * xn1, s_sum,
                         preferred_element_type=jnp.float32).astype(dg1.dtype)
        db1[:] = jnp.dot(ga1, s_sum,
                         preferred_element_type=jnp.float32).astype(db1.dtype)
        gxn1 = ga1 * g1b
    else:
        gxn1 = ga1
    gd1 = _in_bwd(gxn1, d1, xn1, rr1, s_sum, bcm, n_seg).astype(xdt)

    xp, xnx, first, last = _shifts(x)
    dw13[:] += jnp.concatenate(
        [
            jnp.dot(xp.astype(xdt).T, gd1, preferred_element_type=jnp.float32),
            jnp.dot(x.astype(xdt).T, gd1, preferred_element_type=jnp.float32),
            jnp.dot(xnx.astype(xdt).T, gd1, preferred_element_type=jnp.float32),
        ],
        axis=0,
    ).astype(dw13.dtype)
    up = jnp.dot(gd1, w13[:wcl].T, preferred_element_type=jnp.float32)
    ct = jnp.dot(gd1, w13[wcl : 2 * wcl].T, preferred_element_type=jnp.float32)
    dn = jnp.dot(gd1, w13[2 * wcl :].T, preferred_element_type=jnp.float32)
    dx = g + ct + _shift_adjoint(up, dn, first, last)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _chunk(b: int, lanes: int) -> int:
    """Samples per grid step: keep ~12 row buffers under ~6 MB (the two
    stacked weight matrices + their grad accumulators already hold ~12 MB
    f32 of VMEM across the whole grid; the explicit vmem_limit_bytes below
    covers the sum)."""
    budget = 6 * 2**20
    per_sample = 12 * H * lanes * 4
    if b * per_sample <= budget:
        return b
    for c in range(b - 1, 0, -1):
        if b % c == 0 and c * per_sample <= budget:
            return c
    return 1


@functools.lru_cache(maxsize=None)
def _make_block(w: int, c: int, norm: str):
    lanes = w * c
    n_seg = H * w
    s_mean_np, s_sum_np, bc_np = _stat_mats_np(w, c)

    def _consts():
        return (
            jnp.asarray(s_mean_np),
            jnp.asarray(s_sum_np),
            jnp.asarray(bc_np),
        )

    def _row(cs, n):
        return pl.BlockSpec((cs, n), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def _full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def fwd_call(x2, w13, w23, affs):
        rows = x2.shape[0]
        b = rows // H
        cs = _chunk(b, lanes)
        grid = (b // cs,)
        rc = cs * H
        sm, su, bc = _consts()
        in_specs = [_row(rc, lanes), _full(w13.shape), _full(w23.shape)]
        args = [x2, w13, w23]
        if norm == "adain":
            for a in affs:
                in_specs.append(_row(cs * H, c))
                args.append(a)
        in_specs += [_full(sm.shape), _full(su.shape), _full(bc.shape)]
        args += [sm, su, bc]
        out_shape = tuple(
            jax.ShapeDtypeStruct((rows, lanes), x2.dtype) for _ in range(3)
        )
        out_specs = tuple(_row(rc, lanes) for _ in range(3))
        return pl.pallas_call(
            lambda *refs: _fwd_kernel(lanes, norm, refs),
            grid=grid,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=out_specs,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
            interpret=_interpret(),
        )(*args)

    def bwd_call(g, x2, d1, d2, w13, w23, affs):
        rows = x2.shape[0]
        b = rows // H
        cs = _chunk(b, lanes)
        grid = (b // cs,)
        rc = cs * H
        sm, su, bc = _consts()
        in_specs = [
            _row(rc, lanes), _row(rc, lanes), _row(rc, lanes), _row(rc, lanes),
            _full(w13.shape), _full(w23.shape),
        ]
        args = [g, x2, d1, d2, w13, w23]
        if norm == "adain":
            for a in affs:
                in_specs.append(_row(rc, c))
                args.append(a)
        in_specs += [_full(sm.shape), _full(su.shape), _full(bc.shape)]
        args += [sm, su, bc]
        out_shape = [
            jax.ShapeDtypeStruct((rows, lanes), x2.dtype),
            jax.ShapeDtypeStruct(w13.shape, w13.dtype),
            jax.ShapeDtypeStruct(w23.shape, w23.dtype),
        ]
        out_specs = [_row(rc, lanes), _full(w13.shape), _full(w23.shape)]
        if norm == "adain":
            for _ in range(4):
                out_shape.append(jax.ShapeDtypeStruct((rows, c), x2.dtype))
                out_specs.append(_row(rc, c))
        return pl.pallas_call(
            lambda *refs: _bwd_kernel(lanes, norm, n_seg, refs),
            grid=grid,
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
            interpret=_interpret(),
        )(*args)

    if norm == "adain":

        @jax.custom_vjp
        def block(x2, w13, w23, g1r, b1r, g2r, b2r):
            return fwd_call(x2, w13, w23, (g1r, b1r, g2r, b2r))[0]

        def block_fwd(x2, w13, w23, g1r, b1r, g2r, b2r):
            out, d1, d2 = fwd_call(x2, w13, w23, (g1r, b1r, g2r, b2r))
            return out, (x2, d1, d2, w13, w23, g1r, b1r, g2r, b2r)

        def block_bwd(saved, g):
            x2, d1, d2, w13, w23, g1r, b1r, g2r, b2r = saved
            dx, dw13, dw23, dg1, db1, dg2, db2 = bwd_call(
                g, x2, d1, d2, w13, w23, (g1r, b1r, g2r, b2r)
            )
            return dx, dw13, dw23, dg1, db1, dg2, db2

    else:

        @jax.custom_vjp
        def block(x2, w13, w23):
            return fwd_call(x2, w13, w23, ())[0]

        def block_fwd(x2, w13, w23):
            out, d1, d2 = fwd_call(x2, w13, w23, ())
            return out, (x2, d1, d2, w13, w23)

        def block_bwd(saved, g):
            x2, d1, d2, w13, w23 = saved
            dx, dw13, dw23 = bwd_call(g, x2, d1, d2, w13, w23, ())
            return dx, dw13, dw23

    block.defvjp(block_fwd, block_bwd)
    return block


def applicable(h: int, w: int, c: int, b: int | None = None) -> bool:
    """h fixed at 8 (the butterfly), lane width a multiple of 128. Off the
    TPU the kernel runs in interpret mode — fine for parity tests but far
    too slow for real batches, so non-TPU backends cap b at 64 and larger
    batches take the grouped XLA lowering instead."""
    ok = h == H and (w * c) % 128 == 0
    if b is not None and _interpret():
        ok = ok and b <= 64
    return ok


def fused_res_block_2d(
    x: jnp.ndarray,
    k1: jnp.ndarray,
    k2: jnp.ndarray,
    *,
    norm: str = "in",
    gamma1=None,
    beta1=None,
    gamma2=None,
    beta2=None,
) -> jnp.ndarray:
    """One residual block x + norm(conv3x3(relu(norm(conv3x3(x))))) on a
    dense (B, 8, W, C) field, reflect padding both axes, as one Pallas
    kernel each way.

    norm='in': plain InstanceNorm (encoder tail). norm='adain': per-sample
    (B, C) gamma/beta after each IN (decoder tail). Conv biases are
    mean-cancelled by the norms (zero grad) and therefore not accepted.
    """
    b, h, w, c = x.shape
    assert applicable(h, w, c), (h, w, c)
    w13 = assemble_w3(k1.astype(x.dtype), w)
    w23 = assemble_w3(k2.astype(x.dtype), w)
    x2 = x.reshape(b * h, w * c)
    if norm == "adain":
        reps = lambda a: jnp.repeat(a.astype(x.dtype), h, axis=0)
        out2 = _make_block(w, c, "adain")(
            x2, w13, w23, reps(gamma1), reps(beta1), reps(gamma2), reps(beta2)
        )
    else:
        out2 = _make_block(w, c, "in")(x2, w13, w23)
    return out2.reshape(b, h, w, c)
