"""Pallas TPU kernels: fused (matmul + InstanceNorm + activation [+ skip]).

Every hot layer in the model is, after the dense-conv lowering
(ops/dense_conv.py), a (B, K) @ (K, N) matmul followed by an instance norm
over the length axis and an activation — executed by XLA as ~6 separate
HBM-round-trip kernels. This module collapses each layer into ONE Pallas
kernel forward and ONE backward, with a formulation that keeps every value
2-D (Mosaic rejects (B, N) -> (B, L, C) vector reshapes when C < 128 lanes):

  * the flat layout is n = l*C + c; the IN mean over l is a LINEAR map, so
    mean-centering is folded into the weight matrix OUTSIDE the kernel:
    M_c = M - groupmean_L(M) makes d = x @ M_c already centered;
  * the per-(b,c) biased variance, broadcast back over l, is one matmul
    with the constant symmetric projector P_mu[(l,c),(l',c')] = [c==c']/L:
    v = (d*d) @ P_mu;  yh = d * rsqrt(v + eps);  out = act(yh) [+ res].

Backward (custom VJP, residuals d and r = rsqrt(v+eps); relu mask is d>0
because r > 0):

  gyh = act'(g);  A = gyh * d * r^3
  gd  = r * gyh - d * (A @ P_mu)        # P_mu symmetric
  gx  = gd @ M_c^T;   gM_c = x^T @ gd   # one kernel, both outputs

The matmuls hit the MXU; the norm/act algebra runs on the VPU while tiles
are VMEM-resident — no intermediate HBM traffic. Whole-batch blocks at the
flagship sizes ((B<=512, K,N<=2048) f32) — every operand fits VMEM with
grid=(1,); larger batches are row-chunked onto the same kernels by the
public entries (_map_rows below), exact because all the fused math is
per-sample independent.

Supported configs (all encoder stages use one of these):
  norm in {'in', 'none'}, act in {'relu', 'tanh', 'none'},
  optional residual add (requires act='none'), optional bias (norm='none'
  only; a bias before IN is a no-op with zero gradient, matching the
  reference torch modules, models.py:151-152).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5

_ENABLED = True


def set_pallas_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def pallas_enabled() -> bool:
    return _ENABLED


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _pmu_np(l_out: int, c_out: int) -> np.ndarray:
    """P_mu[(l,c),(l',c')] = [c == c'] / L — group-mean projector."""
    n = l_out * c_out
    p = np.zeros((n, n), dtype=np.float32)
    for c in range(c_out):
        idx = np.arange(l_out) * c_out + c
        p[np.ix_(idx, idx)] = 1.0 / l_out
    return p


def center_matrix(m: jnp.ndarray, l_out: int, c_out: int) -> jnp.ndarray:
    """M -> M - groupmean_L(M): makes x @ M_c zero-mean over l per (b, c)."""
    k = m.shape[0]
    m3 = m.reshape(k, l_out, c_out)
    return (m3 - jnp.mean(m3, axis=1, keepdims=True)).reshape(k, l_out * c_out)


def _ld(ref):
    """Load a ref upcast to f32 — Mosaic lacks bf16 compare/rsqrt paths."""
    return ref[:].astype(jnp.float32)


def _act_fwd(y, act):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "tanh":
        return jnp.tanh(y)
    return y


# ------------------------- kernels -------------------------


def _fwd_in_kernel(act, has_res, refs):
    if has_res:
        x_ref, mc_ref, pmu_ref, res_ref, out_ref, d_ref, r_ref = refs
    else:
        x_ref, mc_ref, pmu_ref, out_ref, d_ref, r_ref = refs
    d = jnp.dot(_ld(x_ref), _ld(mc_ref), preferred_element_type=jnp.float32)
    v = jnp.dot(d * d, _ld(pmu_ref), preferred_element_type=jnp.float32)
    r = jax.lax.rsqrt(v + _EPS)
    yh = d * r
    out = _act_fwd(yh, act)
    if has_res:
        out = out + _ld(res_ref)
    out_ref[:] = out.astype(out_ref.dtype)
    d_ref[:] = d.astype(d_ref.dtype)
    r_ref[:] = r.astype(r_ref.dtype)


def _bwd_in_kernel(act, refs):
    g_ref, d_ref, r_ref, x_ref, mc_ref, pmu_ref, dx_ref, dm_ref = refs
    g = _ld(g_ref)
    d = _ld(d_ref)
    r = _ld(r_ref)
    if act == "relu":
        gyh = jnp.where(d > 0, g, 0.0)
    elif act == "tanh":
        t = jnp.tanh(d * r)
        gyh = g * (1.0 - t * t)
    else:
        gyh = g
    a = gyh * d * (r * r * r)
    gd = r * gyh - d * jnp.dot(a, _ld(pmu_ref), preferred_element_type=jnp.float32)
    dx_ref[:] = jnp.dot(gd, _ld(mc_ref).T, preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dm_ref[:] = jnp.dot(_ld(x_ref).T, gd, preferred_element_type=jnp.float32).astype(dm_ref.dtype)


def _fwd_nonorm_kernel(act, has_bias, refs):
    if has_bias:
        x_ref, m_ref, b_ref, out_ref = refs
    else:
        x_ref, m_ref, out_ref = refs
    y = jnp.dot(_ld(x_ref), _ld(m_ref), preferred_element_type=jnp.float32)
    if has_bias:
        y = y + _ld(b_ref)
    out_ref[:] = _act_fwd(y, act).astype(out_ref.dtype)


def _bwd_nonorm_kernel(act, has_bias, refs):
    if has_bias:
        g_ref, out_ref, x_ref, m_ref, dx_ref, dm_ref, db_ref = refs
    else:
        g_ref, out_ref, x_ref, m_ref, dx_ref, dm_ref = refs
    g = _ld(g_ref)
    out = _ld(out_ref)
    if act == "relu":
        dz = jnp.where(out > 0, g, 0.0)
    elif act == "tanh":
        dz = g * (1.0 - out * out)
    else:
        dz = g
    dx_ref[:] = jnp.dot(dz, _ld(m_ref).T, preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dm_ref[:] = jnp.dot(_ld(x_ref).T, dz, preferred_element_type=jnp.float32).astype(dm_ref.dtype)
    if has_bias:
        db_ref[:] = jnp.sum(dz, axis=0, keepdims=True).astype(db_ref.dtype)


# --------------------- whole-residual-block kernel (IN) ---------------------


def _fwd_resblock_kernel(refs):
    x_ref, m1_ref, m2_ref, pmu_ref, out_ref, d1_ref, d2_ref = refs
    x = _ld(x_ref)
    pmu = _ld(pmu_ref)
    d1 = jnp.dot(x, _ld(m1_ref), preferred_element_type=jnp.float32)
    r1 = jax.lax.rsqrt(jnp.dot(d1 * d1, pmu, preferred_element_type=jnp.float32) + _EPS)
    y1 = jnp.maximum(d1 * r1, 0.0)
    d2 = jnp.dot(y1, _ld(m2_ref), preferred_element_type=jnp.float32)
    r2 = jax.lax.rsqrt(jnp.dot(d2 * d2, pmu, preferred_element_type=jnp.float32) + _EPS)
    out_ref[:] = (d2 * r2 + x).astype(out_ref.dtype)
    d1_ref[:] = d1.astype(d1_ref.dtype)
    d2_ref[:] = d2.astype(d2_ref.dtype)


def _bwd_resblock_kernel(refs):
    g_ref, x_ref, d1_ref, d2_ref, m1_ref, m2_ref, pmu_ref, dx_ref, dm1_ref, dm2_ref = refs
    g = _ld(g_ref)
    x = _ld(x_ref)
    d1 = _ld(d1_ref)
    d2 = _ld(d2_ref)
    pmu = _ld(pmu_ref)
    # r's recomputed from the saved pre-norm activations (VMEM budget)
    r2 = jax.lax.rsqrt(jnp.dot(d2 * d2, pmu, preferred_element_type=jnp.float32) + _EPS)
    a2 = g * d2 * (r2 * r2 * r2)
    gd2 = r2 * g - d2 * jnp.dot(a2, pmu, preferred_element_type=jnp.float32)
    r1 = jax.lax.rsqrt(jnp.dot(d1 * d1, pmu, preferred_element_type=jnp.float32) + _EPS)
    y1 = jnp.maximum(d1 * r1, 0.0)
    dm2_ref[:] = jnp.dot(y1.T, gd2, preferred_element_type=jnp.float32).astype(dm2_ref.dtype)
    gy1 = jnp.dot(gd2, _ld(m2_ref).T, preferred_element_type=jnp.float32)
    gyh1 = jnp.where(d1 > 0, gy1, 0.0)
    a1 = gyh1 * d1 * (r1 * r1 * r1)
    gd1 = r1 * gyh1 - d1 * jnp.dot(a1, pmu, preferred_element_type=jnp.float32)
    dx_ref[:] = (jnp.dot(gd1, _ld(m1_ref).T, preferred_element_type=jnp.float32) + g).astype(dx_ref.dtype)
    dm1_ref[:] = jnp.dot(x.T, gd1, preferred_element_type=jnp.float32).astype(dm1_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_resblock_layer(l_out: int, c_out: int):
    n = l_out * c_out

    def fwd_call(x, m1, m2):
        b = x.shape[0]
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        return pl.pallas_call(
            lambda *refs: _fwd_resblock_kernel(refs),
            out_shape=tuple(jax.ShapeDtypeStruct((b, n), x.dtype) for _ in range(3)),
            in_specs=[_vmem()] * 4,
            out_specs=tuple([_vmem()] * 3),
            interpret=_interpret(),
        )(x, m1, m2, pmu)

    def bwd_call(g, x, d1, d2, m1, m2):
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        return pl.pallas_call(
            lambda *refs: _bwd_resblock_kernel(refs),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(m1.shape, m1.dtype),
                jax.ShapeDtypeStruct(m2.shape, m2.dtype),
            ),
            in_specs=[_vmem()] * 7,
            out_specs=tuple([_vmem()] * 3),
            interpret=_interpret(),
        )(g, x, d1, d2, m1, m2, pmu)

    @jax.custom_vjp
    def layer(x, m1, m2):
        return fwd_call(x, m1, m2)[0]

    def layer_fwd(x, m1, m2):
        out, d1, d2 = fwd_call(x, m1, m2)
        return out, (x, d1, d2, m1, m2)

    def layer_bwd(saved, g):
        x, d1, d2, m1, m2 = saved
        return bwd_call(g, x, d1, d2, m1, m2)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_res_block(x, m1, m2, *, l_out: int, c_out: int, centered: bool = False):
    """Whole InstanceNorm residual block — conv+IN+relu+conv+IN+skip — as
    ONE Pallas kernel forward and one backward (x, m* flat/centered as in
    fused_dense_layer). centered=True means m1/m2 already carry the IN
    mean-centering (dense_conv_matrix(centered=True) folds it into the
    constant selector for free)."""
    m1c = m1 if centered else center_matrix(m1, l_out, c_out)
    m2c = m2 if centered else center_matrix(m2, l_out, c_out)
    layer = _make_resblock_layer(l_out, c_out)
    return _map_rows(lambda xc: layer(xc, m1c, m2c), (x,), x.shape[0])


# --------------------- stage-pair kernel (IN+relu twice) ---------------------
#
# The range encoder's five Conv+IN+relu stages ran as five fused kernels;
# chaining two stages per kernel (conv+IN+relu+conv+IN+relu) halves the
# launch count and skips the HBM round trip of the mid-pair activation —
# the 1-D step is launch-bound, not FLOP-bound (BASELINE.md round-2 log).


def _fwd_in_pair_kernel(refs):
    x_ref, m1_ref, m2_ref, p1_ref, p2_ref, out_ref, d1_ref, d2_ref = refs
    x = _ld(x_ref)
    d1 = jnp.dot(x, _ld(m1_ref), preferred_element_type=jnp.float32)
    r1 = jax.lax.rsqrt(jnp.dot(d1 * d1, _ld(p1_ref), preferred_element_type=jnp.float32) + _EPS)
    y1 = jnp.maximum(d1 * r1, 0.0)
    d2 = jnp.dot(y1, _ld(m2_ref), preferred_element_type=jnp.float32)
    r2 = jax.lax.rsqrt(jnp.dot(d2 * d2, _ld(p2_ref), preferred_element_type=jnp.float32) + _EPS)
    out_ref[:] = jnp.maximum(d2 * r2, 0.0).astype(out_ref.dtype)
    d1_ref[:] = d1.astype(d1_ref.dtype)
    d2_ref[:] = d2.astype(d2_ref.dtype)


def _bwd_in_pair_kernel(refs):
    g_ref, x_ref, d1_ref, d2_ref, m1_ref, m2_ref, p1_ref, p2_ref, \
        dx_ref, dm1_ref, dm2_ref = refs
    g = _ld(g_ref)
    x = _ld(x_ref)
    d1 = _ld(d1_ref)
    d2 = _ld(d2_ref)
    p1 = _ld(p1_ref)
    p2 = _ld(p2_ref)
    r2 = jax.lax.rsqrt(jnp.dot(d2 * d2, p2, preferred_element_type=jnp.float32) + _EPS)
    gyh2 = jnp.where(d2 > 0, g, 0.0)
    a2 = gyh2 * d2 * (r2 * r2 * r2)
    gd2 = r2 * gyh2 - d2 * jnp.dot(a2, p2, preferred_element_type=jnp.float32)
    r1 = jax.lax.rsqrt(jnp.dot(d1 * d1, p1, preferred_element_type=jnp.float32) + _EPS)
    y1 = jnp.maximum(d1 * r1, 0.0)
    dm2_ref[:] = jnp.dot(y1.T, gd2, preferred_element_type=jnp.float32).astype(dm2_ref.dtype)
    gy1 = jnp.dot(gd2, _ld(m2_ref).T, preferred_element_type=jnp.float32)
    gyh1 = jnp.where(d1 > 0, gy1, 0.0)
    a1 = gyh1 * d1 * (r1 * r1 * r1)
    gd1 = r1 * gyh1 - d1 * jnp.dot(a1, p1, preferred_element_type=jnp.float32)
    dx_ref[:] = jnp.dot(gd1, _ld(m1_ref).T, preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dm1_ref[:] = jnp.dot(x.T, gd1, preferred_element_type=jnp.float32).astype(dm1_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_in_pair_layer(l1: int, c1: int, l2: int, c2: int):
    n1, n2 = l1 * c1, l2 * c2

    def fwd_call(x, m1, m2):
        b = x.shape[0]
        p1 = jnp.asarray(_pmu_np(l1, c1))
        p2 = jnp.asarray(_pmu_np(l2, c2))
        return pl.pallas_call(
            lambda *refs: _fwd_in_pair_kernel(refs),
            out_shape=(
                jax.ShapeDtypeStruct((b, n2), x.dtype),
                jax.ShapeDtypeStruct((b, n1), x.dtype),
                jax.ShapeDtypeStruct((b, n2), x.dtype),
            ),
            in_specs=[_vmem()] * 5,
            out_specs=tuple([_vmem()] * 3),
            interpret=_interpret(),
        )(x, m1, m2, p1, p2)

    def bwd_call(g, x, d1, d2, m1, m2):
        p1 = jnp.asarray(_pmu_np(l1, c1))
        p2 = jnp.asarray(_pmu_np(l2, c2))
        return pl.pallas_call(
            lambda *refs: _bwd_in_pair_kernel(refs),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(m1.shape, m1.dtype),
                jax.ShapeDtypeStruct(m2.shape, m2.dtype),
            ),
            in_specs=[_vmem()] * 8,
            out_specs=tuple([_vmem()] * 3),
            interpret=_interpret(),
        )(g, x, d1, d2, m1, m2, p1, p2)

    @jax.custom_vjp
    def layer(x, m1, m2):
        return fwd_call(x, m1, m2)[0]

    def layer_fwd(x, m1, m2):
        out, d1, d2 = fwd_call(x, m1, m2)
        return out, (x, d1, d2, m1, m2)

    def layer_bwd(saved, g):
        x, d1, d2, m1, m2 = saved
        return bwd_call(g, x, d1, d2, m1, m2)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_in_pair(x, m1, m2, *, l1, c1, l2, c2, centered=False):
    """TWO chained Conv+IN+relu stages in one kernel each way. m1: (K, l1*c1)
    maps x to stage-1 output; m2: (l1*c1, l2*c2). centered=True: m* already
    carry the IN mean-centering."""
    m1c = m1 if centered else center_matrix(m1, l1, c1)
    m2c = m2 if centered else center_matrix(m2, l2, c2)
    layer = _make_in_pair_layer(l1, c1, l2, c2)
    return _map_rows(lambda xc: layer(xc, m1c, m2c), (x,), x.shape[0])


# ---------------- whole-residual-block kernel (AdaIN, per-sample affine) ----------------
#
# The decoder's three AdaIN residual blocks each ran as TWO fused_adain_layer
# kernels; this folds conv+AdaIN+relu+conv+AdaIN+skip into ONE kernel each
# way (mirroring fused_res_block), halving launches and skipping the HBM
# round trip of the mid-block activation. gamma/beta are per-sample (B, N)
# tiles predicted by the MLP. Batch is chunked on a sample-aligned grid so
# the backward's working set stays inside VMEM; dM1/dM2 accumulate across
# grid steps (TPU grids are sequential).


def _fwd_adain_block_kernel(refs):
    x_ref, m1_ref, m2_ref, pmu_ref, g1_ref, b1_ref, g2_ref, b2_ref, \
        out_ref, d1_ref, d2_ref = refs
    x = _ld(x_ref)
    pmu = _ld(pmu_ref)
    d1 = jnp.dot(x, _ld(m1_ref), preferred_element_type=jnp.float32)
    r1 = jax.lax.rsqrt(jnp.dot(d1 * d1, pmu, preferred_element_type=jnp.float32) + _EPS)
    y1 = jnp.maximum((d1 * r1) * _ld(g1_ref) + _ld(b1_ref), 0.0)
    d2 = jnp.dot(y1, _ld(m2_ref), preferred_element_type=jnp.float32)
    r2 = jax.lax.rsqrt(jnp.dot(d2 * d2, pmu, preferred_element_type=jnp.float32) + _EPS)
    out_ref[:] = ((d2 * r2) * _ld(g2_ref) + _ld(b2_ref) + x).astype(out_ref.dtype)
    d1_ref[:] = d1.astype(d1_ref.dtype)
    d2_ref[:] = d2.astype(d2_ref.dtype)


def _bwd_adain_block_kernel(refs):
    g_ref, x_ref, d1_ref, d2_ref, m1_ref, m2_ref, pmu_ref, \
        g1_ref, b1_ref, g2_ref, \
        dx_ref, dm1_ref, dm2_ref, dgf1_ref, dbf1_ref, dgf2_ref = refs
    g = _ld(g_ref)
    x = _ld(x_ref)
    d1 = _ld(d1_ref)
    d2 = _ld(d2_ref)
    pmu = _ld(pmu_ref)
    g1f = _ld(g1_ref)
    g2f = _ld(g2_ref)

    # r's recomputed from the saved pre-norm activations (VMEM budget)
    r2 = jax.lax.rsqrt(jnp.dot(d2 * d2, pmu, preferred_element_type=jnp.float32) + _EPS)
    yh2 = d2 * r2
    dgf2_ref[:] = (g * yh2).astype(dgf2_ref.dtype)  # dbf2 = g, returned outside
    gyh2 = g * g2f
    a2 = gyh2 * d2 * (r2 * r2 * r2)
    gd2 = r2 * gyh2 - d2 * jnp.dot(a2, pmu, preferred_element_type=jnp.float32)

    r1 = jax.lax.rsqrt(jnp.dot(d1 * d1, pmu, preferred_element_type=jnp.float32) + _EPS)
    yh1 = d1 * r1
    h1 = yh1 * g1f + _ld(b1_ref)
    y1 = jnp.maximum(h1, 0.0)

    gy1 = jnp.dot(gd2, _ld(m2_ref).T, preferred_element_type=jnp.float32)
    gh1 = jnp.where(h1 > 0, gy1, 0.0)
    dgf1_ref[:] = (gh1 * yh1).astype(dgf1_ref.dtype)
    dbf1_ref[:] = gh1.astype(dbf1_ref.dtype)
    gyh1 = gh1 * g1f
    a1 = gyh1 * d1 * (r1 * r1 * r1)
    gd1 = r1 * gyh1 - d1 * jnp.dot(a1, pmu, preferred_element_type=jnp.float32)

    dx_ref[:] = (jnp.dot(gd1, _ld(m1_ref).T, preferred_element_type=jnp.float32) + g).astype(dx_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dm1_ref[:] = jnp.zeros_like(dm1_ref)
        dm2_ref[:] = jnp.zeros_like(dm2_ref)

    dm1_ref[:] += jnp.dot(x.T, gd1, preferred_element_type=jnp.float32).astype(dm1_ref.dtype)
    dm2_ref[:] += jnp.dot(y1.T, gd2, preferred_element_type=jnp.float32).astype(dm2_ref.dtype)


def _batch_chunk(b: int, max_c: int = 128) -> int:
    """Largest divisor of b <= max_c divisible by 8 (Mosaic sublane rule);
    falls back to the whole batch (full-array blocks are unconstrained)."""
    for c in range(min(b, max_c), 0, -1):
        if b % c == 0 and c % 8 == 0:
            return c
    return b


# --------------------- row chunking for oversized batches ---------------------
#
# The whole-batch layers below are sized for the flagship regime (B ~ 500,
# N <= 2048): every operand lives in one VMEM block. Past ~512 rows the
# longer chains blow the ~16 MB scoped-VMEM limit (measured: fused_sln_chain
# at B=2000 wants 22 MB and Mosaic refuses to compile). Instead of falling
# back to the unfused path there, the public entries run the SAME
# whole-batch kernel over <= _CHUNK_ROWS row chunks with lax.map — exact,
# because every op in these kernels is per-sample independent (IN/AdaIN/SLN
# statistics are per-row) and the weight gradients of the closed-over
# matrices accumulate through the scan VJP. Batch sizes with no divisor
# near _CHUNK_ROWS are zero-padded up to a chunk multiple: the padded
# output rows are sliced off, so their cotangents are zero and they
# contribute nothing to any weight gradient.

_CHUNK_ROWS = 512


def _split_rows(b: int) -> tuple[int, int]:
    """(chunk, pad) so that (b + pad) % chunk == 0; chunk == b = no split."""
    if b <= _CHUNK_ROWS:
        return b, 0
    # prefer an exact divisor in (_CHUNK_ROWS/2, _CHUNK_ROWS] — full-size
    # chunks, zero padded rows (e.g. 2000 -> 4 x 500, 4096 -> 8 x 512)
    for c in range(_CHUNK_ROWS, _CHUNK_ROWS // 2, -1):
        if b % c == 0:
            return c, 0
    return _CHUNK_ROWS, (-b) % _CHUNK_ROWS


def _map_rows(fn, mapped, b: int):
    """Apply per-row-independent fn over row chunks of the (b, n_i) arrays
    in `mapped`; non-batched operands are closed over by fn."""
    c, pad = _split_rows(b)
    if c == b:
        return fn(*mapped)
    bp = b + pad

    def prep(a):
        if pad:
            a = jnp.pad(a, ((0, pad), (0, 0)))
        return a.reshape(bp // c, c, a.shape[1])

    ys = jax.lax.map(lambda t: fn(*t), tuple(prep(a) for a in mapped))
    return ys.reshape(bp, ys.shape[-1])[:b]


@functools.lru_cache(maxsize=None)
def _make_adain_block_layer(l_out: int, c_out: int):
    n = l_out * c_out

    def fwd_call(x, m1, m2, g1, b1, g2, b2):
        b = x.shape[0]
        c = _batch_chunk(b)
        grid = (b // c,)
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        row = pl.BlockSpec((c, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            lambda *refs: _fwd_adain_block_kernel(refs),
            grid=grid,
            out_shape=tuple(jax.ShapeDtypeStruct((b, n), x.dtype) for _ in range(3)),
            in_specs=[row, mat, mat, mat, row, row, row, row],
            out_specs=(row, row, row),
            interpret=_interpret(),
        )(x, m1, m2, pmu, g1, b1, g2, b2)

    def bwd_call(g, x, d1, d2, m1, m2, g1, b1, g2):
        b = x.shape[0]
        c = _batch_chunk(b)
        grid = (b // c,)
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        row = pl.BlockSpec((c, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        mat = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            lambda *refs: _bwd_adain_block_kernel(refs),
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((b, n), x.dtype),   # dx
                jax.ShapeDtypeStruct((n, n), m1.dtype),  # dm1
                jax.ShapeDtypeStruct((n, n), m2.dtype),  # dm2
                jax.ShapeDtypeStruct((b, n), x.dtype),   # dgf1
                jax.ShapeDtypeStruct((b, n), x.dtype),   # dbf1
                jax.ShapeDtypeStruct((b, n), x.dtype),   # dgf2
            ),
            in_specs=[row, row, row, row, mat, mat, mat, row, row, row],
            out_specs=(row, mat, mat, row, row, row),
            interpret=_interpret(),
        )(g, x, d1, d2, m1, m2, pmu, g1, b1, g2)

    @jax.custom_vjp
    def layer(x, m1, m2, g1, b1, g2, b2):
        return fwd_call(x, m1, m2, g1, b1, g2, b2)[0]

    def layer_fwd(x, m1, m2, g1, b1, g2, b2):
        out, d1, d2 = fwd_call(x, m1, m2, g1, b1, g2, b2)
        return out, (x, d1, d2, m1, m2, g1, b1, g2)

    def layer_bwd(saved, g):
        x, d1, d2, m1, m2, g1, b1, g2 = saved
        dx, dm1, dm2, dgf1, dbf1, dgf2 = bwd_call(g, x, d1, d2, m1, m2, g1, b1, g2)
        return dx, dm1, dm2, dgf1, dbf1, dgf2, g  # dbf2 = cotangent (affine shift)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_adain_res_block(x, m1, m2, g1, b1, g2, b2, *, l_out: int, c_out: int,
                          centered: bool = False):
    """Whole AdaIN residual block — conv+AdaIN+relu+conv+AdaIN+skip — as ONE
    Pallas kernel forward and one backward. g*/b*: per-sample (B, N) tiles."""
    m1c = m1 if centered else center_matrix(m1, l_out, c_out)
    m2c = m2 if centered else center_matrix(m2, l_out, c_out)
    layer = _make_adain_block_layer(l_out, c_out)
    return _map_rows(
        lambda xc, g1c, b1c, g2c, b2c: layer(xc, m1c, m2c, g1c, b1c, g2c, b2c),
        (x, g1, b1, g2, b2), x.shape[0],
    )


# --------------------- decoder kernels: AdaIN / SLN / tanh+pool ---------------------


def _fwd_adain_kernel(act, has_res, refs):
    if has_res:
        x_ref, mc_ref, pmu_ref, gf_ref, bf_ref, res_ref, out_ref, d_ref, r_ref = refs
    else:
        x_ref, mc_ref, pmu_ref, gf_ref, bf_ref, out_ref, d_ref, r_ref = refs
    d = jnp.dot(_ld(x_ref), _ld(mc_ref), preferred_element_type=jnp.float32)
    v = jnp.dot(d * d, _ld(pmu_ref), preferred_element_type=jnp.float32)
    r = jax.lax.rsqrt(v + _EPS)
    out = (d * r) * _ld(gf_ref) + _ld(bf_ref)
    if act == "relu":
        out = jnp.maximum(out, 0.0)
    if has_res:
        out = out + _ld(res_ref)
    out_ref[:] = out.astype(out_ref.dtype)
    d_ref[:] = d.astype(d_ref.dtype)
    r_ref[:] = r.astype(r_ref.dtype)


def _bwd_adain_kernel(act, refs):
    g_ref, d_ref, r_ref, gf_ref, bf_ref, x_ref, mc_ref, pmu_ref, \
        dx_ref, dm_ref, dgf_ref, dbf_ref = refs
    g = _ld(g_ref)
    d = _ld(d_ref)
    r = _ld(r_ref)
    gf = _ld(gf_ref)
    yh = d * r
    if act == "relu":
        pre = yh * gf + _ld(bf_ref)
        gaff = jnp.where(pre > 0, g, 0.0)
    else:
        gaff = g
    dgf_ref[:] = (gaff * yh).astype(dgf_ref.dtype)
    dbf_ref[:] = gaff.astype(dbf_ref.dtype)
    gyh = gaff * gf
    a = gyh * d * (r * r * r)
    gd = r * gyh - d * jnp.dot(a, _ld(pmu_ref), preferred_element_type=jnp.float32)
    dx_ref[:] = jnp.dot(gd, _ld(mc_ref).T, preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dm_ref[:] = jnp.dot(_ld(x_ref).T, gd, preferred_element_type=jnp.float32).astype(dm_ref.dtype)


def _fwd_sln_kernel(n_feats, refs):
    x_ref, mc_ref, gf_ref, bf_ref, out_ref, d_ref, t_ref = refs
    d = jnp.dot(_ld(x_ref), _ld(mc_ref), preferred_element_type=jnp.float32)
    ss = jnp.sum(d * d, axis=1, keepdims=True) / (n_feats - 1)  # unbiased
    s = jnp.sqrt(ss)
    t = 1.0 / (s + _EPS)  # torch-quirk denominator (std + eps)
    out_ref[:] = jnp.maximum((d * t) * _ld(gf_ref) + _ld(bf_ref), 0.0).astype(out_ref.dtype)
    d_ref[:] = d.astype(d_ref.dtype)
    t_ref[:] = t.astype(t_ref.dtype)


def _bwd_sln_kernel(n_feats, refs):
    g_ref, d_ref, t_ref, gf_ref, bf_ref, x_ref, mc_ref, \
        dx_ref, dm_ref, dgf_ref, dbf_ref = refs
    g = _ld(g_ref)
    d = _ld(d_ref)
    t = _ld(t_ref)
    gf = _ld(gf_ref)
    yh = d * t
    pre = yh * gf + _ld(bf_ref)
    gaff = jnp.where(pre > 0, g, 0.0)
    dgf_ref[:] = jnp.sum(gaff * yh, axis=0, keepdims=True).astype(dgf_ref.dtype)
    dbf_ref[:] = jnp.sum(gaff, axis=0, keepdims=True).astype(dbf_ref.dtype)
    gyh = gaff * gf
    gt = jnp.sum(gyh * d, axis=1, keepdims=True)
    s = 1.0 / t - _EPS  # recover s from t
    gss = gt * (-(t * t)) / (2.0 * s)
    gd = gyh * t + d * (2.0 * gss / (n_feats - 1))
    dx_ref[:] = jnp.dot(gd, mc_ref[:].T, preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dm_ref[:] = jnp.dot(x_ref[:].T, gd, preferred_element_type=jnp.float32).astype(dm_ref.dtype)


def _fwd_tanhpool_kernel(refs):
    x_ref, m_ref, bf_ref, pool_ref, out_ref, th_ref = refs
    z = jnp.dot(_ld(x_ref), _ld(m_ref), preferred_element_type=jnp.float32) + _ld(bf_ref)
    th = jnp.tanh(z)
    th_ref[:] = th.astype(th_ref.dtype)
    out_ref[:] = jnp.dot(th, _ld(pool_ref), preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_tanhpool_kernel(refs):
    g_ref, th_ref, x_ref, m_ref, pool_ref, dx_ref, dm_ref, dbf_ref = refs
    th = _ld(th_ref)
    gth = jnp.dot(_ld(g_ref), _ld(pool_ref).T, preferred_element_type=jnp.float32)
    gz = gth * (1.0 - th * th)
    dx_ref[:] = jnp.dot(gz, _ld(m_ref).T, preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dm_ref[:] = jnp.dot(_ld(x_ref).T, gz, preferred_element_type=jnp.float32).astype(dm_ref.dtype)
    dbf_ref[:] = jnp.sum(gz, axis=0, keepdims=True).astype(dbf_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_adain_layer(l_out: int, c_out: int, act: str, has_res: bool):
    n = l_out * c_out

    def fwd_call(x, mc, gf, bf, *res):
        b = x.shape[0]
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        kern = lambda *refs: _fwd_adain_kernel(act, has_res, refs)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((b, n), x.dtype),
                jax.ShapeDtypeStruct((b, n), x.dtype),
                jax.ShapeDtypeStruct((b, n), x.dtype),
            ),
            in_specs=[_vmem()] * (6 if has_res else 5),
            out_specs=(_vmem(), _vmem(), _vmem()),
            interpret=_interpret(),
        )(x, mc, pmu, gf, bf, *res)

    def bwd_call(g, d, r, gf, bf, x, mc):
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        kern = lambda *refs: _bwd_adain_kernel(act, refs)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(mc.shape, mc.dtype),
                jax.ShapeDtypeStruct(gf.shape, gf.dtype),
                jax.ShapeDtypeStruct(bf.shape, bf.dtype),
            ),
            in_specs=[_vmem()] * 8,
            out_specs=tuple([_vmem()] * 4),
            interpret=_interpret(),
        )(g, d, r, gf, bf, x, mc, pmu)

    if has_res:

        @jax.custom_vjp
        def layer(x, mc, gf, bf, res):
            return fwd_call(x, mc, gf, bf, res)[0]

        def layer_fwd(x, mc, gf, bf, res):
            out, d, r = fwd_call(x, mc, gf, bf, res)
            return out, (x, mc, gf, bf, d, r)

        def layer_bwd(saved, g):
            x, mc, gf, bf, d, r = saved
            dx, dm, dgf, dbf = bwd_call(g, d, r, gf, bf, x, mc)
            return dx, dm, dgf, dbf, g

        layer.defvjp(layer_fwd, layer_bwd)
        return layer

    @jax.custom_vjp
    def layer(x, mc, gf, bf):
        return fwd_call(x, mc, gf, bf)[0]

    def layer_fwd(x, mc, gf, bf):
        out, d, r = fwd_call(x, mc, gf, bf)
        return out, (x, mc, gf, bf, d, r)

    def layer_bwd(saved, g):
        x, mc, gf, bf, d, r = saved
        dx, dm, dgf, dbf = bwd_call(g, d, r, gf, bf, x, mc)
        return dx, dm, dgf, dbf

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


@functools.lru_cache(maxsize=None)
def _make_sln_layer(n: int):
    def fwd_call(x, mc, gf, bf):
        b = x.shape[0]
        kern = lambda *refs: _fwd_sln_kernel(n, refs)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((b, n), x.dtype),
                jax.ShapeDtypeStruct((b, n), x.dtype),
                jax.ShapeDtypeStruct((b, 1), x.dtype),
            ),
            in_specs=[_vmem()] * 4,
            out_specs=(_vmem(), _vmem(), _vmem()),
            interpret=_interpret(),
        )(x, mc, gf, bf)

    def bwd_call(g, d, t, gf, bf, x, mc):
        kern = lambda *refs: _bwd_sln_kernel(n, refs)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(mc.shape, mc.dtype),
                jax.ShapeDtypeStruct(gf.shape, gf.dtype),
                jax.ShapeDtypeStruct(bf.shape, bf.dtype),
            ),
            in_specs=[_vmem()] * 7,
            out_specs=tuple([_vmem()] * 4),
            interpret=_interpret(),
        )(g, d, t, gf, bf, x, mc)

    @jax.custom_vjp
    def layer(x, mc, gf, bf):
        return fwd_call(x, mc, gf, bf)[0]

    def layer_fwd(x, mc, gf, bf):
        out, d, t = fwd_call(x, mc, gf, bf)
        return out, (x, mc, gf, bf, d, t)

    def layer_bwd(saved, g):
        x, mc, gf, bf, d, t = saved
        dx, dm, dgf, dbf = bwd_call(g, d, t, gf, bf, x, mc)
        return dx, dm, dgf, dbf

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


@functools.lru_cache(maxsize=None)
def _make_tanhpool_layer(n_mid: int, n_out: int):
    def fwd_call(x, m, bf, pool):
        b = x.shape[0]
        return pl.pallas_call(
            lambda *refs: _fwd_tanhpool_kernel(refs),
            out_shape=(
                jax.ShapeDtypeStruct((b, n_out), x.dtype),
                jax.ShapeDtypeStruct((b, n_mid), x.dtype),
            ),
            in_specs=[_vmem()] * 4,
            out_specs=(_vmem(), _vmem()),
            interpret=_interpret(),
        )(x, m, bf, pool)

    def bwd_call(g, th, x, m, pool):
        return pl.pallas_call(
            lambda *refs: _bwd_tanhpool_kernel(refs),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(m.shape, m.dtype),
                jax.ShapeDtypeStruct((1, n_mid), x.dtype),
            ),
            in_specs=[_vmem()] * 5,
            out_specs=tuple([_vmem()] * 3),
            interpret=_interpret(),
        )(g, th, x, m, pool)

    @jax.custom_vjp
    def layer(x, m, bf, pool):
        return fwd_call(x, m, bf, pool)[0]

    def layer_fwd(x, m, bf, pool):
        out, th = fwd_call(x, m, bf, pool)
        return out, (x, m, pool, th)

    def layer_bwd(saved, g):
        x, m, pool, th = saved
        dx, dm, dbf = bwd_call(g, th, x, m, pool)
        return dx, dm, dbf, jnp.zeros_like(pool)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_adain_layer(x, m, gamma_full, beta_full, *, l_out, c_out, act="none", residual=None):
    """AdaIN stage: act(IN(x@M) * gamma + beta) [+ res]; gamma/beta (B, N)."""
    mc = center_matrix(m, l_out, c_out)
    layer = _make_adain_layer(l_out, c_out, act, residual is not None)
    b = x.shape[0]
    if residual is not None:
        return _map_rows(
            lambda xc, gc, bc, rc: layer(xc, mc, gc, bc, rc),
            (x, gamma_full, beta_full, residual), b,
        )
    return _map_rows(
        lambda xc, gc, bc: layer(xc, mc, gc, bc),
        (x, gamma_full, beta_full), b,
    )


def fused_sln_layer(x, m, gamma_full, beta_full, *, n: int):
    """Upsample+conv (already folded into m) + SampleLayerNorm + relu.
    gamma_full/beta_full: (1, N) per-channel affine tiled over l."""
    # SLN centering is over ALL outputs per sample -> subtract column mean
    mc = m - jnp.mean(m, axis=1, keepdims=True)
    layer = _make_sln_layer(n)
    return _map_rows(
        lambda xc: layer(xc, mc, gamma_full, beta_full), (x,), x.shape[0]
    )


def fused_tanh_pool_layer(x, m, bias_full, pool):
    """Final decoder stage: pool(tanh(x@M + b)) in one kernel."""
    layer = _make_tanhpool_layer(m.shape[1], pool.shape[1])
    return _map_rows(
        lambda xc: layer(xc, m, bias_full, pool), (x,), x.shape[0]
    )


# ----------------- decoder upsample-chain kernel (4x SLN + tanh-pool) -----------------
#
# The decoder's four upsample+conv+SLN+relu stages and the final
# conv+tanh+pool ran as five kernels; this folds the whole tail into ONE
# kernel each way. SLN stats are per-sample scalars (no P_mu matmuls), so
# the working set is the stage matrices plus the saved pre-norm
# activations — ~10 MB of the ~16 MB VMEM at the flagship sizes.


def _sln_stage_fwd(y_prev, m_ref, bi_ref, g_ref, b_ref, n):
    d = jnp.dot(y_prev, _ld(m_ref), preferred_element_type=jnp.float32) + _ld(bi_ref)
    ss = jnp.sum(d * d, axis=1, keepdims=True) / (n - 1)
    t = 1.0 / (jnp.sqrt(ss) + _EPS)
    y = jnp.maximum((d * t) * _ld(g_ref) + _ld(b_ref), 0.0)
    return d, y


def _sln_stage_bwd(gy, d, y_prev, m_ref, g_ref, b_ref, n):
    """Returns (gy_prev, dm, dbi, dgf, dbf) for one SLN stage; recomputes t."""
    ss = jnp.sum(d * d, axis=1, keepdims=True) / (n - 1)
    s = jnp.sqrt(ss)
    t = 1.0 / (s + _EPS)
    yh = d * t
    gf = _ld(g_ref)
    pre = yh * gf + _ld(b_ref)
    gaff = jnp.where(pre > 0, gy, 0.0)
    dgf = jnp.sum(gaff * yh, axis=0, keepdims=True)
    dbf = jnp.sum(gaff, axis=0, keepdims=True)
    gyh = gaff * gf
    gt = jnp.sum(gyh * d, axis=1, keepdims=True)
    gss = gt * (-(t * t)) / (2.0 * s)
    gd = gyh * t + d * (2.0 * gss / (n - 1))
    gy_prev = jnp.dot(gd, _ld(m_ref).T, preferred_element_type=jnp.float32)
    dm = jnp.dot(y_prev.T, gd, preferred_element_type=jnp.float32)
    dbi = jnp.sum(gd, axis=0, keepdims=True)
    return gy_prev, dm, dbi, dgf, dbf


def _fwd_sln_chain_kernel(ns, refs):
    k = len(ns)
    x_ref = refs[0]
    m_refs = refs[1 : 1 + k]
    bi_refs = refs[1 + k : 1 + 2 * k]
    g_refs = refs[1 + 2 * k : 1 + 3 * k]
    b_refs = refs[1 + 3 * k : 1 + 4 * k]
    mo_ref, bo_ref, pool_ref = refs[1 + 4 * k : 4 + 4 * k]
    out_ref = refs[4 + 4 * k]
    d_refs = refs[5 + 4 * k : 5 + 5 * k]
    th_ref = refs[5 + 5 * k]
    y = _ld(x_ref)
    for j in range(k):
        d, y = _sln_stage_fwd(y, m_refs[j], bi_refs[j], g_refs[j], b_refs[j], ns[j])
        d_refs[j][:] = d.astype(d_refs[j].dtype)
    z = jnp.dot(y, _ld(mo_ref), preferred_element_type=jnp.float32) + _ld(bo_ref)
    th = jnp.tanh(z)
    th_ref[:] = th.astype(th_ref.dtype)
    out_ref[:] = jnp.dot(th, _ld(pool_ref), preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _bwd_sln_chain_kernel(ns, refs):
    k = len(ns)
    g_ref = refs[0]
    x_ref = refs[1]
    d_refs = refs[2 : 2 + k]
    m_refs = refs[2 + k : 2 + 2 * k]
    g_affs = refs[2 + 2 * k : 2 + 3 * k]
    b_affs = refs[2 + 3 * k : 2 + 4 * k]
    mo_ref, pool_ref, th_ref = refs[2 + 4 * k : 5 + 4 * k]
    o = 5 + 4 * k
    dx_ref = refs[o]
    dm_refs = refs[o + 1 : o + 1 + k]
    dbi_refs = refs[o + 1 + k : o + 1 + 2 * k]
    dg_refs = refs[o + 1 + 2 * k : o + 1 + 3 * k]
    db_refs = refs[o + 1 + 3 * k : o + 1 + 4 * k]
    dmo_ref, dbo_ref = refs[o + 1 + 4 * k : o + 3 + 4 * k]

    # recompute the y chain from the saved pre-norm d's
    ys = [_ld(x_ref)]
    for j in range(k):
        d = _ld(d_refs[j])
        ss = jnp.sum(d * d, axis=1, keepdims=True) / (ns[j] - 1)
        t = 1.0 / (jnp.sqrt(ss) + _EPS)
        ys.append(jnp.maximum((d * t) * _ld(g_affs[j]) + _ld(b_affs[j]), 0.0))

    th = _ld(th_ref)
    gth = jnp.dot(_ld(g_ref), _ld(pool_ref).T, preferred_element_type=jnp.float32)
    gz = gth * (1.0 - th * th)
    dmo_ref[:] = jnp.dot(ys[k].T, gz, preferred_element_type=jnp.float32).astype(dmo_ref.dtype)
    dbo_ref[:] = jnp.sum(gz, axis=0, keepdims=True).astype(dbo_ref.dtype)
    gy = jnp.dot(gz, _ld(mo_ref).T, preferred_element_type=jnp.float32)
    for j in range(k - 1, -1, -1):
        gy, dm, dbi, dgf, dbf = _sln_stage_bwd(
            gy, _ld(d_refs[j]), ys[j], m_refs[j], g_affs[j], b_affs[j], ns[j]
        )
        dm_refs[j][:] = dm.astype(dm_refs[j].dtype)
        dbi_refs[j][:] = dbi.astype(dbi_refs[j].dtype)
        dg_refs[j][:] = dgf.astype(dg_refs[j].dtype)
        db_refs[j][:] = dbf.astype(db_refs[j].dtype)
    dx_ref[:] = gy.astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_sln_chain_layer(ns: tuple, n_mid: int, n_out: int):
    k = len(ns)

    def fwd_call(x, ms, bis, gs, bs, mo, bo, pool):
        b = x.shape[0]
        kern = lambda *refs: _fwd_sln_chain_kernel(ns, refs)
        out_shape = (
            [jax.ShapeDtypeStruct((b, n_out), x.dtype)]
            + [jax.ShapeDtypeStruct((b, n), x.dtype) for n in ns]
            + [jax.ShapeDtypeStruct((b, n_mid), x.dtype)]
        )
        res = pl.pallas_call(
            kern,
            out_shape=tuple(out_shape),
            in_specs=[_vmem()] * (4 + 4 * k),
            out_specs=tuple([_vmem()] * (2 + k)),
            interpret=_interpret(),
        )(x, *ms, *bis, *gs, *bs, mo, bo, pool)
        return res[0], res[1 : 1 + k], res[1 + k]

    def bwd_call(g, x, ds, ms, gs, bs, mo, pool, th):
        kern = lambda *refs: _bwd_sln_chain_kernel(ns, refs)
        out_shape = (
            [jax.ShapeDtypeStruct(x.shape, x.dtype)]
            + [jax.ShapeDtypeStruct(m.shape, m.dtype) for m in ms]
            + [jax.ShapeDtypeStruct((1, n), x.dtype) for n in ns]
            + [jax.ShapeDtypeStruct(gf.shape, gf.dtype) for gf in gs]
            + [jax.ShapeDtypeStruct(bf.shape, bf.dtype) for bf in bs]
            + [jax.ShapeDtypeStruct(mo.shape, mo.dtype),
               jax.ShapeDtypeStruct((1, n_mid), x.dtype)]
        )
        return pl.pallas_call(
            kern,
            out_shape=tuple(out_shape),
            in_specs=[_vmem()] * (5 + 4 * k),
            out_specs=tuple([_vmem()] * (3 + 4 * k)),
            interpret=_interpret(),
        )(g, x, *ds, *ms, *gs, *bs, mo, pool, th)

    @jax.custom_vjp
    def layer(x, ms, bis, gs, bs, mo, bo, pool):
        return fwd_call(x, ms, bis, gs, bs, mo, bo, pool)[0]

    def layer_fwd(x, ms, bis, gs, bs, mo, bo, pool):
        out, ds, th = fwd_call(x, ms, bis, gs, bs, mo, bo, pool)
        return out, (x, ds, ms, gs, bs, mo, pool, th)

    def layer_bwd(saved, g):
        x, ds, ms, gs, bs, mo, pool, th = saved
        res = bwd_call(g, x, ds, ms, gs, bs, mo, pool, th)
        dx = res[0]
        dms = tuple(res[1 : 1 + k])
        dbis = tuple(res[1 + k : 1 + 2 * k])
        dgs = tuple(res[1 + 2 * k : 1 + 3 * k])
        dbs = tuple(res[1 + 3 * k : 1 + 4 * k])
        dmo, dbo = res[1 + 4 * k : 3 + 4 * k]
        return dx, dms, dbis, dgs, dbs, dmo, dbo.reshape(1, -1), jnp.zeros_like(pool)

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_sln_chain(x, ms, gammas, betas, m_out, bias_out, pool, biases=None):
    """The decoder tail — k x (upsample+conv+SLN+relu) then conv+tanh+pool —
    as ONE kernel each way. ms: per-stage (K_j, N_j) matrices (upsample
    folded in, dense_upconv_matrix); biases: per-stage (1, N_j) conv-bias
    rows (channel bias tiled over l) added pre-norm, or None; gammas/betas:
    (1, N_j) channel affines tiled over l; m_out: (N_k, n_mid); bias_out:
    (1, n_mid); pool: (n_mid, n_out).

    The kernel pre-centers each stage matrix column-wise so the matmul
    output IS the mean-subtracted SLN activation; a conv bias therefore
    enters as its mean-centered row (bias - mean(bias)) — exact, because
    center(y@M + b) == y@center(M) + (b - mean(b))."""
    ns = tuple(m.shape[1] for m in ms)
    msc = tuple(m - jnp.mean(m, axis=1, keepdims=True) for m in ms)
    if biases is None:
        bisc = tuple(jnp.zeros((1, n), x.dtype) for n in ns)
    else:
        # center in f32 (bf16 mean trips lax.div dtype promotion), store in
        # the activation dtype — the kernel upcasts on load (_ld)
        bisc = tuple(
            (b.reshape(1, -1).astype(jnp.float32)
             - jnp.mean(b.astype(jnp.float32))).astype(x.dtype)
            for b in biases
        )
    layer = _make_sln_chain_layer(ns, m_out.shape[1], pool.shape[1])
    return _map_rows(
        lambda xc: layer(
            xc, msc, bisc, tuple(gammas), tuple(betas), m_out, bias_out, pool
        ),
        (x,), x.shape[0],
    )


# ----------------------- fused MLP chain (heads) -----------------------
#
# The Restorer/Classifier linear heads are 4 Dense+LeakyReLU layers each —
# 8 matmul launches per head per direction for sub-microsecond matmuls.
# One kernel runs the whole chain; backward recomputes the y-chain from the
# saved pre-activation d's.


def _leaky(d, slope):
    return jnp.where(d > 0, d, slope * d)


def _fwd_mlp_kernel(slopes, refs):
    k = len(slopes)
    x_ref = refs[0]
    w_refs = refs[1 : 1 + k]
    b_refs = refs[1 + k : 1 + 2 * k]
    out_ref = refs[1 + 2 * k]
    d_refs = refs[2 + 2 * k : 2 + 3 * k]
    y = _ld(x_ref)
    for j in range(k):
        d = jnp.dot(y, _ld(w_refs[j]), preferred_element_type=jnp.float32) + _ld(b_refs[j])
        d_refs[j][:] = d.astype(d_refs[j].dtype)
        y = _leaky(d, slopes[j])
    out_ref[:] = y.astype(out_ref.dtype)


def _bwd_mlp_kernel(slopes, refs):
    k = len(slopes)
    g_ref = refs[0]
    x_ref = refs[1]
    d_refs = refs[2 : 2 + k]
    w_refs = refs[2 + k : 2 + 2 * k]
    dx_ref = refs[2 + 2 * k]
    dw_refs = refs[3 + 2 * k : 3 + 3 * k]
    db_refs = refs[3 + 3 * k : 3 + 4 * k]
    ys = [_ld(x_ref)]
    for j in range(k):
        ys.append(_leaky(_ld(d_refs[j]), slopes[j]))
    g = _ld(g_ref)
    for j in range(k - 1, -1, -1):
        d = _ld(d_refs[j])
        gd = jnp.where(d > 0, g, slopes[j] * g)
        dw_refs[j][:] = jnp.dot(ys[j].T, gd, preferred_element_type=jnp.float32).astype(dw_refs[j].dtype)
        db_refs[j][:] = jnp.sum(gd, axis=0, keepdims=True).astype(db_refs[j].dtype)
        g = jnp.dot(gd, _ld(w_refs[j]).T, preferred_element_type=jnp.float32)
    dx_ref[:] = g.astype(dx_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_mlp_chain_layer(slopes: tuple, dims: tuple):
    k = len(slopes)

    def fwd_call(x, ws, bs):
        b = x.shape[0]
        kern = lambda *refs: _fwd_mlp_kernel(slopes, refs)
        out_shape = (
            [jax.ShapeDtypeStruct((b, dims[-1]), x.dtype)]
            + [jax.ShapeDtypeStruct((b, n), x.dtype) for n in dims]
        )
        res = pl.pallas_call(
            kern,
            out_shape=tuple(out_shape),
            in_specs=[_vmem()] * (1 + 2 * k),
            out_specs=tuple([_vmem()] * (1 + k)),
            interpret=_interpret(),
        )(x, *ws, *bs)
        return res[0], res[1:]

    def bwd_call(g, x, ds, ws):
        kern = lambda *refs: _bwd_mlp_kernel(slopes, refs)
        out_shape = (
            [jax.ShapeDtypeStruct(x.shape, x.dtype)]
            + [jax.ShapeDtypeStruct(w.shape, w.dtype) for w in ws]
            + [jax.ShapeDtypeStruct((1, n), x.dtype) for n in dims]
        )
        return pl.pallas_call(
            kern,
            out_shape=tuple(out_shape),
            in_specs=[_vmem()] * (2 + 2 * k),
            out_specs=tuple([_vmem()] * (1 + 2 * k)),
            interpret=_interpret(),
        )(g, x, *ds, *ws)

    @jax.custom_vjp
    def layer(x, ws, bs):
        return fwd_call(x, ws, bs)[0]

    def layer_fwd(x, ws, bs):
        out, ds = fwd_call(x, ws, bs)
        return out, (x, tuple(ds), ws)

    def layer_bwd(saved, g):
        x, ds, ws = saved
        res = bwd_call(g, x, ds, ws)
        dx = res[0]
        dws = tuple(res[1 : 1 + k])
        dbs = tuple(res[1 + k : 1 + 2 * k])  # (1, N) — matches the layer inputs
        return dx, dws, dbs

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def fused_mlp_chain(x, ws, bs, slopes):
    """x (B, D0) through k Dense(+bias)+LeakyReLU(slope_j) layers in ONE
    kernel each way. ws[j]: (D_j, D_{j+1}); bs[j]: (D_{j+1},); slopes[j]:
    the LeakyReLU negative slope per layer (1.0 = linear, no activation)."""
    dims = tuple(w.shape[1] for w in ws)
    layer = _make_mlp_chain_layer(tuple(float(s) for s in slopes), dims)
    wst = tuple(ws)
    bst = tuple(b.reshape(1, -1) for b in bs)
    return _map_rows(lambda xc: layer(xc, wst, bst), (x,), x.shape[0])


# ------------------------- custom-vjp wrappers -------------------------


@functools.lru_cache(maxsize=None)
def _make_in_layer(l_out: int, c_out: int, act: str, has_res: bool):
    n = l_out * c_out

    def fwd_call(x, mc, *res):
        b = x.shape[0]
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        kern = lambda *refs: _fwd_in_kernel(act, has_res, refs)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct((b, n), x.dtype),
                jax.ShapeDtypeStruct((b, n), x.dtype),
                jax.ShapeDtypeStruct((b, n), x.dtype),
            ),
            in_specs=[_vmem()] * (4 if has_res else 3),
            out_specs=(_vmem(), _vmem(), _vmem()),
            interpret=_interpret(),
        )(x, mc, pmu, *res)

    def bwd_call(g, d, r, x, mc):
        pmu = jnp.asarray(_pmu_np(l_out, c_out))
        kern = lambda *refs: _bwd_in_kernel(act, refs)
        return pl.pallas_call(
            kern,
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(mc.shape, mc.dtype),
            ),
            in_specs=[_vmem()] * 6,
            out_specs=(_vmem(), _vmem()),
            interpret=_interpret(),
        )(g, d, r, x, mc, pmu)

    if has_res:

        @jax.custom_vjp
        def layer(x, mc, res):
            return fwd_call(x, mc, res)[0]

        def layer_fwd(x, mc, res):
            out, d, r = fwd_call(x, mc, res)
            return out, (x, mc, d, r)

        def layer_bwd(saved, g):
            x, mc, d, r = saved
            dx, dm = bwd_call(g, d, r, x, mc)
            return dx, dm, g  # skip connection passes the cotangent through

        layer.defvjp(layer_fwd, layer_bwd)
        return layer

    @jax.custom_vjp
    def layer(x, mc):
        return fwd_call(x, mc)[0]

    def layer_fwd(x, mc):
        out, d, r = fwd_call(x, mc)
        return out, (x, mc, d, r)

    def layer_bwd(saved, g):
        x, mc, d, r = saved
        dx, dm = bwd_call(g, d, r, x, mc)
        return dx, dm

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


@functools.lru_cache(maxsize=None)
def _make_nonorm_layer(act: str, has_bias: bool):
    def fwd_call(x, m, *bias):
        b = x.shape[0]
        kern = lambda *refs: _fwd_nonorm_kernel(act, has_bias, refs)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((b, m.shape[1]), x.dtype),
            in_specs=[_vmem()] * (3 if has_bias else 2),
            out_specs=_vmem(),
            interpret=_interpret(),
        )(x, m, *bias)

    def bwd_call(g, out, x, m):
        kern = lambda *refs: _bwd_nonorm_kernel(act, has_bias, refs)
        out_shape = [
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(m.shape, m.dtype),
        ]
        if has_bias:
            out_shape.append(jax.ShapeDtypeStruct((1, m.shape[1]), x.dtype))
        return pl.pallas_call(
            kern,
            out_shape=tuple(out_shape),
            in_specs=[_vmem()] * 4,
            out_specs=tuple([_vmem()] * len(out_shape)),
            interpret=_interpret(),
        )(g, out, x, m)

    if has_bias:

        @jax.custom_vjp
        def layer(x, m, bias):
            return fwd_call(x, m, bias)

        def layer_fwd(x, m, bias):
            out = fwd_call(x, m, bias)
            return out, (x, m, out)

        def layer_bwd(saved, g):
            x, m, out = saved
            dx, dm, db = bwd_call(g, out, x, m)
            return dx, dm, db

        layer.defvjp(layer_fwd, layer_bwd)
        return layer

    @jax.custom_vjp
    def layer(x, m):
        return fwd_call(x, m)

    def layer_fwd(x, m):
        out = fwd_call(x, m)
        return out, (x, m, out)

    def layer_bwd(saved, g):
        x, m, out = saved
        dx, dm = bwd_call(g, out, x, m)
        return dx, dm

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


# ------------------------- public entry -------------------------

# Fused lowerings chunk oversized batches onto <=_CHUNK_ROWS-row calls
# (_map_rows above), so there is no VMEM batch ceiling anymore; this cap
# only bounds the pad waste / sequential-chunk count for absurd batch
# sizes, where the unfused XLA path is the sane lowering anyway.
MAX_FUSED_BATCH = 16384


def fused_dense_layer(
    x: jnp.ndarray,
    m: jnp.ndarray,
    *,
    l_out: int,
    c_out: int,
    norm: str = "in",
    act: str = "relu",
    residual: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    centered: bool = False,
) -> jnp.ndarray:
    """x (B, K) @ m (K, L_out*C_out) -> (B, L_out*C_out), fused norm + act.

    residual: (B, L_out*C_out) added after the norm (act must be 'none').
    bias: (L_out*C_out,) pre-activation row vector (norm='none' only).
    centered: m already carries the IN mean-centering.
    """
    assert m.shape[1] == l_out * c_out
    b = x.shape[0]
    if norm == "in":
        assert bias is None, "bias before InstanceNorm is a no-op"
        mc = m if centered else center_matrix(m, l_out, c_out)
        layer = _make_in_layer(l_out, c_out, act, residual is not None)
        if residual is not None:
            assert act == "none"
            return _map_rows(
                lambda xc, rc: layer(xc, mc, rc), (x, residual), b
            )
        return _map_rows(lambda xc: layer(xc, mc), (x,), b)
    assert norm == "none" and residual is None
    layer = _make_nonorm_layer(act, bias is not None)
    if bias is not None:
        brow = bias.reshape(1, -1)
        return _map_rows(lambda xc: layer(xc, m, brow), (x,), b)
    return _map_rows(lambda xc: layer(xc, m), (x,), b)
