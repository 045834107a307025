"""Generic fused-chain Pallas kernel (ROADMAP 1 / VERDICT round-2 item 3).

One builder runs an arbitrary static chain of dense stages as ONE kernel
forward and ONE backward:

    stage i:  d_i  = y_{i-1} @ M_i (+ bias_i)
              yh_i = norm_i(d_i)            norm in {'in', 'sln', 'none'}
              a_i  = yh_i * gamma_i + beta_i   (optional affine:
                       'chan' (1,N) rows or 'sample' (B,N) AdaIN tensors)
              p_i  = a_i + y_{res_i}            (optional residual add;
                       res_i indexes an earlier chain value, 0 = chain input)
              y_i  = act_i(p_i)            act in {'relu','tanh','leaky:s','none'}

This subsumes the specialized mega-kernels (fused_in_pair,
fused_adain_res_block, fused_sln_chain, fused_mlp_chain — ops/pallas/
fused.py) and lets stage GROUPING be tuned per-site against the measured
~12 MB live-VMEM ceiling (the reverted whole-res-tail experiment,
ROADMAP 1) instead of being frozen per hand-built kernel.

Normalization formulation (same algebra as fused.py, parity-tested):

* 'in'  — InstanceNorm over l per (b, c) on the flat n = l*C + c layout.
  Matrices are pre-centered OUTSIDE (center_matrix) so d is already
  mean-subtracted; the biased variance broadcast over l is one matmul with
  the constant projector P_mu; yh = d * rsqrt(v + eps). A channel bias
  before IN is a no-op with zero grad (reference models.py:151-152) —
  disallowed here to keep the exactness obvious.
* 'sln' — the reference's custom per-sample LayerNorm (models.py:965-985):
  whole-tensor mean and UNBIASED std, yh = d_c / (std + eps) with
  d_c = y @ M_c + b_c, M_c column-mean-centered and b_c mean-centered
  outside (exact: center(y@M + b) == y@center(M) + (b - mean b)).
* 'none' — d (+ bias) passes through.

Backward saves only the pre-norm d_i per stage (plus the chain input) and
recomputes the y-chain inside the kernel; the recompute loop stashes each
stage's norm rescale so the reverse pass never re-derives it from d (one
(B,N)@(N,N) projector matmul per IN stage and one row reduction per SLN
stage saved — the hand-built kernels' exact matmul count).

Reference stage stacks this lowers: models.py:140-176 (encoder),
405-471 (decoder), 615-658 / 838-862 (heads).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iinsvae_tpu.ops.pallas.fused import (
    _EPS,
    _interpret,
    _ld,
    _pmu_np,
    _vmem,
    center_matrix,
)

# Live-VMEM budget per grid step; chains whose whole-batch working set
# exceeds this run on a sample-aligned batch grid (weight grads accumulate
# across the sequential grid steps). The measured sweet spot is ~10-12 MB
# (ROADMAP 1 — the 26 MB whole-res-tail experiment regressed 13%).
_VMEM_BUDGET = 12 * 2**20


class Stage(NamedTuple):
    """Static per-stage spec (hashable — part of the kernel cache key)."""

    n: int                     # output width N = l_out * c_out
    norm: str = "none"         # 'in' | 'sln' | 'none'
    act: str = "none"          # 'relu' | 'tanh' | 'leaky:<slope>' | 'none'
    l_out: int = 0             # required for norm='in' (P_mu shape)
    c_out: int = 0
    bias: bool = False         # expects a (1, N) bias row input
    affine: str = "none"       # 'none' | 'chan' (1,N) | 'sample' (B,N)
    res_from: Optional[int] = None  # add y_j (0 = chain input) before act


def _act(p, act):
    if act == "relu":
        return jnp.maximum(p, 0.0)
    if act == "tanh":
        return jnp.tanh(p)
    if act.startswith("leaky:"):
        s = float(act.split(":")[1])
        return jnp.where(p > 0, p, s * p)
    return p


def _act_grad(g, p, act):
    """dL/dp given dL/dy and the PRE-act value p."""
    if act == "relu":
        return jnp.where(p > 0, g, 0.0)
    if act == "tanh":
        t = jnp.tanh(p)
        return g * (1.0 - t * t)
    if act.startswith("leaky:"):
        s = float(act.split(":")[1])
        return jnp.where(p > 0, g, s * g)
    return g


def _norm_fwd(d, st, pmu):
    """d -> (yh, aux); aux is what backward needs to skip recomputing the
    rescale: r for 'in', (t, s) for 'sln', None for 'none'."""
    if st.norm == "in":
        v = jnp.dot(d * d, pmu, preferred_element_type=jnp.float32)
        r = jax.lax.rsqrt(v + _EPS)
        return d * r, r
    if st.norm == "sln":
        ss = jnp.sum(d * d, axis=1, keepdims=True) / (st.n - 1)
        s = jnp.sqrt(ss)
        t = 1.0 / (s + _EPS)
        return d * t, (t, s)
    return d, None


def _norm_bwd(gyh, d, st, pmu, aux=None):
    """dL/dd given dL/dyh. aux: the rescale stashed by _norm_fwd during the
    backward's recompute loop — reusing it saves one (B,N)@(N,N) projector
    matmul per IN stage and one row reduction per SLN stage (the ~5% gap
    vs the hand-built kernels, BASELINE.md round-3 log). Recomputed from d
    when not given."""
    if st.norm == "in":
        if aux is None:
            v = jnp.dot(d * d, pmu, preferred_element_type=jnp.float32)
            aux = jax.lax.rsqrt(v + _EPS)
        r = aux
        a = gyh * d * (r * r * r)
        return r * gyh - d * jnp.dot(a, pmu, preferred_element_type=jnp.float32)
    if st.norm == "sln":
        if aux is None:
            ss = jnp.sum(d * d, axis=1, keepdims=True) / (st.n - 1)
            s = jnp.sqrt(ss)
            t = 1.0 / (s + _EPS)
        else:
            t, s = aux
        gt = jnp.sum(gyh * d, axis=1, keepdims=True)
        gss = gt * (-(t * t)) / (2.0 * s)
        return gyh * t + d * (2.0 * gss / (st.n - 1))
    return gyh


def _stage_refs(stages: Sequence[Stage]):
    """Input-ref layout shared by fwd/bwd: per stage
    [m, bias?, gamma?, beta?] then pmu tail (one per distinct in-(l,c))."""
    counts = []
    for st in stages:
        c = 1 + (1 if st.bias else 0) + (2 if st.affine != "none" else 0)
        counts.append(c)
    pmus = sorted({(st.l_out, st.c_out) for st in stages if st.norm == "in"})
    return counts, pmus


def _chain_fwd_kernel(stages, pmus, refs):
    k = len(stages)
    counts, pmu_keys = _stage_refs(stages)
    n_in = sum(counts)
    x_ref = refs[0]
    stage_refs = refs[1 : 1 + n_in]
    pmu_refs = refs[1 + n_in : 1 + n_in + len(pmu_keys)]
    out_ref = refs[1 + n_in + len(pmu_keys)]
    d_refs = refs[2 + n_in + len(pmu_keys) :]
    pmu_map = {key: _ld(r) for key, r in zip(pmu_keys, pmu_refs)}

    ys = [_ld(x_ref)]
    o = 0
    for i, st in enumerate(stages):
        m = _ld(stage_refs[o]); o += 1
        d = jnp.dot(ys[-1], m, preferred_element_type=jnp.float32)
        if st.bias:
            d = d + _ld(stage_refs[o]); o += 1
        d_refs[i][:] = d.astype(d_refs[i].dtype)
        yh, _ = _norm_fwd(d, st, pmu_map.get((st.l_out, st.c_out)))
        if st.affine != "none":
            yh = yh * _ld(stage_refs[o]) + _ld(stage_refs[o + 1]); o += 2
        if st.res_from is not None:
            yh = yh + ys[st.res_from]
        ys.append(_act(yh, st.act))
    out_ref[:] = ys[-1].astype(out_ref.dtype)


def _chain_bwd_kernel(stages, pmus, refs):
    k = len(stages)
    counts, pmu_keys = _stage_refs(stages)
    n_in = sum(counts)
    g_ref = refs[0]
    x_ref = refs[1]
    d_refs = refs[2 : 2 + k]
    stage_refs = refs[2 + k : 2 + k + n_in]
    pmu_refs = refs[2 + k + n_in : 2 + k + n_in + len(pmu_keys)]
    grad_refs = refs[2 + k + n_in + len(pmu_keys) :]
    pmu_map = {key: _ld(r) for key, r in zip(pmu_keys, pmu_refs)}

    # weight/bias/chan-affine grads accumulate across the (sequential)
    # batch grid; zero them on the first step
    acc_slots = []
    for i, st in enumerate(stages):
        base = _grad_base(stages, i)
        acc_slots.append(base + 0)
        if st.bias:
            acc_slots.append(base + _gi(st, "bias"))
        if st.affine == "chan":
            acc_slots.append(base + _gi(st, "gamma"))
            acc_slots.append(base + _gi(st, "beta"))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for s in acc_slots:
            grad_refs[s][:] = jnp.zeros_like(grad_refs[s])

    # recompute the y-chain, stashing each stage's pre-act p, affine gamma,
    # and the norm rescale aux — the reverse pass reuses the aux instead of
    # re-deriving the rescale from d (one projector matmul per IN stage /
    # one row reduction per SLN stage saved; the hand-built kernels'
    # residency policy, BASELINE.md round-3 log)
    ys = [_ld(x_ref)]
    ps, affs, auxs = [], [], []
    o = 0
    offs = []  # per-stage ref offsets (m, bias, gamma, beta)
    for st in stages:
        offs.append(o)
        o += 1 + (1 if st.bias else 0) + (2 if st.affine != "none" else 0)
    for i, st in enumerate(stages):
        d = _ld(d_refs[i])
        yh, aux = _norm_fwd(d, st, pmu_map.get((st.l_out, st.c_out)))
        auxs.append(aux)
        oo = offs[i] + 1 + (1 if st.bias else 0)
        if st.affine != "none":
            g_aff, b_aff = _ld(stage_refs[oo]), _ld(stage_refs[oo + 1])
            affs.append(g_aff)
            yh = yh * g_aff + b_aff
        else:
            affs.append(None)
        if st.res_from is not None:
            yh = yh + ys[st.res_from]
        ps.append(yh)
        ys.append(_act(yh, st.act))

    # reverse pass; pending[j] accumulates dL/d ys[j] from residual forks
    pending = [None] * (k + 1)
    pending[k] = _ld(g_ref)
    go = 0  # grad-ref cursor
    # grad ref layout mirrors the stage-ref layout, then dx LAST
    for i in range(k - 1, -1, -1):
        st = stages[i]
        g = pending[i + 1]
        gp = _act_grad(g, ps[i], st.act)
        if st.res_from is not None:
            j = st.res_from
            pending[j] = gp if pending[j] is None else pending[j] + gp
        gyh = gp
        oo = offs[i] + 1 + (1 if st.bias else 0)
        base = _grad_base(stages, i)
        if st.affine != "none":
            # pre-affine normalized value, elementwise from the stashed
            # rescale — no projector matmul
            d = _ld(d_refs[i])
            if st.norm == "in":
                yh_n = d * auxs[i]
            elif st.norm == "sln":
                yh_n = d * auxs[i][0]
            else:
                yh_n = d
            if st.affine == "chan":
                grad_refs[base + _gi(st, "gamma")][:] += jnp.sum(
                    gyh * yh_n, axis=0, keepdims=True
                ).astype(grad_refs[base + _gi(st, "gamma")].dtype)
                grad_refs[base + _gi(st, "beta")][:] += jnp.sum(
                    gyh, axis=0, keepdims=True
                ).astype(grad_refs[base + _gi(st, "beta")].dtype)
            else:  # 'sample'
                grad_refs[base + _gi(st, "gamma")][:] = (gyh * yh_n).astype(
                    grad_refs[base + _gi(st, "gamma")].dtype
                )
                grad_refs[base + _gi(st, "beta")][:] = gyh.astype(
                    grad_refs[base + _gi(st, "beta")].dtype
                )
            gyh = gyh * affs[i]
        gd = _norm_bwd(gyh, _ld(d_refs[i]), st,
                       pmu_map.get((st.l_out, st.c_out)), aux=auxs[i])
        if st.bias:
            grad_refs[base + _gi(st, "bias")][:] += jnp.sum(
                gd, axis=0, keepdims=True
            ).astype(grad_refs[base + _gi(st, "bias")].dtype)
        m = _ld(stage_refs[offs[i]])
        grad_refs[base + 0][:] += jnp.dot(
            ys[i].T, gd, preferred_element_type=jnp.float32
        ).astype(grad_refs[base + 0].dtype)
        gy_prev = jnp.dot(gd, m.T, preferred_element_type=jnp.float32)
        pending[i] = gy_prev if pending[i] is None else pending[i] + gy_prev
    grad_refs[_grad_base(stages, k)][:] = pending[0].astype(
        grad_refs[_grad_base(stages, k)].dtype
    )


def _gi(st: Stage, which: str) -> int:
    """Offset of a grad slot within a stage's grad group (after dm at 0)."""
    if which == "bias":
        return 1
    if which == "gamma":
        return 1 + (1 if st.bias else 0)
    if which == "beta":
        return 2 + (1 if st.bias else 0)
    raise KeyError(which)


def _grad_base(stages: Sequence[Stage], i: int) -> int:
    """Start index of stage i's grad group (i == len(stages) -> dx slot)."""
    base = 0
    for st in stages[:i]:
        base += 1 + (1 if st.bias else 0) + (2 if st.affine != "none" else 0)
    return base


def _chain_chunk(b: int, stages: Sequence[Stage], mat_bytes: int) -> int:
    """Batch-chunk size keeping the bwd working set under _VMEM_BUDGET:
    ~(5k+4) row blocks of (chunk, n_max) f32 (the +k: the stashed norm
    rescales live across the reverse pass) plus the stage matrices twice.
    Whole batch when it fits (grid=1 — the flagship case)."""
    n_max = max(st.n for st in stages)
    k = len(stages)

    def live(c):
        return (5 * k + 4) * c * n_max * 4 + 2 * mat_bytes

    if live(b) <= _VMEM_BUDGET:
        return b
    for c in range(min(b, 512), 7, -1):
        if b % c == 0 and c % 8 == 0 and live(c) <= _VMEM_BUDGET:
            return c
    # no aligned divisor fits; fall back to whole batch and let Mosaic spill
    return b


def _row_spec(c, n):
    return pl.BlockSpec((c, n), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _make_chain_layer(stages: Tuple[Stage, ...]):
    counts, pmu_keys = _stage_refs(stages)
    n_in = sum(counts)
    k = len(stages)

    def _stage_in_specs(c, flat):
        """BlockSpecs for the per-stage input refs (m, bias?, gamma?, beta?):
        'sample' affines are batch rows; everything else is a full block."""
        specs, o = [], 0
        for st, cnt in zip(stages, counts):
            specs.append(_full_spec(flat[o].shape))  # m
            o += 1
            if st.bias:
                specs.append(_full_spec(flat[o].shape))
                o += 1
            if st.affine != "none":
                for _ in range(2):
                    if st.affine == "sample":
                        specs.append(_row_spec(c, flat[o].shape[1]))
                    else:
                        specs.append(_full_spec(flat[o].shape))
                    o += 1
        return specs

    def fwd_call(x, flat):
        b = x.shape[0]
        mat_bytes = sum(int(np.prod(f.shape)) * 4 for f in flat)
        c = _chain_chunk(b, stages, mat_bytes)
        grid = (b // c,) if b % c == 0 else (1,)
        if grid == (1,):
            c = b
        pmus = tuple(jnp.asarray(_pmu_np(l, cc)) for (l, cc) in pmu_keys)
        out_shape = (
            [jax.ShapeDtypeStruct((b, stages[-1].n), x.dtype)]
            + [jax.ShapeDtypeStruct((b, st.n), x.dtype) for st in stages]
        )
        in_specs = (
            [_row_spec(c, x.shape[1])]
            + _stage_in_specs(c, flat)
            + [_full_spec(p.shape) for p in pmus]
        )
        out_specs = [_row_spec(c, stages[-1].n)] + [
            _row_spec(c, st.n) for st in stages
        ]
        res = pl.pallas_call(
            lambda *refs: _chain_fwd_kernel(stages, pmu_keys, refs),
            grid=grid,
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=_interpret(),
        )(x, *flat, *pmus)
        return res[0], res[1:]

    def bwd_call(g, x, ds, flat):
        b = x.shape[0]
        mat_bytes = sum(int(np.prod(f.shape)) * 4 for f in flat)
        c = _chain_chunk(b, stages, mat_bytes)
        grid = (b // c,) if b % c == 0 else (1,)
        if grid == (1,):
            c = b
        pmus = tuple(jnp.asarray(_pmu_np(l, cc)) for (l, cc) in pmu_keys)
        out_shape, out_specs = [], []
        o = 0
        for st, cnt in zip(stages, counts):
            out_shape.append(jax.ShapeDtypeStruct(flat[o].shape, flat[o].dtype))
            out_specs.append(_full_spec(flat[o].shape))  # dm (accumulated)
            o += 1
            if st.bias:
                out_shape.append(jax.ShapeDtypeStruct(flat[o].shape, flat[o].dtype))
                out_specs.append(_full_spec(flat[o].shape))
                o += 1
            if st.affine != "none":
                for _ in range(2):
                    out_shape.append(
                        jax.ShapeDtypeStruct(flat[o].shape, flat[o].dtype)
                    )
                    if st.affine == "sample":
                        out_specs.append(_row_spec(c, flat[o].shape[1]))
                    else:
                        out_specs.append(_full_spec(flat[o].shape))
                    o += 1
        out_shape.append(jax.ShapeDtypeStruct(x.shape, x.dtype))  # dx last
        out_specs.append(_row_spec(c, x.shape[1]))
        in_specs = (
            [_row_spec(c, g.shape[1]), _row_spec(c, x.shape[1])]
            + [_row_spec(c, st.n) for st in stages]
            + _stage_in_specs(c, flat)
            + [_full_spec(p.shape) for p in pmus]
        )
        res = pl.pallas_call(
            lambda *refs: _chain_bwd_kernel(stages, pmu_keys, refs),
            grid=grid,
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=_interpret(),
        )(g, x, *ds, *flat, *pmus)
        return res

    @jax.custom_vjp
    def layer(x, *flat):
        return fwd_call(x, flat)[0]

    def layer_fwd(x, *flat):
        out, ds = fwd_call(x, flat)
        return out, (x, tuple(ds), tuple(flat))

    def layer_bwd(saved, g):
        x, ds, flat = saved
        res = bwd_call(g, x, ds, flat)
        return (res[-1],) + tuple(res[:-1])

    layer.defvjp(layer_fwd, layer_bwd)
    return layer


def _group(flat, counts):
    out, o = [], 0
    for c in counts:
        out.append(flat[o : o + c])
        o += c
    return out


def run_plan(x, descs: Sequence[Tuple[Stage, dict]], plan: Sequence[int]):
    """Run a full stage stack as consecutive fused_chain groups.

    descs: (Stage, inputs) pairs with ABSOLUTE res_from indices (ys index in
    the conceptual full chain: 0 = x, i = output of stage i). plan: group
    sizes summing to len(descs); a group boundary must not split a residual
    skip. This is the tunable knob of ROADMAP 1 — the grouping is measured
    per-site (benchmarks/chain_probe.py) against the ~12 MB live-VMEM
    ceiling rather than frozen into hand-built kernels."""
    assert sum(plan) == len(descs), (plan, len(descs))
    y, o = x, 0
    for gsize in plan:
        stages, ins = [], []
        for st, inp in descs[o : o + gsize]:
            rf = st.res_from
            if rf is not None:
                rf = rf - o
                assert rf >= 0, f"plan {plan} splits a residual skip at {o}"
            stages.append(st._replace(res_from=rf))
            ins.append(inp)
        y = fused_chain(y, tuple(stages), ins)
        o += gsize
    return y


def fused_chain(x, stages: Sequence[Stage], inputs: Sequence[dict]):
    """Run the chain as one kernel each way.

    x: (B, K) flat input. stages: static Stage specs. inputs[i]: dict with
      'm'     (K_i, N_i) dense stage matrix — centered here per norm unless
              'centered': True (e.g. dense_conv_matrix(centered=True) folds
              the IN centering into the constant selector for free),
      'bias'  (1, N_i) if stages[i].bias (centered here for 'sln'),
      'gamma'/'beta' per stages[i].affine ('chan': (1, N_i);
              'sample': (B, N_i)).
    """
    stages = tuple(stages)
    flat = []
    for st, inp in zip(stages, inputs):
        m = inp["m"]
        if st.norm == "in":
            assert not st.bias, "bias before IN is a no-op (zero grad)"
            if not inp.get("centered", False):
                m = center_matrix(m, st.l_out, st.c_out)
        elif st.norm == "sln":
            if not inp.get("centered", False):
                m = m - jnp.mean(m, axis=1, keepdims=True)
        flat.append(m)
        if st.bias:
            b = inp["bias"].reshape(1, -1)
            if st.norm == "sln":
                bf = b.astype(jnp.float32)
                b = (bf - jnp.mean(bf)).astype(x.dtype)
            flat.append(b)
        if st.affine != "none":
            flat.append(inp["gamma"])
            flat.append(inp["beta"])
    return _make_chain_layer(stages)(x, *flat)
