"""Fused DeepONet merge + Gaussian-NLL reduction as a Pallas TPU kernel.

The VI-HMC log-likelihood's hot path is

    pred = branch_out @ trunk_out.T + bias        # (B, P) — e.g. 1000 x 10201
    ll   = -sum 0.5 * (log tau + (pred - y)^2 / tau)

The (B, P) prediction matrix (~40 MB fp32 at reference scale) is consumed
immediately by the reduction; this kernel computes the matmul tile-by-tile on
the MXU and reduces in VMEM without ever writing ``pred`` to HBM
(8x the gradient-path throughput of the composed XLA graph on v5e).

Scalar-bias trick: to stay vmap-batchable (a batched SMEM scalar is not
lowerable on TPU), the kernel takes NO bias input. It accumulates

    S1 = sum(m^2 - 2 m y)    and    S2 = sum(m)       with m = bout @ tout.T

over the tile grid, and the host closes the algebra exactly:

    SSE = S1 + sum(y^2) + 2 b (S2 - sum(y)) + N b^2
    ll  = -0.5 (N log var + SSE / var)

Padding to the (256, 256) tile grid pads y with zeros, so padded cells
contribute nothing to either accumulator (m == 0 there).

The backward pass (custom VJP) rematerializes ``pred`` with standard matmuls,
so the op is fully differentiable inside the leapfrog. A jnp reference
implementation (same math, materialized) is used off-TPU and for verification.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # pallas imports only required when the kernel path actually runs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

_TILE_B = 256
_TILE_P = 256
_GNLL_EPS = 1e-6


def merge_nll_reference(bout, tout, bias, y, tau):
    """Materialized reference: -sum gaussian_nll(bout @ tout.T + bias, y, tau)."""
    pred = bout @ tout.T + bias
    var = jnp.maximum(tau, _GNLL_EPS)
    return -jnp.sum(0.5 * (jnp.log(var) + (pred - y) ** 2 / var))


def _sums_kernel(bout_ref, tout_ref, y_ref, s1_ref, s2_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        s1_ref[0, 0] = jnp.zeros((), jnp.float32)
        s2_ref[0, 0] = jnp.zeros((), jnp.float32)

    m = jnp.dot(bout_ref[:], tout_ref[:].T, preferred_element_type=jnp.float32)
    y = y_ref[:]
    s1_ref[0, 0] += jnp.sum(m * (m - 2.0 * y))
    s2_ref[0, 0] += jnp.sum(m)


def _merge_sums_pallas(bout, tout, y, interpret):
    """(S1, S2) accumulated over the (B//TB, P//TP) tile grid."""
    b, k = bout.shape
    p = tout.shape[0]
    grid = (b // _TILE_B, p // _TILE_P)
    out_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    s1, s2 = pl.pallas_call(
        _sums_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_B, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_P, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, _TILE_P), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        interpret=interpret,
    )(bout, tout, y)
    return s1[0, 0], s2[0, 0]


def _batched_sums_kernel(bout_ref, tout_ref, y_ref, s1_ref, s2_ref):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        s1_ref[0, 0, 0] = jnp.zeros((), jnp.float32)
        s2_ref[0, 0, 0] = jnp.zeros((), jnp.float32)

    m = jnp.dot(bout_ref[0], tout_ref[0].T, preferred_element_type=jnp.float32)
    y = y_ref[:]
    s1_ref[0, 0, 0] += jnp.sum(m * (m - 2.0 * y))
    s2_ref[0, 0, 0] += jnp.sum(m)


def _merge_sums_pallas_batched(bout, tout, y, interpret):
    """Chain-batched sums: bout (C,B,K), tout (C,P,K), y (B,P) -> ((C,), (C,)).

    The chain axis is the outermost grid dimension — the whole batch runs in
    ONE kernel launch with per-chain accumulators, instead of vmap serializing
    C separate launches.
    """
    c, b, k = bout.shape
    p = tout.shape[1]
    grid = (c, b // _TILE_B, p // _TILE_P)
    out_spec = pl.BlockSpec((1, 1, 1), lambda ci, i, j: (ci, 0, 0),
                            memory_space=pltpu.SMEM)
    s1, s2 = pl.pallas_call(
        _batched_sums_kernel,
        out_shape=[jax.ShapeDtypeStruct((c, 1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((c, 1, 1), jnp.float32)],
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_B, k), lambda ci, i, j: (ci, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_P, k), lambda ci, i, j: (ci, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, _TILE_P), lambda ci, i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec],
        interpret=interpret,
    )(bout, tout, y)
    return s1[:, 0, 0], s2[:, 0, 0]


def _make_merge_sums(interpret: bool):
    """merge-sums with a custom vmap rule dispatching to the batched kernel.

    ``vmap(grad(fused_merge_nll))`` — the multi-chain sampler's pattern —
    decomposes the custom VJP into fwd/bwd; the fwd's merge-sums call then
    hits this rule and the whole chain batch runs as one kernel.
    """
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def merge_sums(bout, tout, y):
        return _merge_sums_pallas(bout, tout, y, interpret)

    @merge_sums.def_vmap
    def _rule(axis_size, in_batched, bout, tout, y):
        b_b, t_b, y_b = in_batched
        if (not y_b) and b_b and t_b:
            s1, s2 = _merge_sums_pallas_batched(bout, tout, y, interpret)
        else:
            # general case: materialize the batch and loop (rare in practice)
            def one(args):
                bo, to, yy = args
                return _merge_sums_pallas(bo, to, yy, interpret)

            bo = bout if b_b else jnp.broadcast_to(bout, (axis_size,) + bout.shape)
            to = tout if t_b else jnp.broadcast_to(tout, (axis_size,) + tout.shape)
            yy = y if y_b else jnp.broadcast_to(y, (axis_size,) + y.shape)
            s1, s2 = jax.lax.map(one, (bo, to, yy))
        return (s1, s2), (True, True)

    return merge_sums


_merge_sums_compiled = _make_merge_sums(False)
_merge_sums_interpret = _make_merge_sums(True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_nll_call(bout, tout, bias, y, tau, n_valid, interpret):
    # bout/tout/y are already tile-padded; y padding is zeros. sum(y)/sum(y^2)
    # include only real cells (padding contributes zero to both).
    merge_sums = _merge_sums_interpret if interpret else _merge_sums_compiled
    s1, s2 = merge_sums(bout, tout, y)
    sum_y = jnp.sum(y)
    sum_y2 = jnp.sum(y * y)
    sse = s1 + sum_y2 + 2.0 * bias * (s2 - sum_y) + n_valid * bias * bias
    var = max(tau, _GNLL_EPS)
    return -0.5 * (n_valid * math.log(var) + sse / var)


def _fwd(bout, tout, bias, y, tau, n_valid, interpret):
    out = _fused_nll_call(bout, tout, bias, y, tau, n_valid, interpret)
    return out, (bout, tout, bias, y)


def _bwd(tau, n_valid, interpret, res, ct):
    bout, tout, bias, y = res
    var = max(tau, _GNLL_EPS)
    # d ll / d pred = -(pred - y) / var ; rematerialize pred via matmul.
    # Padded cells have pred = bias, y = 0 -> nonzero dpred there, BUT their
    # gradient contributions cancel exactly only for bout/tout rows that are
    # themselves padding (sliced off by the wrapper). For the bias gradient
    # the padded cells must be excluded explicitly.
    pred = bout @ tout.T + bias
    dpred = ct * (-(pred - y) / var)
    g_bout = dpred @ tout
    g_tout = dpred.T @ bout
    # bias gradient from the closed form: d sse/d bias = 2 (S2 - sum_y) + 2 N b,
    # with S2 = sum(m) = sum(pred - bias) computed elementwise (avoids the
    # catastrophic cancellation of sum(pred) - size*bias over large grids)
    s2 = jnp.sum(pred - bias)
    g_bias = ct * (-(s2 - jnp.sum(y) + n_valid * bias) / var)
    g_y = -dpred
    return g_bout, g_tout, g_bias, g_y


_fused_nll_call.defvjp(_fwd, _bwd)


def fused_merge_nll(bout, tout, bias, y, tau, interpret: bool = False):
    """-sum gaussian_nll(bout @ tout.T + bias, y, tau), Pallas on TPU.

    Arbitrary shapes are zero-padded to the (256, 256) tile grid (the latent
    dim is used whole per tile). Off-TPU the jnp reference path is used
    (still a single XLA fusion). Fully vmap-batchable (no scalar operands
    reach the kernel).
    """
    b, k = bout.shape
    p = tout.shape[0]
    if not (jax.default_backend() == "tpu" or interpret):
        return merge_nll_reference(bout, tout, bias, y, tau)

    pb, pp = (-b) % _TILE_B, (-p) % _TILE_P
    if pb:
        bout = jnp.pad(bout, ((0, pb), (0, 0)))
    if pp:
        tout = jnp.pad(tout, ((0, pp), (0, 0)))
    if pb or pp:
        y = jnp.pad(y, ((0, pb), (0, pp)))
    return _fused_nll_call(bout, tout, bias, y, float(tau), b * p, interpret)


# ---------------------------------------------------------------------------
# Fused PAIRED MH log-density difference (round 5)
#
# The draw-policy headline's largest per-draw cost is the paired f32 density
# evaluation (hmc delta_fn): TWO full-grid forwards whose (B, P) prediction
# matrices round-trip HBM just to be differenced and reduced. This kernel
# computes both merges tile-by-tile and reduces the PAIRED small-term form
#
#     D  = sum dm * (sm - 2 y)        dm = m1 - m0  (small: q1 is one
#     Bd = sum dm                                    trajectory from q0)
#     Sm = sum sm                     sm = m1 + m0
#     Q1 = sum m1^2,  C1 = sum m1*y   (lp1 record only — never enters MH)
#
# in VMEM, never writing either prediction to HBM. The MH-critical
# accumulators (D, Bd) sum SMALL per-element differences — the same
# cancellation-free structure as the composed paired evaluator
# (pipelines/common.py make_paired_subspace_delta); the big separately-
# accumulated sums (Sm, Q1, C1) enter the closure only multiplied by the
# tiny bias difference, or in the lp1 record which no MH decision reads.
# Host closes the bias algebra exactly (scalar-bias trick, see module
# docstring). Forward-only: delta_fn sits outside the leapfrog, so no VJP
# is needed.
# ---------------------------------------------------------------------------


def paired_delta_reference(bout1, tout1, b1, bout0, tout0, b0, y, tau):
    """Materialized reference of the paired delta: (dll, lp1_record)."""
    var = jnp.maximum(tau, _GNLL_EPS)
    p1 = bout1 @ tout1.T + b1
    p0 = bout0 @ tout0.T + b0
    e1, e0 = p1 - y, p0 - y
    dll = (-0.5 / var) * jnp.sum((e1 - e0) * (e1 + e0))
    lp1 = -0.5 * jnp.sum(jnp.log(var) + e1 * e1 / var)
    return dll, lp1


def _paired_kernel(b1_ref, t1_ref, b0_ref, t0_ref, y_ref,
                   d_ref, bd_ref, sm_ref, q1_ref, c1_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        for r in (d_ref, bd_ref, sm_ref, q1_ref, c1_ref):
            r[0, 0] = jnp.zeros((), jnp.float32)

    # f32-precision merges (HIGHEST = the same multi-pass f32 datapath the
    # composed density runs under jax.default_matmul_precision('float32');
    # bf16 single-pass would put O(1e-2)-relative noise into dm and revive
    # the acceptance ceiling the paired form exists to kill)
    m1 = jnp.dot(b1_ref[:], t1_ref[:].T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    m0 = jnp.dot(b0_ref[:], t0_ref[:].T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    y = y_ref[:]
    dm = m1 - m0
    sm = m1 + m0
    d_ref[0, 0] += jnp.sum(dm * (sm - 2.0 * y))
    bd_ref[0, 0] += jnp.sum(dm)
    sm_ref[0, 0] += jnp.sum(sm)
    q1_ref[0, 0] += jnp.sum(m1 * m1)
    c1_ref[0, 0] += jnp.sum(m1 * y)


def _paired_sums_pallas(bout1, tout1, bout0, tout0, y, interpret):
    b, k = bout1.shape
    p = tout1.shape[0]
    grid = (b // _TILE_B, p // _TILE_P)
    out_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        _paired_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_B, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_P, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_P, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, _TILE_P), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 5,
        interpret=interpret,
    )(bout1, tout1, bout0, tout0, y)
    return tuple(o[0, 0] for o in outs)


def _paired_batched_kernel(b1_ref, t1_ref, b0_ref, t0_ref, y_ref,
                           d_ref, bd_ref, sm_ref, q1_ref, c1_ref):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when((i == 0) & (j == 0))
    def _():
        for r in (d_ref, bd_ref, sm_ref, q1_ref, c1_ref):
            r[0, 0, 0] = jnp.zeros((), jnp.float32)

    m1 = jnp.dot(b1_ref[0], t1_ref[0].T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    m0 = jnp.dot(b0_ref[0], t0_ref[0].T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    y = y_ref[:]
    dm = m1 - m0
    sm = m1 + m0
    d_ref[0, 0, 0] += jnp.sum(dm * (sm - 2.0 * y))
    bd_ref[0, 0, 0] += jnp.sum(dm)
    sm_ref[0, 0, 0] += jnp.sum(sm)
    q1_ref[0, 0, 0] += jnp.sum(m1 * m1)
    c1_ref[0, 0, 0] += jnp.sum(m1 * y)


def _paired_sums_pallas_batched(bout1, tout1, bout0, tout0, y, interpret):
    """Chain-batched paired sums: (C,B,K)/(C,P,K) features, shared y."""
    c, b, k = bout1.shape
    p = tout1.shape[1]
    grid = (c, b // _TILE_B, p // _TILE_P)
    out_spec = pl.BlockSpec((1, 1, 1), lambda ci, i, j: (ci, 0, 0),
                            memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        _paired_batched_kernel,
        out_shape=[jax.ShapeDtypeStruct((c, 1, 1), jnp.float32)] * 5,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_B, k), lambda ci, i, j: (ci, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_P, k), lambda ci, i, j: (ci, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_B, k), lambda ci, i, j: (ci, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_P, k), lambda ci, i, j: (ci, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, _TILE_P), lambda ci, i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * 5,
        interpret=interpret,
    )(bout1, tout1, bout0, tout0, y)
    return tuple(o[:, 0, 0] for o in outs)


def _make_paired_sums(interpret: bool):
    """paired-sums with a custom vmap rule (multi-chain: one kernel launch)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def paired_sums(bout1, tout1, bout0, tout0, y):
        return _paired_sums_pallas(bout1, tout1, bout0, tout0, y, interpret)

    @paired_sums.def_vmap
    def _rule(axis_size, in_batched, bout1, tout1, bout0, tout0, y):
        b1_b, t1_b, b0_b, t0_b, y_b = in_batched
        if (not y_b) and b1_b and t1_b and b0_b and t0_b:
            outs = _paired_sums_pallas_batched(bout1, tout1, bout0, tout0, y,
                                               interpret)
        else:
            def one(args):
                return _paired_sums_pallas(*args, interpret)

            bc = lambda x, xb: (x if xb else
                                jnp.broadcast_to(x, (axis_size,) + x.shape))
            outs = jax.lax.map(one, (bc(bout1, b1_b), bc(tout1, t1_b),
                                     bc(bout0, b0_b), bc(tout0, t0_b),
                                     bc(y, y_b)))
        return outs, (True,) * 5

    return paired_sums


_paired_sums_compiled = _make_paired_sums(False)
_paired_sums_interpret = _make_paired_sums(True)


def fused_paired_delta(bout1, tout1, bias1, bout0, tout0, bias0, y, tau,
                       interpret: bool = False):
    """Paired MH delta ``(ll(q1) - ll(q0), ll(q1)_record)`` without ever
    materializing either (B, P) prediction (Pallas on TPU; composed
    reference elsewhere). Shapes zero-padded to the (256, 256) tile grid;
    the host closes the scalar-bias algebra exactly over ``n_valid`` real
    cells, so padding contributes nothing."""
    b, k = bout1.shape
    p = tout1.shape[0]
    if not (jax.default_backend() == "tpu" or interpret):
        return paired_delta_reference(bout1, tout1, bias1, bout0, tout0,
                                      bias0, y, tau)
    pb, pp = (-b) % _TILE_B, (-p) % _TILE_P
    if pb:
        bout1 = jnp.pad(bout1, ((0, pb), (0, 0)))
        bout0 = jnp.pad(bout0, ((0, pb), (0, 0)))
    if pp:
        tout1 = jnp.pad(tout1, ((0, pp), (0, 0)))
        tout0 = jnp.pad(tout0, ((0, pp), (0, 0)))
    if pb or pp:
        y = jnp.pad(y, ((0, pb), (0, pp)))
    paired_sums = _paired_sums_interpret if interpret else _paired_sums_compiled
    d, bd, sm, q1, c1 = paired_sums(bout1, tout1, bout0, tout0, y)
    n_valid = b * p
    var = max(float(tau), _GNLL_EPS)
    sum_y = jnp.sum(y)
    sum_y2 = jnp.sum(y * y)
    db = bias1 - bias0
    sb = bias1 + bias0
    # sum (e1-e0)(e1+e0) with e_i = m_i + b_i - y, expanded so every
    # MH-critical accumulator sums small terms (module comment above)
    core = d + sb * bd + db * (sm - 2.0 * sum_y) + db * sb * n_valid
    dll = (-0.5 / var) * core
    b1s = 0.5 * (sm + bd)  # sum(m1) = (Sm + Bd)/2
    sum_e1sq = (q1 + 2.0 * bias1 * b1s - 2.0 * c1 + n_valid * bias1 * bias1
                - 2.0 * bias1 * sum_y + sum_y2)
    lp1 = -0.5 * (n_valid * math.log(var) + sum_e1sq / var)
    return dll, lp1
