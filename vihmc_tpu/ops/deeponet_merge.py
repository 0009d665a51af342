"""Fused DeepONet merge + Gaussian-NLL reduction as a Pallas TPU kernel.

The VI-HMC log-likelihood's hot path is

    pred = branch_out @ trunk_out.T + bias        # (B, P) — e.g. 1000 x 10201
    ll   = -sum 0.5 * (log tau + (pred - y)^2 / tau)

The (B, P) prediction matrix (~40 MB fp32 at reference scale) is consumed
immediately by the reduction; this kernel computes the matmul tile-by-tile on
the MXU and reduces in VMEM without ever writing ``pred`` to HBM. The
backward pass (custom VJP) recomputes tiles and emits the standard matmul
gradients, so the op is fully differentiable inside the leapfrog.

A jnp reference implementation (same math, materialized) is used off-TPU and
for verification.
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


# The kernel accumulates sum((pred - y)^2); the constant term
# -0.5 * B * P * log(var) and the -1/(2 var) scale are applied on the host.
def _sse_kernel(bias_ref, bout_ref, tout_ref, y_ref, acc_ref):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), jnp.float32)

    pred = jnp.dot(bout_ref[:], tout_ref[:].T, preferred_element_type=jnp.float32)
    err = pred + bias_ref[0] - y_ref[:]
    acc_ref[0, 0] += jnp.sum(err * err)


def fused_merge_nll(bout, tout, bias, y, tau, interpret: bool = False):
    """-sum gaussian_nll(bout @ tout.T + bias, y, tau), Pallas on TPU.

    Arbitrary shapes are zero-padded to the (256, 256, 128) tiling: padded
    branch/trunk rows produce pred == bias and the targets are padded with
    ``bias`` so padded cells contribute zero squared error (their log-var
    constant is added back). Off-TPU the jnp reference path is used (still a
    single XLA fusion).
    """
    b, k = bout.shape
    p = tout.shape[0]
    if not (jax.default_backend() == "tpu" or interpret):
        return merge_nll_reference(bout, tout, bias, y, tau)

    pb, pp, pk = (-b) % _TILE_B, (-p) % _TILE_P, (-k) % 128
    if pb or pp or pk:
        bout = jnp.pad(bout, ((0, pb), (0, pk)))
        tout = jnp.pad(tout, ((0, pp), (0, pk)))
        if pp:
            y = jnp.concatenate(
                [y, jnp.broadcast_to(bias, (b, pp)).astype(y.dtype)], axis=1)
        if pb:
            y = jnp.concatenate(
                [y, jnp.broadcast_to(bias, (pb, p + pp)).astype(y.dtype)], axis=0)
    out = _fused_nll_call(bout, tout, bias, y, float(tau), interpret)
    n_pad = (b + pb) * (p + pp) - b * p
    if n_pad:
        # padded cells contributed -0.5*log(var) each; remove that constant
        out = out + 0.5 * math.log(max(float(tau), _GNLL_EPS)) * n_pad
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_nll_call(bout, tout, bias, y, tau, interpret):
    sse = _sse_pallas(bout, tout, bias, y, interpret)
    var = max(tau, _GNLL_EPS)
    n = bout.shape[0] * tout.shape[0]
    return -0.5 * (n * math.log(var) + sse / var)


def _sse_pallas(bout, tout, bias, y, interpret):
    b, k = bout.shape
    p = tout.shape[0]
    grid = (b // _TILE_B, p // _TILE_P)
    bias_arr = jnp.asarray(bias, jnp.float32).reshape(1)
    acc = pl.pallas_call(
        _sse_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE_B, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_P, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, _TILE_P), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        interpret=interpret,
    )(bias_arr, bout, tout, y)
    return acc[0, 0]


def _fwd(bout, tout, bias, y, tau, interpret):
    out = _fused_nll_call(bout, tout, bias, y, tau, interpret)
    return out, (bout, tout, bias, y)


def _bwd(tau, interpret, res, ct):
    bout, tout, bias, y = res
    var = max(tau, _GNLL_EPS)
    # d ll / d pred = -(pred - y) / var ; rematerialize pred via matmul
    pred = bout @ tout.T + bias
    dpred = ct * (-(pred - y) / var)
    g_bout = dpred @ tout
    g_tout = dpred.T @ bout
    g_bias = jnp.sum(dpred)
    g_y = -dpred
    return g_bout, g_tout, g_bias, g_y


_fused_nll_call.defvjp(_fwd, _bwd)
