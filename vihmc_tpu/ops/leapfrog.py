"""Fused leapfrog half-kick + drift as a Pallas TPU kernel.

One leapfrog step touches the flat vectors (q, p, g) several times in the
naive formulation; for full-parameter HMC over big models the update is
HBM-bandwidth bound. This kernel fuses

    p_half = p + 0.5 * eps * g
    q_new  = q + eps * inv_mass * p_half

into a single pass over VMEM-resident tiles. XLA usually fuses these too; the
kernel exists for the cases where the surrounding graph breaks the fusion
(e.g. donated buffers across scan boundaries) and as the building block for a
fully-fused multi-step trajectory. A jnp reference implementation is used
automatically off-TPU.

Layout: the flat (D,) vector is viewed as (rows, 128) fp32 tiles (lane dim
128, sublane multiple of 8 — the TPU native tiling) and the grid sweeps row
blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANES = 128
_ROWS = 256  # rows per grid step: (256, 128) fp32 blocks = 128 KiB per operand


def leapfrog_update_reference(q, p, g, eps, inv_mass):
    """Pure-jnp fallback: (q_new, p_half)."""
    p_half = p + 0.5 * eps * g
    q_new = q + eps * inv_mass * p_half
    return q_new, p_half


def _kernel(eps_ref, qref, pref, gref, im_ref, qout, pout):
    eps = eps_ref[0]
    p_half = pref[:] + 0.5 * eps * gref[:]
    qout[:] = qref[:] + eps * im_ref[:] * p_half
    pout[:] = p_half


def _fused_tpu(q, p, g, eps, inv_mass, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = q.shape[0]
    block = _ROWS * _LANES
    pad = (-d) % block
    def prep(x):
        if pad:
            x = jnp.pad(x, (0, pad))
        return x.reshape(-1, _LANES)

    q2, p2, g2, im2 = prep(q), prep(p), prep(g), prep(inv_mass)
    n = q2.shape[0] // _ROWS
    eps_arr = jnp.asarray(eps, jnp.float32).reshape(1)

    spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    q_new, p_half = pl.pallas_call(
        _kernel,
        out_shape=[jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                   jax.ShapeDtypeStruct(p2.shape, p2.dtype)],
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec, spec, spec, spec],
        out_specs=[spec, spec],
        interpret=interpret,
    )(eps_arr, q2, p2, g2, im2)
    return q_new.reshape(-1)[:d], p_half.reshape(-1)[:d]


def fused_leapfrog_update(q, p, g, eps, inv_mass=None, force_pallas: bool = False,
                          interpret: bool = False):
    """(q_new, p_half) with the Pallas kernel on TPU, jnp elsewhere."""
    if inv_mass is None or jnp.ndim(inv_mass) == 0:
        inv_mass = jnp.full_like(q, 1.0 if inv_mass is None else inv_mass)
    if force_pallas or interpret or jax.default_backend() == "tpu":
        return _fused_tpu(q, p, g, eps, inv_mass, interpret=interpret)
    return leapfrog_update_reference(q, p, g, eps, inv_mass)
