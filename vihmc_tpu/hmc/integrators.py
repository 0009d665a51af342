"""Symplectic integrators as ``lax.scan`` loops.

The reference delegates integration to the external ``hamiltorch`` library
(call sites: SURVEY.md section 2.4); here the leapfrog is a compiled scan with
one gradient evaluation per step (synchronized form: two half-kicks around a
drift, with the gradient carried between steps so cost is identical to the
classic 1-grad-per-step schedule).

``split_leapfrog`` implements the data-split Hamiltonian scheme used by the
reference's split-HMC pipeline
(/root/reference/Operator_network/HMC/main_HMC_splitting.py:209-258): the
potential is a sum of per-shard terms U = sum_m U_m and each outer step runs a
sequential pass of per-shard leapfrog sub-steps (Neal 2011, section 5.1:
H_m = U_m + K/M), so every full-data gradient's worth of work buys M position
updates. Shard potentials are stacked along a leading axis and iterated with a
scan — on a device mesh the shard axis maps onto the ``data`` mesh axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vihmc_tpu.hmc.metric import mass_velocity


def leapfrog(value_and_grad_fn, q, p, grad, step_size, num_steps, inv_mass=1.0):
    """``num_steps`` leapfrog steps. Returns (q, p, log_prob, grad).

    Parameters
    ----------
    value_and_grad_fn : q -> (log_prob, grad)  (gradient of LOG-PROB, not potential)
    grad : gradient at the initial ``q`` (carried to avoid re-evaluation)
    inv_mass : scalar/(D,) diagonal inverse mass, or a
        :class:`vihmc_tpu.hmc.metric.LowRankMetric` (low-rank+diagonal
        mass; the drift uses its O(Dk) Woodbury velocity)
    """

    def step(carry, _):
        q, p, g, _lp = carry
        p_half = p + 0.5 * step_size * g
        q_new = q + step_size * mass_velocity(inv_mass, p_half)
        lp, g_new = value_and_grad_fn(q_new)
        p_new = p_half + 0.5 * step_size * g_new
        return (q_new, p_new, g_new, lp), None

    (q, p, grad, log_prob), _ = jax.lax.scan(
        step, (q, p, grad, jnp.zeros(())), None, length=num_steps
    )
    return q, p, log_prob, grad


def leapfrog_grad_only(grad_fn, q, p, grad, step_size, num_steps, inv_mass=1.0):
    """``num_steps`` leapfrog steps using a gradient-only oracle.

    Same trajectory as :func:`leapfrog` when ``grad_fn = grad(log_prob)``, but
    never evaluates the density — for gradient oracles that are much cheaper
    than value-and-grad (e.g. the Gram-form DeepONet gradient,
    :mod:`vihmc_tpu.ops.gram_merge`). The caller evaluates the exact
    log-density once at the returned endpoint for the MH test; any
    deterministic ``grad_fn`` keeps the integrator reversible and
    volume-preserving, so MH correctness is untouched.

    Returns (q, p, grad).
    """

    def step(carry, _):
        q, p, g = carry
        p_half = p + 0.5 * step_size * g
        q_new = q + step_size * mass_velocity(inv_mass, p_half)
        g_new = grad_fn(q_new)
        p_new = p_half + 0.5 * step_size * g_new
        return (q_new, p_new, g_new), None

    (q, p, grad), _ = jax.lax.scan(step, (q, p, grad), None, length=num_steps)
    return q, p, grad


def split_leapfrog(shard_value_and_grad_fn, shard_data, q, p, step_size, num_steps, inv_mass=1.0):
    """Split-Hamiltonian integration over stacked data shards.

    Parameters
    ----------
    shard_value_and_grad_fn : (q, one_shard) -> (shard_log_prob, shard_grad)
        Per-shard log-prob (likelihood shard + prior/num_shards, matching the
        reference's ``prior_scale`` convention, main_HMC_splitting.py:253-254).
    shard_data : pytree whose leaves have leading axis M (the shard count).

    Returns (q, p). The final log-prob must be recomputed on the full
    potential by the caller (the per-shard values are partial sums).
    """
    num_shards = jax.tree_util.tree_leaves(shard_data)[0].shape[0]
    drift = step_size / num_shards

    def shard_sub_step(carry, shard):
        q, p = carry
        _, g = shard_value_and_grad_fn(q, shard)
        p = p + 0.5 * step_size * g
        q = q + drift * mass_velocity(inv_mass, p)
        _, g = shard_value_and_grad_fn(q, shard)
        p = p + 0.5 * step_size * g
        return (q, p), None

    def outer_step(carry, _):
        carry, _ = jax.lax.scan(shard_sub_step, carry, shard_data)
        return carry, None

    (q, p), _ = jax.lax.scan(outer_step, (q, p), None, length=num_steps)
    return q, p
