"""ChEES-HMC: cross-chain adaptive trajectory-length tuning (TPU-native).

Beyond the reference: the reference hand-derives a *fixed* trajectory length
``L = int(pi*post_var/(2*step))`` from an empirical posterior std
(/root/reference/Neural_network/HMC/config.py:25) and its "NUTS" only adapts
the step size (/root/reference/Operator_network/HMC/NUTS_DeepOnets.py:5-9).
ChEES-HMC (Hoffman, Radul & Sountsov, AISTATS 2021) instead *learns* the
trajectory length by stochastic gradient ascent on the Change-in-the-Estimator
-of-the-Expected-Square criterion

    ChEES(T) = E[ (||q' - E q'||^2 - ||q - E q||^2)^2 ] / 4,

whose gradient is estimated *across parallel chains* — exactly the regime this
framework is built for: chains are a vmap/mesh axis, so the cross-chain means
and the gradient reduction compile to XLA collectives over the ``'chains'``
mesh axis instead of host synchronization.

TPU shaping:

* One ``lax.scan`` over draws; all chains advance together inside each draw.
* The per-draw trajectory length is jittered by a shared Halton-sequence
  fraction u_t (all chains use the same u_t, as in the paper), so the leapfrog
  step count ``n_t = clip(round(u_t * T / eps), 1, max_steps)`` is a *scalar*
  — the trajectory runs as a dynamic-trip-count ``fori_loop`` and short
  trajectories genuinely cost fewer gradient evaluations (no masking waste).
* Step size adapts by dual averaging on the cross-chain mean acceptance
  (paper's harmonic-mean target 0.651); trajectory length adapts by Adam on
  log T. Both freeze after ``burn``.

Statistical validation: tests/test_chees.py (moment recovery, trajectory
growth on correlated targets, ESS/grad advantage over short fixed-L HMC).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from vihmc_tpu.hmc.adaptation import DualAveragingState, da_init, da_update
from vihmc_tpu.hmc.kernel import (DIVERGENCE_THRESHOLD, SampleResult,
                                  _normalize_log_prob)


@dataclasses.dataclass(frozen=True)
class ChEESConfig:
    """Static ChEES-HMC configuration (hashable; safe as a jit static arg)."""

    num_samples: int = 200
    step_size: float = 0.1            # initial step size
    init_traj_length: float = 1.0     # initial integration time T
    burn: int = 100                   # adaptation window (both eps and T)
    max_steps: int = 256              # hard cap on leapfrog steps per draw
    target_accept: float = 0.651      # paper's optimal harmonic-mean target
    adam_lr: float = 0.025            # learning rate for log T
    adam_b1: float = 0.9
    adam_b2: float = 0.999


@struct.dataclass
class ChEESState:
    positions: jnp.ndarray    # (C, D)
    log_probs: jnp.ndarray    # (C,)
    grads: jnp.ndarray        # (C, D)
    da: DualAveragingState    # step-size adaptation (cross-chain mean accept)
    log_T: jnp.ndarray        # trajectory integration time (log)
    adam_m: jnp.ndarray
    adam_v: jnp.ndarray
    adam_t: jnp.ndarray
    aux: Any = None           # per-chain aux (frozen VI draws etc.)


def halton_base2(i):
    """Van der Corput radical-inverse base 2 of ``i + 1`` (in-graph)."""
    bits = jnp.arange(30)
    digits = (jnp.right_shift(i + 1, bits) & 1).astype(jnp.float32)
    return jnp.sum(digits * 2.0 ** -(bits.astype(jnp.float32) + 1.0))


def chees_sample(
    log_prob_fn: Callable,
    init_positions: jnp.ndarray,   # (C, D)
    key,
    config: ChEESConfig,
    inv_mass=1.0,
    aux=None,                      # per-chain pytree with leading axis C, or None
    aux_refresh: Optional[Callable] = None,
    grad_fn: Optional[Callable] = None,
) -> SampleResult:
    """Run C coupled chains with ChEES adaptation. One compiled scan.

    Returns a :class:`SampleResult` whose arrays have shape (C, S, ...) —
    the same convention as :func:`vihmc_tpu.chains.sample_chains`. The final
    adapted step size / trajectory length live in ``final_state``
    (``exp(da.log_step_avg)``, ``exp(log_T)``).
    """
    fn = _normalize_log_prob(log_prob_fn)
    vag_one = jax.value_and_grad(fn)
    vag = jax.vmap(vag_one)
    gfn_one = _normalize_log_prob(grad_fn) if grad_fn is not None else None
    n_chains, dim = init_positions.shape
    inv_mass = jnp.broadcast_to(jnp.asarray(inv_mass, jnp.float32), (dim,))

    def _vmap_a(f, q, a):
        if a is None:
            return jax.vmap(lambda qq: f(qq, None))(q)
        return jax.vmap(f)(q, a)

    def _vag(q, a):
        # gradient oracle: cheap grads along trajectories, exact density at
        # the evaluation points (same contract as the HMC kernel's grad_fn)
        if gfn_one is not None:
            return _vmap_a(fn, q, a), _vmap_a(gfn_one, q, a)
        if a is None:
            return jax.vmap(lambda qq: vag_one(qq, None))(q)
        return vag(q, a)

    lp0, g0 = _vag(init_positions, aux)
    state0 = ChEESState(
        positions=init_positions, log_probs=lp0, grads=g0,
        da=da_init(config.step_size),
        log_T=jnp.log(jnp.asarray(config.init_traj_length, jnp.float32)),
        adam_m=jnp.zeros(()), adam_v=jnp.zeros(()), adam_t=jnp.zeros(()),
        aux=aux,
    )

    def draw(state: ChEESState, xs):
        key, i = xs
        k_mom, k_u, k_aux = jax.random.split(key, 3)
        in_burn = i < config.burn

        # --- per-chain frozen-coordinate refresh ---
        if aux_refresh is not None:
            aux_keys = jax.random.split(k_aux, n_chains)
            aux_t = jax.vmap(aux_refresh)(aux_keys, state.aux)
            lp0, g0 = _vag(state.positions, aux_t)
        else:
            aux_t = state.aux
            lp0, g0 = state.log_probs, state.grads

        eps = jnp.where(in_burn, jnp.exp(state.da.log_step),
                        jnp.exp(state.da.log_step_avg))
        T = jnp.exp(state.log_T)

        # --- shared Halton jitter -> scalar dynamic step count ---
        u = halton_base2(i)
        n_steps = jnp.clip(jnp.rint(u * T / eps).astype(jnp.int32), 1,
                           config.max_steps)

        p0 = jax.random.normal(k_mom, state.positions.shape) / jnp.sqrt(inv_mass)
        ke0 = 0.5 * jnp.sum(inv_mass * p0 * p0, axis=-1)

        if gfn_one is not None:
            def lf_body(_t, carry):
                q, p, g = carry
                p_half = p + 0.5 * eps * g
                q_new = q + eps * (inv_mass * p_half)
                g_new = _vmap_a(gfn_one, q_new, aux_t)
                p_new = p_half + 0.5 * eps * g_new
                return (q_new, p_new, g_new)

            q1, p1, g1 = jax.lax.fori_loop(
                0, n_steps, lf_body, (state.positions, p0, g0))
            lp1 = _vmap_a(fn, q1, aux_t)
        else:
            def lf_body(_t, carry):
                q, p, g, _lp = carry
                p_half = p + 0.5 * eps * g
                q_new = q + eps * (inv_mass * p_half)
                lp_new, g_new = _vag(q_new, aux_t)
                p_new = p_half + 0.5 * eps * g_new
                return (q_new, p_new, g_new, lp_new)

            q1, p1, g1, lp1 = jax.lax.fori_loop(
                0, n_steps, lf_body, (state.positions, p0, g0, lp0))
        ke1 = 0.5 * jnp.sum(inv_mass * p1 * p1, axis=-1)

        # --- per-chain MH ---
        delta = (lp1 - ke1) - (lp0 - ke0)
        finite = jnp.isfinite(delta)
        accept_prob = jnp.where(
            finite, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0))), 0.0)
        log_us = jnp.log(jax.random.uniform(k_u, (n_chains,)))
        accept = finite & (log_us < delta)
        divergent = ~finite | (delta < DIVERGENCE_THRESHOLD)

        sel = lambda a, b: jnp.where(accept[:, None], a, b)
        positions = sel(q1, state.positions)
        log_probs = jnp.where(accept, lp1, lp0)
        grads = sel(g1, g0)

        # --- dual averaging on the cross-chain mean acceptance ---
        da_new = da_update(state.da, jnp.mean(accept_prob),
                           config.target_accept)

        # --- ChEES gradient across chains (collectives over the chain axis).
        # A divergent trajectory's proposal can carry inf/NaN coordinates;
        # substituting the start position keeps the cross-chain means finite
        # (its accept_prob weight is already 0). ---
        q1_safe = jnp.where(finite[:, None], q1, state.positions)
        v1 = inv_mass * jnp.where(finite[:, None], p1, 0.0)
        m_old = jnp.mean(state.positions, axis=0)
        m_new = jnp.mean(q1_safe, axis=0)
        d_old = jnp.sum((state.positions - m_old) ** 2, axis=-1)
        d_new = jnp.sum((q1_safe - m_new) ** 2, axis=-1)
        dir_dot = jnp.sum((q1_safe - m_new) * v1, axis=-1)
        w = accept_prob / jnp.maximum(jnp.sum(accept_prob), 1e-12)
        # d ChEES / d log T  (t_i = u*T, so chain rule brings a u*T factor)
        grad_T = jnp.sum(w * (d_new - d_old) * dir_dot) * u * T
        grad_T = jnp.where(jnp.isfinite(grad_T), grad_T, 0.0)

        adam_t = state.adam_t + 1.0
        adam_m = config.adam_b1 * state.adam_m + (1 - config.adam_b1) * grad_T
        adam_v = config.adam_b2 * state.adam_v + (1 - config.adam_b2) * grad_T ** 2
        m_hat = adam_m / (1 - config.adam_b1 ** adam_t)
        v_hat = adam_v / (1 - config.adam_b2 ** adam_t)
        log_T_new = state.log_T + config.adam_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
        # keep T within [eps, max_steps * eps]
        log_T_new = jnp.clip(log_T_new, jnp.log(eps),
                             jnp.log(config.max_steps * eps))

        upd = lambda new, old: jnp.where(in_burn, new, old)
        new_state = ChEESState(
            positions=positions, log_probs=log_probs, grads=grads,
            da=jax.tree_util.tree_map(upd, da_new, state.da),
            log_T=upd(log_T_new, state.log_T),
            adam_m=upd(adam_m, state.adam_m),
            adam_v=upd(adam_v, state.adam_v),
            adam_t=upd(adam_t, state.adam_t),
            aux=aux_t,
        )
        out = {
            "position": positions,
            "log_prob": log_probs,
            "accept_prob": accept_prob,
            "accepted": accept,
            "step_size": eps,
            "divergent": divergent,
            "n_steps": n_steps,
            "traj_length": T,
        }
        return new_state, out

    keys = jax.random.split(key, config.num_samples)
    final_state, outs = jax.lax.scan(
        draw, state0, (keys, jnp.arange(config.num_samples)))

    def to_chain_major(x):
        return jnp.swapaxes(x, 0, 1) if x.ndim >= 2 else x

    return SampleResult(
        samples=to_chain_major(outs["position"]),
        log_probs=to_chain_major(outs["log_prob"]),
        accept_probs=to_chain_major(outs["accept_prob"]),
        accepted=to_chain_major(outs["accepted"]),
        step_sizes=outs["step_size"],          # (S,) shared across chains
        divergent=to_chain_major(outs["divergent"]),
        final_state=final_state,
        aux_trace={"n_steps": outs["n_steps"],
                   "traj_length": outs["traj_length"]},
    )
