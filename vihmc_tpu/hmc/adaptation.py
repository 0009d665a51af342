"""NUTS-style dual-averaging step-size adaptation.

The reference's ``Sampler.HMC_NUTS`` + ``burn`` runs HMC with step-size
adaptation during burn-in targeting 80% acceptance, then freezes the step size
(/root/reference/Operator_network/HMC/NUTS_DeepOnets.py:5-9,289-290). This is
the dual-averaging scheme of Hoffman & Gelman (2014), Algorithm 5 / eq. (6),
re-derived from the paper (hamiltorch's source is not vendored in the
reference tree — SURVEY.md section 7.3).

State update at adaptation iteration t (1-based), with accept-stat alpha:

    H_bar_t   = (1 - 1/(t+t0)) H_bar_{t-1} + (delta - alpha)/(t+t0)
    log eps_t = mu - sqrt(t)/gamma * H_bar_t
    log ebar_t = t^-kappa * log eps_t + (1 - t^-kappa) * log ebar_{t-1}

with the standard constants gamma=0.05, t0=10, kappa=0.75 and
mu = log(10 * eps_0). After burn-in the averaged iterate exp(log ebar) is used.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

GAMMA = 0.05
T0 = 10.0
KAPPA = 0.75


@struct.dataclass
class DualAveragingState:
    log_step: jnp.ndarray       # current (adapting) log step size
    log_step_avg: jnp.ndarray   # averaged iterate (used post-burn)
    h_bar: jnp.ndarray
    mu: jnp.ndarray
    t: jnp.ndarray              # number of adaptation updates performed


def da_init(step_size: float) -> DualAveragingState:
    log_eps = jnp.log(jnp.asarray(step_size, dtype=jnp.float32))
    return DualAveragingState(
        log_step=log_eps,
        log_step_avg=log_eps,
        h_bar=jnp.zeros((), jnp.float32),
        mu=jnp.log(10.0) + log_eps,
        t=jnp.zeros((), jnp.float32),
    )


def da_update(state: DualAveragingState, accept_prob, target_accept=0.8) -> DualAveragingState:
    t = state.t + 1.0
    eta_h = 1.0 / (t + T0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target_accept - accept_prob)
    log_step = state.mu - jnp.sqrt(t) / GAMMA * h_bar
    eta_x = t ** (-KAPPA)
    log_step_avg = eta_x * log_step + (1.0 - eta_x) * state.log_step_avg
    return DualAveragingState(log_step=log_step, log_step_avg=log_step_avg,
                              h_bar=h_bar, mu=state.mu, t=t)


def da_restart(state: DualAveragingState) -> DualAveragingState:
    """Re-initialize adaptation around the current step size.

    Used at mass-matrix window boundaries (Stan-style windowed warmup): after
    the metric changes, the old averaged iterate and accumulated statistics
    describe a different Hamiltonian, so dual averaging restarts from the
    current adapting step.
    """
    return DualAveragingState(
        log_step=state.log_step,
        log_step_avg=state.log_step,
        h_bar=jnp.zeros_like(state.h_bar),
        mu=jnp.log(10.0) + state.log_step,
        t=jnp.zeros_like(state.t),
    )


def find_reasonable_step_size(value_and_grad_fn, q, key, init_step=1.0, inv_mass=1.0,
                              max_doublings=50):
    """Heuristic initial step size (Hoffman & Gelman Algorithm 4).

    Doubles/halves the step until one leapfrog step crosses 50% acceptance.
    Optional — the reference pipelines always pass an explicit step size, but
    this makes cold starts robust.
    """
    from vihmc_tpu.hmc.integrators import leapfrog

    lp0, g0 = value_and_grad_fn(q)
    p0 = jax.random.normal(key, q.shape) * jnp.sqrt(1.0 / inv_mass)

    def log_accept(step):
        q1, p1, lp1, _ = leapfrog(value_and_grad_fn, q, p0, g0, step, 1, inv_mass)
        ke0 = 0.5 * jnp.sum(inv_mass * p0 * p0)
        ke1 = 0.5 * jnp.sum(inv_mass * p1 * p1)
        delta = (lp1 - ke1) - (lp0 - ke0)
        return jnp.where(jnp.isfinite(delta), delta, -jnp.inf)

    step = jnp.asarray(init_step, jnp.float32)
    direction = jnp.where(log_accept(step) > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        step, i = carry
        return (direction * log_accept(step) > -direction * jnp.log(2.0)) & (i < max_doublings)

    def body(carry):
        step, i = carry
        return step * jnp.exp2(direction), i + 1

    step, _ = jax.lax.while_loop(cond, body, (step, 0))
    return step
