"""Multinomial No-U-Turn sampler with static tree depth (TPU-shaped NUTS).

The reference's "NUTS" is only dual-averaging step-size adaptation
(hamiltorch's ``Sampler.HMC_NUTS``; /root/reference/Operator_network/HMC/
NUTS_DeepOnets.py:5-9) — trajectory length stays the hand-derived constant
``L = int(pi*post_var/(2*step))``. This module goes beyond the reference: a
real NUTS that adapts trajectory length per draw via recursive trajectory
doubling with the generalized U-turn criterion and multinomial sampling over
the trajectory (Betancourt 2017; Hoffman & Gelman 2014).

TPU shaping: the doubling recursion is unrolled over a STATIC ``max_depth``
(the Python ``_build_tree`` recursion runs at trace time), so every draw
costs exactly ``2^max_depth - 1`` gradient evaluations with termination
handled by masking. That is the right trade on TPU — static shapes, no
data-dependent control flow, full MXU occupancy — at the price of not saving
compute when trees terminate early (accelerator-style NUTS, like numpyro's
fixed-budget variants).

Statistical validation: tests/test_nuts.py (moment recovery on isotropic,
correlated, and anisotropic Gaussians; U-turn terminations; divergence
handling; higher ESS/gradient than fixed-L HMC on a correlated target).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from vihmc_tpu.hmc.adaptation import da_restart, da_update
from vihmc_tpu.hmc.kernel import (
    HMCState,
    SampleResult,
    _normalize_log_prob,
    init_state,
    mass_window_schedule,
    windowed_metric_update,
)

#: energy-error threshold for divergence (Stan's default is 1000 in -log space)
NUTS_DIVERGENCE = 1000.0


@dataclasses.dataclass(frozen=True)
class NUTSConfig:
    """Static NUTS configuration."""

    num_samples: int = 100
    max_depth: int = 6                 # trajectory capped at 2^max_depth - 1 steps
    step_size: float = 0.1
    burn: int = 0
    adapt_step_size: bool = True       # dual averaging during burn
    target_accept: float = 0.8
    adapt_mass: bool = False           # Welford diagonal mass (as in hmc kernel)
    mass_schedule: str = "half"        # 'half' | 'windowed' (as in hmc kernel)
    max_step: object = None            # clamp the step actually used (as in
                                       # hmc kernel; Optional[float])
    da_axis: object = None             # pmean the accept statistic over this
                                       # chain axis (as in hmc kernel)
    metric_axis: object = None         # pool the Welford metric across the
                                       # chain axis (as in hmc kernel)


@struct.dataclass
class _Tree:
    q_minus: jnp.ndarray
    p_minus: jnp.ndarray
    g_minus: jnp.ndarray
    q_plus: jnp.ndarray
    p_plus: jnp.ndarray
    g_plus: jnp.ndarray
    q_prop: jnp.ndarray   # multinomial proposal from the subtree
    lp_prop: jnp.ndarray  # log target density at the proposal
    g_prop: jnp.ndarray
    log_w: jnp.ndarray    # logsumexp of trajectory weights in the subtree
    p_sum: jnp.ndarray    # sum of momenta (generalized U-turn criterion)
    turning: jnp.ndarray
    diverged: jnp.ndarray
    sum_accept: jnp.ndarray  # sum over leaves of min(1, exp(h0 - h)) (for DA)
    n_leaves: jnp.ndarray


def _is_turning(q_minus, q_plus, p_minus, p_plus, p_sum, inv_mass):
    """Generalized U-turn: velocity at both ends against the trajectory span."""
    rho = p_sum
    v_minus = inv_mass * p_minus
    v_plus = inv_mass * p_plus
    return (jnp.dot(v_minus, rho - p_minus) <= 0.0) | \
           (jnp.dot(v_plus, rho - p_plus) <= 0.0)


def _make_build_tree(vag, eps_ref, inv_mass, h0_ref):
    """Returns build_tree(depth, z, direction, key) unrolled at trace time."""

    def leaf(q, p, g, direction, key):
        del key
        eps = eps_ref[0] * direction
        p_half = p + 0.5 * eps * g
        q1 = q + eps * (inv_mass * p_half)
        lp1, g1 = vag(q1)
        p1 = p_half + 0.5 * eps * g1
        h1 = -lp1 + 0.5 * jnp.sum(inv_mass * p1 * p1)
        log_w = h0_ref[0] - h1
        log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
        diverged = (h1 - h0_ref[0] > NUTS_DIVERGENCE) | ~jnp.isfinite(h1)
        accept_p = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_w, 0.0)))
        return _Tree(q_minus=q1, p_minus=p1, g_minus=g1,
                     q_plus=q1, p_plus=p1, g_plus=g1,
                     q_prop=q1, lp_prop=lp1, g_prop=g1,
                     log_w=log_w, p_sum=p1,
                     turning=jnp.asarray(False), diverged=diverged,
                     sum_accept=accept_p, n_leaves=jnp.asarray(1.0))

    def combine(first, second, direction, key):
        """Merge ``second`` (grown outward from ``first``) into ``first``.

        If ``first`` already stopped, the merge is a no-op (masked)."""
        stopped = first.turning | first.diverged
        # multinomial proposal swap: take second's proposal w.p. w2/(w1+w2)
        log_wt = jnp.logaddexp(first.log_w, second.log_w)
        take_second = jnp.log(jax.random.uniform(key)) < (second.log_w - log_wt)
        take_second = take_second & ~stopped & ~second.diverged

        def sel(a, b):
            return jnp.where(take_second, b, a)

        fwd = direction > 0
        q_minus = jnp.where(fwd, first.q_minus, jnp.where(stopped, first.q_minus, second.q_minus))
        p_minus = jnp.where(fwd, first.p_minus, jnp.where(stopped, first.p_minus, second.p_minus))
        g_minus = jnp.where(fwd, first.g_minus, jnp.where(stopped, first.g_minus, second.g_minus))
        q_plus = jnp.where(fwd, jnp.where(stopped, first.q_plus, second.q_plus), first.q_plus)
        p_plus = jnp.where(fwd, jnp.where(stopped, first.p_plus, second.p_plus), first.p_plus)
        g_plus = jnp.where(fwd, jnp.where(stopped, first.g_plus, second.g_plus), first.g_plus)

        p_sum = jnp.where(stopped, first.p_sum, first.p_sum + second.p_sum)
        new_turn = _is_turning(q_minus, q_plus, p_minus, p_plus, p_sum, inv_mass)
        turning = jnp.where(stopped, first.turning,
                            second.turning | new_turn)
        diverged = first.diverged | (~stopped & second.diverged)
        return _Tree(
            q_minus=q_minus, p_minus=p_minus, g_minus=g_minus,
            q_plus=q_plus, p_plus=p_plus, g_plus=g_plus,
            q_prop=sel(first.q_prop, second.q_prop),
            lp_prop=sel(first.lp_prop, second.lp_prop),
            g_prop=sel(first.g_prop, second.g_prop),
            log_w=jnp.where(stopped, first.log_w, log_wt),
            p_sum=p_sum,
            turning=turning,
            diverged=diverged,
            sum_accept=first.sum_accept + jnp.where(stopped, 0.0, second.sum_accept),
            n_leaves=first.n_leaves + jnp.where(stopped, 0.0, second.n_leaves),
        )

    def build_tree(depth, q, p, g, direction, key):
        if depth == 0:
            return leaf(q, p, g, direction, key)
        k1, k2, k3 = jax.random.split(key, 3)
        t1 = build_tree(depth - 1, q, p, g, direction, k1)
        # grow outward from t1's outer end in the SAME direction
        q_o = jnp.where(direction > 0, t1.q_plus, t1.q_minus)
        p_o = jnp.where(direction > 0, t1.p_plus, t1.p_minus)
        g_o = jnp.where(direction > 0, t1.g_plus, t1.g_minus)
        t2 = build_tree(depth - 1, q_o, p_o, g_o, direction, k2)
        return combine(t1, t2, direction, k3)

    return build_tree


def nuts_sample(
    log_prob_fn: Callable,
    init_position: jnp.ndarray,
    key,
    config: NUTSConfig,
    inv_mass=1.0,
    aux=None,
    aux_refresh: Optional[Callable] = None,
    grad_fn: Optional[Callable] = None,
) -> SampleResult:
    """Draw ``config.num_samples`` NUTS samples (one compiled scan).

    ``grad_fn``: optional surrogate TRAJECTORY field (same contract as the
    HMC kernel's, e.g. the Gram/stride oracle or the VI-Gaussian field,
    optionally wrapped in :func:`clipped_grad_fn`). The leapfrog dynamics
    follow the surrogate, but every leaf still evaluates the EXACT log
    density for its multinomial weight ``exp(h0 - h)`` — the trajectory
    map stays volume-preserving and reversible for any deterministic field,
    and weighting leaves by the exact Hamiltonian keeps the multinomial
    trajectory sampler unbiased for the true posterior (the NUTS analogue
    of the HMC kernel's exact-endpoint-MH argument; statistical test in
    tests/test_nuts.py). Unlike in plain HMC the surrogate does NOT remove
    the per-step likelihood evaluation — it removes the per-step
    *gradient* (backward pass / full-grid Gram work), roughly a 3x
    trajectory-cost reduction for autodiff targets.
    """
    fn = _normalize_log_prob(log_prob_fn)
    gfn = _normalize_log_prob(grad_fn) if grad_fn is not None else None
    windowed = False
    if config.adapt_mass and config.mass_schedule == "windowed":
        win_start, win_ends = mass_window_schedule(config.burn)
        windowed = len(win_ends) > 0

    def kernel(state, k, iteration):
        key_mom, key_dirs, key_tree, key_swap, key_aux = jax.random.split(k, 5)
        in_burn = iteration < config.burn

        if aux_refresh is not None:
            aux_t = aux_refresh(key_aux, state.aux)
            if gfn is not None:
                lp0, g0 = fn(state.position, aux_t), gfn(state.position, aux_t)
            else:
                lp0, g0 = jax.value_and_grad(fn)(state.position, aux_t)
        else:
            aux_t = state.aux
            lp0, g0 = state.log_prob, state.grad

        if gfn is not None:
            vag = lambda q: (fn(q, aux_t), gfn(q, aux_t))
        else:
            vag = lambda q: jax.value_and_grad(fn)(q, aux_t)

        if config.adapt_step_size:
            eps = jnp.where(in_burn, jnp.exp(state.da.log_step),
                            jnp.exp(state.da.log_step_avg))
            if config.max_step is not None:
                eps = jnp.minimum(eps, config.max_step)
        else:
            eps = jnp.asarray(config.step_size, jnp.float32)

        if windowed:
            inv_mass_t = state.inv_mass
        elif config.adapt_mass:
            switch = max(config.burn // 2, 1)
            n = state.welford.count
            var_hat = (n / (n + 5.0)) * state.welford.variance \
                + 1e-3 * (5.0 / (n + 5.0))
            base = inv_mass * jnp.ones_like(state.position)
            inv_mass_t = jnp.where(iteration >= switch, var_hat, base)
        else:
            inv_mass_t = inv_mass * jnp.ones_like(state.position)

        p0 = jax.random.normal(key_mom, state.position.shape) / jnp.sqrt(inv_mass_t)
        h0 = -lp0 + 0.5 * jnp.sum(inv_mass_t * p0 * p0)

        build_tree = _make_build_tree(vag, eps[None], inv_mass_t, h0[None])

        # trajectory state: current tree spanning [minus, plus]
        traj = _Tree(q_minus=state.position, p_minus=p0, g_minus=g0,
                     q_plus=state.position, p_plus=p0, g_plus=g0,
                     q_prop=state.position, lp_prop=lp0, g_prop=g0,
                     log_w=jnp.zeros(()), p_sum=p0,
                     turning=jnp.asarray(False), diverged=jnp.asarray(False),
                     sum_accept=jnp.zeros(()), n_leaves=jnp.zeros(()))

        dirs = jax.random.rademacher(key_dirs, (config.max_depth,), dtype=jnp.float32) \
            if hasattr(jax.random, "rademacher") else \
            (2.0 * jax.random.bernoulli(key_dirs, 0.5, (config.max_depth,)) - 1.0)
        tree_keys = jax.random.split(key_tree, config.max_depth)
        swap_keys = jax.random.split(key_swap, config.max_depth)

        for depth in range(config.max_depth):
            direction = dirs[depth]
            q_o = jnp.where(direction > 0, traj.q_plus, traj.q_minus)
            p_o = jnp.where(direction > 0, traj.p_plus, traj.p_minus)
            g_o = jnp.where(direction > 0, traj.g_plus, traj.g_minus)
            sub = build_tree(depth, q_o, p_o, g_o, direction, tree_keys[depth])

            stopped = traj.turning | traj.diverged
            # biased progressive swap: take the new subtree's proposal w.p.
            # min(1, W_new / W_old), only if the subtree itself is valid
            log_ratio = sub.log_w - traj.log_w
            take = jnp.log(jax.random.uniform(swap_keys[depth])) < log_ratio
            take = take & ~stopped & ~sub.turning & ~sub.diverged

            def sel(a, b):
                return jnp.where(take, b, a)

            fwd = direction > 0
            grow = ~stopped & ~sub.diverged & ~sub.turning
            q_minus = jnp.where(fwd | ~grow, traj.q_minus, sub.q_minus)
            p_minus = jnp.where(fwd | ~grow, traj.p_minus, sub.p_minus)
            g_minus = jnp.where(fwd | ~grow, traj.g_minus, sub.g_minus)
            q_plus = jnp.where(~fwd | ~grow, traj.q_plus, sub.q_plus)
            p_plus = jnp.where(~fwd | ~grow, traj.p_plus, sub.p_plus)
            g_plus = jnp.where(~fwd | ~grow, traj.g_plus, sub.g_plus)
            p_sum = jnp.where(grow, traj.p_sum + sub.p_sum, traj.p_sum)
            turn_now = _is_turning(q_minus, q_plus, p_minus, p_plus, p_sum,
                                   inv_mass_t)
            traj = _Tree(
                q_minus=q_minus, p_minus=p_minus, g_minus=g_minus,
                q_plus=q_plus, p_plus=p_plus, g_plus=g_plus,
                q_prop=sel(traj.q_prop, sub.q_prop),
                lp_prop=sel(traj.lp_prop, sub.lp_prop),
                g_prop=sel(traj.g_prop, sub.g_prop),
                log_w=jnp.where(grow, jnp.logaddexp(traj.log_w, sub.log_w),
                                traj.log_w),
                p_sum=p_sum,
                turning=jnp.where(stopped, traj.turning,
                                  sub.turning | turn_now),
                diverged=traj.diverged | (~stopped & sub.diverged),
                sum_accept=traj.sum_accept + jnp.where(stopped, 0.0, sub.sum_accept),
                n_leaves=traj.n_leaves + jnp.where(stopped, 0.0, sub.n_leaves),
            )

        accept_stat = traj.sum_accept / jnp.maximum(traj.n_leaves, 1.0)
        moved = jnp.any(traj.q_prop != state.position)

        is_win_end = None
        inv_mass_state = state.inv_mass
        if windowed:
            welford, inv_mass_state, is_win_end = windowed_metric_update(
                state.welford, traj.q_prop, iteration, win_start, win_ends,
                inv_mass, state.inv_mass, metric_axis=config.metric_axis)
        elif config.adapt_mass:
            switch = max(config.burn // 2, 1)
            new_w = state.welford.update(traj.q_prop)
            welford = jax.tree_util.tree_map(
                lambda a, b: jnp.where(iteration < switch, a, b),
                new_w, state.welford)
        else:
            welford = state.welford

        if config.adapt_step_size:
            if config.da_axis is not None:
                accept_stat = jax.lax.pmean(accept_stat, config.da_axis)
            da_new = da_update(state.da, accept_stat, config.target_accept)
            da = jax.tree_util.tree_map(
                lambda new, old: jnp.where(in_burn, new, old), da_new, state.da)
            if is_win_end is not None:
                da = jax.tree_util.tree_map(
                    lambda r, c: jnp.where(is_win_end, r, c), da_restart(da), da)
        else:
            da = state.da

        new_state = HMCState(position=traj.q_prop, log_prob=traj.lp_prop,
                             grad=traj.g_prop, da=da, aux=aux_t, welford=welford,
                             inv_mass=inv_mass_state)
        info = {"accept_prob": accept_stat, "accepted": moved,
                "step_size": eps, "divergent": traj.diverged,
                "log_prob": traj.lp_prop, "tree_leaves": traj.n_leaves}
        return new_state, info

    from vihmc_tpu.hmc.kernel import HMCConfig as _HC

    state0 = init_state(log_prob_fn, init_position,
                        _HC(step_size=config.step_size,
                            adapt_mass=config.adapt_mass,
                            mass_schedule=config.mass_schedule), aux=aux,
                        inv_mass=inv_mass, grad_fn=grad_fn)
    keys = jax.random.split(key, config.num_samples)
    iters = jnp.arange(config.num_samples)

    def step(state, xs):
        k, i = xs
        state, info = kernel(state, k, i)
        return state, {"position": state.position, **info}

    final_state, outs = jax.lax.scan(step, state0, (keys, iters))
    return SampleResult(
        samples=outs["position"],
        log_probs=outs["log_prob"],
        accept_probs=outs["accept_prob"],
        accepted=outs["accepted"],
        step_sizes=outs["step_size"],
        divergent=outs["divergent"],
        final_state=final_state,
    )
