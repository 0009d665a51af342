"""The HMC kernel: Metropolis-adjusted leapfrog transitions as one ``lax.scan``.

Replaces the external ``hamiltorch.samplers.sample`` the reference depends on
(call-site semantics catalogued in SURVEY.md section 2.4):

* plain HMC — momentum ~ N(0, M), ``num_leapfrog`` steps, MH accept/reject;
* ``sampler='hmc_nuts'`` — same, with dual-averaging step-size adaptation
  during the first ``burn`` draws targeting 80% acceptance, frozen after
  (reference /root/reference/Operator_network/HMC/NUTS_DeepOnets.py:5-9);
* ``integrator='splitting'`` — data-split Hamiltonian sub-steps
  (reference main_HMC_splitting.py:361-369);
* non-finite Hamiltonian differences reject the proposal (reference
  ``util.has_nan_or_inf`` / ``LogProbError`` semantics, and count as
  divergences);
* an explicit per-draw ``aux_refresh`` hook generalizes the reference's
  implicit "extra-argument resamples the frozen VI coordinates" convention
  (/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:91-94) into
  first-class sampler state carried through the scan.

Everything — all draws, all leapfrog steps — is a single compiled XLA
computation per chain; chains vectorize with ``vmap`` and shard over a device
mesh (see :mod:`vihmc_tpu.chains`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from vihmc_tpu.hmc.adaptation import (DualAveragingState, da_init, da_restart,
                                      da_update)
from vihmc_tpu.hmc.integrators import (leapfrog, leapfrog_grad_only,
                                       split_leapfrog)
from vihmc_tpu.hmc.metric import (EigenMetric, LowRankMetric,
                                  mass_kinetic_energy, mass_sample_momentum,
                                  mass_velocity)

#: log-Hamiltonian-error threshold below which a transition counts as divergent
DIVERGENCE_THRESHOLD = -1000.0


@dataclasses.dataclass(frozen=True)
class HMCConfig:
    """Static sampler configuration (hashable; safe as a jit static arg)."""

    num_samples: int = 100
    num_leapfrog: int = 10
    step_size: float = 0.1
    burn: int = 0                       # draws before adaptation freezes
    sampler: str = "hmc"                # 'hmc' | 'hmc_nuts'
    integrator: str = "leapfrog"        # 'leapfrog' | 'splitting'
    target_accept: float = 0.8
    store_burn: bool = True             # hamiltorch returns burn draws for plain HMC
    adapt_mass: bool = False            # Welford diagonal mass estimation
                                        # during burn (extension beyond the
                                        # reference's identity mass)
    mass_schedule: str = "half"         # 'half': one switch at burn//2;
                                        # 'windowed': Stan-style doubling
                                        # windows, each ending with a metric
                                        # update + dual-averaging restart
    jitter_l: bool = False              # per-draw uniform trajectory length in
                                        # [max(1, jitter_low_frac*L), L]
                                        # (masked steps; same compute, kills
                                        # resonance artifacts of the
                                        # reference's fixed analytic L)
    jitter_low_frac: float = 0.0        # lower bound of the jitter range as a
                                        # fraction of num_leapfrog (0 -> [1,L],
                                        # 0.5 -> [L/2,L]; keeps mean trajectory
                                        # length high while still breaking
                                        # resonances)
    jitter_eps: bool = False            # per-draw continuous step-size
                                        # multiplier u ~ U[jitter_low_frac, 1]
                                        # applied to the WHOLE trajectory:
                                        # the same trajectory-time
                                        # distribution (and resonance
                                        # breaking) as jitter_l, but all
                                        # num_leapfrog gradient evals
                                        # contribute — masked-L jitter
                                        # computes L evals and discards the
                                        # tail past the drawn length — and
                                        # the shrunken steps integrate more
                                        # accurately, so acceptance rises.
                                        # Mutually exclusive with jitter_l.
    adapt_forever: bool = False         # continue dual averaging past burn
                                        # using the adapting iterate
                                        # (diminishing adaptation: the t^-1/2
                                        # DA decay preserves ergodicity).
                                        # Self-heals chains trapped in far
                                        # tails where the frozen step rejects
                                        # everything — their own acceptance
                                        # collapse drives the step down until
                                        # they escape ('hmc_nuts' only).
    max_step: Optional[float] = None    # clamp the step size actually used
                                        # (adapting iterate AND frozen
                                        # average). Dual averaging's early
                                        # exploration can overshoot by 10-20x
                                        # for a few draws — measured on-chip
                                        # flinging chains into far tails they
                                        # never recover from under the
                                        # refresh policy.
    min_step: Optional[float] = None    # clamp from BELOW: when the DA
                                        # target sits above the
                                        # configuration's acceptance CEILING
                                        # (surrogate-field bias or reduced-
                                        # precision density noise put an
                                        # O(1)-nat floor under |Delta H|),
                                        # dual averaging shrinks the step
                                        # without bound — measured 5 orders
                                        # in ~100 draws, ending below f32
                                        # position resolution
                                        # (docs/performance.md round 4).
                                        # The clamp bounds the damage; fix
                                        # the ceiling or lower the target
                                        # for a real equilibrium.
    refresh_during_burn: bool = True    # False: hold the frozen aux fixed
                                        # until burn ends (chains equilibrate
                                        # against one conditional, then the
                                        # per-draw refresh turns on)
    da_axis: Optional[str] = None       # couple dual averaging across a vmap/
                                        # mesh axis of this name: the accept
                                        # statistic is pmean'd over chains so
                                        # all chains share ONE low-noise
                                        # adapted step (32 chains -> 32x less
                                        # freeze variance). Requires running
                                        # under vmap(axis_name=da_axis) — the
                                        # multi-chain APIs use 'chains'.
    metric_axis: Optional[str] = None   # pool the Welford mass-matrix
                                        # estimate across the chain axis
                                        # (within+between-chain variance, C
                                        # times the data per adaptation
                                        # window — 2048 marginal variances
                                        # become estimable in tens of draws).
                                        # Same axis-name requirement as
                                        # da_axis.
    init_step_search: bool = False      # Hoffman-Gelman Algorithm-4 search at
                                        # init: double/halve config.step_size
                                        # until one leapfrog step crosses 50%
                                        # acceptance, then anchor dual
                                        # averaging there. Removes the
                                        # adaptation-variance of climbing to
                                        # the right scale within burn when the
                                        # configured step is orders of
                                        # magnitude off ('hmc_nuts' only).
    momentum_persistence: float = 0.0   # generalized/Horowitz HMC: carry
                                        # momentum across draws, partially
                                        # refreshed as
                                        #   p <- alpha*p + sqrt(1-alpha^2)*xi,
                                        # xi ~ N(0, M), with a momentum FLIP
                                        # on rejection (the flip is what keeps
                                        # the chain exact — Horowitz 1991;
                                        # Neal 2011 sec. 5.3). alpha=0 is
                                        # standard HMC (full refresh).
                                        # Successive accepted trajectories
                                        # keep moving in a persistent
                                        # direction, so SHORT trajectories
                                        # (small L) escape the random-walk
                                        # cliff the round-4 L sweep walked up
                                        # to — the textbook lever for the
                                        # short-trajectory rough-target
                                        # regime. Rejections break
                                        # persistence, so it pays off only
                                        # at high acceptance.
    store_aux_trace: bool = False       # record the per-draw aux state (e.g.
                                        # the frozen VI draw used at each
                                        # iteration — the reference's
                                        # vi_params_<uid>.npy trace,
                                        # my_make_func.py:45-50). Memory: one
                                        # aux copy per draw.


@struct.dataclass
class WelfordState:
    """Running mean/variance of the position (diagonal mass estimation)."""

    mean: jnp.ndarray
    m2: jnp.ndarray
    count: jnp.ndarray

    def update(self, x):
        count = self.count + 1.0
        delta = x - self.mean
        mean = self.mean + delta / count
        m2 = self.m2 + delta * (x - mean)
        return WelfordState(mean=mean, m2=m2, count=count)

    @property
    def variance(self):
        return self.m2 / jnp.maximum(self.count - 1.0, 1.0)


@struct.dataclass
class HMCState:
    position: jnp.ndarray
    log_prob: jnp.ndarray
    grad: jnp.ndarray
    da: DualAveragingState
    aux: Any  # frozen-coordinate state etc.; None when unused
    welford: Any = None   # WelfordState when adapt_mass, else None
    inv_mass: Any = None  # (D,) carried metric when mass_schedule='windowed'
    momentum: Any = None  # (D,) carried momentum when momentum_persistence>0


def mass_window_schedule(burn: int):
    """Static Stan-style warmup windows inside ``burn`` draws.

    Returns ``(start, ends)``: Welford accumulation covers
    ``[start, ends[-1])``, split into doubling windows whose *exclusive* end
    iterations are ``ends``; at the last draw of each window the accumulated
    (shrunk) posterior variances become the diagonal inverse mass, the
    accumulator resets, and dual averaging restarts. ~15% of burn settles the
    chain first, ~10% at the end re-equilibrates the step size against the
    final metric. Empty ``ends`` means burn is too short for windowing.
    """
    if burn < 20:
        return 0, ()
    start = max(int(0.15 * burn), 1)
    term = max(int(0.10 * burn), 1)
    region = burn - start - term
    if region < 10:
        return 0, ()
    w = max(region // 15, 5)
    ends, pos = [], start
    while pos + w <= start + region:
        pos += w
        ends.append(pos)
        w *= 2
    if not ends:
        return 0, ()
    ends[-1] = start + region  # absorb the tail into the final window
    return start, tuple(ends)


@struct.dataclass
class SampleResult:
    samples: jnp.ndarray        # (S, D)
    log_probs: jnp.ndarray      # (S,)
    accept_probs: jnp.ndarray   # (S,)
    accepted: jnp.ndarray       # (S,) bool
    step_sizes: jnp.ndarray     # (S,)
    divergent: jnp.ndarray      # (S,) bool
    final_state: HMCState
    aux_trace: Any = None       # per-draw aux states when store_aux_trace

    @property
    def acceptance_rate(self):
        return jnp.mean(self.accepted.astype(jnp.float32))

    @property
    def num_divergent(self):
        return jnp.sum(self.divergent.astype(jnp.int32))


def pooled_variance(welford: "WelfordState", axis: Optional[str]):
    """Welford variance, optionally pooled across a named chain axis.

    Pooling combines within-chain sums of squares with the between-chain
    mean dispersion (the exact grouped-variance identity), giving C times
    the effective sample count per adaptation window — the TPU-native way to
    estimate thousands of marginal variances within tens of draws. Returns
    ``(variance, effective_count)``.
    """
    if axis is None:
        return welford.variance, welford.count
    n = welford.count
    c = jax.lax.psum(jnp.ones(()), axis)
    mean_p = jax.lax.pmean(welford.mean, axis)
    m2_p = jax.lax.pmean(welford.m2, axis)          # mean per-chain SS
    between = jax.lax.pmean((welford.mean - mean_p) ** 2, axis)
    n_tot = c * n
    ss = c * (m2_p + n * between)
    return ss / jnp.maximum(n_tot - 1.0, 1.0), n_tot


def windowed_metric_update(welford, position, iteration, win_start, win_ends,
                           base_inv_mass, carried_inv_mass, metric_axis=None):
    """One windowed-warmup bookkeeping step (shared by HMC and NUTS kernels).

    Accumulates ``position`` into the Welford state inside the window region;
    at the last draw of each window, replaces the carried diagonal inverse
    mass with the shrunk variance estimate (shrinkage toward
    ``base_inv_mass`` — e.g. the VI-posterior variances — rather than Stan's
    fixed 1e-3*I) and resets the accumulator. With ``metric_axis`` the
    variance pools across the chain axis (see :func:`pooled_variance`).

    Returns ``(welford, inv_mass, is_window_end)``.
    """
    in_window = (iteration >= win_start) & (iteration < win_ends[-1])
    is_win_end = jnp.any(iteration == jnp.asarray(win_ends) - 1)
    new_w = welford.update(position)
    welford = jax.tree_util.tree_map(
        lambda a, b: jnp.where(in_window, a, b), new_w, welford)
    var, n = pooled_variance(welford, metric_axis)
    base = base_inv_mass * jnp.ones_like(position)
    var_hat = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * base
    inv_mass = jnp.where(is_win_end, var_hat, carried_inv_mass)
    welford = jax.tree_util.tree_map(
        lambda a: jnp.where(is_win_end, jnp.zeros_like(a), a), welford)
    return welford, inv_mass, is_win_end


def _num_positional_params(fn) -> int:
    import inspect

    try:
        return len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        return 1


def _normalize_log_prob(log_prob_fn):
    """Accept both f(q) and f(q, aux) signatures (decided once, by signature)."""
    if _num_positional_params(log_prob_fn) >= 2:
        return log_prob_fn
    return lambda q, aux: log_prob_fn(q)


def init_state(log_prob_fn, position, config: HMCConfig, aux=None,
               inv_mass=1.0, grad_fn=None, key=None) -> HMCState:
    fn = _normalize_log_prob(log_prob_fn)
    if isinstance(inv_mass, (LowRankMetric, EigenMetric)) and (
            config.adapt_mass or config.init_step_search):
        raise ValueError("structured metrics are fixed: incompatible with "
                         "adapt_mass / init_step_search")
    if grad_fn is not None:
        # state.grad must hold the SAME gradient field the trajectory uses
        # (reversibility); log_prob stays exact
        lp = fn(position, aux)
        g = _normalize_log_prob(grad_fn)(position, aux)
    else:
        lp, g = jax.value_and_grad(fn)(position, aux)
    step0 = config.step_size
    if config.init_step_search and config.sampler == "hmc_nuts":
        if key is None:
            raise ValueError("init_step_search requires init_state(key=...)")
        from vihmc_tpu.hmc.adaptation import find_reasonable_step_size

        step0 = find_reasonable_step_size(
            lambda qq: jax.value_and_grad(fn)(qq, aux), position, key,
            init_step=config.step_size, inv_mass=inv_mass)
    welford = None
    if config.adapt_mass:
        welford = WelfordState(mean=jnp.zeros_like(position),
                               m2=jnp.zeros_like(position),
                               count=jnp.zeros((), jnp.float32))
    inv_mass_state = None
    if config.adapt_mass and config.mass_schedule == "windowed":
        inv_mass_state = jnp.broadcast_to(
            jnp.asarray(inv_mass, position.dtype), position.shape)
    momentum = None
    if config.momentum_persistence > 0.0:
        # zeros placeholder: the kernel fully refreshes at iteration 0, so
        # the carried value never enters the first draw
        momentum = jnp.zeros_like(position)
    return HMCState(position=position, log_prob=lp, grad=g,
                    da=da_init(step0), aux=aux, welford=welford,
                    inv_mass=inv_mass_state, momentum=momentum)


def clipped_grad_fn(base, max_norm: float, inv_mass=1.0, is_grad: bool = True):
    """Norm-clip a gradient field for use as the kernel's ``grad_fn``.

    ``base`` is a gradient oracle with the kernel's ``(q[, aux])`` signature
    (``is_grad=True``) or a log-prob function to autodiff (``is_grad=False``).
    The returned field equals the gradient wherever the preconditioned norm
    ``sqrt(sum(inv_mass * g^2))`` is below ``max_norm`` and is rescaled to
    that norm beyond. The clipped field is deterministic, so leapfrog
    trajectories remain reversible and volume-preserving and MH acceptance
    (on the exact density) stays unbiased — only proposals change.

    Purpose: escape hatch for chains trapped in far tails. Measured at the
    headline config a trapped chain sits at preconditioned |g| ~ 120x the
    healthy scale (~1.7 sqrt(d)), so every trajectory explodes and rejects
    indefinitely; under the clipped field trajectories drift back toward
    the typical set and get accepted. Pick ``max_norm`` ~ 10x sqrt(d) so
    the clip never binds in equilibrium.
    """
    raw = _normalize_log_prob(base)
    if not is_grad:
        raw = jax.grad(raw)

    def gfn(q, aux=None):
        g = raw(q, aux)
        norm = jnp.sqrt(jnp.sum(inv_mass * g * g))
        return g * jnp.minimum(1.0, max_norm / (norm + 1e-30))

    return gfn


def gaussian_field_grad(mu, sigma, alpha: float = 1.0):
    """Gaussian-score trajectory field: ``-(q - mu) / (alpha * sigma^2)``.

    The logical extreme of the surrogate trajectory-gradient family
    (cf. the coarse-grid/function-stride surrogates in
    :mod:`vihmc_tpu.ops.gram_merge` and the surrogate-gradient HMC
    literature): the leapfrog field is the score of ``N(mu, alpha sigma^2)``
    — e.g. the VI posterior over the sensitive subspace — so a trajectory
    costs ZERO likelihood evaluations. Used as the kernel's ``grad_fn``,
    the exact density at trajectory endpoints keeps MH unbiased for the
    true posterior (deterministic field -> reversible, volume-preserving
    leapfrog); only acceptance degrades where the posterior departs from
    the Gaussian.

    Measured on the reference-scale DeepONet headline posterior (variant G,
    docs/performance.md; now the ``bench.py`` headline): acceptance 0.49,
    pooled ESS 2500-2598 of 3072 at ~1/4 the dual-stride surrogate's wall
    clock — 1530.6 ESS/s/chip median. ``alpha`` stiffens (<1) or
    relaxes (>1) the field relative to ``sigma``; compose with
    :func:`clipped_grad_fn` if tail robustness is needed (the pure Gaussian
    field is already bounded-drift, so the clip rarely binds).
    """
    inv_var = 1.0 / (alpha * sigma ** 2)

    def grad(q, aux=None):
        return -(q - mu) * inv_var

    return grad


def make_kernel(
    log_prob_fn: Callable,
    config: HMCConfig,
    inv_mass=1.0,
    aux_refresh: Optional[Callable] = None,
    shard_log_prob_fn: Optional[Callable] = None,
    shard_data=None,
    grad_fn: Optional[Callable] = None,
    delta_fn: Optional[Callable] = None,
):
    """Build ``kernel(state, key, iteration) -> (state, info)``.

    Parameters
    ----------
    log_prob_fn : (q[, aux]) -> scalar log target density.
    inv_mass : scalar or (D,) diagonal inverse mass. A VI-posterior-variance
        inverse mass preconditions the subspace sampler (BASELINE.md north star).
    aux_refresh : (key, aux) -> aux, run before each draw (frozen-coordinate
        refresh policy). When it changes ``aux``, log_prob/grad are recomputed.
    shard_log_prob_fn, shard_data : per-shard potential for the splitting
        integrator: (q, shard[, aux]) -> scalar, with ``shard_data`` leaves
        stacked along axis 0.
    grad_fn : optional (q[, aux]) -> (D,) gradient oracle used for the
        leapfrog trajectory INSTEAD of autodiff through ``log_prob_fn``
        (e.g. the Gram-form DeepONet gradient,
        :mod:`vihmc_tpu.ops.gram_merge`). The exact ``log_prob_fn`` is still
        evaluated once per draw at the trajectory endpoint for the MH test,
        so any deterministic gradient field keeps the sampler unbiased
        (reversible, volume-preserving integrator; exact energies).
        Incompatible with the splitting integrator.
    delta_fn : optional ``(q1, q0, aux) -> (delta_log_prob, lp1_record)``
        PAIRED log-density difference used for the MH test instead of
        ``log_prob(q1) - log_prob(q0)``. For likelihoods that are sums of
        millions of terms, differencing two separately-accumulated f32 sums
        carries evaluation noise that GROWS with the distance |q1 - q0| —
        measured O(1) nats at trajectory-sized displacements on the
        reference-scale DeepONet (scripts/tpu_noise_probe.py), an
        acceptance ceiling that makes step-size adaptation collapse
        (docs/performance.md round 4). A paired evaluator computes the
        difference as one sum of SMALL per-term differences
        (e.g. sum((e1-e0)*(e1+e0)) for Gaussian errors), cutting the noise
        ~100x at f32. ``lp1_record`` is the proposal's log-density for the
        result records (any f32 evaluation). Plain leapfrog integrator
        only.
    """
    fn = _normalize_log_prob(log_prob_fn)
    vag = jax.value_and_grad(fn)
    gfn = _normalize_log_prob(grad_fn) if grad_fn is not None else None
    adapt = config.sampler == "hmc_nuts"
    windowed = False
    if config.adapt_mass and config.mass_schedule == "windowed":
        win_start, win_ends = mass_window_schedule(config.burn)
        windowed = len(win_ends) > 0

    if isinstance(inv_mass, (LowRankMetric, EigenMetric)) and config.adapt_mass:
        raise ValueError("structured metrics are fixed: incompatible with "
                         "adapt_mass")
    dfn = None
    if delta_fn is not None:
        if config.integrator == "splitting":
            raise ValueError("delta_fn requires the plain leapfrog integrator")
        dfn = delta_fn
    if config.integrator == "splitting":
        if shard_log_prob_fn is None or shard_data is None:
            raise ValueError("splitting integrator requires shard_log_prob_fn and shard_data")
        if gfn is not None:
            raise ValueError("grad_fn is incompatible with the splitting integrator")
    if config.jitter_l and config.jitter_eps:
        raise ValueError("jitter_l and jitter_eps are mutually exclusive")

    def kernel(state: HMCState, key, iteration):
        key_mom, key_u, key_aux, key_jit = jax.random.split(key, 4)
        in_burn = iteration < config.burn

        # --- frozen-coordinate refresh (first-class aux state) ---
        if aux_refresh is not None:
            aux = aux_refresh(key_aux, state.aux)
            if not config.refresh_during_burn:
                aux = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(in_burn, old, new), aux, state.aux)
            if gfn is not None:
                lp0, g0 = fn(state.position, aux), gfn(state.position, aux)
            else:
                lp0, g0 = vag(state.position, aux)
        elif dfn is not None:
            # paired-delta path: the MH test never uses lp0, so skip the
            # in-scan density recompute entirely (its purpose — killing the
            # cross-compilation f32 offset — is subsumed: the paired
            # evaluator differences per-term, which removes both the offset
            # and the distance-dependent accumulation noise)
            aux = state.aux
            g0 = state.grad
            lp0 = state.log_prob
        else:
            aux = state.aux
            # recompute lp0 IN-SCAN instead of trusting the carried value:
            # the cached log-prob was produced by a different compiled
            # dispatch (init_state, or the previous segment of a resumable
            # run), and XLA's f32 reduction order differs between
            # compilations — at reference scale (10M-term likelihood sums
            # of magnitude ~1e5) the systematic offset is a few tenths of
            # a nat, which enters EVERY MH delta as a constant bias and
            # pins acceptance near exp(-bias) regardless of step size
            # (measured: dual averaging wandering flat across decades of
            # tiny steps at ~target acceptance — docs/performance.md round
            # 3). One in-scan density eval per draw (the refresh path
            # already pays it) removes the bias; the cached gradient is
            # still used for the proposal (any deterministic field is
            # valid there).
            g0 = state.grad
            lp0 = fn(state.position, aux)

        # --- step size: adapting iterate during burn, averaged after
        # (adapt_forever: adapting iterate throughout) ---
        if adapt:
            if config.adapt_forever:
                eps = jnp.exp(state.da.log_step)
            else:
                eps = jnp.where(in_burn, jnp.exp(state.da.log_step),
                                jnp.exp(state.da.log_step_avg))
            if config.max_step is not None:
                eps = jnp.minimum(eps, config.max_step)
            if config.min_step is not None:
                eps = jnp.maximum(eps, config.min_step)
        else:
            eps = jnp.asarray(config.step_size, jnp.float32)
        if config.jitter_eps:
            low = min(max(config.jitter_low_frac,
                          1.0 / max(config.num_leapfrog, 1)), 1.0)
            eps = eps * jax.random.uniform(key_jit, (), minval=low, maxval=1.0)

        # --- mass matrix: fixed; carried metric updated at window boundaries
        # (windowed); or Welford-estimated posterior variances after the
        # first half of burn (half schedule) — shrunk Stan-style either way ---
        if windowed:
            inv_mass_t = state.inv_mass
        elif config.adapt_mass:
            switch = max(config.burn // 2, 1)
            var, n = pooled_variance(state.welford, config.metric_axis)
            var_hat = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
            base = inv_mass * jnp.ones_like(state.position)
            inv_mass_t = jnp.where(iteration >= switch, var_hat, base)
        else:
            inv_mass_t = inv_mass

        # --- momentum draw: p ~ N(0, M) (M = inv_mass^-1 for diagonal
        # metrics; M = D + UU^T for LowRankMetric — hmc/metric.py). With
        # momentum_persistence the fresh draw only partially replaces the
        # carried momentum (the linear combination preserves the N(0, M)
        # marginal for ANY metric); iteration 0 refreshes fully so the
        # zeros init never enters ---
        p_fresh = mass_sample_momentum(inv_mass_t, key_mom, state.position)
        alpha = config.momentum_persistence
        if alpha > 0.0:
            p0 = alpha * state.momentum + (1.0 - alpha ** 2) ** 0.5 * p_fresh
            p0 = jnp.where(iteration == 0, p_fresh, p0)
        else:
            p0 = p_fresh
        ke0 = mass_kinetic_energy(inv_mass_t, p0)

        # --- trajectory ---
        if config.integrator == "splitting":
            def shard_vag(q, shard):
                return jax.value_and_grad(
                    lambda qq: _call_shard(shard_log_prob_fn, qq, shard, aux)
                )(q)

            q1, p1 = split_leapfrog(shard_vag, shard_data, state.position, p0,
                                    eps, config.num_leapfrog, inv_mass_t)
            lp1, g1 = vag(q1, aux)
        elif config.jitter_l:
            # uniform random trajectory length in [low, L]: leapfrog steps past
            # the drawn length are masked out (no extra gradient evals saved —
            # shapes stay static — but fixed-L resonances are broken)
            low = max(1, int(round(config.jitter_low_frac * config.num_leapfrog)))
            n_steps = jax.random.randint(key_jit, (), low, config.num_leapfrog + 1)

            if gfn is not None:
                def lf_step(carry, i):
                    q, p, g = carry
                    p_half = p + 0.5 * eps * g
                    q_new = q + eps * mass_velocity(inv_mass_t, p_half)
                    g_new = gfn(q_new, aux)
                    p_new = p_half + 0.5 * eps * g_new
                    keep = i < n_steps
                    sel = lambda a, b: jnp.where(keep, a, b)
                    return (sel(q_new, q), sel(p_new, p), sel(g_new, g)), None

                (q1, p1, g1), _ = jax.lax.scan(
                    lf_step, (state.position, p0, g0),
                    jnp.arange(config.num_leapfrog))
                lp1 = lp0 if dfn is not None else fn(q1, aux)
            else:
                def lf_step(carry, i):
                    q, p, g, lp = carry
                    p_half = p + 0.5 * eps * g
                    q_new = q + eps * mass_velocity(inv_mass_t, p_half)
                    lp_new, g_new = vag(q_new, aux)
                    p_new = p_half + 0.5 * eps * g_new
                    keep = i < n_steps
                    sel = lambda a, b: jnp.where(keep, a, b)
                    return (sel(q_new, q), sel(p_new, p), sel(g_new, g),
                            sel(lp_new, lp)), None

                (q1, p1, g1, lp1), _ = jax.lax.scan(
                    lf_step, (state.position, p0, g0, lp0),
                    jnp.arange(config.num_leapfrog))
        elif gfn is not None:
            # gradient-only trajectory; one exact density eval at the endpoint
            q1, p1, g1 = leapfrog_grad_only(lambda q: gfn(q, aux),
                                            state.position, p0, g0, eps,
                                            config.num_leapfrog, inv_mass_t)
            lp1 = lp0 if dfn is not None else fn(q1, aux)
        else:
            q1, p1, lp1, g1 = leapfrog(lambda q: vag(q, aux), state.position, p0,
                                       g0, eps, config.num_leapfrog, inv_mass_t)
        ke1 = mass_kinetic_energy(inv_mass_t, p1)

        # --- Metropolis accept/reject with NaN-safe energies ---
        if dfn is not None:
            dlp, lp1 = dfn(q1, state.position, aux)
            delta = dlp - (ke1 - ke0)
        else:
            delta = (lp1 - ke1) - (lp0 - ke0)
        finite = jnp.isfinite(delta)
        accept_prob = jnp.where(finite, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 0.0))), 0.0)
        log_u = jnp.log(jax.random.uniform(key_u))
        accept = finite & (log_u < delta)
        divergent = jnp.logical_not(finite) | (delta < DIVERGENCE_THRESHOLD)

        position = jnp.where(accept, q1, state.position)
        log_prob = jnp.where(accept, lp1, lp0)
        grad = jnp.where(accept, g1, g0)
        momentum = None
        if alpha > 0.0:
            # Horowitz scheme: the proposal is flip(leapfrog(q, p)) and the
            # chain negates momentum again after the MH step — net effect:
            # accepted draws KEEP the trajectory-end momentum (persistent
            # motion), rejected draws FLIP the carried momentum (required
            # for exactness; also why rejections hurt persistence). Kinetic
            # energy is even in p, so the MH delta above is unchanged.
            momentum = jnp.where(accept, p1, -p0)

        # --- Welford accumulation / metric updates ---
        is_win_end = None
        inv_mass_state = state.inv_mass
        if windowed:
            welford, inv_mass_state, is_win_end = windowed_metric_update(
                state.welford, position, iteration, win_start, win_ends,
                inv_mass, state.inv_mass, metric_axis=config.metric_axis)
        elif config.adapt_mass:
            switch = max(config.burn // 2, 1)
            new_w = state.welford.update(position)
            welford = jax.tree_util.tree_map(
                lambda a, b: jnp.where(iteration < switch, a, b),
                new_w, state.welford)
        else:
            welford = state.welford

        # --- dual averaging (burn phase only; restart at metric updates) ---
        if adapt:
            accept_stat = accept_prob
            if config.da_axis is not None:
                accept_stat = jax.lax.pmean(accept_prob, config.da_axis)
            da_new = da_update(state.da, accept_stat, config.target_accept)
            if config.adapt_forever:
                da = da_new
            else:
                da = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(in_burn, new, old), da_new,
                    state.da)
            if is_win_end is not None:
                da = jax.tree_util.tree_map(
                    lambda r, c: jnp.where(is_win_end, r, c), da_restart(da), da)
        else:
            da = state.da

        new_state = HMCState(position=position, log_prob=log_prob, grad=grad,
                             da=da, aux=aux, welford=welford,
                             inv_mass=inv_mass_state, momentum=momentum)
        info = {
            "accept_prob": accept_prob,
            "accepted": accept,
            "step_size": eps,
            "divergent": divergent,
            "log_prob": log_prob,
        }
        return new_state, info

    return kernel


def _call_shard(fn, q, shard, aux):
    if _num_positional_params(fn) >= 3:
        return fn(q, shard, aux)
    return fn(q, shard)


def sample(
    log_prob_fn: Callable,
    init_position: jnp.ndarray,
    key,
    config: HMCConfig,
    inv_mass=1.0,
    aux=None,
    aux_refresh: Optional[Callable] = None,
    shard_log_prob_fn: Optional[Callable] = None,
    shard_data=None,
    grad_fn: Optional[Callable] = None,
    delta_fn: Optional[Callable] = None,
) -> SampleResult:
    """Draw ``config.num_samples`` HMC samples from ``log_prob_fn``.

    The whole chain is one ``lax.scan``; wrap in ``jax.jit`` (the pipelines
    do) so all draws compile to a single XLA computation.
    """
    kernel = make_kernel(log_prob_fn, config, inv_mass=inv_mass,
                         aux_refresh=aux_refresh,
                         shard_log_prob_fn=shard_log_prob_fn, shard_data=shard_data,
                         grad_fn=grad_fn, delta_fn=delta_fn)
    state0 = init_state(log_prob_fn, init_position, config, aux=aux,
                        inv_mass=inv_mass, grad_fn=grad_fn,
                        key=jax.random.fold_in(key, 0x1517))

    keys = jax.random.split(key, config.num_samples)
    iters = jnp.arange(config.num_samples)

    def step(state, xs):
        k, i = xs
        state, info = kernel(state, k, i)
        out = {"position": state.position, **info}
        if config.store_aux_trace:
            out["aux"] = state.aux
        return state, out

    final_state, outs = jax.lax.scan(step, state0, (keys, iters))
    return SampleResult(
        samples=outs["position"],
        log_probs=outs["log_prob"],
        accept_probs=outs["accept_prob"],
        accepted=outs["accepted"],
        step_sizes=outs["step_size"],
        divergent=outs["divergent"],
        final_state=final_state,
        aux_trace=outs.get("aux"),
    )
