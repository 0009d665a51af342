"""Diagonal mass-matrix adaptation (Welford during warmup)."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import HMCConfig, sample
from vihmc_tpu.dists import diag_normal_logpdf_sum


def test_mass_adaptation_recovers_anisotropic_target():
    """Target with 100:1 scale separation; identity mass mixes the wide dim
    terribly, adapted mass recovers both marginals."""
    scale = jnp.array([0.1, 10.0])

    def lp(q):
        return diag_normal_logpdf_sum(q, 0.0, scale)

    cfg_adapt = HMCConfig(num_samples=3000, num_leapfrog=10, step_size=0.05,
                          burn=1000, sampler="hmc_nuts", adapt_mass=True)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(2), k, cfg_adapt))(jax.random.key(0))
    post = np.asarray(res.samples[1000:])
    np.testing.assert_allclose(post.std(0), np.asarray(scale), rtol=0.25)
    assert 0.5 < float(np.mean(np.asarray(res.accept_probs[1000:]))) <= 1.0

    # the Welford estimate (from warmup only, before full exploration) at
    # least captures the scale separation between dimensions
    var_hat = np.asarray(res.final_state.welford.variance)
    assert var_hat[1] / var_hat[0] > 100.0
    assert abs(np.sqrt(var_hat[0]) - 0.1) < 0.05


def test_jittered_trajectory_length():
    """jitter_l samples correctly (moments) and breaks fixed-L periodicity."""
    def lp(q):
        return -0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=3000, num_leapfrog=8, step_size=0.35,
                    jitter_l=True)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(2), k, cfg))(jax.random.key(2))
    post = np.asarray(res.samples[500:])
    np.testing.assert_allclose(post.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(post.std(0), 1.0, atol=0.12)
    assert float(res.acceptance_rate) > 0.7


def test_jittered_step_size():
    """jitter_eps samples correctly (moments), varies the per-draw step
    within [low*eps, eps], and is rejected alongside jitter_l."""
    def lp(q):
        return -0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=3000, num_leapfrog=8, step_size=0.35,
                    jitter_eps=True, jitter_low_frac=0.5)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(2), k, cfg))(jax.random.key(2))
    post = np.asarray(res.samples[500:])
    np.testing.assert_allclose(post.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(post.std(0), 1.0, atol=0.12)
    # shrunken steps only -> acceptance at least as good as fixed-step
    assert float(res.acceptance_rate) > 0.7
    steps = np.asarray(res.step_sizes)
    assert steps.min() >= 0.35 * 0.5 - 1e-6
    assert steps.max() <= 0.35 + 1e-6
    assert steps.std() > 0.01  # actually jittering

    import dataclasses

    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        sample(lp, jnp.zeros(2),  jax.random.key(0),
               dataclasses.replace(cfg, jitter_l=True))


def test_mass_window_schedule_static_shape():
    from vihmc_tpu.hmc.kernel import mass_window_schedule

    start, ends = mass_window_schedule(100)
    assert start == 15 and ends[-1] == 90
    assert all(b > a for a, b in zip(ends, ends[1:]))  # strictly increasing
    # doubling widths until the absorbed tail
    widths = np.diff([start, *ends])
    assert list(widths[:-1]) == [widths[0] * 2**i for i in range(len(widths) - 1)]
    # too-short burns degrade to no windows
    assert mass_window_schedule(10) == (0, ())


def test_windowed_mass_adaptation_recovers_anisotropic_target():
    """Windowed warmup (metric updates + DA restarts) recovers a 100:1 target
    and ends with a carried inv_mass close to the target variances."""
    scale = jnp.array([0.1, 10.0])

    def lp(q):
        return diag_normal_logpdf_sum(q, 0.0, scale)

    cfg = HMCConfig(num_samples=3000, num_leapfrog=10, step_size=0.05,
                    burn=1000, sampler="hmc_nuts", adapt_mass=True,
                    mass_schedule="windowed")
    res = jax.jit(lambda k: sample(lp, jnp.zeros(2), k, cfg))(jax.random.key(0))
    post = np.asarray(res.samples[1000:])
    np.testing.assert_allclose(post.std(0), np.asarray(scale), rtol=0.25)
    assert 0.5 < float(np.mean(np.asarray(res.accept_probs[1000:]))) <= 1.0

    inv_mass = np.asarray(res.final_state.inv_mass)
    assert inv_mass[1] / inv_mass[0] > 100.0  # scale separation captured
    np.testing.assert_allclose(np.sqrt(inv_mass), np.asarray(scale), rtol=0.5)


def test_windowed_nuts_mass_adaptation():
    from vihmc_tpu.hmc.nuts import NUTSConfig, nuts_sample

    scale = jnp.array([0.05, 5.0])

    def lp(q):
        return diag_normal_logpdf_sum(q, 0.0, scale)

    cfg = NUTSConfig(num_samples=1200, max_depth=5, step_size=0.05, burn=600,
                     adapt_mass=True, mass_schedule="windowed")
    res = jax.jit(lambda k: nuts_sample(lp, jnp.zeros(2), k, cfg))(jax.random.key(3))
    post = np.asarray(res.samples[600:])
    np.testing.assert_allclose(post.std(0), np.asarray(scale), rtol=0.3)
    inv_mass = np.asarray(res.final_state.inv_mass)
    assert inv_mass[1] / inv_mass[0] > 100.0


def test_adapt_mass_state_is_carried():
    cfg = HMCConfig(num_samples=40, num_leapfrog=3, step_size=0.3, burn=20,
                    adapt_mass=True)
    res = jax.jit(lambda k: sample(
        lambda q: -0.5 * jnp.sum(q * q), jnp.zeros(3), k, cfg))(jax.random.key(1))
    w = res.final_state.welford
    assert float(w.count) == 10.0  # first half of burn only
    assert np.isfinite(np.asarray(w.variance)).all()


def test_min_step_clamps_da_collapse():
    """min_step bounds dual-averaging collapse when the acceptance target
    sits above the configuration's ceiling (round-4 forensics: an O(1)-nat
    Delta-H floor makes DA shrink the step without bound)."""
    import jax
    import jax.numpy as jnp

    from vihmc_tpu.hmc import HMCConfig, sample

    # a "noisy-ceiling" target: smooth Gaussian plus a deterministic
    # high-frequency ripple that puts an O(1) floor under Delta H at any
    # step — acceptance can never reach the 0.9 target
    def lp(q):
        return -0.5 * jnp.sum(q * q) + 1.5 * jnp.sum(jnp.cos(q * 1e5))

    cfg = HMCConfig(num_samples=200, num_leapfrog=4, step_size=0.1,
                    burn=200, sampler="hmc_nuts", target_accept=0.9,
                    adapt_forever=True, min_step=1e-3)
    res = sample(lp, jnp.zeros(8), jax.random.key(0), cfg)
    import numpy as np

    steps = np.asarray(res.step_sizes)
    assert steps.min() >= 1e-3 - 1e-9
