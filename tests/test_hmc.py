"""Statistical validation of the HMC kernel on analytic targets.

The reference's sampler semantics come from the external hamiltorch library
(SURVEY.md section 2.4/7.3); correctness here is established against closed
forms: moment recovery on Gaussian targets within MC error, leapfrog
reversibility/symplecticity, NaN-rejection, dual-averaging acceptance
targeting, and split-integrator equivalence of the stationary distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.hmc import (
    HMCConfig,
    sample,
    leapfrog,
    da_init,
    da_update,
    find_reasonable_step_size,
    FrozenPolicy,
    SubspaceSpec,
    make_subspace_log_prob,
)
from vihmc_tpu.dists import diag_normal_logpdf_sum


def std_normal_lp(q):
    return -0.5 * jnp.sum(q * q)


def test_leapfrog_reversibility():
    vag = jax.value_and_grad(std_normal_lp)
    q0 = jnp.array([1.0, -0.5, 2.0])
    p0 = jnp.array([0.3, 0.7, -1.1])
    _, g0 = vag(q0)
    q1, p1, _, g1 = leapfrog(vag, q0, p0, g0, 0.1, 25)
    # integrate back with flipped momentum
    q2, p2, _, _ = leapfrog(vag, q1, -p1, g1, 0.1, 25)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(-p2), np.asarray(p0), atol=1e-4)


def test_leapfrog_energy_conservation():
    vag = jax.value_and_grad(std_normal_lp)
    q0 = jnp.array([1.0, -0.5])
    p0 = jnp.array([0.3, 0.7])
    _, g0 = vag(q0)
    h0 = -std_normal_lp(q0) + 0.5 * jnp.sum(p0 * p0)
    q1, p1, lp1, _ = leapfrog(vag, q0, p0, g0, 0.01, 1000)
    h1 = -lp1 + 0.5 * jnp.sum(p1 * p1)
    assert abs(float(h1 - h0)) < 1e-3  # O(eps^2) energy error


def test_leapfrog_symplecticity_volume_preservation():
    """|det d(q1,p1)/d(q0,p0)| == 1 for the leapfrog map (SURVEY test plan)."""
    vag = jax.value_and_grad(std_normal_lp)

    def phase_map(z):
        q, p = z[:2], z[2:]
        _, g = vag(q)
        q1, p1, _, _ = leapfrog(vag, q, p, g, 0.3, 5)
        return jnp.concatenate([q1, p1])

    z0 = jnp.array([0.7, -0.3, 0.2, 1.1])
    jac = jax.jacfwd(phase_map)(z0)
    np.testing.assert_allclose(abs(float(jnp.linalg.det(jac))), 1.0, rtol=1e-4)


def test_hmc_standard_normal_moments():
    cfg = HMCConfig(num_samples=2000, num_leapfrog=8, step_size=0.35, burn=0)
    res = jax.jit(lambda k: sample(std_normal_lp, jnp.zeros(3), k, cfg))(jax.random.key(0))
    post = np.asarray(res.samples[500:])
    assert float(res.acceptance_rate) > 0.7
    np.testing.assert_allclose(post.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(post.std(0), 1.0, atol=0.15)
    assert int(res.num_divergent) == 0


def test_hmc_correlated_gaussian_moments():
    cov = jnp.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.linalg.inv(cov)

    def lp(q):
        return -0.5 * q @ prec @ q

    cfg = HMCConfig(num_samples=4000, num_leapfrog=12, step_size=0.25)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(2), k, cfg))(jax.random.key(1))
    post = np.asarray(res.samples[1000:])
    emp_cov = np.cov(post.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.35)


def test_ghmc_persistent_momentum_moments():
    """Generalized/Horowitz HMC (momentum_persistence + reject-flip) is
    exact: correlated-Gaussian moments recovered at L=1, alpha=0.9 —
    the regime where plain HMC would random-walk."""
    cov = jnp.array([[1.0, 0.8], [0.8, 2.0]])
    prec = jnp.linalg.inv(cov)

    def lp(q):
        return -0.5 * q @ prec @ q

    cfg = HMCConfig(num_samples=8000, num_leapfrog=1, step_size=0.35,
                    momentum_persistence=0.9)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(2), k, cfg))(jax.random.key(3))
    assert float(res.acceptance_rate) > 0.8
    post = np.asarray(res.samples[2000:])
    emp_cov = np.cov(post.T)
    np.testing.assert_allclose(post.mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.4)


def test_ghmc_asymmetric_target_moments():
    """The reject-side momentum FLIP is load-bearing: on an asymmetric
    (quartic-tilted) 1-D target, persistent momentum without the flip
    biases the stationary law. Moments are checked against numerical
    quadrature."""
    def lp(q):
        x = q[0]
        return -0.25 * x ** 4 + 0.5 * x ** 2 - 0.3 * x

    xs = np.linspace(-6, 6, 20001)
    w = np.exp(-0.25 * xs ** 4 + 0.5 * xs ** 2 - 0.3 * xs)
    w /= w.sum()
    want_mean = float((w * xs).sum())
    want_std = float(np.sqrt((w * xs ** 2).sum() - want_mean ** 2))

    cfg = HMCConfig(num_samples=12000, num_leapfrog=2, step_size=0.4,
                    momentum_persistence=0.85)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(1), k, cfg))(jax.random.key(4))
    post = np.asarray(res.samples[2000:, 0])
    assert abs(post.mean() - want_mean) < 0.1
    assert abs(post.std() - want_std) < 0.12


def test_ghmc_zero_persistence_matches_plain_hmc():
    """alpha=0 must reproduce the plain-HMC chain draw-for-draw (same key)."""
    cfg0 = HMCConfig(num_samples=50, num_leapfrog=5, step_size=0.3)
    cfga = HMCConfig(num_samples=50, num_leapfrog=5, step_size=0.3,
                     momentum_persistence=0.0)
    r0 = sample(std_normal_lp, jnp.ones(3), jax.random.key(7), cfg0)
    ra = sample(std_normal_lp, jnp.ones(3), jax.random.key(7), cfga)
    np.testing.assert_array_equal(np.asarray(r0.samples), np.asarray(ra.samples))


def test_hmc_offset_gaussian_with_diag_mass():
    mu = jnp.array([3.0, -2.0, 0.5])
    scale = jnp.array([0.1, 1.0, 5.0])

    def lp(q):
        return diag_normal_logpdf_sum(q, mu, scale)

    # precondition with the true variances as inverse mass
    cfg = HMCConfig(num_samples=3000, num_leapfrog=10, step_size=0.5)
    res = jax.jit(lambda k: sample(lp, mu + 0.0, k, cfg, inv_mass=scale**2))(jax.random.key(2))
    post = np.asarray(res.samples[500:])
    assert float(res.acceptance_rate) > 0.6
    assert np.all(np.abs(post.mean(0) - np.asarray(mu)) < np.asarray(scale) * 0.2)
    np.testing.assert_allclose(post.std(0), np.asarray(scale), rtol=0.25)


def test_nan_log_prob_rejected_not_propagated():
    def lp(q):
        # blows up outside |q|<2 -> NaN gradients territory
        return jnp.where(jnp.abs(q[0]) < 2.0, -0.5 * jnp.sum(q * q), jnp.nan)

    cfg = HMCConfig(num_samples=200, num_leapfrog=5, step_size=0.5)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(1), k, cfg))(jax.random.key(3))
    samples = np.asarray(res.samples)
    assert np.all(np.isfinite(samples))  # NaN proposals never accepted


def test_dual_averaging_targets_acceptance():
    # deliberately bad initial step; adaptation should fix acceptance to ~0.8
    cfg = HMCConfig(num_samples=1500, num_leapfrog=5, step_size=5.0, burn=500,
                    sampler="hmc_nuts", target_accept=0.8)
    res = jax.jit(lambda k: sample(std_normal_lp, jnp.zeros(5), k, cfg))(jax.random.key(4))
    post_burn_accept = float(np.mean(np.asarray(res.accept_probs[500:])))
    assert 0.6 < post_burn_accept < 0.95
    # step size frozen after burn
    eps_post = np.asarray(res.step_sizes[501:])
    assert np.allclose(eps_post, eps_post[0])
    # and it moved away from the bad initial value
    assert eps_post[0] < 5.0


def test_da_update_math():
    st = da_init(0.1)
    st2 = da_update(st, jnp.asarray(0.5), target_accept=0.8)
    assert float(st2.t) == 1.0
    # H_bar pulled toward (target - accept) = 0.3
    np.testing.assert_allclose(float(st2.h_bar), 0.3 / 11.0, rtol=1e-5)


def test_find_reasonable_step_size():
    vag = jax.value_and_grad(std_normal_lp)
    eps = float(find_reasonable_step_size(vag, jnp.zeros(10), jax.random.key(0)))
    assert 1e-3 < eps < 10.0


def test_splitting_integrator_matches_target():
    """Split-Hamiltonian HMC leaves the same target invariant (shard sum)."""
    # target: N(0, I_2); two shards each contributing half the potential,
    # mirroring the reference's prior/num_splits rescaling
    # (main_HMC_splitting.py:253-254).
    data = jnp.arange(8.0).reshape(2, 4)  # 2 shards (content unused by lp)

    def shard_lp(q, shard):
        del shard
        return -0.5 * jnp.sum(q * q) / 2.0

    def full_lp(q):
        return -0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=3000, num_leapfrog=6, step_size=0.4,
                    integrator="splitting")
    res = jax.jit(
        lambda k: sample(full_lp, jnp.zeros(2), k, cfg,
                         shard_log_prob_fn=shard_lp, shard_data=data)
    )(jax.random.key(5))
    post = np.asarray(res.samples[500:])
    assert float(res.acceptance_rate) > 0.7
    np.testing.assert_allclose(post.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(post.std(0), 1.0, atol=0.15)


# ---------------------------------------------------------------------------
# Subspace (VI-HMC) machinery
# ---------------------------------------------------------------------------

def _spec():
    mu = jnp.array([1.0, 2.0, 3.0, 4.0])
    sigma = jnp.array([0.1, 0.2, 0.3, 0.4])
    return SubspaceSpec(idx=(1, 3), mu=mu, sigma=sigma)


def test_subspace_scatter_mean_policy():
    spec = _spec()
    seen = {}

    def full_lp(full):
        seen["full"] = full
        return -0.5 * jnp.sum(full * full)

    lp, aux0, refresh = make_subspace_log_prob(full_lp, spec, FrozenPolicy.MEAN)
    assert refresh is None
    np.testing.assert_allclose(np.asarray(aux0), np.asarray(spec.mu))
    val = lp(jnp.array([-7.0, -8.0]), aux0)
    np.testing.assert_allclose(np.asarray(seen["full"]), [1.0, -7.0, 3.0, -8.0])
    np.testing.assert_allclose(float(val), -0.5 * (1 + 49 + 9 + 64), rtol=1e-6)


def test_subspace_refresh_policy_changes_frozen():
    spec = _spec()
    lp, aux0, refresh = make_subspace_log_prob(
        lambda f: -0.5 * jnp.sum(f * f), spec, FrozenPolicy.REFRESH,
        init_key=jax.random.key(0))
    assert refresh is not None
    aux1 = refresh(jax.random.key(1), aux0)
    assert not np.allclose(np.asarray(aux0), np.asarray(aux1))
    # frozen draws are centered on VI means with VI stds
    draws = np.stack([np.asarray(refresh(jax.random.key(i), aux0)) for i in range(500)])
    np.testing.assert_allclose(draws.mean(0), np.asarray(spec.mu), atol=0.06)
    np.testing.assert_allclose(draws.std(0), np.asarray(spec.sigma), rtol=0.2)


def test_subspace_hmc_recovers_conditional():
    """HMC over a subspace of a correlated Gaussian = conditional distribution."""
    prec = jnp.linalg.inv(jnp.array([[1.0, 0.6], [0.6, 1.5]]))

    def full_lp(full):
        return -0.5 * full @ prec @ full

    # freeze coordinate 0 at 1.0; sample coordinate 1 | q0=1
    spec = SubspaceSpec(idx=(1,), mu=jnp.array([1.0, 0.0]), sigma=jnp.array([1e-8, 1.0]))
    lp, aux0, _ = make_subspace_log_prob(full_lp, spec, FrozenPolicy.MEAN)
    cfg = HMCConfig(num_samples=20000, num_leapfrog=6, step_size=0.9)
    res = jax.jit(lambda k: sample(lp, jnp.zeros(1), k, cfg, aux=aux0))(jax.random.key(6))
    post = np.asarray(res.samples[5000:, 0])

    # analytic conditional N(mu_c, var_c) for q1 | q0 = 1 with precision matrix
    var_c = 1.0 / float(prec[1, 1])
    mu_c = -float(prec[1, 0]) / float(prec[1, 1]) * 1.0
    assert abs(post.mean() - mu_c) < 0.1
    np.testing.assert_allclose(post.std(), np.sqrt(var_c), rtol=0.15)


def test_paired_delta_matches_standard_mh():
    """delta_fn (paired MH log-density difference — the round-4 fix for
    f32 sum-accumulation noise at reference scale) samples the same
    posterior as the standard lp1 - lp0 test: moment agreement within MC
    error on a conjugate Gaussian target with a many-term likelihood."""
    import numpy as np

    from vihmc_tpu.chains import sample_chains

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2000, 2)), jnp.float32)
    w_true = jnp.asarray([0.7, -0.4])
    y = x @ w_true + 0.3 * jnp.asarray(rng.normal(size=2000), jnp.float32)
    tau = 0.3 ** 2

    def lp(q, aux=None):
        e = x @ q - y
        return -0.5 / tau * jnp.sum(e * e) - 0.5 * jnp.sum(q * q)

    def delta_fn(q1, q0, aux):
        e1 = x @ q1 - y
        e0 = x @ q0 - y
        dll = -0.5 / tau * jnp.sum((e1 - e0) * (e1 + e0))
        dpr = -0.5 * (jnp.sum(q1 * q1) - jnp.sum(q0 * q0))
        lp1 = -0.5 / tau * jnp.sum(e1 * e1) - 0.5 * jnp.sum(q1 * q1)
        return dll + dpr, lp1

    # analytic posterior: precision = X^T X / tau + I
    prec = np.asarray(x.T @ x) / tau + np.eye(2)
    cov = np.linalg.inv(prec)
    mean = cov @ (np.asarray(x.T @ y) / tau)

    cfg = HMCConfig(num_samples=1500, num_leapfrog=8, step_size=0.01,
                    burn=300, sampler="hmc", jitter_l=True,
                    jitter_low_frac=0.5)
    inits = jnp.zeros((4, 2))
    res_p = sample_chains(lp, inits, jax.random.key(1), cfg,
                          delta_fn=delta_fn)
    res_s = sample_chains(lp, inits, jax.random.key(1), cfg)
    for res in (res_p, res_s):
        post = np.asarray(res.samples)[:, 300:, :].reshape(-1, 2)
        se = np.sqrt(np.diag(cov) / 200)  # generous ESS floor
        assert np.all(np.abs(post.mean(0) - mean) < 4 * se)
        assert np.allclose(post.var(0), np.diag(cov), rtol=0.25)
    # both paths accept at comparable rates on this well-conditioned target
    assert abs(float(res_p.acceptance_rate)
               - float(res_s.acceptance_rate)) < 0.1
