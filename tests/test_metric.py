"""Low-rank + diagonal kinetic metric (vihmc_tpu/hmc/metric.py).

The round-3 finding this module answers: the 90%-captured-variance VI-HMC
conditional (the configuration the reference actually samples,
/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:283) is
off-diagonally stiff beyond any diagonal metric. Tests here verify the
Woodbury algebra exactly against dense solves, the Lanczos eigen-estimation,
and — statistically — that the low-rank metric samples a correlated stiff
Gaussian a diagonal metric cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.chains import effective_sample_size_np, sample_chains
from vihmc_tpu.chains.resume import sample_chains_resumable
from vihmc_tpu.hmc import HMCConfig, sample
from vihmc_tpu.hmc.metric import (LowRankMetric, estimate_lowrank_metric,
                                  hvp_fn, lanczos_eigs, lowrank_from_eigs,
                                  make_lowrank_metric, mass_diag_inv,
                                  mass_kinetic_energy, mass_sample_momentum,
                                  mass_velocity, preconditioned_hvp)


def _random_metric(key, d=40, k=5):
    k1, k2 = jax.random.split(key)
    diag = 0.5 + jax.random.uniform(k1, (d,))
    u = 0.7 * jax.random.normal(k2, (d, k))
    return make_lowrank_metric(diag, u)


class TestWoodburyAlgebra:
    def test_velocity_matches_dense_solve(self):
        m = _random_metric(jax.random.key(0))
        p = jax.random.normal(jax.random.key(1), (40,))
        dense = np.asarray(m.dense(), np.float64)
        want = np.linalg.solve(dense, np.asarray(p, np.float64))
        got = np.asarray(mass_velocity(m, p))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_kinetic_energy_matches_dense(self):
        m = _random_metric(jax.random.key(2))
        p = jax.random.normal(jax.random.key(3), (40,))
        dense = np.asarray(m.dense(), np.float64)
        pn = np.asarray(p, np.float64)
        want = 0.5 * pn @ np.linalg.solve(dense, pn)
        got = float(mass_kinetic_energy(m, p))
        assert got == pytest.approx(want, rel=2e-4)

    def test_diagonal_dispatch_unchanged(self):
        inv_mass = jnp.asarray([0.5, 2.0, 1.0])
        p = jnp.asarray([1.0, -2.0, 3.0])
        np.testing.assert_allclose(mass_velocity(inv_mass, p), inv_mass * p)
        assert float(mass_kinetic_energy(inv_mass, p)) == pytest.approx(
            float(0.5 * jnp.sum(inv_mass * p * p)))
        np.testing.assert_allclose(np.asarray(mass_diag_inv(inv_mass)),
                                   np.asarray(inv_mass))

    def test_momentum_sample_covariance_is_mass(self):
        # Cov(sqrt(D) z1 + U z2) = D + UU^T exactly; check empirically
        m = _random_metric(jax.random.key(4), d=12, k=3)
        keys = jax.random.split(jax.random.key(5), 40000)
        ps = jax.vmap(lambda k: mass_sample_momentum(m, k, jnp.zeros(12)))(keys)
        emp = np.cov(np.asarray(ps).T)
        want = np.asarray(m.dense())
        scale = np.sqrt(np.outer(np.diag(want), np.diag(want)))
        assert np.max(np.abs(emp - want) / scale) < 0.06

    def test_lowrank_from_eigs_identity_when_flat(self):
        # lambda = 1 everywhere -> pure diagonal metric (U has zero columns)
        d = 10
        diag_inv = 0.3 + jnp.arange(d, dtype=jnp.float32) / 10
        vecs = jnp.eye(d)[:, :3]
        m = lowrank_from_eigs(diag_inv, jnp.ones(3), vecs)
        p = jax.random.normal(jax.random.key(0), (d,))
        np.testing.assert_allclose(np.asarray(mass_velocity(m, p)),
                                   np.asarray(diag_inv * p), rtol=1e-5)

    def test_lowrank_from_eigs_whitens_known_precision(self):
        # build a precision P = S^-1 (I + (lam-1) v v^T) S^-1, feed its
        # preconditioned eigenpair to lowrank_from_eigs, expect M == P
        d, lam = 8, 50.0
        key = jax.random.key(7)
        diag_inv = 0.2 + jax.random.uniform(key, (d,))
        v = jax.random.normal(jax.random.key(8), (d,))
        v = v / jnp.linalg.norm(v)
        m = lowrank_from_eigs(diag_inv, jnp.asarray([lam]), v[:, None])
        s_inv = 1.0 / jnp.sqrt(diag_inv)
        inner = jnp.eye(d) + (lam - 1.0) * jnp.outer(v, v)
        p_want = (s_inv[:, None] * inner) * s_inv[None, :]
        np.testing.assert_allclose(np.asarray(m.dense()), np.asarray(p_want),
                                   rtol=1e-4, atol=1e-4)


class TestLanczos:
    def test_recovers_top_eigenpairs(self):
        # symmetric matrix with a known, well-separated top spectrum
        d = 60
        rng = np.random.default_rng(0)
        q, _ = np.linalg.qr(rng.normal(size=(d, d)))
        evals = np.concatenate([[500.0, 120.0, 40.0],
                                rng.uniform(0.1, 2.0, d - 3)])
        a = (q * evals) @ q.T
        a_j = jnp.asarray(a, jnp.float32)
        vals, vecs = lanczos_eigs(lambda v: a_j @ v, d, rank=3, num_iters=30,
                                  key=jax.random.key(0))
        np.testing.assert_allclose(np.asarray(vals), evals[:3], rtol=1e-3)
        for i in range(3):
            cos = abs(float(np.asarray(vecs)[:, i] @ q[:, i]))
            assert cos > 0.999

    def test_hvp_matches_dense_hessian(self):
        def lp(x):
            return -0.5 * jnp.sum(x ** 2 * jnp.arange(1.0, 5.0)) - x[0] * x[1]

        q0 = jnp.asarray([0.3, -0.2, 0.1, 0.5])
        hvp = hvp_fn(lp, q0)
        dense = -np.asarray(jax.hessian(lp)(q0))
        for i in range(4):
            e = jnp.zeros(4).at[i].set(1.0)
            np.testing.assert_allclose(np.asarray(hvp(e)), dense[:, i],
                                       rtol=1e-5, atol=1e-6)

    def test_preconditioned_hvp_flat_for_matched_diag(self):
        # if diag_inv_mass == true marginal variances of an AXIS-ALIGNED
        # Gaussian, the preconditioned operator is the identity
        var = jnp.asarray([0.5, 2.0, 0.1])

        def lp(x):
            return -0.5 * jnp.sum(x ** 2 / var)

        mv = preconditioned_hvp(lp, jnp.zeros(3), var)
        # the preconditioned operator is the identity, so the Krylov space is
        # one-dimensional and the single converged Ritz value is 1 — no
        # residual stiffness for lowrank_from_eigs to correct
        vals, _ = lanczos_eigs(mv, 3, rank=1, num_iters=3,
                               key=jax.random.key(1))
        assert float(vals[0]) == pytest.approx(1.0, rel=1e-4)


def _stiff_gaussian(d=48, k_stiff=3, lam=2000.0, seed=0):
    """Correlated Gaussian whose precision is I + (lam-1) sum v_i v_i^T for
    random non-axis-aligned v_i — diagonal marginal variances are all ~1-ish
    (so a diagonal/Laplace metric sees nothing) but the conditional curvature
    along the v_i is lam. The miniature of the round-3 90%-subspace stiffness."""
    rng = np.random.default_rng(seed)
    v = np.linalg.qr(rng.normal(size=(d, k_stiff)))[0]
    prec = np.eye(d) + (lam - 1.0) * v @ v.T
    prec_j = jnp.asarray(prec, jnp.float32)
    cov = np.linalg.inv(prec)

    def lp(x):
        return -0.5 * x @ (prec_j @ x)

    return lp, prec, cov, jnp.asarray(v, jnp.float32)


class TestHutchinson:
    def test_diag_estimate_converges(self):
        from vihmc_tpu.hmc.metric import hutchinson_diag

        d = 30
        rng = np.random.default_rng(0)
        a = rng.normal(size=(d, d))
        a = a @ a.T + np.diag(rng.uniform(5, 10, d))
        a_j = jnp.asarray(a, jnp.float32)
        est = np.asarray(hutchinson_diag(lambda v: a_j @ v, d, 4000,
                                         jax.random.key(1)))
        np.testing.assert_allclose(est, np.diag(a), rtol=0.15)


class TestStiffGaussianSampling:
    def test_lowrank_metric_samples_what_diagonal_cannot(self):
        d = 48
        lp, prec, cov, v = _stiff_gaussian(d=d)
        cfg = HMCConfig(num_samples=600, num_leapfrog=8, step_size=0.5,
                        burn=100, sampler="hmc", jitter_l=True,
                        jitter_low_frac=0.5)
        n_chains = 8
        inits = 0.1 * jax.random.normal(jax.random.key(0), (n_chains, d))

        # exact low-rank metric from the true eigenpairs: lam along v_i
        metric = lowrank_from_eigs(jnp.ones(d), 2000.0 * jnp.ones(3), v)
        res = sample_chains(lp, inits, jax.random.key(1), cfg,
                            inv_mass=metric)
        accept_lr = float(res.acceptance_rate)
        post = np.asarray(res.samples)[:, 100:, :]
        ess_lr = effective_sample_size_np(post)

        # same trajectory cost with the (useless here) diagonal metric; the
        # unit step explodes every trajectory, so use the largest stable
        # step ~ 1/sqrt(lam) — the stiffness tax the metric exists to remove
        res_d = sample_chains(lp, inits, jax.random.key(1),
                              HMCConfig(num_samples=600, num_leapfrog=8,
                                        step_size=0.02, burn=100,
                                        sampler="hmc", jitter_l=True,
                                        jitter_low_frac=0.5),
                              inv_mass=jnp.ones(d))
        post_d = np.asarray(res_d.samples)[:, 100:, :]
        ess_d = effective_sample_size_np(post_d)

        assert accept_lr > 0.6
        # the low-rank metric mixes the full space; the diagonal metric at
        # its stable step crawls (tiny steps in the soft directions)
        assert float(np.median(ess_lr)) > 4 * float(np.median(ess_d))
        # moment check: marginal variances within MC error of the truth
        flat = post.reshape(-1, d)
        var_emp = flat.var(axis=0)
        ratio = var_emp / np.diag(cov)
        assert 0.8 < float(np.median(ratio)) < 1.2

    def test_estimate_lowrank_metric_end_to_end(self):
        # Lanczos discovers the stiff directions from HVPs alone, and the
        # estimated metric then matches the oracle-metric acceptance
        d = 48
        lp, prec, cov, v = _stiff_gaussian(d=d)
        metric = estimate_lowrank_metric(lp, jnp.zeros(d), jnp.ones(d),
                                         rank=6, num_iters=24,
                                         key=jax.random.key(2))
        # estimated mass should match the true precision in the stiff block
        m_dense = np.asarray(metric.dense())
        for i in range(3):
            vi = np.asarray(v)[:, i]
            assert float(vi @ m_dense @ vi) == pytest.approx(2000.0, rel=0.05)
        cfg = HMCConfig(num_samples=400, num_leapfrog=8, step_size=0.5,
                        burn=80, sampler="hmc", jitter_l=True,
                        jitter_low_frac=0.5)
        inits = 0.1 * jax.random.normal(jax.random.key(3), (4, d))
        res = sample_chains(lp, inits, jax.random.key(4), cfg, inv_mass=metric)
        assert float(res.acceptance_rate) > 0.6

    def test_resumable_segments_accept_metric(self):
        d = 16
        lp, *_ , v = _stiff_gaussian(d=d, k_stiff=2, lam=500.0)
        metric = lowrank_from_eigs(jnp.ones(d), 500.0 * jnp.ones(2), v)
        cfg = HMCConfig(num_samples=40, num_leapfrog=4, step_size=0.4,
                        burn=8, sampler="hmc")
        inits = 0.1 * jax.random.normal(jax.random.key(5), (3, d))
        res = sample_chains_resumable(lp, inits, jax.random.key(6), cfg,
                                      segment_size=20, inv_mass=metric)
        assert res.samples.shape == (3, 40, d)
        assert float(res.acceptance_rate) > 0.5

    def test_single_chain_sample_with_metric_and_grad_fn(self):
        # surrogate trajectory field composes with the metric (the bench path)
        d = 16
        lp, *_, v = _stiff_gaussian(d=d, k_stiff=2, lam=500.0, seed=3)
        metric = lowrank_from_eigs(jnp.ones(d), 500.0 * jnp.ones(2), v)
        grad = jax.grad(lp)
        cfg = HMCConfig(num_samples=60, num_leapfrog=4, step_size=0.4,
                        burn=10, sampler="hmc")
        res = sample(lp, jnp.zeros(d), jax.random.key(7), cfg,
                     inv_mass=metric, grad_fn=lambda q, aux: grad(q))
        assert float(res.acceptance_rate) > 0.5

    def test_adapt_mass_with_metric_raises(self):
        d = 8
        lp, *_, v = _stiff_gaussian(d=d, k_stiff=1, lam=100.0)
        metric = lowrank_from_eigs(jnp.ones(d), 100.0 * jnp.ones(1), v)
        cfg = HMCConfig(num_samples=10, num_leapfrog=2, step_size=0.1,
                        burn=4, sampler="hmc_nuts", adapt_mass=True)
        with pytest.raises(ValueError, match="structured metrics"):
            sample(lp, jnp.zeros(d), jax.random.key(0), cfg, inv_mass=metric)

    def test_nuts_chains_reject_metric(self):
        from vihmc_tpu.chains import sample_chains_nuts
        from vihmc_tpu.hmc import NUTSConfig

        d = 8
        lp, *_, v = _stiff_gaussian(d=d, k_stiff=1, lam=100.0)
        metric = lowrank_from_eigs(jnp.ones(d), 100.0 * jnp.ones(1), v)
        with pytest.raises(TypeError, match="diagonal"):
            sample_chains_nuts(lp, jnp.zeros((2, d)), jax.random.key(0),
                               NUTSConfig(num_samples=4), inv_mass=metric)


class TestEigenMetric:
    def _metric(self, d=24, k=6, seed=0):
        from vihmc_tpu.hmc.metric import eigen_metric_from_eigs

        rng = np.random.default_rng(seed)
        diag_inv = jnp.asarray(0.3 + rng.uniform(size=d), jnp.float32)
        v = jnp.asarray(np.linalg.qr(rng.normal(size=(d, k)))[0], jnp.float32)
        lam = jnp.asarray([200.0, 50.0, 8.0, 0.5, 0.1, 0.02][:k], jnp.float32)
        return eigen_metric_from_eigs(diag_inv, lam, v)

    def test_velocity_matches_dense_solve(self):
        m = self._metric()
        p = jax.random.normal(jax.random.key(1), (24,))
        dense = np.asarray(m.dense(), np.float64)
        want = np.linalg.solve(dense, np.asarray(p, np.float64))
        np.testing.assert_allclose(np.asarray(mass_velocity(m, p)), want,
                                   rtol=2e-3, atol=2e-4)

    def test_momentum_covariance_is_mass(self):
        m = self._metric(d=10, k=3, seed=2)
        keys = jax.random.split(jax.random.key(3), 60000)
        ps = jax.vmap(lambda k: mass_sample_momentum(m, k, jnp.zeros(10)))(keys)
        emp = np.cov(np.asarray(ps).T)
        want = np.asarray(m.dense())
        scale = np.sqrt(np.outer(np.diag(want), np.diag(want)))
        assert np.max(np.abs(emp - want) / scale) < 0.06

    def test_kinetic_energy_matches_dense(self):
        m = self._metric(seed=4)
        p = jax.random.normal(jax.random.key(5), (24,))
        dense = np.asarray(m.dense(), np.float64)
        pn = np.asarray(p, np.float64)
        want = 0.5 * pn @ np.linalg.solve(dense, pn)
        assert float(mass_kinetic_energy(m, p)) == pytest.approx(want,
                                                                 rel=2e-3)

    def test_two_sided_whitening_samples_soft_and_stiff(self):
        # Gaussian with precision S^-1(I + V(Lam-I)V^T)S^-1: both a 1000x
        # stiff and a 100x soft direction. The two-sided metric built from
        # the exact eigenpairs whitens it completely -> unit-scale steps
        # accept and the fully-whitened chain mixes fast.
        from vihmc_tpu.hmc.metric import eigen_metric_from_eigs

        d = 32
        rng = np.random.default_rng(7)
        diag_inv = jnp.asarray(0.5 + rng.uniform(size=d), jnp.float32)
        v = jnp.asarray(np.linalg.qr(rng.normal(size=(d, 2)))[0], jnp.float32)
        lam = jnp.asarray([1000.0, 0.01], jnp.float32)
        m = eigen_metric_from_eigs(diag_inv, lam, v, min_eig=1e-3)
        prec = jnp.asarray(m.dense())

        def lp(x):
            return -0.5 * x @ (prec @ x)

        cfg = HMCConfig(num_samples=500, num_leapfrog=8, step_size=0.6,
                        burn=100, sampler="hmc", jitter_l=True,
                        jitter_low_frac=0.5)
        inits = 0.05 * jax.random.normal(jax.random.key(8), (4, d))
        res = sample_chains(lp, inits, jax.random.key(9), cfg, inv_mass=m)
        assert float(res.acceptance_rate) > 0.6
        post = np.asarray(res.samples)[:, 100:, :]
        ess = effective_sample_size_np(post)
        assert float(np.median(ess)) > 400
        # soft-direction marginal variance recovered (the direction a
        # one-sided metric would leave 100x under-explored)
        cov = np.linalg.inv(np.asarray(prec, np.float64))
        soft = np.asarray(v)[:, 1]
        var_emp = (post.reshape(-1, d) @ soft).var()
        assert var_emp == pytest.approx(float(soft @ cov @ soft), rel=0.25)

    def test_lanczos_both_ends(self):
        d = 50
        rng = np.random.default_rng(1)
        q, _ = np.linalg.qr(rng.normal(size=(d, d)))
        evals = np.concatenate([[300.0, 90.0], rng.uniform(0.8, 1.2, d - 4),
                                [0.05, 0.01]])
        a = jnp.asarray((q * evals) @ q.T, jnp.float32)
        vals, vecs = lanczos_eigs(lambda x: a @ x, d, rank=4, num_iters=40,
                                  key=jax.random.key(2), which="both")
        got = sorted(float(x) for x in np.asarray(vals))
        np.testing.assert_allclose(got, [0.01, 0.05, 90.0, 300.0], rtol=5e-3,
                                   atol=1e-4)
