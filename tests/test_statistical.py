"""Statistical correctness against analytically-known posteriors.

Bayesian linear regression has a closed-form Gaussian posterior; running the
full HMC pipeline machinery (flat params, likelihood zoo, per-segment prior)
on it validates the composed log-posterior + sampler end to end, not just the
kernel on toy Gaussians.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import HMCConfig
from vihmc_tpu.chains import sample_chains, effective_sample_size
from vihmc_tpu.dists.priors import IsotropicGaussianPrior
from vihmc_tpu.pipelines.common import make_log_posterior


def test_bayesian_linear_regression_posterior():
    rng = np.random.default_rng(0)
    n, d = 50, 3
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w_true = jnp.asarray([1.0, -2.0, 0.5])
    noise_prec = 25.0  # tau_out (precision) for the 'regression' likelihood
    y = x @ w_true + jnp.asarray(rng.normal(size=n) / np.sqrt(noise_prec),
                                 jnp.float32)

    prior_scale = 2.0
    prior = IsotropicGaussianPrior(scale=prior_scale)
    log_prob = make_log_posterior(lambda w: x @ w, y, "regression", noise_prec,
                                  prior)

    # exact posterior: Sigma = (tau X'X + I/s^2)^-1, mu = tau Sigma X'y
    xtx = np.asarray(x.T @ x)
    sigma_post = np.linalg.inv(noise_prec * xtx + np.eye(d) / prior_scale**2)
    mu_post = noise_prec * sigma_post @ np.asarray(x.T @ y)

    # precondition with the exact posterior variances (the vi_mass pathway)
    cfg = HMCConfig(num_samples=1500, num_leapfrog=10, step_size=0.35)
    res = sample_chains(log_prob, jnp.zeros((4, d)), jax.random.key(0), cfg,
                        inv_mass=jnp.asarray(np.diag(sigma_post), jnp.float32))
    post = np.asarray(res.samples[:, 300:, :]).reshape(-1, d)

    ess = np.asarray(effective_sample_size(res.samples[:, 300:, :]))
    mc_err = np.sqrt(np.diag(sigma_post)) / np.sqrt(np.maximum(ess, 1))
    # means within 5 MC standard errors of the exact posterior mean
    assert np.all(np.abs(post.mean(0) - mu_post) < 5 * mc_err + 1e-3)
    # marginal stds within 15%
    np.testing.assert_allclose(post.std(0), np.sqrt(np.diag(sigma_post)),
                               rtol=0.15)
    # posterior correlation structure reproduced
    corr_emp = np.corrcoef(post.T)
    dd = np.sqrt(np.diag(sigma_post))
    corr_true = sigma_post / np.outer(dd, dd)
    np.testing.assert_allclose(corr_emp, corr_true, atol=0.2)


def test_vi_recovers_conjugate_posterior():
    """Mean-field VI (standard KL direction) on Bayesian linear regression
    approaches the exact posterior's marginals (SURVEY test plan: 'VI on
    conjugate models')."""
    import optax

    from vihmc_tpu.models import MLPConfig, init_mlp, init_variational
    from vihmc_tpu.vi import VIConfig, init_train_state, make_train_step
    from vihmc_tpu.vi.elbo import ELBOConfig
    from vihmc_tpu.pipelines.common import mlp_vi_apply

    rng = np.random.default_rng(0)
    n, d = 200, 2
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    w_true = jnp.asarray([0.8, -1.2])
    noise_var = 0.04
    y = (x @ w_true + jnp.asarray(rng.normal(size=n) * np.sqrt(noise_var),
                                  jnp.float32)).reshape(-1, 1)

    # linear model == MLP with no hidden layers and no bias anywhere
    mlp = MLPConfig(in_dim=d, widths=(), out_dim=1, last_bias=False)
    template = init_mlp(jax.random.key(0), mlp)
    vp = init_variational(jax.random.key(1), template,
                          posterior_mu_initial=(0.0, 0.1),
                          posterior_rho_initial=(-3.0, 0.1))
    prior_scale = 2.0
    cfg = VIConfig(epochs=0, lr_start=2e-2, num_ens=8,
                   prior_sigma=prior_scale, kl_direction="standard",
                   elbo=ELBOConfig(reduction="sum", fixed_noise_var=noise_var))
    state = init_train_state(vp, cfg)
    step = make_train_step(mlp_vi_apply(mlp), cfg, train_size=n)
    batch = {"x": x, "y": y}
    key = jax.random.key(2)
    for _ in range(800):
        key, sk = jax.random.split(key)
        state, _ = step(state, batch, sk, 1.0)

    # exact posterior
    xtx = np.asarray(x.T @ x)
    S = np.linalg.inv(xtx / noise_var + np.eye(d) / prior_scale ** 2)
    mu = S @ np.asarray(x.T @ y).ravel() / noise_var

    from vihmc_tpu.models.bayesian import softplus_sigma

    vi_mu = np.asarray(state.vp["mu"][0]["w"]).ravel()
    vi_sigma = np.asarray(softplus_sigma(state.vp["rho"][0]["w"])).ravel()
    np.testing.assert_allclose(vi_mu, mu, atol=0.03)
    # mean-field VI underestimates correlated-posterior marginals, but here
    # the posterior is near-diagonal: stds within 40%
    np.testing.assert_allclose(vi_sigma, np.sqrt(np.diag(S)), rtol=0.4)


def test_nll_and_regression_losses_consistent():
    """'NLL' with tau_out = variance and 'regression' with tau_out = 1/variance
    define the same posterior shape (constants differ)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=20), jnp.float32)
    var = 0.3

    lp_nll = make_log_posterior(lambda w: x @ w, y, "NLL", var, None)
    lp_reg = make_log_posterior(lambda w: x @ w, y, "regression", 1.0 / var, None)
    w1 = jnp.array([0.5, -0.2]); w2 = jnp.array([-1.0, 2.0])
    diff_nll = float(lp_nll(w1) - lp_nll(w2))
    diff_reg = float(lp_reg(w1) - lp_reg(w2))
    np.testing.assert_allclose(diff_nll, diff_reg, rtol=1e-4)
