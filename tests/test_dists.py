import jax.numpy as jnp
import numpy as np
from scipy import stats

from vihmc_tpu.dists import (
    normal_logpdf,
    IsotropicGaussianPrior,
    DiagonalGaussianPrior,
    PerSegmentGaussianPrior,
    get_likelihood,
    gaussian_nll,
)
from vihmc_tpu.core import per_segment_vector


def test_normal_logpdf_matches_scipy():
    x = np.linspace(-3, 3, 7)
    got = np.asarray(normal_logpdf(jnp.array(x), 0.5, 1.7))
    want = stats.norm.logpdf(x, 0.5, 1.7)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_priors_consistency():
    x = jnp.array([0.3, -1.2, 2.0])
    iso = IsotropicGaussianPrior(scale=0.7)
    diag = DiagonalGaussianPrior(loc=jnp.zeros(3), scale=0.7 * jnp.ones(3))
    np.testing.assert_allclose(float(iso.log_prob(x)), float(diag.log_prob(x)), rtol=1e-6)

    tree = {"a": jnp.zeros(2), "b": jnp.zeros(1)}
    seg = PerSegmentGaussianPrior(per_segment_vector(tree, [0.7, 0.7]))
    np.testing.assert_allclose(float(seg.log_prob(x)), float(iso.log_prob(x)), rtol=1e-6)


def test_regression_likelihood():
    ll = get_likelihood("regression")
    out = jnp.array([1.0, 2.0])
    y = jnp.array([0.0, 0.0])
    tau = 4.0
    np.testing.assert_allclose(float(ll(out, y, tau)), -0.5 * 4.0 * 5.0, rtol=1e-6)


def test_nll_likelihood_matches_torch_gaussian_nll():
    import torch
    import torch.nn as nn

    out = np.array([0.3, -1.0, 2.2], dtype=np.float32)
    y = np.array([0.0, -1.5, 2.0], dtype=np.float32)
    tau_out = 0.25  # variance
    ll = get_likelihood("NLL")
    got = float(ll(jnp.array(out), jnp.array(y), tau_out))
    crit = nn.GaussianNLLLoss(reduction="sum")
    want = -float(crit(torch.tensor(out), torch.tensor(y), tau_out * torch.ones(3)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_likelihood_matches_torch():
    import torch
    import torch.nn as nn

    logits = np.array([0.5, -2.0, 3.0], dtype=np.float32)
    y = np.array([1.0, 0.0, 1.0], dtype=np.float32)
    ll = get_likelihood("binary_class_linear_output")
    got = float(ll(jnp.array(logits), jnp.array(y), 2.0))
    crit = nn.BCEWithLogitsLoss(reduction="sum")
    want = -2.0 * float(crit(torch.tensor(logits), torch.tensor(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ce_likelihood_matches_torch():
    import torch
    import torch.nn as nn

    logits = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    y = np.array([0, 2, 1, 2])
    ll = get_likelihood("multi_class_linear_output")
    got = float(ll(jnp.array(logits), jnp.array(y), 1.0))
    crit = nn.CrossEntropyLoss(reduction="sum")
    want = -float(crit(torch.tensor(logits), torch.tensor(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_custom_callable_likelihood():
    ll = get_likelihood(lambda o, y: (o - y) ** 2)
    got = float(ll(jnp.array([2.0, 1.0]), jnp.array([0.0, 0.0]), 99.0))
    np.testing.assert_allclose(got, -5.0, rtol=1e-6)


def test_gaussian_nll_full_constant():
    a = float(gaussian_nll(jnp.array(1.0), jnp.array(0.0), jnp.array(1.0), full=True))
    b = float(gaussian_nll(jnp.array(1.0), jnp.array(0.0), jnp.array(1.0), full=False))
    np.testing.assert_allclose(a - b, 0.5 * np.log(2 * np.pi), rtol=1e-6)
