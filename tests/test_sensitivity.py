import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.sensitivity import (
    sensitivity_scores,
    mean_squared_jacobian,
    captured_variance_count,
    select_sensitive_indices,
    flatten_mean_std,
)
from vihmc_tpu.models import MLPConfig, init_mlp, init_variational
from vihmc_tpu.models.bayesian import softplus_sigma
from vihmc_tpu.core import ravel_pytree


def test_mean_squared_jacobian_linear_model():
    """y = w . x -> dy/dw_i = x_i, so msj_i = E[x_i^2]."""
    def apply_one(flat, x):
        return jnp.dot(flat, x)

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(200, 4)).astype(np.float32))
    msj = np.asarray(mean_squared_jacobian(apply_one, jnp.zeros(4), xs))
    np.testing.assert_allclose(msj, np.mean(np.asarray(xs) ** 2, axis=0), rtol=1e-4)


def test_chunked_equals_unchunked():
    def apply_one(flat, x):
        return jnp.tanh(flat[:2] * x[0]) + flat[2:] * x[1]

    xs = jnp.asarray(np.random.default_rng(1).normal(size=(32, 2)).astype(np.float32))
    flat = jnp.array([0.3, -0.5, 1.0, 2.0])
    a = np.asarray(mean_squared_jacobian(apply_one, flat, xs))
    b = np.asarray(mean_squared_jacobian(apply_one, flat, xs, chunk_size=8))
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_scores_scale_with_sigma():
    def apply_one(flat, x):
        return jnp.dot(flat, x)

    xs = jnp.ones((10, 3))
    sigma = jnp.array([1.0, 2.0, 0.5])
    s = np.asarray(sensitivity_scores(apply_one, jnp.zeros(3), sigma, xs))
    np.testing.assert_allclose(s, np.asarray(sigma) ** 2, rtol=1e-5)


def test_captured_variance_matches_reference_semantics():
    # reference counts entries with cumulative ratio <= threshold
    scores = np.array([5.0, 3.0, 1.0, 0.5, 0.5])  # total 10
    assert captured_variance_count(scores, 0.5) == 1   # 5/10 = 0.5 <= 0.5
    assert captured_variance_count(scores, 0.8) == 2   # 8/10
    assert captured_variance_count(scores, 0.95) == 4
    idx = select_sensitive_indices(scores, 0.8)
    np.testing.assert_array_equal(idx, [0, 1])  # sorted index order


def test_select_indices_are_sorted_and_top():
    # reference semantics: count entries whose cumulative ratio stays <=
    # threshold; 9/17.35 = 0.52 <= 0.85 but 17/17.35 = 0.98 > 0.85 -> 1 index
    scores = np.array([0.1, 9.0, 0.2, 8.0, 0.05])
    idx = select_sensitive_indices(scores, 0.85)
    np.testing.assert_array_equal(idx, [1])
    idx2 = select_sensitive_indices(scores, 0.99)
    np.testing.assert_array_equal(idx2, [1, 3])


def test_flatten_mean_std_ordering():
    cfg = MLPConfig(in_dim=2, widths=(3,), out_dim=1)
    template = init_mlp(jax.random.key(0), cfg)
    vp = init_variational(jax.random.key(1), template)
    mu, sigma = flatten_mean_std(vp)
    flat_mu_direct, _ = ravel_pytree(vp["mu"])
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(flat_mu_direct))
    assert np.all(np.asarray(sigma) > 0)
    rho_flat, _ = ravel_pytree(vp["rho"])
    np.testing.assert_allclose(np.asarray(sigma),
                               np.asarray(softplus_sigma(rho_flat)), rtol=1e-6)
