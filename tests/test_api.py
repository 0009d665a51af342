"""hamiltorch-style convenience API: sample_model / predict_model."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import sample_model, predict_model
from vihmc_tpu.models import MLPConfig, init_mlp, mlp_apply


def test_sample_and_predict_model_regression():
    cfg = MLPConfig(in_dim=1, widths=(8,), out_dim=1)
    params = init_mlp(jax.random.key(0), cfg)
    x = jnp.linspace(-1, 1, 16).reshape(-1, 1)
    y = jnp.sin(3 * x)
    n_leaves = len(jax.tree_util.tree_leaves(params))

    res = sample_model(lambda p, xx: mlp_apply(cfg, p, xx), params, x, y,
                       key=jax.random.key(1), model_loss="regression",
                       num_samples=80, num_steps_per_sample=10,
                       step_size=5e-3, tau_out=100.0,
                       tau_list=[1.0] * n_leaves,
                       normalizing_const=x.shape[0])
    assert res.samples.shape[0] == 80
    assert np.isfinite(np.asarray(res.samples)).all()
    assert float(res.acceptance_rate) > 0.3

    preds, log_probs = predict_model(lambda p, xx: mlp_apply(cfg, p, xx),
                                     params, res.samples[20:], x, y,
                                     model_loss="regression", tau_out=100.0,
                                     tau_list=[1.0] * n_leaves)
    assert preds.shape == (60, 16, 1)
    assert log_probs.shape == (60,)
    # sampling reduced the data misfit vs the prior-random init
    init_mse = float(jnp.mean((mlp_apply(cfg, params, x) - y) ** 2))
    post_mse = float(jnp.mean((preds.mean(0) - y) ** 2))
    assert post_mse < init_mse


def test_sample_model_nuts_mode():
    cfg = MLPConfig(in_dim=1, widths=(4,), out_dim=1)
    params = init_mlp(jax.random.key(2), cfg)
    x = jnp.linspace(-1, 1, 8).reshape(-1, 1)
    y = jnp.zeros((8, 1))
    res = sample_model(lambda p, xx: mlp_apply(cfg, p, xx), params, x, y,
                       key=jax.random.key(3), num_samples=60, burn=30,
                       step_size=1.0, sampler="hmc_nuts", tau_out=25.0)
    eps = np.asarray(res.step_sizes)
    assert not np.allclose(eps[0], eps[-1])  # adaptation happened
