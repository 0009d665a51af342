"""Classification capability: the BCE/CE/log-softmax likelihoods end to end.

The reference wires these likelihoods into every log-prob closure
(main_VI_HMC.py:123-142) but ships no classification workload; these tests
prove the capability actually samples: Bayesian logistic regression on
separable blobs recovers better-than-chance accuracy via full HMC.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import HMCConfig
from vihmc_tpu.chains import sample_chains
from vihmc_tpu.dists.priors import IsotropicGaussianPrior
from vihmc_tpu.models import MLPConfig
from vihmc_tpu.pipelines.common import make_flat_mlp, make_log_posterior
from vihmc_tpu.vi import accuracy


def _blobs(key, n=60, d=2):
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (n // 2, d)) + jnp.array([2.0, 0.0])
    x1 = jax.random.normal(k2, (n // 2, d)) + jnp.array([-2.0, 0.0])
    x = jnp.concatenate([x0, x1])
    y = jnp.concatenate([jnp.zeros(n // 2), jnp.ones(n // 2)])
    return x, y


def test_binary_classification_hmc():
    x, y = _blobs(jax.random.key(0))
    cfg = MLPConfig(in_dim=2, widths=(8,), out_dim=1)
    apply_flat, flat0, _ = make_flat_mlp(cfg)
    prior = IsotropicGaussianPrior(scale=1.0)
    lp = make_log_posterior(lambda f: apply_flat(f, x).squeeze(-1), y,
                            "binary_class_linear_output", 1.0, prior)
    hmc = HMCConfig(num_samples=300, num_leapfrog=10, step_size=0.02)
    res = sample_chains(lp, jnp.zeros((2, flat0.shape[0])), jax.random.key(1), hmc)
    assert float(res.acceptance_rate) > 0.3
    post = res.samples[:, 100:, :].reshape(-1, flat0.shape[0])
    mean_logits = np.mean([np.asarray(apply_flat(s, x)) for s in post[::20]], axis=0)
    pred = (mean_logits.squeeze(-1) > 0).astype(float)
    acc = float(np.mean(pred == np.asarray(y)))
    assert acc > 0.9


def test_multiclass_classification_hmc():
    key = jax.random.key(2)
    centers = jnp.array([[3.0, 0.0], [-3.0, 0.0], [0.0, 3.0]])
    n_per = 20
    xs, ys = [], []
    for c in range(3):
        key, k = jax.random.split(key)
        xs.append(jax.random.normal(k, (n_per, 2)) + centers[c])
        ys.append(jnp.full((n_per,), c))
    x, y = jnp.concatenate(xs), jnp.concatenate(ys)

    cfg = MLPConfig(in_dim=2, widths=(8,), out_dim=3)
    apply_flat, flat0, _ = make_flat_mlp(cfg)
    prior = IsotropicGaussianPrior(scale=1.0)
    lp = make_log_posterior(lambda f: apply_flat(f, x), y,
                            "multi_class_linear_output", 1.0, prior)
    hmc = HMCConfig(num_samples=300, num_leapfrog=10, step_size=0.02)
    res = sample_chains(lp, jnp.zeros((2, flat0.shape[0])), jax.random.key(3), hmc)
    post = res.samples[:, 100:, :].reshape(-1, flat0.shape[0])
    mean_logits = np.mean([np.asarray(apply_flat(s, x)) for s in post[::20]], axis=0)
    assert accuracy(mean_logits, np.asarray(y)) > 0.9
