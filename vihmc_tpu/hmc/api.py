"""hamiltorch-style convenience API: one-call model sampling/prediction.

The reference calls ``hamiltorch.sample_model(net, x, y, model_loss=...,
tau_list=..., tau_out=...)`` and ``hamiltorch.predict_model(...)``
(/root/reference/Neural_network/HMC/main_regression_hmc.py:124-127,153-155).
These are the JAX-native equivalents: the torch ``net`` becomes a pure
``apply_fn(params, x)`` + params pytree; everything else mirrors the
hamiltorch signature so reference users find the same entry points.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from vihmc_tpu.core.ravel import ravel_pytree, per_segment_vector
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import PerSegmentGaussianPrior
from vihmc_tpu.hmc.kernel import HMCConfig, SampleResult, sample
from vihmc_tpu.pipelines.predict import posterior_predictive, predictive_metrics


def _flat_posterior(apply_fn, params, x, y, model_loss, tau_out, tau_list,
                    normalizing_const=None):
    flat0, unravel = ravel_pytree(params)
    like = get_likelihood(model_loss)
    n_leaves = len(jax.tree_util.tree_leaves(params))
    taus = list(tau_list) if tau_list is not None else [1.0] * n_leaves
    # hamiltorch semantics: tau_list entries are prior PRECISIONS per tensor
    scales = per_segment_vector(params, [t ** -0.5 for t in taus])
    prior = PerSegmentGaussianPrior(scales)

    # hamiltorch's normalizing_const rescales a minibatch likelihood to the
    # full-data scale; with full-batch data (the reference's usage,
    # normalizing_const=N_tr) the factor is 1. When not given (None), the
    # likelihood is left unscaled.
    if normalizing_const is None:
        ll_scale = 1.0
    else:
        ll_scale = normalizing_const / jnp.shape(y)[0]

    def log_prob(flat):
        out = apply_fn(unravel(flat), x)
        if out.size == y.size and out.shape != y.shape:
            out = out.reshape(y.shape)
        return like(out, y, tau_out) * ll_scale + prior.log_prob(flat)

    return log_prob, flat0, unravel, prior, like


def sample_model(
    apply_fn: Callable,
    params,
    x,
    y,
    key=None,
    model_loss: str = "regression",
    num_samples: int = 100,
    num_steps_per_sample: int = 10,
    step_size: float = 0.1,
    burn: int = 0,
    tau_out: float = 1.0,
    tau_list: Optional[Sequence[float]] = None,
    sampler: str = "hmc",
    inv_mass=1.0,
    normalizing_const: Optional[float] = None,
) -> SampleResult:
    """Build a flat log-posterior from (apply_fn, params) and run HMC.

    Mirrors ``hamiltorch.sample_model``: Gaussian per-tensor priors with
    precisions ``tau_list``, likelihood per ``model_loss`` with ``tau_out``.
    Returns a :class:`SampleResult` whose ``samples`` (num_samples, D)
    correspond to hamiltorch's returned list of flat vectors (all draws,
    including burn — slice downstream, as the reference does).
    """
    key = jax.random.key(0) if key is None else key
    log_prob, flat0, _, _, _ = _flat_posterior(
        apply_fn, params, x, y, model_loss, tau_out, tau_list, normalizing_const)
    cfg = HMCConfig(num_samples=num_samples, num_leapfrog=num_steps_per_sample,
                    step_size=step_size, burn=burn, sampler=sampler)
    return jax.jit(
        lambda k: sample(log_prob, flat0, k, cfg, inv_mass=inv_mass)
    )(key)


def predict_model(
    apply_fn: Callable,
    params,
    samples,
    x,
    y,
    model_loss: str = "regression",
    tau_out: float = 1.0,
    tau_list: Optional[Sequence[float]] = None,
):
    """Posterior predictive over flat samples (hamiltorch.predict_model).

    Returns (predictions (S, ...), log_probs (S,)) — stacked predictions plus
    the per-sample log densities on (x, y), exactly the reference's contract.
    """
    log_prob, _, unravel, _, _ = _flat_posterior(
        apply_fn, params, x, y, model_loss, tau_out, tau_list)

    def lp_and_pred(flat):
        return log_prob(flat), apply_fn(unravel(flat), x)

    log_probs, preds = posterior_predictive(jax.jit(lp_and_pred),
                                            jnp.asarray(samples), chunk_size=256)
    return preds, log_probs
