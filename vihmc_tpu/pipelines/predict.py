"""Posterior-predictive evaluation (the reference's ``predict_model``).

Reference: for each parameter sample, a forward pass + log-prob on held-out
data, returning stacked predictions (S, N, O) and per-sample log-probs
(/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:183-241 and
3 near-copies). Here the loop over samples is a (optionally chunked) ``vmap``.

Metric conventions (both reference variants are reported):
* NN pipelines print MSE of the *mean* prediction as "Expected MSE"
  (/root/reference/Neural_network/VI_HMC/main_VI_HMC.py:424-429);
* operator pipelines print the mean of per-sample MSEs plus final/min MSE
  (/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:293-300).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def posterior_predictive(log_prob_and_forward: Callable, samples, chunk_size: int = 0):
    """Evaluate (log_prob, prediction) for every sample row.

    ``log_prob_and_forward(flat) -> (lp, pred)`` closes over the evaluation
    data (mirroring the reference's ``predict=True`` log-prob closures).
    Returns (log_probs (S,), preds (S, ...)).
    """
    def one(s):
        return log_prob_and_forward(s)

    if chunk_size and chunk_size > 0:
        return jax.lax.map(one, samples, batch_size=chunk_size)
    return jax.vmap(one)(samples)


def streaming_predictive_metrics(log_prob_and_forward: Callable, samples, y) -> dict:
    """Predictive metrics WITHOUT materializing all predictions.

    For S samples over an (N, P) evaluation set the stacked predictions are
    S*N*P floats (52 GB at reference scale with thousands of pooled draws);
    this scan carries only the running prediction sum plus per-sample
    scalars, so memory is O(N*P). Returns the same keys as
    :func:`predictive_metrics` plus ``mean_prediction``.
    """
    def step(sum_pred, s):
        lp, pred = log_prob_and_forward(s)
        pred = pred.reshape(y.shape)
        mse = jnp.mean((pred - y) ** 2)
        return sum_pred + pred, (lp, mse)

    sum_pred, (log_probs, sample_mse) = jax.lax.scan(
        step, jnp.zeros_like(y), samples)
    # samples may be a pytree (e.g. (rows, chain_ids)); S = leading axis
    n_s = jax.tree_util.tree_leaves(samples)[0].shape[0]
    mean_pred = sum_pred / n_s
    return {
        "sample_mse": sample_mse,
        "expected_mse_of_mean": jnp.mean((mean_pred - y) ** 2),
        "mean_sample_mse": jnp.mean(sample_mse),
        "final_mse": sample_mse[-1],
        "min_mse": jnp.min(sample_mse),
        "expected_log_prob": jnp.mean(log_probs),
        "mean_prediction": mean_pred,
    }


def predictive_metrics(preds, y, log_probs=None) -> dict:
    """Summary metrics over stacked predictions (S, ...) vs targets."""
    preds = preds.reshape(preds.shape[0], *y.shape)
    sample_mse = jnp.mean((preds - y) ** 2, axis=tuple(range(1, preds.ndim)))
    mean_pred = jnp.mean(preds, axis=0)
    out = {
        "sample_mse": sample_mse,
        "expected_mse_of_mean": jnp.mean((mean_pred - y) ** 2),
        "mean_sample_mse": jnp.mean(sample_mse),
        "final_mse": sample_mse[-1],
        "min_mse": jnp.min(sample_mse),
    }
    if log_probs is not None:
        out["expected_log_prob"] = jnp.mean(log_probs)
    return out
