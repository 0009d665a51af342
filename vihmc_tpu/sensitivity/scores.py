"""Sensitivity analysis: rank parameters by squared output-Jacobian x VI variance.

The score for parameter i is  S_i = E_x[(dy/dw_i)^2] * sigma_i^2, where the
expectation runs over inputs and output coordinates and sigma_i is the VI
posterior std (reference: ``eval_jac``/``eval_std_dydw``,
/root/reference/Operator_network/VI/sensitivity.py:61-126, and the NN twin at
/root/reference/Neural_network/VI/sensitivity.py:71-126). The HMC subspace is
the smallest top-scoring set capturing a target fraction (default 0.90) of the
total score mass (``captured_var``,
/root/reference/Operator_network/VI/sensitivity.py:205-236).

TPU-first: the Jacobian is taken with ``jax.jacrev`` w.r.t. the FLAT parameter
vector through the pure functional model and batched with ``lax.map`` over
input chunks so the (chunk, P, D) Jacobian blocks stream through HBM instead
of materializing at once.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.models.bayesian import softplus_sigma
from vihmc_tpu.core.ravel import ravel_pytree


def mean_squared_jacobian(apply_flat: Callable, flat_params, inputs, chunk_size: int = 0):
    """E over batch+output dims of (d output / d flat_params)^2 -> (D,).

    Parameters
    ----------
    apply_flat : (flat_params, one_input) -> outputs (any shape)
        Pure model forward for a SINGLE example (vmapped internally).
    inputs : pytree with leading batch axis.
    chunk_size : >0 to stream the batch through ``lax.map`` in chunks,
        bounding peak memory for big Jacobians (the reference uses
        batch_size=1 loaders for the same reason, config_sens.py:25).
    """
    def one_example(x):
        jac = jax.jacrev(lambda p: apply_flat(p, x))(flat_params)  # (*out, D)
        return jnp.mean(jac.reshape(-1, jac.shape[-1]) ** 2, axis=0)

    if chunk_size and chunk_size > 0:
        per_example = jax.lax.map(one_example, inputs, batch_size=chunk_size)
    else:
        per_example = jax.vmap(one_example)(inputs)
    return jnp.mean(per_example, axis=0)


def sensitivity_scores(apply_flat: Callable, flat_mu, flat_sigma, inputs, chunk_size: int = 0):
    """S = E[(dy/dw)^2] * sigma^2, evaluated at the VI posterior mean."""
    grads = mean_squared_jacobian(apply_flat, flat_mu, inputs, chunk_size)
    return grads * flat_sigma ** 2


def captured_variance_count(scores, threshold: float = 0.90) -> int:
    """Number of top parameters whose cumulative score ratio stays <= threshold
    (reference ``captured_var``, sensitivity.py:205-236)."""
    s = np.sort(np.asarray(scores))[::-1]
    ratio = np.cumsum(s) / s.sum()
    return int(np.sum(ratio <= threshold))


def select_sensitive_indices(scores, threshold: float = 0.90) -> np.ndarray:
    """Sorted indices of the minimal top-score set capturing ``threshold`` of
    total sensitivity (reference: ``np.sort(np.argsort(-imp)[:num])``,
    sensitivity.py:278-281)."""
    num = captured_variance_count(scores, threshold)
    order = np.argsort(-np.asarray(scores))
    return np.sort(order[:num])


def flatten_mean_std(vp):
    """Flat (mu, sigma) vectors from variational params, matching the ordering
    of ``ravel_pytree`` on the underlying parameter template (the reference
    extracts '*_mu' / softplus('*_rho') from a checkpoint state-dict,
    /root/reference/Neural_network/VI/util.py:82-91)."""
    flat_mu, _ = ravel_pytree(vp["mu"])
    rho_flat, _ = ravel_pytree(vp["rho"])
    return flat_mu, softplus_sigma(rho_flat)
