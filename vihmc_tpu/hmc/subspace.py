"""Subspace (VI-HMC) sampling: frozen-coordinate policies over the flat vector.

The hybrid VI-HMC method runs HMC only over the *sensitive* parameter subset;
the remaining coordinates are frozen to VI-posterior values. The reference
implements the freeze as a mutable closure that scatters the subspace vector
into a sampled full vector (/root/reference/Operator_network/VI/my_make_func.py:41-53)
and refreshes the frozen draw through an implicit "call log_prob with an extra
argument" convention (/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:91-94).

Here the frozen full vector is explicit sampler state (``aux``) carried
through the sampling scan, with three first-class policies
(SURVEY.md section 2.4, "Caution" row):

``FrozenPolicy.MEAN``     frozen coordinates fixed at the VI means;
``FrozenPolicy.DRAW``     fixed at a single VI-posterior draw taken at init;
``FrozenPolicy.REFRESH``  re-drawn from the VI posterior before every sample
                          (the reference's resample-hook behavior).

The sensitive index set is static per compilation (SURVEY.md section 7.3), so
the scatter lowers to a fused XLA gather/scatter with no host round-trips.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Callable

import jax
import jax.numpy as jnp

from vihmc_tpu.core.ravel import scatter_subspace


class FrozenPolicy(enum.Enum):
    MEAN = "mean"
    DRAW = "draw"
    REFRESH = "refresh"


@dataclasses.dataclass(frozen=True)
class SubspaceSpec:
    """Static description of the subspace split.

    Attributes
    ----------
    idx : sensitive coordinate indices into the flat vector (sorted, static).
    mu, sigma : (D,) VI-posterior mean/std over the FULL flat vector
        (the sensitivity-stage artifacts ``means_flattened``/``stds_flattened``,
        /root/reference/Operator_network/VI/sensitivity.py:268-269).
    """

    idx: tuple  # tuple of ints => hashable/static
    mu: jnp.ndarray
    sigma: jnp.ndarray

    @property
    def idx_array(self):
        return jnp.asarray(self.idx, dtype=jnp.int32)

    @property
    def subspace_dim(self):
        return len(self.idx)

    def sub_mu(self):
        return self.mu[self.idx_array]

    def sub_sigma(self):
        return self.sigma[self.idx_array]


def draw_full(key, spec: SubspaceSpec):
    """One full-vector draw from the VI posterior (reference ``sample_weights``)."""
    return spec.mu + spec.sigma * jax.random.normal(key, spec.mu.shape)


def make_subspace_log_prob(
    full_log_prob: Callable,
    spec: SubspaceSpec,
    policy: FrozenPolicy = FrozenPolicy.MEAN,
    init_key=None,
):
    """Build the subspace log-prob + aux machinery for the HMC kernel.

    Parameters
    ----------
    full_log_prob : (full_flat,) -> scalar log-density term that consumes the
        FULL parameter vector (likelihood + any full-vector prior terms).
        Subspace priors are added separately by the caller on the subvector.

    Returns
    -------
    (log_prob, aux0, aux_refresh):
        log_prob(q_sub, aux) -> scalar, where aux is the frozen full vector;
        aux0 is the initial frozen vector per ``policy``;
        aux_refresh is None except for REFRESH, where it redraws per sample.
    """
    idx = spec.idx_array

    def log_prob(q_sub, frozen):
        full = scatter_subspace(frozen, q_sub, idx)
        return full_log_prob(full)

    if policy is FrozenPolicy.MEAN:
        aux0 = spec.mu
        refresh = None
    elif policy is FrozenPolicy.DRAW:
        if init_key is None:
            raise ValueError("FrozenPolicy.DRAW requires init_key")
        aux0 = draw_full(init_key, spec)
        refresh = None
    elif policy is FrozenPolicy.REFRESH:
        if init_key is None:
            raise ValueError("FrozenPolicy.REFRESH requires init_key")
        aux0 = draw_full(init_key, spec)

        def refresh(key, _frozen):
            return draw_full(key, spec)
    else:
        raise ValueError(f"unknown policy {policy}")

    return log_prob, aux0, refresh


def make_subspace_grad(full_grad: Callable, spec: SubspaceSpec, prior=None):
    """Subspace gradient from a full-flat-vector gradient oracle.

    By the chain rule through the scatter,
    ``d/dq full_term(scatter(frozen, q, idx)) = full_grad(full)[idx]``;
    when ``prior`` (over the subvector) is given its gradient is added. Pairs
    a cheap full-vector gradient (e.g. the Gram-form DeepONet gradient,
    :mod:`vihmc_tpu.ops.gram_merge`) with :func:`make_subspace_log_prob`'s
    exact density as the HMC kernel's ``grad_fn``.
    """
    idx = spec.idx_array
    prior_grad = jax.grad(prior.log_prob) if prior is not None else None

    def grad(q_sub, frozen):
        full = scatter_subspace(frozen, q_sub, idx)
        g = full_grad(full)[idx]
        if prior_grad is not None:
            g = g + prior_grad(q_sub)
        return g

    return grad
