"""Gaussian priors over flat parameter vectors.

The reference uses three prior shapes for its samplers:

1. a single shared ``Normal(0, sqrt(prior_var))`` over the whole (sub)vector
   (/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:74-81),
2. per-tensor ``Normal(0, tau_l ** 0.5)`` lists looped over parameter tensors
   (/root/reference/Neural_network/VI_HMC/main_VI_HMC.py:88-92,106-113),
3. the VI posterior itself, ``Normal(mu_VI[ind], sigma_VI[ind])`` over the
   sensitive subspace (``load_prior``,
   /root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:263-266).

All three reduce to one fused elementwise op + reduction over the flat vector
here — no Python loops over tensors inside the sampler.

Convention note: the reference's ``tau`` naming is inconsistent (precision in
``hamiltorch.sample_model``, variance in the in-repo ``Normal(0, tau**0.5)``
closures). This module takes *scales* (standard deviations) everywhere; config
adapters do the conversion once.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2 * math.pi)


def normal_logpdf(x, loc, scale):
    """Elementwise Gaussian log-density (same math as torch.distributions.Normal.log_prob)."""
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * _LOG_2PI


def diag_normal_logpdf_sum(x, loc, scale):
    """Sum of elementwise Gaussian log-densities (diagonal-covariance log-prob)."""
    return jnp.sum(normal_logpdf(x, loc, scale))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class IsotropicGaussianPrior:
    """``N(0, scale^2 I)`` over the whole flat vector."""

    scale: float = 1.0

    def log_prob(self, flat):
        return diag_normal_logpdf_sum(flat, 0.0, self.scale)

    def tree_flatten(self):
        return (self.scale,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiagonalGaussianPrior:
    """``N(loc, diag(scale^2))`` — e.g. the VI posterior restricted to the subspace."""

    loc: jnp.ndarray
    scale: jnp.ndarray

    def log_prob(self, flat):
        return diag_normal_logpdf_sum(flat, self.loc, self.scale)

    def tree_flatten(self):
        return (self.loc, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PerSegmentGaussianPrior:
    """Zero-mean Gaussian with one scale per parameter tensor, pre-broadcast flat.

    Build ``scales_flat`` with :func:`vihmc_tpu.core.per_segment_vector` from a
    params pytree template and a per-tensor scale list (the TPU equivalent of
    the reference's ``tau_list`` loop).
    """

    scales_flat: jnp.ndarray

    def log_prob(self, flat):
        return diag_normal_logpdf_sum(flat, 0.0, self.scales_flat)

    def tree_flatten(self):
        return (self.scales_flat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)
