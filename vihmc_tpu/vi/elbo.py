"""ELBO losses and KL-annealing schedules.

Two ELBO conventions exist in the reference and both are kept:

* NN variant (/root/reference/Neural_network/VI/metrics.py:11-18):
  ``gaussian_nll(pred, target, noise_var, reduction='sum') + beta * kl``
* operator variant (/root/reference/Operator_network/VI/metrics.py:13-31):
  ``gaussian_nll(..., reduction='mean') * train_size + beta * kl`` — the
  mean-times-N form that makes minibatched losses unbiased estimates of the
  full-data NLL; with ``learn_noise`` the scalar noise parameter is a free
  log-variance, and with ``noise_type=1`` (heteroscedastic) the model's noise
  head provides a per-point log-variance.

Beta schedules mirror ``get_beta`` (/root/reference/Neural_network/VI/metrics.py:45-63):
constant float / Blundell / linear / step / Soenderby / Standard.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax.numpy as jnp

from vihmc_tpu.dists.likelihoods import gaussian_nll


@dataclasses.dataclass(frozen=True)
class ELBOConfig:
    reduction: str = "sum"        # 'sum' (NN variant) | 'mean_x_n' (operator variant)
    learn_noise: bool = False     # noise_param is a learned log-variance
    noise_type: int = 0           # 0 = homoscedastic scalar, 1 = heteroscedastic head
    fixed_noise_var: float = 1.0  # used when not learning noise


def elbo_loss(cfg: ELBOConfig, prediction, target, kl, beta, train_size,
              noise_param: Optional[jnp.ndarray] = None):
    """Negative ELBO (the training loss).

    ``noise_param`` semantics follow the reference: when ``learn_noise`` it is
    a log-variance (scalar for noise_type 0, per-point array from the hetero
    head for noise_type 1); otherwise the variance is ``cfg.fixed_noise_var``.
    """
    if cfg.learn_noise:
        if noise_param is None:
            raise ValueError("learn_noise requires noise_param")
        var = jnp.exp(noise_param)
        var = var * jnp.ones_like(target) if cfg.noise_type == 0 else var
    else:
        var = cfg.fixed_noise_var * jnp.ones_like(target)

    nll = gaussian_nll(prediction.reshape(target.shape), target, var)
    if cfg.reduction == "sum":
        data_term = jnp.sum(nll)
    elif cfg.reduction == "mean_x_n":
        data_term = jnp.mean(nll) * train_size
    else:
        raise ValueError(f"unknown reduction {cfg.reduction!r}")
    return data_term + beta * kl


def accuracy(outputs, targets):
    """Classification accuracy (reference ``acc``, metrics.py:20-21):
    argmax over the last axis vs integer targets."""
    import numpy as np

    pred = np.asarray(outputs).argmax(axis=-1)
    return float(np.mean(pred == np.asarray(targets).reshape(pred.shape)))


def get_beta(batch_idx: int, m: int, beta_type: Union[float, str],
             epoch: Optional[int] = None, num_epochs: Optional[int] = None) -> float:
    """KL weight schedule; semantics identical to the reference ``get_beta``."""
    if isinstance(beta_type, float):
        return beta_type
    if beta_type == "Blundell":
        return 2 ** (m - (batch_idx + 1)) / (2 ** m - 1)
    if beta_type == "linear":
        return min(1.0, (1 - 1e-4) / num_epochs * epoch + 1e-4)
    if beta_type == "step":
        return min(1.0, 1e-4 * 10 ** ((epoch + 1) // num_epochs))
    if beta_type == "Soenderby":
        if epoch is None or num_epochs is None:
            raise ValueError("Soenderby method requires both epoch and num_epochs to be passed.")
        return min(epoch / (num_epochs // 4), 1)
    if beta_type == "Standard":
        return 1.0 / m
    return 0.0
