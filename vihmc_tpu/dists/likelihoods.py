"""The 6-way likelihood switch of the reference, as pure JAX functions.

Mirrors the ``model_loss`` dispatch at
/root/reference/Neural_network/VI_HMC/main_VI_HMC.py:123-142 and
/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:145-169.

Every likelihood maps ``(output, target, tau_out) -> scalar log-likelihood``:

``binary_class_linear_output``   ll = -tau_out * BCEWithLogits(sum)
``multi_class_linear_output``    ll = -tau_out * CrossEntropy(sum)   (logits)
``multi_class_log_softmax_output`` ll = -tau_out * NLL(sum)  (log-probs in)
``regression``                   ll = -0.5 * tau_out * sum(err^2)  (tau=precision)
``NLL``                          ll = -sum GaussianNLL(var=tau_out) (tau=VARIANCE)
custom callable                  ll = -sum(loss(output, target))

The precision-vs-variance asymmetry between ``regression`` and ``NLL`` is a
property of the reference we reproduce exactly (its configs are written
against it, e.g. ``tau_out = 1/0.05**2`` for regression at
/root/reference/Neural_network/HMC/config.py:21 vs ``tau_out = 0.05**2`` for
NLL at /root/reference/Neural_network/VI_HMC/config.py:28).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# torch.nn.functional.gaussian_nll_loss clamps the variance at eps=1e-6 and
# omits the 0.5*log(2*pi) constant unless full=True; we match that so log-prob
# values are comparable across frameworks.
_GNLL_EPS = 1e-6


def gaussian_nll(pred, target, var, *, full: bool = False):
    """Elementwise Gaussian negative log-likelihood, torch semantics."""
    var = jnp.maximum(var, _GNLL_EPS)
    out = 0.5 * (jnp.log(var) + (pred - target) ** 2 / var)
    if full:
        out = out + 0.5 * jnp.log(2 * jnp.pi)
    return out


def _bce_with_logits(logits, target):
    # numerically-stable BCE-with-logits: max(x,0) - x*y + log1p(exp(-|x|))
    return jnp.maximum(logits, 0.0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _ll_binary(output, target, tau_out):
    return -tau_out * jnp.sum(_bce_with_logits(output, target))


def _ll_multiclass(output, target, tau_out):
    logp = jax.nn.log_softmax(output, axis=-1)
    picked = jnp.take_along_axis(logp, target.astype(jnp.int32).reshape(-1, 1), axis=-1)
    return tau_out * jnp.sum(picked)


def _ll_log_softmax(output, target, tau_out):
    picked = jnp.take_along_axis(output, target.astype(jnp.int32).reshape(-1, 1), axis=-1)
    return tau_out * jnp.sum(picked)


def _ll_regression(output, target, tau_out):
    return -0.5 * tau_out * jnp.sum((output - target) ** 2)


def _ll_gaussian_nll(output, target, tau_out):
    return -jnp.sum(gaussian_nll(output, target, tau_out * jnp.ones_like(output)))


LIKELIHOODS = {
    "binary_class_linear_output": _ll_binary,
    "multi_class_linear_output": _ll_multiclass,
    "multi_class_log_softmax_output": _ll_log_softmax,
    "regression": _ll_regression,
    "NLL": _ll_gaussian_nll,
}


def get_likelihood(model_loss):
    """Resolve a likelihood by reference name or wrap a custom loss callable."""
    if callable(model_loss):
        def _custom(output, target, tau_out):
            del tau_out
            return -jnp.sum(model_loss(output, target))

        return _custom
    try:
        return LIKELIHOODS[model_loss]
    except KeyError:
        raise NotImplementedError(f"model_loss {model_loss!r} not implemented") from None
