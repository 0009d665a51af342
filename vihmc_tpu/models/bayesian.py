"""Bayesian (mean-field Gaussian) model variants: BBB and BBB-LRT.

The reference implements Bayes-by-Backprop layers as torch Modules holding
``(W_mu, W_rho)`` pairs with ``sigma = log1p(exp(rho))`` and weight-space
reparameterized sampling (/root/reference/Neural_network/VI/layers/BBB/BBBLinear.py:54-78),
plus a local-reparameterization-trick variant that samples in activation space
(/root/reference/Neural_network/VI/layers/BBB_LRT/BBBLinear.py:53-70), and
conv2d versions of both (layers/BBB/BBBConv.py, layers/BBB_LRT/BBBConv.py).

Here a Bayesian model is just ``VariationalParams = {'mu': tree, 'rho': tree}``
mirroring the deterministic parameter pytree. Sampling modes:

* ``'bbb'``  — weight-space: w = mu + eps * softplus(rho), then the ordinary
  deterministic apply. One eps per leaf per forward.
* ``'lrt'``  — activation-space: out ~ N(x@mu_W + mu_b, x^2 @ sigma_W^2 + sigma_b^2),
  lower-variance gradients for VI.

The KL between the factorized posterior and the Gaussian prior is closed-form
and *independent of the input*, so unlike the reference (which accumulates
``kl_loss()`` module-by-module during forward,
/root/reference/Neural_network/VI/layers/misc.py:16-25) it is computed once
per step outside the forward pass — one fused elementwise reduction.

KL direction note: the reference's ``calculate_kl(mu_q, sig_q, mu_p, sig_p)``
(/root/reference/Neural_network/VI/metrics.py:40-42) is invoked as
``calculate_kl(prior_mu, prior_sigma, W_mu, W_sigma)``, which evaluates
KL(N(prior) || N(posterior)) — the reverse of the textbook ELBO term. We
reproduce that behavior by default (``direction='reference'``) for parity and
offer the standard direction as an option.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from vihmc_tpu.models.mlp import MLPConfig, get_activation
from vihmc_tpu.models.deeponet import DeepONetConfig, bc_embedding
from vihmc_tpu.core.prng import split_like

VariationalParams = Dict[str, Any]  # {'mu': tree, 'rho': tree}

_LRT_EPS = 1e-16  # activation-variance floor (reference BBB_LRT/BBBLinear.py:62)


def softplus_sigma(rho):
    """sigma = log1p(exp(rho)), the reference's rho -> sigma map."""
    return jax.nn.softplus(rho)


def init_variational(
    key,
    params_template,
    posterior_mu_initial=(0.0, 0.1),
    posterior_rho_initial=(-3.0, 0.1),
) -> VariationalParams:
    """Normal-init (mu, rho) pairs mirroring ``params_template``.

    Defaults match the reference's priors dict
    (/root/reference/Neural_network/VI/config.py:16-21).
    """
    kmu, krho = jax.random.split(key)

    def norm_init(key_tree, template, loc, scale):
        return jax.tree_util.tree_map(
            lambda k, p: loc + scale * jax.random.normal(k, jnp.shape(p)),
            key_tree,
            template,
        )

    return {
        "mu": norm_init(split_like(kmu, params_template), params_template, *posterior_mu_initial),
        "rho": norm_init(split_like(krho, params_template), params_template, *posterior_rho_initial),
    }


def sample_params(key, vp: VariationalParams):
    """Weight-space reparameterized draw: mu + eps * softplus(rho), per leaf."""
    keys = split_like(key, vp["mu"])
    return jax.tree_util.tree_map(
        lambda k, mu, rho: mu + jax.random.normal(k, jnp.shape(mu)) * softplus_sigma(rho),
        keys,
        vp["mu"],
        vp["rho"],
    )


def mean_params(vp: VariationalParams):
    return vp["mu"]


def kl_gaussian(mu_q, sig_q, mu_p, sig_p):
    """Reference closed form (metrics.py:40-42): KL(N(mu_q,sig_q) || N(mu_p,sig_p))."""
    return 0.5 * jnp.sum(
        2 * jnp.log(sig_p / sig_q) - 1 + (sig_q / sig_p) ** 2 + ((mu_p - mu_q) / sig_p) ** 2
    )


def kl_divergence(vp: VariationalParams, prior_mu=0.0, prior_sigma=1.0, direction="reference"):
    """Total KL between the factorized posterior and the Gaussian prior.

    ``direction='reference'`` evaluates KL(prior || posterior), matching the
    reference's argument order; ``'standard'`` evaluates KL(posterior || prior).
    """
    leaves_mu = jax.tree_util.tree_leaves(vp["mu"])
    leaves_rho = jax.tree_util.tree_leaves(vp["rho"])
    total = 0.0
    for mu, rho in zip(leaves_mu, leaves_rho):
        sigma = softplus_sigma(rho)
        if direction == "reference":
            total = total + kl_gaussian(prior_mu, prior_sigma, mu, sigma)
        elif direction == "standard":
            total = total + kl_gaussian(mu, sigma, prior_mu, prior_sigma)
        else:
            raise ValueError(f"unknown KL direction {direction!r}")
    return total


# ---------------------------------------------------------------------------
# Layer-level applies
# ---------------------------------------------------------------------------

def bbb_linear_apply(key, layer_mu, layer_rho, x, sample=True):
    """Weight-space BBB linear layer (BBB/BBBLinear.py:54-72)."""
    if sample:
        kw, kb = jax.random.split(key)
        w = layer_mu["w"] + jax.random.normal(kw, layer_mu["w"].shape) * softplus_sigma(layer_rho["w"])
        y = x @ w.T
        if "b" in layer_mu:
            b = layer_mu["b"] + jax.random.normal(kb, layer_mu["b"].shape) * softplus_sigma(layer_rho["b"])
            y = y + b
        return y
    y = x @ layer_mu["w"].T
    if "b" in layer_mu:
        y = y + layer_mu["b"]
    return y


def lrt_linear_apply(key, layer_mu, layer_rho, x, sample=True):
    """Local-reparameterization linear layer (BBB_LRT/BBBLinear.py:53-70)."""
    act_mu = x @ layer_mu["w"].T
    if "b" in layer_mu:
        act_mu = act_mu + layer_mu["b"]
    if not sample:
        return act_mu
    w_var = softplus_sigma(layer_rho["w"]) ** 2
    act_var = (x * x) @ w_var.T
    if "b" in layer_mu:
        act_var = act_var + softplus_sigma(layer_rho["b"]) ** 2
    eps = jax.random.normal(key, act_mu.shape)
    return act_mu + eps * jnp.sqrt(_LRT_EPS + act_var)


def _conv2d(x, w, stride, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def bbb_conv2d_apply(key, layer_mu, layer_rho, x, stride=1, padding="SAME", sample=True):
    """Weight-space BBB conv2d (BBB/BBBConv.py). x: (N,C,H,W), w: (O,I,kh,kw)."""
    if sample:
        kw, kb = jax.random.split(key)
        w = layer_mu["w"] + jax.random.normal(kw, layer_mu["w"].shape) * softplus_sigma(layer_rho["w"])
        y = _conv2d(x, w, stride, padding)
        if "b" in layer_mu:
            b = layer_mu["b"] + jax.random.normal(kb, layer_mu["b"].shape) * softplus_sigma(layer_rho["b"])
            y = y + b[None, :, None, None]
        return y
    y = _conv2d(x, layer_mu["w"], stride, padding)
    if "b" in layer_mu:
        y = y + layer_mu["b"][None, :, None, None]
    return y


def lrt_conv2d_apply(key, layer_mu, layer_rho, x, stride=1, padding="SAME", sample=True):
    """Local-reparameterization conv2d (BBB_LRT/BBBConv.py:61-80)."""
    act_mu = _conv2d(x, layer_mu["w"], stride, padding)
    if "b" in layer_mu:
        act_mu = act_mu + layer_mu["b"][None, :, None, None]
    if not sample:
        return act_mu
    w_var = softplus_sigma(layer_rho["w"]) ** 2
    act_var = _conv2d(x * x, w_var, stride, padding)
    if "b" in layer_mu:
        act_var = act_var + (softplus_sigma(layer_rho["b"]) ** 2)[None, :, None, None]
    eps = jax.random.normal(key, act_mu.shape)
    return act_mu + eps * jnp.sqrt(_LRT_EPS + act_var)


# ---------------------------------------------------------------------------
# Model-level applies
# ---------------------------------------------------------------------------

_LAYER_APPLY = {"bbb": bbb_linear_apply, "lrt": lrt_linear_apply}


def bayesian_mlp_apply(cfg: MLPConfig, vp: VariationalParams, x, key, mode="bbb", sample=True):
    """Bayesian MLP forward (reference ``Bayesian_Net``, bayesian_model.py:42-62).

    Returns predictions only; use :func:`kl_divergence` for the KL term.
    """
    apply_fn = _LAYER_APPLY[mode]
    act = get_activation(cfg.activation)
    n_layers = len(vp["mu"])
    keys = jax.random.split(key, n_layers)
    h = x
    for i in range(n_layers - 1):
        h = act(apply_fn(keys[i], vp["mu"][i], vp["rho"][i], h, sample))
    return apply_fn(keys[-1], vp["mu"][-1], vp["rho"][-1], h, sample)


def _bayesian_stack(cfg, mu_layers, rho_layers, x, keys, mode, sample):
    apply_fn = _LAYER_APPLY[mode]
    act = get_activation(cfg.activation)
    h = x
    for i in range(len(mu_layers) - 1):
        h = act(apply_fn(keys[i], mu_layers[i], rho_layers[i], h, sample))
    return apply_fn(keys[-1], mu_layers[-1], rho_layers[-1], h, sample)


def bayesian_deeponet_apply(
    cfg: DeepONetConfig, vp: VariationalParams, branch_x, trunk_x, key, mode="bbb", sample=True
):
    """Bayesian DeepONet forward (reference ``Bayesian_DeepONet``,
    /root/reference/Operator_network/VI/bayesian_model.py:54-114).

    The scalar merge bias is itself Bayesian (b_mu/b_rho with its own KL,
    bayesian_model.py:33-34,98-110). With ``cfg.noise_neurons > 0`` returns
    ``(y, noise_param)`` — the heteroscedastic head's output — else ``y``.
    """
    kb, kt, kbias = jax.random.split(key, 3)
    n_b = len(vp["mu"]["branch"])
    n_t = len(vp["mu"]["trunk"])

    trunk_in = bc_embedding(trunk_x) if cfg.impose_bc else trunk_x
    bout = _bayesian_stack(cfg, vp["mu"]["branch"], vp["rho"]["branch"], branch_x,
                           jax.random.split(kb, n_b), mode, sample)
    tout = _bayesian_stack(cfg, vp["mu"]["trunk"], vp["rho"]["trunk"], trunk_in,
                           jax.random.split(kt, n_t), mode, sample)

    if sample:
        b = vp["mu"]["b"] + jax.random.normal(kbias, ()) * softplus_sigma(vp["rho"]["b"])
    else:
        b = vp["mu"]["b"]

    n = cfg.noise_neurons
    k_main = cfg.latent - n
    if trunk_x.ndim == 2:
        y = bout[:, :k_main] @ tout[:, :k_main].T + b
        if n:
            return y, bout[:, k_main:] @ tout[:, k_main:].T
        return y
    y = jnp.einsum("bk,bpk->bp", bout[:, :k_main], tout[..., :k_main]) + b
    if n:
        return y, jnp.einsum("bk,bpk->bp", bout[:, k_main:], tout[..., k_main:])
    return y
