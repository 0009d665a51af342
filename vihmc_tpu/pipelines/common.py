"""Shared pipeline plumbing: flat-vector model closures and log-posteriors.

The reference re-creates ``define_model_log_prob`` closures in four places
(SURVEY.md section 2.3); here one factory builds the flat-parameter forward
(`apply_flat`) from the pure model and one builds the log-posterior from
(apply, data, likelihood, prior) — the composition the HMC kernel consumes.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from vihmc_tpu.core.ravel import ravel_pytree, scatter_subspace
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.models.mlp import MLPConfig, init_mlp, mlp_apply
from vihmc_tpu.models.deeponet import DeepONetConfig, init_deeponet, deeponet_apply
from vihmc_tpu.models.bayesian import bayesian_mlp_apply, bayesian_deeponet_apply


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype), tree)


def make_flat_mlp(cfg: MLPConfig, key=None, compute_dtype=None):
    """Returns (apply_flat(flat, x) -> y, flat0, unravel).

    ``compute_dtype=jnp.bfloat16`` runs the forward in bf16 on the MXU while
    parameters, gradients, and the likelihood reduction stay fp32 — the
    sampled distribution is the posterior induced by the bf16 forward
    (deterministic, so MH remains exact for that target).
    """
    key = jax.random.key(0) if key is None else key
    params0 = init_mlp(key, cfg)
    flat0, unravel = ravel_pytree(params0)

    def apply_flat(flat, x):
        params = unravel(flat)
        if compute_dtype is not None:
            out = mlp_apply(cfg, _cast_tree(params, compute_dtype),
                            jnp.asarray(x, compute_dtype))
            return out.astype(jnp.float32)
        return mlp_apply(cfg, params, x)

    return apply_flat, flat0, unravel


def make_flat_deeponet(cfg: DeepONetConfig, key=None, compute_dtype=None):
    """Returns (apply_flat(flat, branch_x, trunk_x) -> y, flat0, unravel).
    See :func:`make_flat_mlp` for ``compute_dtype`` semantics."""
    key = jax.random.key(0) if key is None else key
    params0 = init_deeponet(key, cfg)
    flat0, unravel = ravel_pytree(params0)

    def apply_flat(flat, branch_x, trunk_x):
        params = unravel(flat)
        if compute_dtype is not None:
            out = deeponet_apply(cfg, _cast_tree(params, compute_dtype),
                                 jnp.asarray(branch_x, compute_dtype),
                                 jnp.asarray(trunk_x, compute_dtype))
            return out.astype(jnp.float32)
        return deeponet_apply(cfg, params, branch_x, trunk_x)

    return apply_flat, flat0, unravel


def make_log_posterior(
    forward: Callable,           # flat -> model output on the (closed-over) data
    y,
    model_loss,
    tau_out: float,
    prior=None,
    prior_scale: float = 1.0,
):
    """log p(theta | D) = log-likelihood + log-prior / prior_scale.

    ``prior_scale`` follows the reference's splitting convention (the prior is
    divided across shard potentials, main_HMC_splitting.py:202-204).
    """
    like = get_likelihood(model_loss)

    def log_prob(flat):
        out = forward(flat)
        # align shapes for elementwise (regression-type) likelihoods; leave
        # classification logits (extra class axis) untouched
        if out.size == y.size and out.shape != y.shape:
            out = out.reshape(y.shape)
        ll = like(out, y, tau_out)
        if prior is not None:
            ll = ll + prior.log_prob(flat) / prior_scale
        return ll

    return log_prob


def make_deeponet_nll_log_posterior(cfg: DeepONetConfig, branch_x, trunk_x, y,
                                    tau_var: float, prior=None, key=None,
                                    use_fused: bool = True):
    """DeepONet Gaussian-NLL log-posterior with the fused Pallas merge+loss.

    On TPU the (B, P) prediction matrix never hits HBM: the merge matmul and
    the NLL reduction run tile-by-tile in one kernel
    (:mod:`vihmc_tpu.ops.deeponet_merge`). Equivalent to composing
    :func:`make_flat_deeponet` + ``get_likelihood('NLL')`` (fallback path).
    Shared-query-grid, homoscedastic case (the hot path of every reference
    operator pipeline).
    """
    from vihmc_tpu.models.deeponet import init_deeponet, deeponet_features
    from vihmc_tpu.ops.deeponet_merge import fused_merge_nll, merge_nll_reference

    key = jax.random.key(0) if key is None else key
    params0 = init_deeponet(key, cfg)
    flat0, unravel = ravel_pytree(params0)

    def log_prob(flat):
        params = unravel(flat)
        bout, tout = deeponet_features(cfg, params, branch_x, trunk_x)
        if use_fused:
            ll = fused_merge_nll(bout, tout, params["b"], y, tau_var)
        else:
            ll = merge_nll_reference(bout, tout, params["b"], y, tau_var)
        if prior is not None:
            ll = ll + prior.log_prob(flat)
        return ll

    return log_prob, flat0, unravel


# ---------------------------------------------------------------------------
# VI-trainer adapters: batch dicts -> Bayesian model applies
# ---------------------------------------------------------------------------

def mlp_vi_apply(cfg: MLPConfig, mode: str = "bbb"):
    """apply_fn(vp, batch{'x','y'}, key, sample) for the VI trainer."""

    def apply_fn(vp, batch, key, sample):
        return bayesian_mlp_apply(cfg, vp, batch["x"], key, mode=mode, sample=sample)

    return apply_fn


def deeponet_vi_apply(cfg: DeepONetConfig, mode: str = "bbb"):
    """apply_fn(vp, batch{'branch','trunk','y'}, key, sample) for the VI trainer."""

    def apply_fn(vp, batch, key, sample):
        return bayesian_deeponet_apply(cfg, vp, batch["branch"], batch["trunk"], key,
                                       mode=mode, sample=sample)

    return apply_fn


def make_paired_subspace_delta(apply_flat, branch_x, trunk_x, y, tau_var,
                               spec, prior, precision: str = "float32"):
    """Paired MH log-density difference for the subspace DeepONet posterior
    (the kernel's ``delta_fn`` — hmc/kernel.py).

    Computes ``log p(q1|aux) - log p(q0|aux)`` as ONE reduction of per-term
    differences, ``-0.5/tau * sum((e1 - e0) * (e1 + e0))``: for the
    reference-scale likelihood (10M Gaussian terms) differencing two
    separately-accumulated f32 sums carries evaluation noise that grows
    with |q1 - q0| to O(1) nats at trajectory scale — an MH acceptance
    ceiling (measured: scripts/tpu_noise_probe.py; forensics in
    docs/performance.md round 4). The paired form's terms are SMALL, so the
    float error stays ~1e-2 nats. Both forwards run at ``precision`` matmul
    precision (default f32 — the bf16 datapath's per-element forward noise
    would otherwise re-enter through e1 - e0).

    Returns ``delta_fn(q1, q0, aux) -> (delta_log_prob, lp1_record)`` where
    ``lp1_record`` matches ``get_likelihood('NLL') + prior.log_prob``
    (torch GaussianNLLLoss semantics, no 2-pi constant).
    """
    idx = spec.idx_array
    n_obs = y.size
    var = jnp.maximum(jnp.asarray(tau_var, jnp.float32), 1e-6)
    const = -0.5 * n_obs * jnp.log(var)

    def delta_fn(q1, q0, aux):
        full1 = scatter_subspace(aux, q1, idx)
        full0 = scatter_subspace(aux, q0, idx)
        with jax.default_matmul_precision(precision):
            p1 = apply_flat(full1, branch_x, trunk_x)
            p0 = apply_flat(full0, branch_x, trunk_x)
        e1 = p1 - y
        e0 = p0 - y
        dll = (-0.5 / var) * jnp.sum((e1 - e0) * (e1 + e0))
        dpr = prior.log_prob(q1) - prior.log_prob(q0)
        lp1 = (-0.5 / var) * jnp.sum(e1 * e1) + const + prior.log_prob(q1)
        return dll + dpr, lp1

    return delta_fn


def make_fused_paired_subspace_delta(cfg: DeepONetConfig, branch_x, trunk_x,
                                     y, tau_var, spec, prior,
                                     interpret: bool = False):
    """Fused-Pallas variant of :func:`make_paired_subspace_delta`: both
    endpoint merges run tile-by-tile in one kernel and neither (B, P)
    prediction ever reaches HBM (:func:`vihmc_tpu.ops.deeponet_merge.
    fused_paired_delta`). Same paired small-term reduction for the
    MH-critical difference; the tiny feature nets still run composed at
    f32 matmul precision. Semantics identical to the composed evaluator
    (torch GaussianNLLLoss convention, no 2-pi constant)."""
    from vihmc_tpu.models.deeponet import deeponet_features, init_deeponet
    from vihmc_tpu.ops.deeponet_merge import fused_paired_delta

    _, unravel = ravel_pytree(init_deeponet(jax.random.key(0), cfg))
    idx = spec.idx_array
    tau = float(tau_var)

    def delta_fn(q1, q0, aux):
        full1 = scatter_subspace(aux, q1, idx)
        full0 = scatter_subspace(aux, q0, idx)
        params1 = unravel(full1)
        params0 = unravel(full0)
        with jax.default_matmul_precision("float32"):
            bout1, tout1 = deeponet_features(cfg, params1, branch_x, trunk_x)
            bout0, tout0 = deeponet_features(cfg, params0, branch_x, trunk_x)
        dll, lp1 = fused_paired_delta(bout1, tout1, params1["b"],
                                      bout0, tout0, params0["b"], y, tau,
                                      interpret=interpret)
        dpr = prior.log_prob(q1) - prior.log_prob(q0)
        return dll + dpr, lp1 + prior.log_prob(q1)

    return delta_fn
