"""Full-parameter DeepONet HMC with NUTS-style step-size adaptation.

Reference: /root/reference/Operator_network/HMC/NUTS_DeepOnets.py — "Adaptive
step size HMC for an acceptance rate of 80%" (:5-9), full-parameter
log-posterior with a shared N(0, sqrt(prior_var)) prior (:127-132; note the
reference's ``Normal(0, tau*0.5)`` branch there is inconsistent with its other
pipelines' ``tau**0.5`` — we use the sqrt convention everywhere), optional
random trunk-point subsampling per log-prob call (``sample_data``/``p``,
config.py:33-38).

The subsampling quirk becomes a first-class per-draw aux refresh: the trunk
index set is sampler state redrawn before each sample, so the likelihood is
fixed within a trajectory (shape-stable under jit) while still stochastic
across draws.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vihmc_tpu.chains import sample_chains, summarize_np
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import IsotropicGaussianPrior
from vihmc_tpu.hmc import HMCConfig
from vihmc_tpu.pipelines.common import make_flat_deeponet
from vihmc_tpu.pipelines.configs import OperatorHMCRunConfig
from vihmc_tpu.pipelines.predict import posterior_predictive, predictive_metrics
from vihmc_tpu.data.burgers import get_burgers
from vihmc_tpu.io.artifacts import RunStore


def score_on_validation(cfg, apply_flat, prior, valid_split, samples, burn):
    """Pooled posterior-predictive scoring of full-parameter samples on the
    validation split (shared by the NUTS/split runs and their reevaluate
    modes). Returns (metrics, preds, log_probs)."""
    like = get_likelihood(cfg.loss)
    samples = jnp.asarray(samples)
    if samples.ndim == 2:
        samples = samples[None]

    def lp_and_pred(flat):
        pred = apply_flat(flat, valid_split["branch_in"], valid_split["trunk_in"])
        lp = like(pred.reshape(valid_split["solution"].shape),
                  valid_split["solution"], cfg.tau_out) + prior.log_prob(flat)
        return lp, pred

    pooled = samples[:, burn:, :].reshape(-1, samples.shape[-1])
    log_probs, preds = posterior_predictive(jax.jit(lp_and_pred), pooled,
                                            chunk_size=16)
    metrics = predictive_metrics(preds, valid_split["solution"], log_probs)
    return metrics, preds, log_probs


def run(cfg: OperatorHMCRunConfig = OperatorHMCRunConfig(), key=None, data=None,
        mat_path=None, num_chains: int = 1, mesh=None,
        store: Optional[RunStore] = None, use_fused: bool = False,
        use_gram: Optional[bool] = None):
    """``use_gram``: Gram-form trajectory gradients for the full 172k-dim
    parameter vector (no (B, P) array per leapfrog step —
    :mod:`vihmc_tpu.ops.gram_merge`); auto-enabled when eligible (NLL,
    shared grid, no subsampling, no noise head). The exact density still
    decides MH acceptance."""
    key = jax.random.key(0) if key is None else key
    kd, ki, ks, kt = jax.random.split(key, 4)
    if data is None:
        train_split, valid_split = get_burgers(kd, cfg.n_train, cfg.n_valid, mat_path)
    else:
        train_split, valid_split = data

    apply_flat, flat0, _ = make_flat_deeponet(cfg.model)
    like = get_likelihood(cfg.loss)
    prior = IsotropicGaussianPrior(scale=cfg.prior_var ** 0.5)
    n_grid = train_split["trunk_in"].shape[0]
    subsample = cfg.sample_data and cfg.p < n_grid

    if subsample:
        def log_prob(flat, trunk_idx):
            trunk = train_split["trunk_in"][trunk_idx]
            y = train_split["solution"][:, trunk_idx]
            pred = apply_flat(flat, train_split["branch_in"], trunk)
            return like(pred, y, cfg.tau_out) + prior.log_prob(flat)

        def refresh(key, _idx):
            return jax.random.choice(key, n_grid, shape=(cfg.p,), replace=False)

        aux0 = refresh(kt, None)
    elif use_fused and cfg.loss == "NLL":
        # optional fused Pallas merge+NLL likelihood (composed XLA is the
        # measured-faster default in-sampler; see docs/performance.md)
        from vihmc_tpu.pipelines.common import make_deeponet_nll_log_posterior

        fused_ll, _, _ = make_deeponet_nll_log_posterior(
            cfg.model, train_split["branch_in"], train_split["trunk_in"],
            train_split["solution"], tau_var=cfg.tau_out, prior=None)

        def log_prob(flat):
            return fused_ll(flat) + prior.log_prob(flat)

        refresh, aux0 = None, None
    else:
        def log_prob(flat):
            pred = apply_flat(flat, train_split["branch_in"], train_split["trunk_in"])
            return like(pred.reshape(train_split["solution"].shape),
                        train_split["solution"], cfg.tau_out) + prior.log_prob(flat)

        refresh, aux0 = None, None

    gram_eligible = (cfg.loss == "NLL" and not subsample
                     and not cfg.model.noise_neurons
                     and train_split["trunk_in"].ndim == 2)
    grad_fn = None
    if use_gram or (use_gram is None and gram_eligible):
        from vihmc_tpu.ops.gram_merge import make_gram_grad_full

        grad_full, _, _ = make_gram_grad_full(
            cfg.model, train_split["branch_in"], train_split["trunk_in"],
            train_split["solution"], tau_var=cfg.tau_out, prior=prior)

        def grad_fn(flat):
            return grad_full(flat)

    inits = jax.vmap(lambda k: 0.1 * jax.random.normal(k, flat0.shape))(
        jax.random.split(ki, num_chains))
    hmc_cfg = HMCConfig(num_samples=cfg.num_samples, num_leapfrog=cfg.L,
                        step_size=cfg.step_size, burn=cfg.burn,
                        sampler="hmc_nuts", target_accept=cfg.target_accept)
    res = sample_chains(log_prob, inits, ks, hmc_cfg, aux=aux0,
                        aux_refresh=refresh, mesh=mesh, grad_fn=grad_fn)

    metrics, preds, log_probs = score_on_validation(
        cfg, apply_flat, prior, valid_split, res.samples, cfg.burn)
    metrics["acceptance_rate"] = res.acceptance_rate
    metrics["adapted_step_size"] = res.step_sizes[..., -1]

    if store is not None:
        store.save_config(cfg)
        store.save_array("hmc_params", res.samples)
        store.save_array("sample_mse", metrics["sample_mse"])
    return {"result": res, "metrics": metrics,
            "diagnostics": summarize_np(res.samples[:, cfg.burn:, :]),
            "data": (train_split, valid_split), "apply_flat": apply_flat}


def reevaluate(cfg, store: RunStore, key=None, data=None, mat_path=None):
    """Reload saved full-parameter samples and re-score on validation data
    (the reference's ``evaluate``/``eval_uid`` modes for the operator HMC
    pipelines, main_HMC_splitting.py:386-433). Works for both the NUTS and
    split configs (same model/loss/prior fields)."""
    key = jax.random.key(0) if key is None else key
    if data is None:
        _, valid_split = get_burgers(key, cfg.n_train, cfg.n_valid, mat_path)
    else:
        _, valid_split = data
    apply_flat, _, _ = make_flat_deeponet(cfg.model)
    prior = IsotropicGaussianPrior(scale=cfg.prior_var ** 0.5)
    samples = jnp.asarray(store.load_array("hmc_params"))
    if samples.ndim == 2:
        samples = samples[None]
    metrics, preds, _ = score_on_validation(cfg, apply_flat, prior, valid_split,
                                            samples, cfg.burn)
    return {"metrics": metrics, "predictions": preds,
            "diagnostics": summarize_np(samples[:, cfg.burn:, :])}
