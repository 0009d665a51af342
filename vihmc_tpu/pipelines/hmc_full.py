"""Full-parameter HMC for the regression MLP — the minimum end-to-end slice.

Reference pipeline: /root/reference/Neural_network/HMC/main_regression_hmc.py
(draw_hmc_samples :102-129, validate :132-176, sequential chain loop
:179-190). Differences by design:

* chains run vectorized/mesh-sharded instead of a Python loop;
* the log-posterior + all leapfrog steps compile to one XLA computation;
* sampler state is explicit and checkpointable.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vihmc_tpu.chains import sample_chains, summarize_np
from vihmc_tpu.core.ravel import per_segment_vector
from vihmc_tpu.data.synthetic import regression_data
from vihmc_tpu.dists.priors import PerSegmentGaussianPrior
from vihmc_tpu.hmc import HMCConfig
from vihmc_tpu.models.mlp import init_mlp
from vihmc_tpu.pipelines.common import make_flat_mlp, make_log_posterior
from vihmc_tpu.pipelines.configs import NNHMCRunConfig
from vihmc_tpu.pipelines.predict import posterior_predictive, predictive_metrics
from vihmc_tpu.io.artifacts import RunStore


def build_log_posterior(cfg: NNHMCRunConfig, data):
    """Per-tensor N(0, tau^-1/2) priors + regression likelihood, matching
    ``hamiltorch.sample_model``'s construction (tau as precision,
    main_regression_hmc.py:118-127)."""
    apply_flat, flat0, unravel = make_flat_mlp(cfg.model)
    params0 = init_mlp(jax.random.key(0), cfg.model)
    scales = per_segment_vector(params0, [cfg.tau ** -0.5] * len(jax.tree_util.tree_leaves(params0)))
    prior = PerSegmentGaussianPrior(scales)
    log_prob = make_log_posterior(
        lambda flat: apply_flat(flat, data["x_train"]),
        data["y_train"], cfg.loss, cfg.tau_out, prior,
    )
    return log_prob, apply_flat, flat0, prior


def run(cfg: NNHMCRunConfig = NNHMCRunConfig(), key=None, data=None, mesh=None,
        store: Optional[RunStore] = None):
    """Sample, evaluate, and (optionally) persist. Returns a result dict."""
    key = jax.random.key(0) if key is None else key
    kd, ki, ks = jax.random.split(key, 3)
    if data is None:
        data = regression_data(kd, cfg.n_train, cfg.n_val, noise_std=cfg.tau_out ** -0.5)

    log_prob, apply_flat, flat0, prior = build_log_posterior(cfg, data)

    # torch-default random init per chain (the reference re-creates the net
    # per chain; parity via same init family)
    inits = jax.vmap(lambda k: jax.random.normal(k, flat0.shape) * 0.3)(
        jax.random.split(ki, cfg.num_chains))

    hmc_cfg = HMCConfig(num_samples=cfg.num_samples, num_leapfrog=cfg.L,
                        step_size=cfg.step_size)
    res = sample_chains(log_prob, inits, ks, hmc_cfg, mesh=mesh)

    # posterior predictive on validation data, post-burn, all chains pooled
    def lp_and_pred(flat):
        pred = apply_flat(flat, data["x_val"])
        lp = make_log_posterior(lambda f: apply_flat(f, data["x_val"]),
                                data["y_val"], cfg.loss, cfg.tau_out, prior)(flat)
        return lp, pred

    pooled = res.samples[:, cfg.burn:, :].reshape(-1, flat0.shape[0])
    log_probs, preds = posterior_predictive(jax.jit(lp_and_pred), pooled,
                                            chunk_size=256)
    metrics = predictive_metrics(preds, data["y_val"], log_probs)
    metrics["acceptance_rate"] = res.acceptance_rate
    metrics["num_divergent"] = res.num_divergent
    diag = summarize_np(res.samples[:, cfg.burn:, :])

    if store is not None:
        store.save_config(cfg)
        store.save_array("hmc_params", res.samples)
        store.save_array("sample_mse", metrics["sample_mse"])
    return {"result": res, "metrics": metrics, "diagnostics": diag, "data": data,
            "apply_flat": apply_flat}


def reevaluate(cfg: NNHMCRunConfig, store: RunStore, key=None, data=None):
    """Reload saved samples and re-score on validation data without sampling
    (the reference's ``test``/``test_dtstring`` mode,
    main_regression_hmc.py:184-185 + validate())."""
    key = jax.random.key(0) if key is None else key
    if data is None:
        data = regression_data(key, cfg.n_train, cfg.n_val,
                               noise_std=cfg.tau_out ** -0.5)
    _, apply_flat, flat0, prior = build_log_posterior(cfg, data)
    samples = jnp.asarray(store.load_array("hmc_params"))
    if samples.ndim == 2:
        samples = samples[None]

    def lp_and_pred(flat):
        pred = apply_flat(flat, data["x_val"])
        lp = make_log_posterior(lambda f: apply_flat(f, data["x_val"]),
                                data["y_val"], cfg.loss, cfg.tau_out, prior)(flat)
        return lp, pred

    pooled = samples[:, cfg.burn:, :].reshape(-1, flat0.shape[0])
    log_probs, preds = posterior_predictive(jax.jit(lp_and_pred), pooled,
                                            chunk_size=256)
    metrics = predictive_metrics(preds, data["y_val"], log_probs)
    return {"metrics": metrics, "predictions": preds,
            "diagnostics": summarize_np(samples[:, cfg.burn:, :])}
