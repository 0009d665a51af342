"""Split-Hamiltonian HMC over data shards for the DeepONet.

Reference: /root/reference/Operator_network/HMC/main_HMC_splitting.py —
training functions partitioned into ``num_splits`` equal shards (:28-76), one
log-prob per shard with the prior contribution divided by ``num_splits``
(:202-204,253-254), integrated with hamiltorch's SPLITTING integrator
(:361-369) and an optional NUTS-adaptation toggle (``is_nuts``,
config_splitting.py:31).

TPU mapping: shard potentials are stacked along a leading axis and swept by
the split integrator's inner scan; on a mesh the shard axis rides the 'data'
mesh dimension (SURVEY.md section 2.5 row "Split-Hamiltonian").
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
from vihmc_tpu.pipelines.configs import SplitHMCRunConfig
from vihmc_tpu.pipelines.predict import posterior_predictive, predictive_metrics
from vihmc_tpu.data.burgers import get_burgers, split_shards
from vihmc_tpu.io.artifacts import RunStore


def run(cfg: SplitHMCRunConfig = SplitHMCRunConfig(), key=None, data=None,
        mat_path=None, num_chains: int = 1, mesh=None,
        store: Optional[RunStore] = None):
    key = jax.random.key(0) if key is None else key
    kd, ki, ks = jax.random.split(key, 3)
    if data is None:
        train_split, valid_split = get_burgers(kd, cfg.n_train, cfg.n_valid, mat_path)
    else:
        train_split, valid_split = data

    shards = split_shards(train_split, cfg.num_splits)
    apply_flat, flat0, _ = make_flat_deeponet(cfg.model)
    like = get_likelihood(cfg.loss)
    prior = IsotropicGaussianPrior(scale=cfg.prior_var ** 0.5)
    trunk = train_split["trunk_in"]

    def shard_log_prob(flat, shard):
        branch, sol = shard
        pred = apply_flat(flat, branch, trunk)
        return like(pred.reshape(sol.shape), sol, cfg.tau_out) \
            + prior.log_prob(flat) / cfg.num_splits

    shard_data = (shards["branch_in"], shards["solution"])

    def full_log_prob(flat):
        pred = apply_flat(flat, train_split["branch_in"], trunk)
        return like(pred.reshape(train_split["solution"].shape),
                    train_split["solution"], cfg.tau_out) + prior.log_prob(flat)

    inits = jax.vmap(lambda k: 0.1 * jax.random.normal(k, flat0.shape))(
        jax.random.split(ki, num_chains))
    hmc_cfg = HMCConfig(
        num_samples=cfg.num_samples, num_leapfrog=cfg.L, step_size=cfg.step_size,
        burn=cfg.burn, sampler="hmc_nuts" if cfg.is_nuts else "hmc",
        integrator="splitting", target_accept=cfg.target_accept)
    res = sample_chains(full_log_prob, inits, ks, hmc_cfg,
                        shard_log_prob_fn=shard_log_prob, shard_data=shard_data,
                        mesh=mesh)

    from vihmc_tpu.pipelines.hmc_nuts import score_on_validation

    metrics, preds, log_probs = score_on_validation(
        cfg, apply_flat, prior, valid_split, res.samples, cfg.burn)
    metrics["acceptance_rate"] = res.acceptance_rate

    if store is not None:
        store.save_config(cfg)
        store.save_array("hmc_params", res.samples)
        store.save_array("sample_mse", metrics["sample_mse"])
    return {"result": res, "metrics": metrics,
            "diagnostics": summarize_np(res.samples[:, cfg.burn:, :]),
            "data": (train_split, valid_split), "apply_flat": apply_flat}


# reload-and-score mode (reference validate_HMC, main_HMC_splitting.py:386-426);
# shares the full-parameter operator evaluation with the NUTS pipeline.
from vihmc_tpu.pipelines.hmc_nuts import reevaluate  # noqa: E402,F401
