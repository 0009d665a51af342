"""Sensitivity pipelines: rank VI-posterior parameters, select the HMC subspace.

Reference: /root/reference/Neural_network/VI/sensitivity.py (jacrev over named
params) and /root/reference/Operator_network/VI/sensitivity.py (jacrev over the
flat vector through a functional DeepONet). Artifacts written per run uid:
``means_flattened`` / ``stds_flattened`` / ``gradient_indices`` /
``sensitivity_scores`` (sensitivity.py:268-288) — the filesystem contract the
VI-HMC stage consumes.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from vihmc_tpu.sensitivity import (
    sensitivity_scores,
    select_sensitive_indices,
    captured_variance_count,
    flatten_mean_std,
)
from vihmc_tpu.pipelines.common import make_flat_mlp, make_flat_deeponet
from vihmc_tpu.pipelines.configs import SensitivityRunConfig
from vihmc_tpu.data.burgers import subsample_trunk
from vihmc_tpu.io.artifacts import RunStore


def _finish(cfg, scores, flat_mu, flat_sigma, store: Optional[RunStore]):
    indices = select_sensitive_indices(scores, cfg.importance_threshold)
    out = {
        "scores": np.asarray(scores),
        "indices": indices,
        "mu": np.asarray(flat_mu),
        "sigma": np.asarray(flat_sigma),
        "num_sensitive": len(indices),
        "captured_count": captured_variance_count(scores, cfg.importance_threshold),
    }
    if store is not None:
        store.save_config(cfg, name="config_sens")
        store.save_array("means_flattened", out["mu"])
        store.save_array("stds_flattened", out["sigma"])
        store.save_array("gradient_indices", indices)
        store.save_array("sensitivity_scores", out["scores"])
    return out


def run_nn(vp, mlp_cfg, inputs, cfg: SensitivityRunConfig = SensitivityRunConfig(),
           store: Optional[RunStore] = None):
    """NN sensitivity. ``vp`` = trained variational params; ``inputs`` (N, in)."""
    flat_mu, flat_sigma = flatten_mean_std(vp)
    return run_nn_flat(flat_mu, flat_sigma, mlp_cfg, inputs, cfg, store)


def run_nn_flat(flat_mu, flat_sigma, mlp_cfg, inputs,
                cfg: SensitivityRunConfig = SensitivityRunConfig(),
                store: Optional[RunStore] = None):
    """NN sensitivity from flat VI mu/sigma vectors — the standalone entry
    point consuming a finished VI run's ``vi_mu/sigma_flattened`` artifacts
    (the reference runs sensitivity.py as its own script against a saved
    checkpoint, /root/reference/Neural_network/VI/sensitivity.py:205-235)."""
    apply_flat, _, _ = make_flat_mlp(mlp_cfg)

    def apply_one(flat, x):
        return apply_flat(flat, x[None, :])[0]

    scores = sensitivity_scores(apply_one, flat_mu, flat_sigma, inputs,
                                chunk_size=cfg.batch_chunk)
    return _finish(cfg, scores, flat_mu, flat_sigma, store)


def run_operator(vp, deeponet_cfg, split, cfg: SensitivityRunConfig = SensitivityRunConfig(),
                 key=None, store: Optional[RunStore] = None):
    """Operator sensitivity over ``cfg.p_subsample`` random trunk points per
    example (reference config_sens.py:25 uses p=100 to bound the Jacobian)."""
    flat_mu, flat_sigma = flatten_mean_std(vp)
    return run_operator_flat(flat_mu, flat_sigma, deeponet_cfg, split, cfg,
                             key=key, store=store)


def run_operator_flat(flat_mu, flat_sigma, deeponet_cfg, split,
                      cfg: SensitivityRunConfig = SensitivityRunConfig(),
                      key=None, store: Optional[RunStore] = None):
    """Operator twin of :func:`run_nn_flat` (standalone stage against a
    finished VI run's flat-posterior artifacts)."""
    key = jax.random.key(0) if key is None else key
    apply_flat, _, _ = make_flat_deeponet(deeponet_cfg)

    if split["trunk_in"].ndim == 3:
        # per-example query points (e.g. Cone): already (B, P, 2), no
        # grid subsampling to do
        trunk_sub = split["trunk_in"]
    else:
        p = min(cfg.p_subsample, split["trunk_in"].shape[0])
        trunk_sub, _ = subsample_trunk(key, split, p)  # (B, p, 2)
    inputs = {"branch": split["branch_in"], "trunk": trunk_sub}

    def apply_one(flat, x):
        return apply_flat(flat, x["branch"][None, :], x["trunk"][None, :, :])[0]

    scores = sensitivity_scores(apply_one, flat_mu, flat_sigma, inputs,
                                chunk_size=cfg.batch_chunk)
    return _finish(cfg, scores, flat_mu, flat_sigma, store)
