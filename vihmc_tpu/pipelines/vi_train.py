"""VI training pipelines: NN regression and operator (DeepONet/Burgers).

Reference: /root/reference/Neural_network/VI/main_regression_VI.py (full-batch,
ensemble-of-10, 10k epochs) and /root/reference/Operator_network/VI/
main_VI_deeponet.py (minibatched with per-example trunk subsampling,
ensemble-of-5, learnable noise options).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vihmc_tpu.data.synthetic import regression_data
from vihmc_tpu.data.burgers import get_burgers, subsample_trunk
from vihmc_tpu.models.mlp import init_mlp
from vihmc_tpu.models.deeponet import init_deeponet
from vihmc_tpu.models.bayesian import init_variational
from vihmc_tpu.vi.train import (
    init_train_state,
    train,
    train_fullbatch_scan,
    make_train_step,
    make_eval_fn,
    plateau_update,
    predictive_samples,
)
from vihmc_tpu.pipelines.common import mlp_vi_apply, deeponet_vi_apply
from vihmc_tpu.pipelines.configs import NNVIRunConfig, OperatorVIRunConfig
from vihmc_tpu.io.artifacts import RunStore


def run_nn(cfg: NNVIRunConfig = NNVIRunConfig(), key=None, data=None,
           store: Optional[RunStore] = None, init_vp=None):
    """NN VI training. Returns dict with final/best states + metrics."""
    key = jax.random.key(0) if key is None else key
    kd, kp, kt = jax.random.split(key, 3)
    if data is None:
        data = regression_data(kd, cfg.n_train, cfg.n_val, noise_std=cfg.noise)

    template = init_mlp(kp, cfg.model)
    vp = init_vp if init_vp is not None else init_variational(
        kp, template, cfg.posterior_mu_initial, cfg.posterior_rho_initial)
    state = init_train_state(vp, cfg.vi)

    apply_fn = mlp_vi_apply(cfg.model, cfg.mode)
    train_batch = {"x": data["x_train"], "y": data["y_train"]}
    valid_batch = {"x": data["x_val"], "y": data["y_val"]}

    if isinstance(cfg.vi.beta_type, float):
        # whole training = one compiled scan (one host dispatch)
        state, best_state, metrics = train_fullbatch_scan(
            apply_fn, state, cfg.vi, train_batch, valid_batch,
            train_size=data["x_train"].shape[0], key=kt)
        if store is not None:
            for row in metrics:
                store.append_metrics_row(row)
    else:
        def batches_fn(key, epoch):  # full batch, one step per epoch
            return [train_batch]

        def callback(epoch, row, st):
            if store is not None:
                store.append_metrics_row(row)

        state, best_state, metrics = train(
            apply_fn, state, cfg.vi, batches_fn, valid_batch, train_batch,
            train_size=data["x_train"].shape[0], key=kt, callback=callback)

    if store is not None:
        store.save_config(cfg)
        _save_vi_posterior(store, best_state)
    return {"state": state, "best_state": best_state, "metrics": metrics,
            "data": data, "apply_fn": apply_fn}


def _save_vi_posterior(store: RunStore, best_state):
    """Persist the best variational posterior as flat mu/sigma arrays so the
    sensitivity stage can run standalone against a finished VI run — the
    reference's checkpoint -> sensitivity filesystem handoff
    (/root/reference/Operator_network/VI/sensitivity.py:254-271)."""
    from vihmc_tpu.sensitivity import flatten_mean_std

    flat_mu, flat_sigma = flatten_mean_std(best_state.vp)
    store.save_array("vi_mu_flattened", flat_mu)
    store.save_array("vi_sigma_flattened", flat_sigma)


def _run_operator_scan(cfg, state, apply_fn, train_split, valid_split,
                       subsampling, n_grid, key, store):
    """Operator VI with each epoch as ONE compiled scan over minibatches.

    The python-loop path costs ~tens of host round-trips per epoch (batch
    gathers, subsampling draws, per-batch steps) — prohibitive on
    remote-execution backends. Here shuffling, per-example trunk subsampling,
    and all SGD steps for an epoch run device-side; one dispatch per epoch
    plus one for evaluation. Constant-float beta only (the shipped configs);
    the trailing partial minibatch is dropped (epochs reshuffle, so coverage
    is uniform — deviation from the reference's DataLoader noted here).
    """
    import numpy as np
    from vihmc_tpu.vi.elbo import get_beta

    n_train = train_split["branch_in"].shape[0]
    bs = min(cfg.batch_size, n_train)
    n_batches = n_train // bs
    # per-example query points (ndim 3, e.g. Cone) vs shared grid (ndim 2)
    per_example = train_split["trunk_in"].ndim == 3
    n_grid_pts = (train_split["trunk_in"].shape[-2] if per_example
                  else train_split["trunk_in"].shape[0])
    # reference convention: train_size = (actual) N_train * trunk points
    # (Operator_network/VI/utils.py:50); use the split's true size so
    # caller-provided datasets of a different size scale the ELBO correctly
    train_size = n_train * n_grid_pts
    beta = float(cfg.vi.beta_type)

    step = make_train_step(apply_fn, cfg.vi, train_size)
    evaluate = make_eval_fn(apply_fn, cfg.vi, train_size)

    branch_all = train_split["branch_in"]
    trunk_all = train_split["trunk_in"]
    sol_all = train_split["solution"]

    @jax.jit
    def epoch_fn(state, key):
        kperm, kbatch = jax.random.split(key)
        order = jax.random.permutation(kperm, n_train)[: n_batches * bs]
        order = order.reshape(n_batches, bs)
        keys = jax.random.split(kbatch, n_batches)

        def body(state, inp):
            idx, k = inp
            branch = branch_all[idx]
            if subsampling:
                ksub, kstep = jax.random.split(k)
                ex_keys = jax.random.split(ksub, bs)

                def pick(ek, row):
                    tidx = jax.random.choice(ek, n_grid_pts, shape=(cfg.p,),
                                             replace=False)
                    return trunk_all[tidx], row[tidx]

                trunk, y = jax.vmap(pick)(ex_keys, sol_all[idx])
            else:
                kstep = k
                trunk = trunk_all[idx] if per_example else trunk_all
                y = sol_all[idx]
            batch = {"branch": branch, "trunk": trunk, "y": y}
            state, loss = step(state, batch, kstep, beta)
            return state, loss

        state, losses = jax.lax.scan(body, state, (order, keys))
        return state, jnp.mean(losses)

    nb = min(bs, valid_split["branch_in"].shape[0])
    valid_batch = {"branch": valid_split["branch_in"][:nb],
                   "trunk": (valid_split["trunk_in"][:nb] if per_example
                             else valid_split["trunk_in"]),
                   "y": valid_split["solution"][:nb]}
    train_eval_batch = {"branch": branch_all[:nb],
                        "trunk": trunk_all[:nb] if per_example else trunk_all,
                        "y": sol_all[:nb]}

    metrics = []
    best_state, best_valid = state, float("inf")
    for epoch in range(cfg.vi.epochs):
        key, ek, vk, tk = jax.random.split(key, 4)
        state, ep_loss = epoch_fn(state, ek)
        valid_loss, valid_mse = evaluate(state, valid_batch, vk, beta)
        _, train_mse = evaluate(state, train_eval_batch, tk, beta)
        state = state.replace(
            plateau=plateau_update(state.plateau, valid_loss, cfg.vi.patience,
                                   cfg.vi.plateau_factor,
                                   cfg.vi.min_lr / cfg.vi.lr_start),
            epoch=state.epoch + 1,
        )
        row = [float(ep_loss), float(valid_loss), float(train_mse), float(valid_mse)]
        if cfg.vi.elbo.learn_noise:
            row.append(float(jnp.exp(state.noise_param)))
        metrics.append(row)
        if row[1] < best_valid:
            best_valid, best_state = row[1], state
        if store is not None:
            store.append_metrics_row(row)

    if store is not None:
        store.save_config(cfg)
        _save_vi_posterior(store, best_state)
    return {"state": state, "best_state": best_state,
            "metrics": np.asarray(metrics),
            "data": (train_split, valid_split), "apply_fn": apply_fn}


def run_operator(cfg: OperatorVIRunConfig = OperatorVIRunConfig(), key=None,
                 data=None, mat_path: Optional[str] = None,
                 store: Optional[RunStore] = None, init_vp=None):
    """Operator VI training on Burgers data (generated or .mat)."""
    key = jax.random.key(0) if key is None else key
    kd, kp, kt = jax.random.split(key, 3)
    if data is None:
        if cfg.dataset == "Cone":
            from vihmc_tpu.data.cone import get_cone

            train_split, valid_split = get_cone(kd, cfg.n_train, cfg.n_valid,
                                                mat_path, cfg.model.in_branch)
        elif cfg.dataset == "Burgers":
            train_split, valid_split = get_burgers(kd, cfg.n_train, cfg.n_valid,
                                                   mat_path)
        else:
            # reference error surface (Operator_network/VI/utils.py:57)
            raise NotImplementedError(
                f"Dataset: {cfg.dataset} is NOT implemented. "
                f"Dataset should be Burgers or Cone")
    else:
        train_split, valid_split = data

    template = init_deeponet(kp, cfg.model)
    vp = init_vp if init_vp is not None else init_variational(
        kp, template, cfg.posterior_mu_initial, cfg.posterior_rho_initial)
    state = init_train_state(vp, cfg.vi)

    apply_fn = deeponet_vi_apply(cfg.model, cfg.mode)
    per_example = train_split["trunk_in"].ndim == 3  # e.g. Cone (data/cone.py)
    n_grid = (train_split["trunk_in"].shape[-2] if per_example
              else train_split["trunk_in"].shape[0])
    # query subsampling assumes a shared grid; per-example datasets always
    # use their full per-example query set
    subsampling = (not per_example) and cfg.p < n_grid

    if isinstance(cfg.vi.beta_type, float):
        return _run_operator_scan(cfg, state, apply_fn, train_split, valid_split,
                                  subsampling, n_grid, kt, store)

    def make_batches(key, split, shuffle: bool):
        """Minibatch the function axis; per-example random trunk subsample
        when cfg.p < grid (reference BurgersDataSet.__getitem__)."""
        n = split["branch_in"].shape[0]
        ks, kperm = jax.random.split(key)
        order = jax.random.permutation(kperm, n) if shuffle else jnp.arange(n)
        batches = []
        for start in range(0, n, cfg.batch_size):
            idx = order[start:start + cfg.batch_size]
            branch = split["branch_in"][idx]
            if subsampling:
                ks, kb = jax.random.split(ks)
                trunk, y = subsample_trunk(
                    kb,
                    {"trunk_in": split["trunk_in"], "branch_in": branch,
                     "solution": split["solution"][idx]},
                    cfg.p,
                )
            else:
                trunk = (split["trunk_in"][idx] if per_example
                         else split["trunk_in"])
                y = split["solution"][idx]
            batches.append({"branch": branch, "trunk": trunk, "y": y})
        return batches

    def batches_fn(key, epoch):
        return make_batches(key, train_split, shuffle=True)

    # fixed evaluation batches (first minibatch-sized slice, full grid)
    nb = min(cfg.batch_size, cfg.n_valid)
    valid_batch = {"branch": valid_split["branch_in"][:nb],
                   "trunk": (valid_split["trunk_in"][:nb] if per_example
                             else valid_split["trunk_in"]),
                   "y": valid_split["solution"][:nb]}
    train_eval_batch = {"branch": train_split["branch_in"][:nb],
                        "trunk": (train_split["trunk_in"][:nb] if per_example
                                  else train_split["trunk_in"]),
                        "y": train_split["solution"][:nb]}

    def callback(epoch, row, st):
        if store is not None:
            store.append_metrics_row(row)

    # reference: (actual) N_train * trunk points (Operator_network/VI/utils.py:50)
    train_size = train_split["branch_in"].shape[0] * n_grid
    state, best_state, metrics = train(
        apply_fn, state, cfg.vi, batches_fn, valid_batch, train_eval_batch,
        train_size=train_size, key=kt, callback=callback)

    if store is not None:
        store.save_config(cfg)
        _save_vi_posterior(store, best_state)
    return {"state": state, "best_state": best_state, "metrics": metrics,
            "data": (train_split, valid_split), "apply_fn": apply_fn}
