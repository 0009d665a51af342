"""Stage 1+2 of the flagship operator demo, run once and cached.

Generates the Burgers dataset deterministically, trains the Bayesian
DeepONet VI stage at the reference minibatch regime (batch 128 +
per-example trunk subsampling, /root/reference/Operator_network/VI/
main_VI_deeponet.py:23-81), runs sensitivity, and persists everything
downstream consumers need:

- ``runs/op_r2/stage12/``: the RunStore artifact contract
  (means/stds_flattened, gradient_indices, sensitivity_scores) that stage 3
  (scripts/run_operator_demo.py / the vi-hmc CLI) reads.
- ``assets/burgers_stage12.npz``: compact bundle committed to the repo so
  bench.py can build its posterior from REAL stage-1/2 artifacts instead of
  synthetic noise data (round-1 VERDICT item 2): full-vector mu/sigma, the
  90%-captured-variance index set, full sensitivity scores (for top-k
  subspaces), the data-generation parameters, and the VI metric curve.

``--compare-loop N`` additionally times N epochs of the python-loop
DataLoader-style path (vihmc_tpu/vi/train.py::train — the literal reference
regime) against N epochs of the per-epoch-scan path on identical data and
config, so the demo default is the measured winner (VERDICT item 8). Both
paths are minibatched; they differ only in dispatch granularity.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def compare_loop_path(model, data, p, epochs, key):
    """Time the python-loop (DataLoader-style) VI path vs the scan path at
    identical config/data for ``epochs`` epochs; returns a summary dict."""
    import dataclasses

    from vihmc_tpu.models import init_deeponet
    from vihmc_tpu.models.bayesian import init_variational
    from vihmc_tpu.pipelines import vi_train, configs as C
    from vihmc_tpu.pipelines.common import deeponet_vi_apply
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig
    from vihmc_tpu.vi.train import init_train_state, train
    from vihmc_tpu.data.burgers import subsample_trunk

    train_split, valid_split = data
    n_train = train_split["branch_in"].shape[0]
    n_grid = train_split["trunk_in"].shape[0]
    vi_cfg = VIConfig(epochs=epochs, lr_start=1e-3, patience=20, num_ens=3,
                      prior_sigma=0.1,
                      elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0))
    op_cfg = C.OperatorVIRunConfig(model=model, n_train=n_train,
                                   n_valid=valid_split["branch_in"].shape[0],
                                   batch_size=128, p=p, vi=vi_cfg)

    kp, kt = jax.random.split(key)
    apply_fn = deeponet_vi_apply(model, op_cfg.mode)
    template = init_deeponet(kp, model)

    # --- python-loop path (reference DataLoader regime: host-side shuffle,
    # one dispatch per minibatch step) ---
    vp = init_variational(kp, template, op_cfg.posterior_mu_initial,
                          op_cfg.posterior_rho_initial)
    state = init_train_state(vp, vi_cfg)

    def batches_fn(key, epoch):
        ks, kperm = jax.random.split(key)
        order = np.asarray(jax.random.permutation(kperm, n_train))
        batches = []
        for start in range(0, n_train, op_cfg.batch_size):
            idx = order[start:start + op_cfg.batch_size]
            ks, kb = jax.random.split(ks)
            trunk, y = subsample_trunk(
                kb, {"trunk_in": train_split["trunk_in"],
                     "branch_in": train_split["branch_in"][idx],
                     "solution": train_split["solution"][idx]}, p)
            batches.append({"branch": train_split["branch_in"][idx],
                            "trunk": trunk, "y": y})
        return batches

    nb = min(op_cfg.batch_size, valid_split["branch_in"].shape[0])
    valid_batch = {"branch": valid_split["branch_in"][:nb],
                   "trunk": valid_split["trunk_in"],
                   "y": valid_split["solution"][:nb]}
    train_eval_batch = {"branch": train_split["branch_in"][:nb],
                        "trunk": train_split["trunk_in"],
                        "y": train_split["solution"][:nb]}
    train_size = n_train * n_grid

    t0 = time.time()
    _, best_loop, metrics_loop = train(apply_fn, state, vi_cfg, batches_fn,
                                       valid_batch, train_eval_batch,
                                       train_size=train_size, key=kt)
    loop_s = time.time() - t0

    # --- per-epoch-scan path on the same config ---
    t0 = time.time()
    out_scan = vi_train.run_operator(op_cfg, key=key, data=data)
    scan_s = time.time() - t0

    return {
        "epochs": epochs,
        "loop_seconds": loop_s,
        "scan_seconds": scan_s,
        "loop_valid_mse_last": float(metrics_loop[-1, 3]),
        "scan_valid_mse_last": float(out_scan["metrics"][-1, 3]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU smoke scale")
    ap.add_argument("--out", default="runs/op_r2/stage12")
    ap.add_argument("--assets", default="assets/burgers_stage12.npz")
    ap.add_argument("--epochs", type=int, default=2400)
    ap.add_argument("--patience", type=int, default=200,
                    help="ReduceLROnPlateau patience (reference scales its "
                         "lr_patience with the training length: "
                         "Neural_network/VI/config.py:28-29 uses 5000/10000)")
    ap.add_argument("--p", type=int, default=512,
                    help="trunk points per example during VI")
    ap.add_argument("--compare-loop", type=int, default=0,
                    help="also time N epochs of loop-vs-scan VI paths")
    args = ap.parse_args()

    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig
    from vihmc_tpu.pipelines import vi_train, sensitivity, configs as C
    from vihmc_tpu.data import get_burgers
    from vihmc_tpu.io import RunStore

    if args.small:
        model = DeepONetConfig(in_branch=17, in_trunk=5, width_branch=16,
                               width_trunk=16, depth_branch=3, depth_trunk=3)
        n_train, n_valid, nx, nt, p = 32, 16, 17, 17, 64
        epochs = min(args.epochs, 5)
    else:
        model = DeepONetConfig()  # reference scale (~172k params)
        n_train, n_valid, nx, nt, p = 1000, 200, 101, 101, args.p
        epochs = args.epochs

    data_seed = 0
    key = jax.random.key(data_seed)
    store = RunStore(args.out, uid="stage12")
    print(f"artifacts -> {store.path}", flush=True)

    t0 = time.time()
    data = get_burgers(key, n_train, n_valid, nx=nx, nt=nt)
    print(f"[data] {n_train}+{n_valid} Burgers fns ({nx}x{nt}) "
          f"in {time.time()-t0:.1f}s", flush=True)

    compare = None
    if args.compare_loop:
        compare = compare_loop_path(model, data, p, args.compare_loop, key)
        print(f"[vi-path-compare] {json.dumps(compare)}", flush=True)

    # --- stage 1: VI (minibatched: batch 128 + per-example trunk subsample,
    # each epoch one compiled scan over minibatch steps) ---
    t0 = time.time()
    vi_cfg = C.OperatorVIRunConfig(
        model=model, n_train=n_train, n_valid=n_valid, batch_size=128, p=p,
        vi=VIConfig(epochs=epochs, lr_start=1e-3, patience=args.patience,
                    num_ens=3, prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0)))
    vi_out = vi_train.run_operator(vi_cfg, key=key, data=data, store=store)
    m = np.asarray(vi_out["metrics"])
    vi_s = time.time() - t0
    print(f"[vi] {epochs} epochs in {vi_s:.1f}s  valid_mse "
          f"{m[0,3]:.4f} -> {m[-1,3]:.4f} (best {m[:,3].min():.4f} "
          f"@epoch {int(m[:,3].argmin())})", flush=True)

    # --- stage 2: sensitivity ---
    t0 = time.time()
    sens = sensitivity.run_operator(
        vi_out["best_state"].vp, model, data[1],
        C.SensitivityRunConfig(importance_threshold=0.90,
                               p_subsample=min(100, nx * nt), batch_chunk=8),
        key=key, store=store)
    sens_s = time.time() - t0
    print(f"[sensitivity] {sens['num_sensitive']}/{len(sens['scores'])} "
          f"in {sens_s:.1f}s", flush=True)

    # --- compact committed bundle for bench.py / stage 3 ---
    os.makedirs(os.path.dirname(args.assets) or ".", exist_ok=True)
    np.savez_compressed(
        args.assets,
        mu=np.asarray(sens["mu"], np.float32),
        sigma=np.asarray(sens["sigma"], np.float32),
        indices=np.asarray(sens["indices"], np.int32),
        scores=np.asarray(sens["scores"], np.float32),
        data_seed=data_seed, n_train=n_train, n_valid=n_valid, nx=nx, nt=nt,
        vi_epochs=epochs, vi_p=p,
        vi_valid_mse=np.asarray(m[:, 3], np.float32))
    print(f"[assets] wrote {args.assets} "
          f"({os.path.getsize(args.assets)/1e6:.1f} MB)", flush=True)

    summary = {
        "valid_mse_first": float(m[0, 3]),
        "valid_mse_last": float(m[-1, 3]),
        "valid_mse_best": float(m[:, 3].min()),
        "vi_seconds": vi_s,
        "sensitivity_seconds": sens_s,
        "num_sensitive": int(sens["num_sensitive"]),
        "subspace_frac": sens["num_sensitive"] / len(sens["scores"]),
        "vi_path_compare": compare,
    }
    store.save_config(summary, name="stage12_summary")
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
