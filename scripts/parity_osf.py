"""One-command parity harness against the reference's real OSF dataset.

The reference's flagship pipeline samples a sensitivity subspace of a
Bayesian DeepONet fit to ``DeepOnet_data.mat`` (osf.io/x64h7 — pointer at
/root/reference/Operator_network/Data/data.txt:1; the file is not
redistributable, so this repo's committed artifacts use generated Burgers
data instead). Anyone holding the ``.mat`` can run THIS script to get the
moment/MSE comparison the north star asks for, at reference-exact configs:

    PALLAS_AXON_POOL_IPS= python scripts/parity_osf.py \
        --mat /path/to/DeepOnet_data.mat \
        [--ref-samples hmc_params_<uid>.npy --ref-indices gradient_indices_<uid>.npy \
         --ref-means means_flattened_<uid> --ref-stds stds_flattened_<uid>]

Stages (configs matched to the reference file:line):
1. VI — batch 128, lr 1e-3, lr_patience 500, num_ens 5, prior sigma 0.1,
   rho-init (-5, 0.1), fixed noise var 1.0
   (/root/reference/Operator_network/VI/config.py:10-51; the shipped epoch
   count is 10 — override with --epochs for a converged fit).
2. Sensitivity — 90% captured variance, p=100 subsampled trunk points
   (/root/reference/Operator_network/VI/config_sens.py:25,33).
3. VI-HMC — step 1e-4, 1000 draws, burn 100, L = int(pi*post_var/(2*step))
   = 7, NLL tau_out 1.0, prior N(0, 0.1), frozen-coordinate refresh
   (/root/reference/Operator_network/VI_HMC/config.py:28-51,
   main_VI_HMC_burgers.py:244-301).

Emits the reference's quality battery (expected val log-prob, expected MSE
of the posterior-predictive mean, final/min per-sample MSE, mean
relative-L2, error-sigma correlation — main_VI_HMC_burgers.py:286-301 +
post_process_burgers.py:105-215). With ``--ref-samples`` (a reference
``hmc_params_<uid>.npy`` produced on the SAME .mat) it additionally pushes
the reference draws through the identical functional DeepONet and reports
posterior-predictive moment parity normalized by Monte-Carlo error.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def predictive_moments(apply_flat, draws_full, branch_x, trunk_x, chunk=16):
    """Posterior-predictive mean/std over (S, D_full) draws: (N, P) each."""
    import jax
    import jax.numpy as jnp

    fwd = jax.jit(lambda f: apply_flat(f, branch_x, trunk_x))
    s1 = None
    s2 = None
    n = 0
    for start in range(0, draws_full.shape[0], chunk):
        block = jnp.asarray(draws_full[start:start + chunk], jnp.float32)
        preds = np.asarray(jax.vmap(fwd)(block), np.float64)
        s1 = preds.sum(0) if s1 is None else s1 + preds.sum(0)
        s2 = (preds ** 2).sum(0) if s2 is None else s2 + (preds ** 2).sum(0)
        n += preds.shape[0]
    mean = s1 / n
    var = np.maximum(s2 / n - mean ** 2, 0.0)
    return mean, np.sqrt(var), n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mat", required=True, help="path to DeepOnet_data.mat")
    ap.add_argument("--epochs", type=int, default=10,
                    help="VI epochs (reference ships 10; use >=1000 for a "
                         "converged stage 1)")
    ap.add_argument("--draws", type=int, default=1000)
    ap.add_argument("--burn", type=int, default=100)
    ap.add_argument("--chains", type=int, default=1,
                    help="reference runs chains sequentially; >1 vectorizes")
    ap.add_argument("--n-train", type=int, default=1000)
    ap.add_argument("--n-valid", type=int, default=1000,
                    help="train/valid split sizes (reference: 1000/1000, "
                         "Operator_network/VI/config.py:29-32; lower only "
                         "for smoke tests on truncated .mat files)")
    ap.add_argument("--out", default="runs/parity_osf")
    ap.add_argument("--ref-samples", default=None,
                    help="reference hmc_params_<uid>.npy from the same .mat")
    ap.add_argument("--ref-indices", default=None,
                    help="reference gradient_indices_<uid>.npy")
    ap.add_argument("--ref-means", default=None,
                    help="reference means_flattened_<uid> (torch.save file)")
    ap.add_argument("--ref-stds", default=None)
    args = ap.parse_args()

    import jax

    from vihmc_tpu.data.burgers import get_burgers
    from vihmc_tpu.io import RunStore
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines import vi_train, sensitivity, vi_hmc, configs as C
    from vihmc_tpu.pipelines.common import make_flat_deeponet
    from vihmc_tpu.pipelines.postprocess import (error_report,
                                                 error_sigma_correlation)
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    model = DeepONetConfig()  # reference architecture (~172.4k params)
    data = get_burgers(jax.random.key(0), args.n_train, args.n_valid,
                       mat_path=args.mat)
    train_split, valid_split = data
    nxnt = train_split["trunk_in"].shape[0]
    print(f"[data] {args.mat}: {train_split['branch_in'].shape[0]} train / "
          f"{valid_split['branch_in'].shape[0]} valid fns x {nxnt} pts",
          flush=True)
    store = RunStore(args.out, uid="parity")

    # --- stage 1: VI (reference-exact hyperparameters) ---
    t0 = time.time()
    vi_cfg = C.OperatorVIRunConfig(
        model=model, n_train=args.n_train, n_valid=args.n_valid,
        batch_size=128, p=min(10201, nxnt),
        vi=VIConfig(epochs=args.epochs, lr_start=1e-3, patience=500,
                    num_ens=5, prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0)))
    vi_out = vi_train.run_operator(vi_cfg, key=jax.random.key(0), data=data,
                                   store=store)
    m = np.asarray(vi_out["metrics"])
    print(f"[vi] {args.epochs} epochs in {time.time()-t0:.1f}s  "
          f"valid_mse {m[0,3]:.4f} -> {m[-1,3]:.4f}", flush=True)

    # --- stage 2: sensitivity @90% ---
    sens = sensitivity.run_operator(
        vi_out["best_state"].vp, model, data[1],
        C.SensitivityRunConfig(importance_threshold=0.90, p_subsample=100,
                               batch_chunk=8),
        key=jax.random.key(0), store=store)
    print(f"[sensitivity] {sens['num_sensitive']}/{len(sens['scores'])}",
          flush=True)

    # --- stage 3: VI-HMC (reference-exact: fixed step 1e-4, L=7) ---
    artifacts = {"mu": sens["mu"], "sigma": sens["sigma"],
                 "indices": sens["indices"]}
    hmc_cfg = C.VIHMCRunConfig(
        step_size=1e-4, num_samples=args.draws, burn=args.burn,
        post_std=0.0214, prior_var=0.1 ** 2, loss="NLL", tau_out=1.0,
        num_chains=args.chains, load_prior=False, load_std=False,
        init_prior=False, frozen_policy="refresh")
    t0 = time.time()
    out = vi_hmc.run_operator(hmc_cfg, model, artifacts,
                              key=jax.random.key(1), data=data, store=store,
                              evaluate=True)
    met = out["metrics"]
    n_valid = valid_split["branch_in"].shape[0]
    preds = np.asarray(out["predictions"]).reshape(-1, n_valid, nxnt)
    truth = np.asarray(valid_split["solution"])
    rep = error_report(preds, truth)
    nt = int(round(nxnt ** 0.5))
    corr = error_sigma_correlation(preds, truth, nt=nt, nx=nxnt // nt)
    summary = {
        "mat": os.path.abspath(args.mat),
        "vi_epochs": args.epochs,
        "subspace_dim": int(sens["num_sensitive"]),
        "chains": args.chains, "draws": args.draws, "burn": args.burn,
        "L": hmc_cfg.L, "step": hmc_cfg.step_size,
        "acceptance": float(met["acceptance_rate"]),
        "expected_log_prob": float(np.mean(np.asarray(met["expected_log_prob"]))),
        "expected_mse_of_mean": float(met["expected_mse_of_mean"]),
        "final_sample_mse": float(np.asarray(met["final_mse"])),
        "min_sample_mse": float(np.asarray(met["min_mse"])),
        "mean_relative_l2": rep["mean_relative_l2"],
        "mean_error_sigma_correlation": corr["mean_correlation"],
        "sampling_seconds": time.time() - t0,
    }

    # --- optional: moment parity vs reference-produced draws ---
    if args.ref_samples:
        apply_flat, _, _ = make_flat_deeponet(model)
        ref_draws = np.load(args.ref_samples)          # (S, d_sub)
        if args.ref_indices:
            ref_idx = np.asarray(np.load(args.ref_indices)).ravel()
        else:
            ref_idx = np.asarray(sens["indices"])
        base = np.asarray(sens["mu"], np.float64)
        if args.ref_means:
            import torch

            base = np.asarray(torch.load(args.ref_means,
                                         map_location="cpu")).ravel()
        full = np.tile(base[None], (ref_draws.shape[0], 1))
        full[:, ref_idx] = ref_draws[:, :len(ref_idx)]
        bx, tx = valid_split["branch_in"], valid_split["trunk_in"]
        ref_mean, ref_std, s_ref = predictive_moments(apply_flat, full, bx, tx)
        ours = preds.reshape(-1, n_valid, nxnt)
        our_mean, our_std = ours.mean(0), ours.std(0)
        # MC-error normalization: the difference of two posterior-mean
        # estimates has std ~ sqrt(var_ref/S_ref + var_ours/S_ours)
        mc = np.sqrt(ref_std ** 2 / s_ref + our_std ** 2 / ours.shape[0]) + 1e-12
        z = np.abs(ref_mean - our_mean) / mc
        summary["moment_parity"] = {
            "ref_samples": os.path.abspath(args.ref_samples),
            "ref_draws_used": int(s_ref),
            "mean_abs_mean_diff": float(np.mean(np.abs(ref_mean - our_mean))),
            "max_abs_mean_diff": float(np.max(np.abs(ref_mean - our_mean))),
            "median_mean_z": float(np.median(z)),
            "frac_mean_z_above_3": float(np.mean(z > 3.0)),
            "mean_abs_std_diff": float(np.mean(np.abs(ref_std - our_std))),
            "std_ratio_median": float(np.median(
                our_std / np.maximum(ref_std, 1e-12))),
        }

    store.save_config(summary, name="parity_summary")
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
