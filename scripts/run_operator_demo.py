"""End-to-end operator demo: VI -> sensitivity -> VI-HMC on Burgers, on-chip.

Runs the full three-stage VI-HMC flow at (near-)reference scale against the
generated Burgers dataset and writes metrics + artifacts to runs/demo/.
Scale down with --small for CPU smoke runs.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--out", default="runs/demo")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--draws", type=int, default=None)
    ap.add_argument("--gauss-field", action="store_true",
                    help="VI-Gaussian trajectory field instead of the "
                         "dual-stride Gram oracle (fixed d^-1/4 step; "
                         "zero likelihood cost per leapfrog step)")
    args = ap.parse_args()

    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig
    from vihmc_tpu.pipelines import vi_train, sensitivity, vi_hmc, configs as C
    from vihmc_tpu.pipelines.postprocess import error_report, error_sigma_correlation
    from vihmc_tpu.data import get_burgers
    from vihmc_tpu.io import RunStore

    if args.small:
        model = DeepONetConfig(in_branch=17, in_trunk=5, width_branch=16,
                               width_trunk=16, depth_branch=3, depth_trunk=3)
        n_train, n_valid, nx, nt, p = 32, 16, 17, 17, 64
        epochs = args.epochs or 5
        draws, chains = args.draws or 30, 4
    else:
        model = DeepONetConfig()  # reference scale (~172k params)
        n_train, n_valid, nx, nt, p = 1000, 200, 101, 101, 512
        epochs = args.epochs or 200   # scan-path VI: one dispatch per epoch
        draws, chains = args.draws or 450, 16  # stride-3 surrogate: ~4.5x
        # cheaper leapfrog steps, so 3x the draws still runs ~1.6x faster
        # than the previous 150-draw full-grid demo

    key = jax.random.key(0)
    store = RunStore(args.out)
    print(f"artifacts -> {store.path}", flush=True)

    t0 = time.time()
    data = get_burgers(key, n_train, n_valid, nx=nx, nt=nt)
    print(f"[data] generated {n_train}+{n_valid} Burgers functions "
          f"({nx}x{nt} grid) in {time.time()-t0:.1f}s", flush=True)

    # --- stage 1: VI ---
    t0 = time.time()
    vi_cfg = C.OperatorVIRunConfig(
        model=model, n_train=n_train, n_valid=n_valid, batch_size=128, p=p,
        vi=VIConfig(epochs=epochs, lr_start=1e-3, patience=20, num_ens=3,
                    prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0)))
    vi_out = vi_train.run_operator(vi_cfg, key=key, data=data, store=store)
    m = vi_out["metrics"]
    print(f"[vi] {epochs} epochs in {time.time()-t0:.1f}s  "
          f"first/last valid_mse: {m[0,3]:.4f} -> {m[-1,3]:.4f}", flush=True)

    # --- stage 2: sensitivity ---
    t0 = time.time()
    sens = sensitivity.run_operator(
        vi_out["best_state"].vp, model, data[1],
        C.SensitivityRunConfig(importance_threshold=0.90,
                               p_subsample=min(100, nx * nt), batch_chunk=8),
        key=key, store=store)
    print(f"[sensitivity] {sens['num_sensitive']}/{len(sens['scores'])} params "
          f"({100*sens['num_sensitive']/len(sens['scores']):.1f}%) "
          f"in {time.time()-t0:.1f}s", flush=True)

    # --- stage 3: VI-HMC over the subspace ---
    t0 = time.time()
    # L=31 from the on-chip sweep; trajectory jitter + preconditioned
    # gradient clip from the ESS-variance investigation (docs/performance.md)
    # — the previous demo's R-hat 4.8 / ESS 20 came from tail-trapped chains
    clip = 13.0 * sens["num_sensitive"] ** 0.5
    if args.gauss_field:
        # VI-Gaussian trajectory field: fixed step at the d^-1/4 scale of
        # the VI-preconditioned subspace (bench calibration: 0.12 at
        # d=2048 -> c ~ 0.8)
        step = 0.8 * sens["num_sensitive"] ** -0.25
        hmc_cfg = C.VIHMCRunConfig(num_samples=draws, step_size=step,
                                   post_std=0.0214, num_chains=chains,
                                   num_leapfrog=31, loss="NLL", tau_out=1.0,
                                   frozen_policy="refresh", vi_mass=True,
                                   jitter_l=True, jitter_low_frac=0.5,
                                   gauss_field=1.0)
    else:
        hmc_cfg = C.VIHMCRunConfig(num_samples=draws, step_size=1e-4,
                                   post_std=0.0214, num_chains=chains,
                                   num_leapfrog=31, target_accept=0.65,
                                   loss="NLL", tau_out=1.0,
                                   frozen_policy="refresh", vi_mass=True,
                                   adapt_step_size=True, jitter_l=True,
                                   jitter_low_frac=0.5, clip_grad=clip,
                                   coarse_stride=None if args.small else 3,
                                   # function-stride surrogate on top
                                   # (F-variant sweep, docs/performance.md)
                                   fn_stride=None if args.small else 3)
    artifacts = {"mu": sens["mu"], "sigma": sens["sigma"],
                 "indices": sens["indices"]}
    out = vi_hmc.run_operator(hmc_cfg, model, artifacts, key=key, data=data,
                              store=store)
    dt = time.time() - t0
    met = out["metrics"]
    print(f"[vi-hmc] {chains}x{draws} draws (L={hmc_cfg.L}) in {dt:.1f}s  "
          f"accept={float(met['acceptance_rate']):.3f}  "
          f"div={int(met['num_divergent'])}", flush=True)

    # --- posterior quality ---
    preds = np.asarray(out["predictions"]).reshape(-1, n_valid, nx * nt)
    truth = np.asarray(data[1]["solution"])
    rep = error_report(preds, truth,
                       log_probs=np.asarray(met["expected_log_prob"])[None])
    corr = error_sigma_correlation(preds, truth, nt=nt, nx=nx)
    summary = {
        "valid_mse_vi_first": float(m[0, 3]),
        "valid_mse_vi_last": float(m[-1, 3]),
        "subspace_frac": sens["num_sensitive"] / len(sens["scores"]),
        "acceptance": float(met["acceptance_rate"]),
        "expected_mse_of_mean": float(met["expected_mse_of_mean"]),
        "mean_relative_l2": rep["mean_relative_l2"],
        "mean_error_sigma_correlation": corr["mean_correlation"],
        "ess_median": float(np.median(np.asarray(out["ess"]))),
        "r_hat_max": float(np.max(np.asarray(out["diagnostics"]["r_hat"]))),
        "sampling_seconds": dt,
    }
    store.save_config(summary, name="demo_summary")
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
