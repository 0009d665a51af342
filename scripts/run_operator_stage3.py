"""Stage 3 of the flagship operator demo: long, segmented, resumable VI-HMC.

Consumes the cached stage-1/2 artifacts (scripts/run_operator_stage12.py),
regenerates the Burgers data deterministically, and runs subspace VI-HMC at
reference scale in checkpointed segments — the production pattern for this
backend (per-dispatch draw ceiling, CLAUDE.md). Reports the full Vehtari-2021
diagnostic battery (raw/bulk/tail ESS, raw/rank R-hat) plus the reference's
posterior-quality metrics (expected MSE, relative-L2, error-sigma
correlation; main_VI_HMC_burgers.py:286-301).

Variants select the TRAJECTORY field only — MH always uses the exact density:
  gauss     VI-Gaussian score field (zero likelihood cost per leapfrog step)
  stride    dual-stride Gram surrogate (default 3/3)
  autodiff  plain full-grid autodiff
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
    ap.add_argument("--artifacts", default="runs/op_r2/stage12/stage12")
    ap.add_argument("--out", default="runs/op_r2/stage3")
    ap.add_argument("--uid", default=None)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir for mid-run resume")
    ap.add_argument("--variant", choices=["gauss", "stride", "autodiff"],
                    default="stride")
    ap.add_argument("--stride", type=int, default=3)
    ap.add_argument("--fn-stride", type=int, default=3)
    ap.add_argument("--draws", type=int, default=450)
    ap.add_argument("--burn", type=int, default=None, help="default draws//5")
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--L", type=int, default=31)
    ap.add_argument("--step", type=float, default=1e-4,
                    help="initial step (fixed unless --adapt)")
    ap.add_argument("--adapt", action="store_true",
                    help="dual-averaging step adaptation during burn")
    ap.add_argument("--da-axis", action="store_true",
                    help="couple dual averaging across chains (one shared "
                         "low-noise adapted step)")
    ap.add_argument("--adapt-forever", action="store_true",
                    help="diminishing adaptation past burn (the frozen "
                         "burn-average lands far above the acceptance "
                         "target: pilot measured 0.92 at target 0.65)")
    ap.add_argument("--target-accept", type=float, default=0.65)
    ap.add_argument("--max-step", type=float, default=None)
    ap.add_argument("--jitter", choices=["l", "eps", "none"], default="eps")
    ap.add_argument("--frozen-policy", default="draw",
                    choices=["refresh", "mean", "draw"],
                    help="frozen-coordinate policy. Default 'draw' (one "
                         "fixed VI draw) — the reference's EFFECTIVE "
                         "semantics (its refresh hook is never invoked by "
                         "hamiltorch, SURVEY 2.4) and the only policy whose "
                         "per-draw conditional is a fixed density; "
                         "'refresh' ratchets when frozen-coordinate "
                         "likelihood damage is large (docs/performance.md "
                         "round 3)")
    ap.add_argument("--init-optimize", type=int, default=0,
                    help="warm-start Adam steps on the conditional before "
                         "sampling (recommended ~200 for the draw policy)")
    ap.add_argument("--laplace-mass", action="store_true",
                    help="stage-2 Fisher kinetic metric instead of VI "
                         "sigma^2 (docs/performance.md round 3)")
    ap.add_argument("--clip-scale", type=float, default=13.0,
                    help="clip = scale * sqrt(subspace dim); 0 disables")
    ap.add_argument("--segment", type=int, default=90)
    ap.add_argument("--thin", type=int, default=3,
                    help="keep every thin-th draw (state advances through "
                         "all draws; must divide --segment)")
    ap.add_argument("--key", type=int, default=0)
    ap.add_argument("--no-eval", action="store_true",
                    help="skip the posterior-predictive evaluation (probes)")
    args = ap.parse_args()

    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines import vi_hmc, configs as C
    from vihmc_tpu.pipelines.postprocess import error_report, error_sigma_correlation
    from vihmc_tpu.chains import summarize_np
    from vihmc_tpu.data import get_burgers
    from vihmc_tpu.io import RunStore

    model = DeepONetConfig()
    meta = np.load("assets/burgers_stage12.npz")
    if os.path.isdir(args.artifacts):
        art_root, art_uid = os.path.split(args.artifacts.rstrip("/"))
        art = RunStore.open(art_root or ".", art_uid)
        artifacts = {"mu": art.load_array("means_flattened"),
                     "sigma": art.load_array("stds_flattened"),
                     "indices": art.load_array("gradient_indices"),
                     "scores": art.load_array("sensitivity_scores")}
    else:
        # stage-1/2 RunStore dir absent: the committed asset bundle carries
        # the same mu/sigma/index artifacts (scripts/run_operator_stage12.py)
        print(f"[artifacts] {args.artifacts} missing; using "
              "assets/burgers_stage12.npz", flush=True)
        artifacts = {"mu": meta["mu"], "sigma": meta["sigma"],
                     "indices": meta["indices"], "scores": meta["scores"]}
    d_sub = len(artifacts["indices"])
    n_train, n_valid = int(meta["n_train"]), int(meta["n_valid"])
    nx, nt = int(meta["nx"]), int(meta["nt"])
    t0 = time.time()
    data = get_burgers(jax.random.key(int(meta["data_seed"])), n_train,
                       n_valid, nx=nx, nt=nt)
    print(f"[data] regenerated in {time.time()-t0:.1f}s; subspace {d_sub} "
          f"dims", flush=True)

    clip = args.clip_scale * d_sub ** 0.5 if args.clip_scale else None
    common = dict(num_samples=args.draws, burn=args.burn, post_std=0.0214,
                  num_chains=args.chains, num_leapfrog=args.L,
                  loss="NLL", tau_out=1.0, frozen_policy=args.frozen_policy,
                  vi_mass=True, laplace_mass=args.laplace_mass,
                  laplace_n_data=n_train * nx * nt,
                  init_optimize=args.init_optimize,
                  clip_grad=clip,
                  jitter_l=args.jitter == "l", jitter_eps=args.jitter == "eps",
                  jitter_low_frac=0.5 if args.jitter != "none" else 0.0,
                  adapt_step_size=args.adapt,
                  target_accept=args.target_accept,
                  da_axis="chains" if args.da_axis else None,
                  adapt_forever=args.adapt_forever,
                  max_step=args.max_step)
    if args.variant == "gauss":
        step = args.step if args.step != 1e-4 else 0.8 * d_sub ** -0.25
        cfg = C.VIHMCRunConfig(step_size=step, gauss_field=1.0, **common)
    elif args.variant == "stride":
        cfg = C.VIHMCRunConfig(step_size=args.step,
                               coarse_stride=args.stride,
                               fn_stride=args.fn_stride, **common)
    else:
        cfg = C.VIHMCRunConfig(step_size=args.step, **common)

    store = RunStore(args.out, uid=args.uid)
    print(f"artifacts -> {store.path}", flush=True)
    seg_t = [time.time()]

    def progress(seg, n_segs, state):
        now = time.time()
        eps = float(np.asarray(jnp_exp_step(state)))
        print(f"[seg {seg}/{n_segs}] {args.segment} draws in "
              f"{now-seg_t[-1]:.1f}s  step={eps:.3e}", flush=True)
        seg_t.append(now)

    def jnp_exp_step(state):
        import jax.numpy as jnp

        if args.adapt:
            field = (state.da.log_step if args.adapt_forever
                     else state.da.log_step_avg)
            return jnp.exp(field).mean()
        return np.float32(cfg.step_size)

    t0 = time.time()
    out = vi_hmc.run_operator(
        cfg, model, artifacts, key=jax.random.key(args.key), data=data,
        store=None if args.no_eval else store,
        segment_size=args.segment, checkpoint_dir=args.ckpt,
        progress=progress, sample_thin=args.thin,
        evaluate=not args.no_eval)
    wall = time.time() - t0
    res = out["result"]
    acc = float(np.asarray(res.accept_probs)[:, (cfg.burn_ or 0):].mean())
    print(f"[vi-hmc] {args.chains}x{args.draws} draws (L={cfg.L}, "
          f"variant={args.variant}) in {wall:.1f}s  accept={acc:.3f}",
          flush=True)

    if args.no_eval:
        kept = np.asarray(res.samples)
        burn_kept = cfg.burn_ // args.thin
        diag = summarize_np(kept[:, burn_kept:, : min(4096, d_sub)])
        print(json.dumps({
            "acceptance_post_burn": acc,
            "ess_median_head": float(np.median(diag["ess"])),
            "wall_seconds": wall,
        }, indent=2), flush=True)
        return

    met = out["metrics"]
    diag = out["diagnostics"]
    preds = np.asarray(out["predictions"]).reshape(-1, n_valid, nx * nt)
    truth = np.asarray(data[1]["solution"])
    rep = error_report(preds, truth,
                       log_probs=np.asarray(met["expected_log_prob"])[None])
    corr = error_sigma_correlation(preds, truth, nt=nt, nx=nx)
    summary = {
        "variant": args.variant,
        "chains": args.chains, "draws": args.draws, "thin": args.thin,
        "burn": int(cfg.burn_ or 0),
        "L": cfg.L, "step": float(cfg.step_size), "adapt": args.adapt,
        "da_axis": args.da_axis, "jitter": args.jitter,
        "acceptance": float(met["acceptance_rate"]),
        "acceptance_post_burn": acc,
        "expected_mse_of_mean": float(met["expected_mse_of_mean"]),
        "mean_relative_l2": rep["mean_relative_l2"],
        "mean_error_sigma_correlation": corr["mean_correlation"],
        "ess_median": float(np.median(np.asarray(diag["ess"]))),
        "ess_bulk_median": float(np.median(np.asarray(diag["ess_bulk"]))),
        "ess_tail_median": float(np.median(np.asarray(diag["ess_tail"]))),
        "ess_bulk_min": float(np.min(np.asarray(diag["ess_bulk"]))),
        "r_hat_max": float(np.nanmax(np.asarray(diag["r_hat"]))),
        "r_hat_rank_max": float(np.nanmax(np.asarray(diag["r_hat_rank"]))),
        "tau_floor_frac": float(diag["tau_floor_frac"]),
        "sampling_seconds": wall,
    }
    store.save_config(summary, name="demo_summary")
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
