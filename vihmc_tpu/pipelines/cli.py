"""Command-line entry points mirroring the reference's runnable scripts.

The reference is run as ``python main_*.py`` next to a ``config.py``
(/root/reference/README.md:20-24). Here the equivalent is

    python -m vihmc_tpu <command> [flags]

with one subcommand per reference entry point. Flags override the typed
config defaults (which reproduce the reference's config modules); every run
writes its artifacts + a JSON config snapshot into ``--out`` via
:class:`vihmc_tpu.io.RunStore`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _common(p):
    p.add_argument("--out", default="runs", help="artifact root directory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--uid", default=None, help="run uid (default: timestamp)")


def _print_metrics(metrics):
    out = {}
    for k, v in metrics.items():
        arr = np.asarray(v)
        out[k] = float(arr) if arr.ndim == 0 else arr.shape
    print(json.dumps(out, default=str, indent=2))


def build_parser():
    ap = argparse.ArgumentParser(prog="vihmc_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    p = sub.add_parser("hmc-full", help="full-parameter HMC, regression MLP")
    _common(p)
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--step-size", type=float, default=None)
    p.add_argument("--num-chains", type=int, default=None)

    p = sub.add_parser("vi-nn", help="VI training, regression MLP")
    _common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--mode", choices=["bbb", "lrt"], default=None)
    p.add_argument("--with-sensitivity", action="store_true",
                   help="also run the sensitivity stage, writing the "
                        "VI-HMC artifact contract into the same run store")
    p.add_argument("--threshold", type=float, default=0.90)

    p = sub.add_parser("vi-operator", help="VI training, Bayesian DeepONet")
    _common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--dataset", choices=["Burgers", "Cone"], default=None)
    p.add_argument("--mat", default=None,
                   help="path to DeepOnet_data.mat (Burgers) or a Cone "
                        ".mat/.npz with Xf/Xp/Y keys")
    p.add_argument("--n-train", type=int, default=None)
    p.add_argument("--n-valid", type=int, default=None)
    p.add_argument("--with-sensitivity", action="store_true")
    p.add_argument("--threshold", type=float, default=0.90)

    p = sub.add_parser("vi-hmc", help="subspace VI-HMC from sensitivity artifacts")
    _common(p)
    p.add_argument("--artifacts", required=True, help="RunStore uid dir with "
                   "means_flattened/stds_flattened/gradient_indices")
    p.add_argument("--workload", choices=["nn", "operator"], default="nn")
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--num-chains", type=int, default=None)
    p.add_argument("--policy", choices=["mean", "draw", "refresh"], default=None)
    p.add_argument("--algorithm", choices=["hmc", "nuts", "chees", "auto"],
                   default=None,
                   help="hmc = reference behavior; nuts/chees adapt the "
                        "trajectory length")
    p.add_argument("--save-vi-trace", action="store_true",
                   help="persist the per-draw frozen VI draw ('vi_params')")
    p.add_argument("--jitter-l", action="store_true",
                   help="jitter the trajectory length over [L/2, L] "
                        "(breaks fixed-L resonances)")
    p.add_argument("--jitter-eps", action="store_true",
                   help="jitter the step size over [eps/2, eps] instead "
                        "(same resonance-breaking, no masked leapfrog tail)")
    p.add_argument("--clip-grad", type=float, default=None,
                   help="preconditioned grad-norm clip on the trajectory "
                        "field (~13*sqrt(subspace dim); frees tail-trapped "
                        "chains, MH stays exact)")
    p.add_argument("--coarse-stride", type=int, default=None,
                   help="coarse-grid surrogate trajectory gradient: keep "
                        "every stride-th query point per grid dim (exact "
                        "density at endpoints; ~3.8x wall clock at stride 2)")
    p.add_argument("--fn-stride", type=int, default=None,
                   help="function-stride surrogate trajectory gradient: keep "
                        "every stride-th training function (rescaled; exact "
                        "density at endpoints; composes with --coarse-stride)")
    p.add_argument("--gauss-field", type=float, default=None,
                   help="VI-Gaussian trajectory field with this alpha (zero "
                        "likelihood cost per leapfrog step; exact density at "
                        "endpoints keeps MH unbiased; 1.0 recommended)")
    p.add_argument("--gauss-field-auto", action="store_true",
                   help="probe the VI-Gaussian field for a few draws and "
                        "keep it only if its MH acceptance clears the floor "
                        "(falls back to the configured Gram/autodiff field)")
    p.add_argument("--adapt-step-size", action="store_true",
                   help="dual-averaging step adaptation during burn")
    p.add_argument("--da-axis", action="store_true",
                   help="couple dual averaging across chains (one shared "
                        "low-noise adapted step)")
    p.add_argument("--adapt-forever", action="store_true",
                   help="diminishing adaptation past burn (holds the "
                        "acceptance target instead of freezing at the "
                        "burn-average step)")
    p.add_argument("--target-accept", type=float, default=None)
    p.add_argument("--laplace-mass", action="store_true",
                   help="kinetic metric from the stage-2 Fisher (diagonal "
                        "conditional-Laplace scales) instead of VI sigma^2")
    p.add_argument("--lowrank-rank", type=int, default=None, metavar="K",
                   help="low-rank+diagonal kinetic metric: correct the K "
                        "stiffest preconditioned curvature directions via "
                        "Lanczos on conditional HVPs (round-4 headline "
                        "recipe component)")
    p.add_argument("--init-optimize", type=int, default=None, metavar="N",
                   help="warm-start chain inits with N preconditioned Adam "
                        "steps on the conditional before sampling "
                        "(draw/mean policies)")
    p.add_argument("--grad-dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="Gram trajectory-gradient datapath dtype (operator "
                        "workload; field precision only — the sampled law "
                        "is identical)")
    p.add_argument("--segment", type=int, default=None,
                   help="run in checkpointed segments of this many draws "
                        "(resumable with --ckpt)")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint dir for mid-run resume (with --segment)")
    p.add_argument("--thin", type=int, default=1,
                   help="keep every thin-th draw (segmented runs; bounds "
                        "host RAM for huge subspaces)")
    p.add_argument("--mat", default=None)

    p = sub.add_parser("sensitivity", help="standalone sensitivity stage "
                       "against a finished VI run (reads vi_mu/sigma_flattened)")
    _common(p)
    p.add_argument("--vi-run", required=True,
                   help="RunStore uid dir of a finished vi-nn/vi-operator run")
    p.add_argument("--workload", choices=["nn", "operator"], default="nn")
    p.add_argument("--threshold", type=float, default=0.90)
    p.add_argument("--mat", default=None)

    p = sub.add_parser("reevaluate", help="reload saved hmc_params and "
                       "re-score on validation data without sampling (the "
                       "reference's test/evaluate flags)")
    _common(p)
    p.add_argument("--run", required=True,
                   help="RunStore uid dir containing hmc_params.npy")
    p.add_argument("--artifacts", default=None,
                   help="RunStore uid dir with means/stds/gradient_indices "
                        "(default: --run itself)")
    p.add_argument("--workload", choices=["nn", "operator"], default="nn")
    p.add_argument("--burn", type=int, default=None)
    p.add_argument("--mat", default=None)

    p = sub.add_parser("predict", help="posterior predictive from saved "
                       "hmc_params: persist thinned predictions + mean "
                       "prediction (the reference's predict_model)")
    _common(p)
    p.add_argument("--run", required=True)
    p.add_argument("--artifacts", default=None)
    p.add_argument("--workload", choices=["nn", "operator"], default="nn")
    p.add_argument("--burn", type=int, default=None)
    p.add_argument("--keep", type=int, default=64,
                   help="number of thinned posterior-predictive samples kept")
    p.add_argument("--mat", default=None)

    p = sub.add_parser("hmc-nuts", help="full-parameter DeepONet HMC + adaptation")
    _common(p)
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--mat", default=None)

    p = sub.add_parser("hmc-split", help="split-Hamiltonian DeepONet HMC")
    _common(p)
    p.add_argument("--num-samples", type=int, default=None)
    p.add_argument("--num-splits", type=int, default=None)
    p.add_argument("--nuts", action="store_true")
    p.add_argument("--mat", default=None)

    p = sub.add_parser("postprocess", help="stack saved runs and print error metrics")
    p.add_argument("--runs", nargs="+", required=True,
                   help="run directories (each containing hmc_params.npy)")
    p.add_argument("--burn", type=int, default=0)
    p.add_argument("--out", default=None, help="save stacked samples here (.npy)")

    p = sub.add_parser("bench", help="run the ESS/s benchmark")
    p.add_argument("--quick", action="store_true")
    return ap


def _override(cfg, **updates):
    updates = {k: v for k, v in updates.items() if v is not None}
    return dataclasses.replace(cfg, **updates) if updates else cfg


def _reevaluate(args, C, vi_hmc, RunStore, key):
    """Shared reevaluate/predict flow: rebuild the run's config from its
    snapshot, reload hmc_params, re-score (reference eval_VI_HMC,
    /root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:304-349)."""
    import os

    root, uid = os.path.split(args.run.rstrip("/"))
    run_store = RunStore.open(root or ".", uid)
    art_dir = args.artifacts or args.run
    root_a, uid_a = os.path.split(art_dir.rstrip("/"))
    art_store = RunStore.open(root_a or ".", uid_a)
    artifacts = {"mu": art_store.load_array("means_flattened"),
                 "sigma": art_store.load_array("stds_flattened"),
                 "indices": art_store.load_array("gradient_indices")}

    saved = run_store.load_config()
    fields = {f.name for f in dataclasses.fields(C.VIHMCRunConfig)}
    cfg = C.VIHMCRunConfig(**{k: v for k, v in saved.items() if k in fields})
    if args.burn is not None:
        cfg = dataclasses.replace(cfg, burn=args.burn)

    keep = getattr(args, "keep", 64)
    if args.workload == "nn":
        mlp_cfg = C.NNVIRunConfig().model
        from vihmc_tpu.pipelines.vi_hmc import (evaluate_samples,
                                                make_spec, make_subspace_prior)
        from vihmc_tpu.pipelines.common import make_flat_mlp
        from vihmc_tpu.data.synthetic import regression_data

        data = regression_data(key, noise_std=cfg.tau_out ** 0.5
                               if cfg.loss == "NLL" else cfg.tau_out ** -0.5)
        apply_flat, _, _ = make_flat_mlp(mlp_cfg)
        spec = make_spec(artifacts)
        prior = make_subspace_prior(cfg, spec)
        return evaluate_samples(cfg, spec, prior,
                                lambda flat: apply_flat(flat, data["x_val"]),
                                data["y_val"],
                                run_store.load_array("hmc_params"),
                                keep_predictions=keep)
    from vihmc_tpu.pipelines.vi_hmc import (evaluate_samples, make_spec,
                                            make_subspace_prior)
    from vihmc_tpu.pipelines.common import make_flat_deeponet
    from vihmc_tpu.data import get_burgers

    op_model = C.OperatorVIRunConfig().model
    _, valid_split = get_burgers(key, 1000, 1000, args.mat)
    apply_flat, _, _ = make_flat_deeponet(op_model)
    spec = make_spec(artifacts)
    prior = make_subspace_prior(cfg, spec)
    return evaluate_samples(
        cfg, spec, prior,
        lambda flat: apply_flat(flat, valid_split["branch_in"],
                                valid_split["trunk_in"]),
        valid_split["solution"], run_store.load_array("hmc_params"),
        keep_predictions=keep)


def main(argv=None):
    import jax

    from vihmc_tpu.io import RunStore
    from vihmc_tpu.pipelines import configs as C
    from vihmc_tpu.pipelines import hmc_full, vi_train, sensitivity as sens_p
    from vihmc_tpu.pipelines import vi_hmc, hmc_nuts, hmc_split

    args = build_parser().parse_args(argv)
    if args.command == "bench":
        import subprocess

        return subprocess.call([sys.executable, "bench.py"] +
                               (["--quick"] if args.quick else []))
    if args.command == "postprocess":
        import os

        from vihmc_tpu.pipelines.postprocess import stack_runs

        stores = []
        for r in args.runs:
            root, uid = os.path.split(r.rstrip("/"))
            stores.append(RunStore.open(root or ".", uid))
        stacked = stack_runs(stores, burn=args.burn)
        print(f"stacked {stacked.shape[0]} post-burn samples "
              f"(dim {stacked.shape[1]}) from {len(stores)} runs")
        print(f"pooled mean |theta|: {np.abs(stacked).mean():.5f}   "
              f"pooled std: {stacked.std(axis=0).mean():.5f}")
        if args.out:
            np.save(args.out, stacked)
            print(f"saved -> {args.out}")
        return 0

    key = jax.random.key(args.seed)
    store = RunStore(args.out, uid=args.uid)
    print(f"run uid: {store.uid}  ->  {store.path}")

    if args.command == "hmc-full":
        cfg = _override(C.NNHMCRunConfig(), num_samples=args.num_samples,
                        step_size=args.step_size, num_chains=args.num_chains)
        out = hmc_full.run(cfg, key=key, store=store)
        _print_metrics(out["metrics"])
    elif args.command == "vi-nn":
        cfg = C.NNVIRunConfig()
        vi = _override(cfg.vi, epochs=args.epochs, lr_start=args.lr)
        cfg = _override(cfg, vi=vi, mode=args.mode)
        out = vi_train.run_nn(cfg, key=key, store=store)
        print("final metrics row:", out["metrics"][-1].tolist())
        if args.with_sensitivity:
            sens = sens_p.run_nn(out["best_state"].vp, cfg.model,
                                 out["data"]["x_val"],
                                 C.SensitivityRunConfig(importance_threshold=args.threshold),
                                 store=store)
            print(f"sensitive params: {sens['num_sensitive']} "
                  f"(artifacts in {store.path})")
    elif args.command == "vi-operator":
        cfg = C.OperatorVIRunConfig()
        vi = _override(cfg.vi, epochs=args.epochs)
        cfg = _override(cfg, vi=vi, n_train=args.n_train, n_valid=args.n_valid,
                        dataset=args.dataset)
        out = vi_train.run_operator(cfg, key=key, mat_path=args.mat, store=store)
        print("final metrics row:", out["metrics"][-1].tolist())
        if args.with_sensitivity:
            sens = sens_p.run_operator(out["best_state"].vp, cfg.model,
                                       out["data"][1],
                                       C.SensitivityRunConfig(importance_threshold=args.threshold),
                                       key=key, store=store)
            print(f"sensitive params: {sens['num_sensitive']} "
                  f"(artifacts in {store.path})")
    elif args.command == "vi-hmc":
        import os

        root, uid = os.path.split(args.artifacts.rstrip("/"))
        art_store = RunStore.open(root or ".", uid)
        artifacts = {"mu": art_store.load_array("means_flattened"),
                     "sigma": art_store.load_array("stds_flattened"),
                     "indices": art_store.load_array("gradient_indices")}
        cfg = _override(C.VIHMCRunConfig(), num_samples=args.num_samples,
                        num_chains=args.num_chains, frozen_policy=args.policy,
                        algorithm=args.algorithm,
                        save_vi_trace=(True if args.save_vi_trace else None),
                        jitter_l=(True if args.jitter_l else None),
                        jitter_eps=(True if args.jitter_eps else None),
                        jitter_low_frac=(0.5 if (args.jitter_l or args.jitter_eps)
                                         else None),
                        clip_grad=args.clip_grad,
                        coarse_stride=args.coarse_stride,
                        fn_stride=args.fn_stride,
                        gauss_field=args.gauss_field,
                        gauss_field_auto=(True if args.gauss_field_auto
                                          else None),
                        adapt_step_size=(True if args.adapt_step_size
                                         else None),
                        da_axis="chains" if args.da_axis else None,
                        adapt_forever=(True if args.adapt_forever else None),
                        target_accept=args.target_accept,
                        laplace_mass=(True if args.laplace_mass else None),
                        lowrank_rank=args.lowrank_rank,
                        init_optimize=args.init_optimize,
                        grad_dtype=args.grad_dtype)
        seg_kw = dict(segment_size=args.segment, checkpoint_dir=args.ckpt,
                      sample_thin=args.thin)
        if args.workload == "nn":
            out = vi_hmc.run_nn(cfg, C.NNVIRunConfig().model, artifacts,
                                key=key, store=store, **seg_kw)
        else:
            out = vi_hmc.run_operator(cfg, C.OperatorVIRunConfig().model,
                                      artifacts, key=key, mat_path=args.mat,
                                      store=store, **seg_kw)
        _print_metrics(out["metrics"])
    elif args.command == "sensitivity":
        import os

        root, uid = os.path.split(args.vi_run.rstrip("/"))
        vi_store = RunStore.open(root or ".", uid)
        flat_mu = vi_store.load_array("vi_mu_flattened")
        flat_sigma = vi_store.load_array("vi_sigma_flattened")
        scfg = C.SensitivityRunConfig(importance_threshold=args.threshold)
        if args.workload == "nn":
            from vihmc_tpu.data.synthetic import regression_data

            nn_cfg = C.NNVIRunConfig()
            data = regression_data(jax.random.key(args.seed), nn_cfg.n_train,
                                   nn_cfg.n_val, noise_std=nn_cfg.noise)
            sens = sens_p.run_nn_flat(flat_mu, flat_sigma, nn_cfg.model,
                                      data["x_val"], scfg, store=store)
        else:
            from vihmc_tpu.data import get_burgers

            op_cfg = C.OperatorVIRunConfig()
            _, valid_split = get_burgers(jax.random.key(args.seed),
                                         op_cfg.n_train, op_cfg.n_valid,
                                         args.mat)
            sens = sens_p.run_operator_flat(flat_mu, flat_sigma, op_cfg.model,
                                            valid_split, scfg, key=key,
                                            store=store)
        print(f"sensitive params: {sens['num_sensitive']}/"
              f"{len(sens['scores'])} (artifacts in {store.path})")
    elif args.command in ("reevaluate", "predict"):
        out = _reevaluate(args, C, vi_hmc, RunStore, key)
        _print_metrics(out["metrics"])
        diag = out["diagnostics"]
        print(json.dumps({
            "ess_median": float(np.median(np.asarray(diag["ess"]))),
            "r_hat_max": float(np.nanmax(np.asarray(diag["r_hat"]))),
        }))
        if args.command == "predict":
            store.save_array("predictions", out["predictions"])
            store.save_array("pred_mean", out["mean_prediction"])
            print(f"predictions {np.asarray(out['predictions']).shape} "
                  f"-> {store.path}")
    elif args.command == "hmc-nuts":
        cfg = _override(C.OperatorHMCRunConfig(), num_samples=args.num_samples)
        out = hmc_nuts.run(cfg, key=key, mat_path=args.mat, store=store)
        _print_metrics(out["metrics"])
    elif args.command == "hmc-split":
        cfg = _override(C.SplitHMCRunConfig(), num_samples=args.num_samples,
                        num_splits=args.num_splits)
        if args.nuts:
            cfg = dataclasses.replace(cfg, is_nuts=True)
        out = hmc_split.run(cfg, key=key, mat_path=args.mat, store=store)
        _print_metrics(out["metrics"])
    return 0


if __name__ == "__main__":
    sys.exit(main())
