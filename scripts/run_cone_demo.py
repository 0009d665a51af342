"""Cone workload end-to-end demo: VI -> sensitivity -> VI-HMC + fs diagnostics.

The reference carries a complete ``dataset = 'Cone'`` surface whose loader
was never shipped (``NotImplementedError``,
/root/reference/Operator_network/HMC/util.py:441-443,
/root/reference/Operator_network/VI/utils.py:54-55): dict batches with a
PER-EXAMPLE 2-feature query point, recorded min-max normalization, no trunk
subsampling, 988 validation examples hinted at
/root/reference/Operator_network/VI/sensitivity.py:87. This demo exercises
that whole path at reference architecture scale on the synthetic Cone
generator (vihmc_tpu/data/cone.py): the DeepONet runs its batched-einsum
per-example-query merge instead of the shared-grid MXU matmul, end to end
through the production VI-HMC recipe (chain-coupled dual averaging, clip,
step jitter), and reports the function-space Vehtari battery.

Writes docs/results/cone_demo_summary.json (round-2 VERDICT item 8).

TPU: ``python scripts/run_cone_demo.py``
CPU smoke: ``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python
scripts/run_cone_demo.py --small``
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CPU smoke scale")
    ap.add_argument("--epochs", type=int, default=1200)
    ap.add_argument("--draws", type=int, default=600)
    ap.add_argument("--chains", type=int, default=16)
    ap.add_argument("--out", default="docs/results/cone_demo_summary.json")
    ap.add_argument("--store", default="runs/cone_demo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vihmc_tpu.core import scatter_subspace
    from vihmc_tpu.data.cone import get_cone
    from vihmc_tpu.io import RunStore
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines import vi_train, sensitivity, vi_hmc, configs as C
    from vihmc_tpu.pipelines.common import make_flat_deeponet
    from vihmc_tpu.pipelines.postprocess import function_space_diagnostics
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    if args.small:
        model = DeepONetConfig(in_branch=17, in_trunk=2, width_branch=16,
                               width_trunk=16, depth_branch=3, depth_trunk=3,
                               impose_bc=False)
        n_train, n_valid = 64, 32
        epochs, draws, chains = min(args.epochs, 30), min(args.draws, 40), 4
    else:
        # reference operator architecture with the Cone trunk input
        # (in_trunk=2, no BC embedding — VI/config.py:24 'if enforcing bc')
        model = DeepONetConfig(in_trunk=2, impose_bc=False)
        n_train, n_valid = 1000, 988  # 988: reference sensitivity.py:87
        epochs, draws, chains = args.epochs, args.draws, args.chains

    noise_var = 1e-2
    key = jax.random.key(0)
    data = get_cone(key, n_train, n_valid, in_branch=model.in_branch)
    store = RunStore(args.store, uid="cone")
    print(f"[data] cone {n_train}+{n_valid} examples (per-example query)",
          flush=True)

    t0 = time.time()
    vi_cfg = C.OperatorVIRunConfig(
        model=model, dataset="Cone", n_train=n_train, n_valid=n_valid,
        batch_size=128,
        vi=VIConfig(epochs=epochs, lr_start=1e-3, patience=100, num_ens=3,
                    prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n",
                                    fixed_noise_var=noise_var)))
    vi_out = vi_train.run_operator(vi_cfg, key=key, data=data, store=store)
    m = np.asarray(vi_out["metrics"])
    vi_s = time.time() - t0
    print(f"[vi] {epochs} epochs in {vi_s:.1f}s  valid_mse "
          f"{m[0,3]:.4f} -> {m[-1,3]:.4f} (best {m[:,3].min():.4f})",
          flush=True)

    t0 = time.time()
    sens = sensitivity.run_operator(
        vi_out["best_state"].vp, model, data[1],
        C.SensitivityRunConfig(importance_threshold=0.90, batch_chunk=8),
        key=key, store=store)
    d_sub = int(sens["num_sensitive"])
    if d_sub < 8:  # tiny smoke scale: one param can capture 90% alone
        indices = np.sort(np.argsort(-sens["scores"])[:8])
        d_sub = 8
    else:
        indices = np.asarray(sens["indices"])
    print(f"[sensitivity] {d_sub}/{len(sens['scores'])} in "
          f"{time.time()-t0:.1f}s", flush=True)

    artifacts = {"mu": sens["mu"], "sigma": sens["sigma"], "indices": indices}
    hmc_cfg = C.VIHMCRunConfig(
        step_size=0.1, num_samples=draws, num_chains=chains,
        num_leapfrog=31, loss="NLL", tau_out=noise_var,
        frozen_policy="refresh", vi_mass=True,
        clip_grad=13.0 * d_sub ** 0.5,
        adapt_step_size=True, target_accept=0.65, da_axis="chains",
        adapt_forever=True, jitter_eps=True, jitter_low_frac=0.5)
    t0 = time.time()
    out = vi_hmc.run_operator(hmc_cfg, model, artifacts,
                              key=jax.random.key(1), data=data, store=store,
                              evaluate=True)
    wall = time.time() - t0
    res = out["result"]
    met = out["metrics"]
    acc = float(np.asarray(res.accept_probs)[:, (hmc_cfg.burn_ or 0):].mean())
    print(f"[vi-hmc] {chains}x{draws} (L={hmc_cfg.L}) in {wall:.1f}s "
          f"accept={acc:.3f}", flush=True)

    # function-space battery on a validation probe subset
    apply_flat, _, _ = make_flat_deeponet(model)
    valid = data[1]
    nprobe = min(64, n_valid)
    branch_p = jnp.asarray(valid["branch_in"][:nprobe])
    trunk_p = jnp.asarray(valid["trunk_in"][:nprobe])
    frozen = jnp.asarray(sens["mu"])
    idxj = jnp.asarray(indices)

    def predict_fn(q):
        full = scatter_subspace(frozen, q, idxj)
        return apply_flat(full, branch_p, trunk_p).reshape(-1)

    samples = np.asarray(res.samples)
    post = samples[:, (hmc_cfg.burn_ or 0):, :]
    fs = function_space_diagnostics(post, predict_fn)
    fs.pop("probes")

    diag = out["diagnostics"]
    summary = {
        "workload": "cone_synthetic",
        "model_params": int(model.num_params),
        "subspace_dim": int(d_sub),
        "n_train": n_train, "n_valid": n_valid,
        "vi_epochs": epochs,
        "vi_valid_mse_best": float(m[:, 3].min()),
        "chains": chains, "draws": draws, "L": int(hmc_cfg.L),
        "acceptance_post_burn": acc,
        "expected_mse_of_mean": float(met["expected_mse_of_mean"]),
        "expected_log_prob": float(np.mean(np.asarray(met["expected_log_prob"]))),
        "ess_median": float(np.median(np.asarray(diag["ess"]))),
        "r_hat_max": float(np.nanmax(np.asarray(diag["r_hat"]))),
        "fs_r_hat_max": float(np.nanmax(fs["r_hat"])),
        "fs_r_hat_rank_max": float(np.nanmax(fs["r_hat_rank"])),
        "fs_ess_median": float(np.median(fs["ess"])),
        "fs_ess_bulk_median": float(np.median(fs["ess_bulk"])),
        "fs_ess_tail_median": float(np.median(fs["ess_tail"])),
        "sampling_seconds": wall,
        "vi_seconds": vi_s,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
