"""Function-space convergence analysis of a saved stage-3 operator run.

The weight-space posterior of the Bayesian DeepONet is genuinely multimodal
along part of the sensitive subspace (hidden-unit/channel symmetries of the
dot-product merge), so per-dimension weight-space R-hat saturates above 1 on
a tail of coordinates no matter how long a fixed-temperature HMC chain runs.
This script quantifies BOTH views on a finished run:

1. function-space diagnostics (`postprocess.function_space_diagnostics`):
   split/rank R-hat + bulk/tail ESS on posterior-predictive probe outputs —
   the convergence measure for the quantity the reference consumes
   (main_VI_HMC_burgers.py:286-301 validates purely through predictions);
2. weight-space mode evidence: the worst-R-hat coordinates, how their
   per-chain means cluster into basins, and whether basin membership has any
   effect on predictive quality (it should not, if the modes are symmetric
   images).

Writes the merged summary next to the run's demo_summary.json and prints it.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/fs_diagnostics_operator.py --run runs/op_r2/stage3/converged
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/op_r2/stage3/converged")
    ap.add_argument("--thin", type=int, default=4,
                    help="probe every thin-th KEPT draw")
    ap.add_argument("--probe-fns", type=int, default=8)
    ap.add_argument("--probe-pts", type=int, default=64)
    ap.add_argument("--assets", default="assets/burgers_stage12.npz",
                    help="stage-1/2 bundle the run's draws belong to (use "
                         "assets/burgers_stage12_r2.npz for round-2 runs)")
    ap.add_argument("--out", default=None,
                    help="summary json path (default <run>/fs_summary.json)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vihmc_tpu.core import scatter_subspace
    from vihmc_tpu.data import get_burgers
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines.common import make_flat_deeponet
    from vihmc_tpu.pipelines.postprocess import function_space_diagnostics

    meta = np.load(args.assets)
    mu, indices = meta["mu"], meta["indices"]
    demo = json.load(open(os.path.join(args.run, "demo_summary.json")))
    # the run's actual burn when recorded (run_operator_stage3.py writes it
    # since round 3); draws//5 is only the stage-3 default fallback
    burn = int(demo.get("burn") or int(demo["draws"]) // 5)
    burn_kept = burn // int(demo["thin"])

    samples = np.load(os.path.join(args.run, "hmc_params.npy"), mmap_mode="r")
    x = np.asarray(samples[:, burn_kept:, :])
    c, s, d = x.shape
    print(f"[load] {c} chains x {s} kept draws x {d} subspace dims", flush=True)

    # --- probe set: a fixed slice of the validation set ---
    _, valid = get_burgers(jax.random.key(int(meta["data_seed"])),
                           int(meta["n_train"]), int(meta["n_valid"]),
                           nx=int(meta["nx"]), nt=int(meta["nt"]))
    nfn, npts = args.probe_fns, args.probe_pts
    branch_p = jnp.asarray(valid["branch_in"][:nfn])
    stride = max(1, valid["trunk_in"].shape[0] // npts)
    pt_idx = np.arange(valid["trunk_in"].shape[0])[::stride][:npts]
    trunk_p = jnp.asarray(valid["trunk_in"][pt_idx])
    truth_p = np.asarray(valid["solution"][:nfn][:, pt_idx])  # (nfn, npts)

    apply_flat, _, _ = make_flat_deeponet(DeepONetConfig())
    frozen = jnp.asarray(mu)
    idx = jnp.asarray(indices)

    def predict_fn(q):
        full = scatter_subspace(frozen, q, idx)
        return apply_flat(full, branch_p, trunk_p).reshape(-1)

    diag = function_space_diagnostics(x, predict_fn, thin=args.thin)
    probes = diag.pop("probes")  # (C, S', P)

    # --- weight-space mode evidence ---
    from vihmc_tpu.chains import potential_scale_reduction_np

    rhat_w = potential_scale_reduction_np(x)
    order = np.argsort(-rhat_w)
    worst = order[:8]
    chain_means = x[:, :, worst].mean(axis=1)          # (C, 8)
    # basin split on the single worst dim: threshold at the largest gap in
    # sorted chain means, reported ONLY when the gap dominates the
    # within-chain spread AND the dim is actually flagged by R-hat —
    # otherwise any unimodal coordinate would fabricate two "basins"
    cm0 = chain_means[:, 0]
    sd_within = float(x[:, :, worst[0]].std(axis=1).mean())
    srt = np.sort(cm0)
    gap = int(np.argmax(np.diff(srt)))
    basin_real = (float(np.diff(srt)[gap]) > 2.0 * sd_within
                  and float(rhat_w[worst[0]]) > 1.1)
    thr = 0.5 * (srt[gap] + srt[gap + 1])
    lo = np.where(cm0 <= thr)[0]
    hi = np.where(cm0 > thr)[0]
    # predictive quality per basin on the probe set
    pm = probes.mean(axis=1).reshape(c, nfn, npts)      # per-chain mean pred
    mse_chain = ((pm - truth_p[None]) ** 2).mean(axis=(1, 2))

    summary = dict(demo)
    summary.update({
        "fs_probe_fns": nfn, "fs_probe_pts": int(trunk_p.shape[0]),
        "fs_probe_thin": args.thin,
        "fs_r_hat_max": float(np.nanmax(diag["r_hat"])),
        "fs_r_hat_rank_max": float(np.nanmax(diag["r_hat_rank"])),
        "fs_ess_median": float(np.median(diag["ess"])),
        "fs_ess_bulk_median": float(np.median(diag["ess_bulk"])),
        "fs_ess_bulk_min": float(np.min(diag["ess_bulk"])),
        "fs_ess_tail_median": float(np.median(diag["ess_tail"])),
        "weight_space_mode_evidence": {
            "worst_dims_subspace_idx": [int(i) for i in worst],
            "worst_dims_r_hat": [round(float(rhat_w[i]), 3) for i in worst],
            "worst_dim_chain_means": [round(float(v), 4) for v in cm0],
            "basin_split_significant": bool(basin_real),
            **({"basin_sizes": [int(len(lo)), int(len(hi))],
                "basin_mean_probe_mse": [float(mse_chain[lo].mean()),
                                         float(mse_chain[hi].mean())]}
               if basin_real else {}),
            "probe_mse_per_chain_spread": float(mse_chain.std()),
        },
    })
    out = args.out or os.path.join(args.run, "fs_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2), flush=True)


if __name__ == "__main__":
    main()
