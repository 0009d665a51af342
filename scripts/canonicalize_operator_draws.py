"""Canonicalize the stored flagship-demo draws and re-measure split-R-hat.

Round-2 finding: the converged operator demo (24 chains x 2100 draws over the
81,131-dim sensitive subspace, runs/op_r2/stage3_ckpt) reports weight-space
max split-R-hat 2.85 while the function-space battery is converged (1.082),
with per-chain means splitting into basins — argued to be symmetric BNN
weight-space multimodality. This script supplies the missing clincher
(round-2 VERDICT item 3): map every draw to a canonical representative of
its tanh-sign/permutation/merge-channel symmetry orbit
(vihmc_tpu/models/symmetry.py, reference architecture
/root/reference/Operator_network/HMC/model.py:45-77) and recompute the
diagnostics. If the R-hat tail is pure symmetry, the canonicalized max
drops to ~1; whatever remains is genuine (non-symmetric) multimodality and
is reported as such, per-dim, with within-basin R-hat as the fallback
evidence.

The draws predate the round-3 asset refresh, so mu/indices come from the
archived round-2 bundle (assets/burgers_stage12_r2.npz).

Run (CPU-only, ~10 GB RAM):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python scripts/canonicalize_operator_draws.py [--permute]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def split_rhat(draws):
    from vihmc_tpu.chains import potential_scale_reduction_np

    return potential_scale_reduction_np(draws)


def canonicalize_all(draws, mu, idx, cfg, permute, chunk=256):
    """Canonicalize (C, S, d_sub) subspace draws scattered into the VI mean;
    returns the canonicalized subspace array (same shape, float32)."""
    from vihmc_tpu.models.symmetry import canonicalize_deeponet

    c, s, d_sub = draws.shape
    out = np.empty_like(draws)
    flat_dim = mu.shape[0]
    rows = draws.reshape(c * s, d_sub)
    out_rows = out.reshape(c * s, d_sub)
    t0 = time.time()
    for start in range(0, c * s, chunk):
        stop = min(start + chunk, c * s)
        full = np.tile(mu[None, :], (stop - start, 1))
        full[:, idx] = rows[start:stop]
        canon = canonicalize_deeponet(full, mu, cfg, permute=permute)
        out_rows[start:stop] = canon[:, idx].astype(np.float32)
        if start % (chunk * 8) == 0:
            print(f"  canonicalize[{'perm' if permute else 'sign'}] "
                  f"{stop}/{c*s} draws ({time.time()-t0:.0f}s)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="runs/op_r2/stage3_ckpt")
    ap.add_argument("--assets", default="assets/burgers_stage12_r2.npz")
    ap.add_argument("--burn-kept", type=int, default=140,
                    help="kept draws to drop (demo: burn 420 / thin 3)")
    ap.add_argument("--permute", action="store_true",
                    help="also run the permutation-alignment stage "
                         "(one linear assignment per draw per layer)")
    ap.add_argument("--out", default="docs/results/canonicalization_r2.json")
    args = ap.parse_args()

    from vihmc_tpu.models import DeepONetConfig

    cfg = DeepONetConfig()
    z = np.load(args.assets)
    mu = np.asarray(z["mu"], np.float64)
    idx = np.sort(np.asarray(z["indices"]))

    seg_files = sorted(f for f in os.listdir(args.ckpt)
                       if f.startswith("samples_seg") and f.endswith(".npy"))
    draws = np.concatenate(
        [np.load(os.path.join(args.ckpt, f)) for f in seg_files], axis=1)
    c, s_all, d_sub = draws.shape
    draws = draws[:, args.burn_kept:]
    s = draws.shape[1]
    print(f"[load] {c} chains x {s_all} kept draws ({s} post-burn) x "
          f"{d_sub} dims", flush=True)
    assert d_sub == len(idx), (d_sub, len(idx))

    report = {"chains": c, "post_burn_kept_draws": s, "subspace_dim": d_sub,
              "permute_stage": bool(args.permute)}

    rhat_raw = split_rhat(draws)
    order = np.argsort(-np.nan_to_num(rhat_raw))
    report["rhat_raw_max"] = float(np.nanmax(rhat_raw))
    report["rhat_raw_frac_above_1_1"] = float(np.mean(rhat_raw > 1.1))
    print(f"[raw] max split-R-hat {report['rhat_raw_max']:.3f}  "
          f">1.1 on {100*report['rhat_raw_frac_above_1_1']:.2f}% of dims",
          flush=True)

    canon = canonicalize_all(draws, mu, idx, cfg, permute=False)
    rhat_sign = split_rhat(canon)
    report["rhat_sign_max"] = float(np.nanmax(rhat_sign))
    report["rhat_sign_frac_above_1_1"] = float(np.mean(rhat_sign > 1.1))
    print(f"[sign-canonicalized] max split-R-hat "
          f"{report['rhat_sign_max']:.3f}  >1.1 on "
          f"{100*report['rhat_sign_frac_above_1_1']:.2f}% of dims", flush=True)

    if args.permute:
        canon_p = canonicalize_all(draws, mu, idx, cfg, permute=True)
        rhat_perm = split_rhat(canon_p)
        report["rhat_perm_max"] = float(np.nanmax(rhat_perm))
        report["rhat_perm_frac_above_1_1"] = float(np.mean(rhat_perm > 1.1))
        print(f"[perm-canonicalized] max split-R-hat "
              f"{report['rhat_perm_max']:.3f}  >1.1 on "
              f"{100*report['rhat_perm_frac_above_1_1']:.2f}% of dims",
              flush=True)
        canon_best, rhat_best = canon_p, rhat_perm
    else:
        canon_best, rhat_best = canon, rhat_sign

    # per-dim view of the round-2 worst offenders + whatever remains worst
    # after canonicalization (rank-normalized battery on those dims)
    from vihmc_tpu.chains.diagnostics import rhat_rank_np
    from vihmc_tpu.chains import effective_sample_size_np

    worst_raw = order[:8]
    still = np.argsort(-np.nan_to_num(rhat_best))[:8]
    sel = np.unique(np.concatenate([worst_raw, still]))
    report["dims"] = []
    for dim in sel:
        dsel = canon_best[:, :, dim:dim + 1]
        entry = {
            "subspace_idx": int(dim),
            "rhat_raw": round(float(rhat_raw[dim]), 3),
            "rhat_canon": round(float(rhat_best[dim]), 3),
            "rhat_canon_rank": round(float(rhat_rank_np(dsel)[0]), 3),
            "ess_canon": round(float(effective_sample_size_np(dsel)[0]), 1),
            "chain_means_canon": [round(float(m), 4)
                                  for m in dsel[:, :, 0].mean(axis=1)],
        }
        # within-basin fallback: split chains at the largest gap in sorted
        # canonicalized chain means ONLY if the gap dominates within-chain
        # spread (avoids fabricating basins on healthy dims — ADVICE r2)
        means = dsel[:, :, 0].mean(axis=1)
        sd_within = float(dsel[:, :, 0].std(axis=1).mean())
        srt = np.sort(means)
        gaps = np.diff(srt)
        if len(gaps) and gaps.max() > 2.0 * sd_within and entry["rhat_canon"] > 1.1:
            cut = srt[np.argmax(gaps)]
            lo = means <= cut
            entry["basin_sizes"] = [int(lo.sum()), int((~lo).sum())]
            for name, mask in (("lo", lo), ("hi", ~lo)):
                if mask.sum() >= 2:
                    entry[f"rhat_within_{name}"] = round(
                        float(split_rhat(dsel[mask])[0]), 3)
        report["dims"].append(entry)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "dims"},
                     indent=2), flush=True)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
