"""Measure ONE headline-bench variant per process (argv-selected).

The TPU worker has crashed twice when a second large sampling graph was
compiled+run in the same process (scripts/tpu_jitter_sweep.py logs), so each
variant runs in its own process: `python scripts/tpu_headline_variant.py I`.

Variants attack the two measured variance sources at the headline config
(32 chains x 120 draws, 2048-dim VI-preconditioned subspace, gram gradients):

  * dual-averaging from step 1e-4 must climb 3 decades inside 24 burn draws
    -> start at the d^-1/4 ~ 0.15 scale instead (step_size=0.1);
  * fixed L=31 resonance: near-identical frozen steps (0.084 vs 0.086) gave
    ESS 199 vs 1511 -> jitter trajectory length over [L/2, L].

  I  step0=0.1, hmc_nuts@0.55, fixed L=31
  J  step0=0.1, hmc_nuts@0.55, L=31 jittered over [16, 31]
  K  plain hmc, fixed step 0.12, L=31 jittered over [16, 31] (no DA at all)
  L  as J, but the endpoint density uses the fused Pallas merge+NLL kernel —
     with gram trajectory gradients NO (B, P) array exists anywhere in the
     sampler (the composed endpoint eval was the last one)
  M  as L at 64 chains (the (B,P)-free sampler may clear the HBM ceiling
     that crashed 64-chain runs before)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from vihmc_tpu.chains import sample_chains, effective_sample_size_np
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                           make_subspace_grad, make_subspace_log_prob)
from vihmc_tpu.ops import make_gram_grad_full

VARIANTS = {
    "I": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.1,
              sampler="hmc_nuts", target_accept=0.55),
    "J": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.1,
              sampler="hmc_nuts", target_accept=0.55,
              jitter_l=True, jitter_low_frac=0.5),
    "K": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
              sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "L": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.1,
              sampler="hmc_nuts", target_accept=0.55,
              jitter_l=True, jitter_low_frac=0.5),
    "M": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.1,
              sampler="hmc_nuts", target_accept=0.55,
              jitter_l=True, jitter_low_frac=0.5),
    # 360-draw finalists (segmented 120-draw dispatches; pooled ESS over 96
    # retained draws is itself ~10x noisy across keys, so the headline must
    # amortize over more draws):
    "K360": dict(num_samples=360, num_leapfrog=31, burn=24, step_size=0.12,
                 sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "N360": dict(num_samples=360, num_leapfrog=31, burn=48, step_size=0.1,
                 sampler="hmc_nuts", target_accept=0.75, da_axis="chains",
                 jitter_l=True, jitter_low_frac=0.5),
    # P: the stuck-chain fix — K360/N360 diagnostics show refresh-policy
    # chains trapped in far tails (acceptance 0.000 for 312 draws) under ANY
    # frozen step; per-chain continuous (diminishing) adaptation self-heals:
    "P360": dict(num_samples=360, num_leapfrog=31, burn=24, step_size=0.1,
                 sampler="hmc_nuts", target_accept=0.75, adapt_forever=True,
                 max_step=0.25, jitter_l=True, jitter_low_frac=0.5),
    # Measured: P360 FAILS — continuous DA chases the refresh-noise in the
    # accept statistic (sqrt(t)/gamma gain) and collapses chain steps to
    # 1e-4..2e-6; ESS ~23. adapt_forever is not fit for noisy targets.
    # Q: drop the moving target instead. FrozenPolicy.DRAW (one VI draw for
    # the whole run — what the reference's hamiltorch call actually did: the
    # resample hook is only triggered by an extra arg hamiltorch never
    # passes, SURVEY.md 2.4) + coupled DA + max_step + jitter + per-chain
    # VI-draw (overdispersed) inits.
    "Q": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.1,
              sampler="hmc_nuts", target_accept=0.65, da_axis="chains",
              max_step=0.25, jitter_l=True, jitter_low_frac=0.5),
    "Q360": dict(num_samples=360, num_leapfrog=31, burn=24, step_size=0.1,
                 sampler="hmc_nuts", target_accept=0.65, da_axis="chains",
                 max_step=0.25, jitter_l=True, jitter_low_frac=0.5),
    # R: Q + chain-pooled windowed mass adaptation (metric_axis: 32x data
    # per window makes 2048 marginal variances estimable inside burn=120) —
    # fixes the preconditioner misfit that pins Q's coupled step at ~0.03.
    "R360": dict(num_samples=360, num_leapfrog=31, burn=120, step_size=0.1,
                 sampler="hmc_nuts", target_accept=0.65, da_axis="chains",
                 metric_axis="chains", adapt_mass=True,
                 mass_schedule="windowed", max_step=0.25,
                 jitter_l=True, jitter_low_frac=0.5),
    # S: the stuck-chain cure that keeps the fast config. K + norm-clipped
    # trajectory gradients (preconditioned clip 600; healthy scale measured
    # 77-364, the trapped chain sat at 9261): trapped chains drift home and
    # re-accept, MH stays exact (deterministic modified proposal field).
    "S": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
              sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "S360": dict(num_samples=360, num_leapfrog=31, burn=24, step_size=0.12,
                 sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # S48: the final headline config at 48 chains. Wall clock measured FLAT
    # from 16 -> 32 chains (chip not saturated), 64 crashed the worker;
    # 48 was the untested midpoint. MEASURED: 48 chains ALSO crashes the
    # TPU worker at reference scale (UNAVAILABLE: worker crashed, same
    # signature as 64) — 32 chains is the confirmed per-chip ceiling on
    # this backend.
    "S48": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # C2/C3: headline config S with a COARSE-GRID surrogate trajectory
    # gradient (ops.grid_stride_subset of the 101x101 query grid, likelihood
    # term rescaled by P/p). Every gradient cost component scales with the
    # query-point count, so stride 2 (2601 pts) is ~4x fewer FLOPs per
    # leapfrog step and stride 3 (1156 pts) ~9x; the exact full-grid density
    # at trajectory endpoints keeps MH unbiased. Measured cosine(full,
    # coarse) > 0.99 on smooth targets (tests/test_gram.py) — acceptance
    # should survive.
    "C2": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
               sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "C3": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
               sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "C4": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
               sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F2/F3: headline C3 + a FUNCTION-stride surrogate on the same gradient
    # (every 2nd/3rd of the 1000 training functions, rescaled). The query
    # stride leaves the branch forward/VJP and y-contractions as the
    # per-step cost floor (C3 -> C4 only gained 7% despite 40% fewer query
    # points); the fn stride attacks exactly that floor. Exactness argument
    # unchanged: fixed subsets -> deterministic field, exact full density at
    # endpoints (tests/test_gram.py::test_fn_subset_*).
    "F2": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
               sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "F3": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
               sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F3 measured (keys 3/4 steady state): 7.3-7.4s wall, accept 0.65,
    # ESS/s 304-398 (C3: 8.9-9.4s, 295-345) -> push both strides:
    "F34": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "F44": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F34 measured: wall 7.45-7.6s (NOT faster than F3's 7.3-7.4), accept
    # 0.60, ESS/s 315-339 -> fn stride 3 is the sweet spot; the remaining
    # floor is trunk+endpoints+scan overhead, not the branch.
    # F3C48/F3C64: F3 at higher chain counts — the earlier 48/64-chain
    # worker crashes were measured with FULL-GRID gradient footprints
    # (variants M/S48); the dual-stride sampler's working set is far
    # smaller, so the per-chip chain ceiling may have moved.
    "F3C48": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                  sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "F3C64": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                  sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F44 measured: 5.66-6.41s wall, accept 0.60-0.62, ESS/s 379-395 — the
    # new best (with the branch cost stripped by fn-stride, query stride 4
    # now pays where C4-alone did not). Deeper strides + chain probes:
    "F55": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "F44C48": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                   sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "F44C64": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                   sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F44C48 measured: 8.6s wall, ESS/s 356-400 — 48 chains NO LONGER
    # crashes at the dual-stride footprint (the old 48/64 crashes were
    # full-grid), but ESS/s is flat vs 32 (chain axis now compute-bound).
    # F44L: F44 + the fused Pallas merge+NLL for the ENDPOINT density —
    # with the trajectory stripped to strides, the composed endpoint eval
    # (materializes (B,P) = 40 MB/chain) is the dominant HBM term left.
    "F44L": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                 sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F44L measured: 6.8-7.1s — the composed endpoint still wins in-scan
    # (fused kernel serializes against the scan; consistent with the
    # original fused-vs-composed finding). F55 measured: 5.3-5.4s wall,
    # accept 0.55, ESS/s 420-427 — strides still paying at 5; F66 probes
    # the next level (289 query pts, 167 fns).
    "F66": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
                sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # Per-draw cost decomposition at F55 (scripts/tpu_draw_cost_breakdown.py):
    # endpoint 2.1 ms x2, refresh 0.4, momentum 0.2 — but the stride-5/5
    # gram step costs 0.90 ms despite ~3e8 FLOPs: the 36 sequential
    # small-matmul ops per step ride a per-op latency floor. So trajectory
    # cost is now ~linear in L at fixed per-step price -> try SHORTER
    # trajectories (the old L sweep that chose 31 was priced at full-grid
    # step cost, a completely different tradeoff).
    "F55L15": dict(num_samples=120, num_leapfrog=15, burn=24, step_size=0.12,
                   sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # F55L15 measured: 4.0-4.6s wall but ESS craters to 830-877 (vs
    # 2216-2301 at L=31) -> 181-222 ESS/s. Shorter trajectories lose on
    # autocorrelation; L=31 stands. (With the x32-chain factor the
    # trajectory step is at ~15-25% MXU utilization — limited by the
    # reference architecture's 100-wide layers vs the 128 MXU tile, not by
    # op-dispatch — so F55@L31 is near the practical ceiling for this
    # model shape.)
    "F55L23": dict(num_samples=120, num_leapfrog=23, burn=24, step_size=0.12,
                   sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    # G: the logical extreme of the surrogate-field family (cf. latent-HNN /
    # NN-gradient-HMC, PAPERS.md): the trajectory field is the VI Gaussian's
    # score -(q - mu)/(alpha sigma^2) — ZERO likelihood cost per leapfrog
    # step; the exact full density at endpoints keeps MH unbiased. Works
    # iff the VI-preconditioned conditional posterior is Gaussian enough
    # for 31-step trajectories. alpha: G=1.0, G5=0.5 (likelihood sharpens
    # the posterior past the prior/VI scale, so a stiffer field may track
    # better).
    "G": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
              sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
    "G5": dict(num_samples=120, num_leapfrog=31, burn=24, step_size=0.12,
               sampler="hmc", jitter_l=True, jitter_low_frac=0.5),
}
GAUSS_FIELD = {"G": 1.0, "G5": 0.5}  # alpha: field = -(q-mu)/(alpha sigma^2)
DRAW_POLICY = {"Q", "Q360", "R360"}  # frozen-at-draw target + VI-draw inits
CLIP_GRAD = {"S": 600.0, "S360": 600.0, "S48": 600.0,
             "C2": 600.0, "C3": 600.0, "C4": 600.0,
             "F2": 600.0, "F3": 600.0, "F34": 600.0, "F44": 600.0,
             "F3C48": 600.0, "F3C64": 600.0, "F55": 600.0,
             "F44C48": 600.0, "F44C64": 600.0,
             "F44L": 600.0, "F66": 600.0,
             "F55L15": 600.0, "F55L23": 600.0,
             "G": 600.0, "G5": 600.0}  # preconditioned-norm clip
COARSE_STRIDE = {"C2": 2, "C3": 3, "C4": 4, "F2": 3, "F3": 3,
                 "F34": 3, "F44": 4, "F3C48": 3, "F3C64": 3,
                 "F55": 5, "F44C48": 4, "F44C64": 4, "F44L": 4, "F66": 6,
                 "F55L15": 5, "F55L23": 5}
FN_STRIDE = {"F2": 2, "F3": 3, "F34": 4, "F44": 4, "F3C48": 3, "F3C64": 3,
             "F55": 5, "F44C48": 4, "F44C64": 4, "F44L": 4, "F66": 6,
             "F55L15": 5, "F55L23": 5}
FUSED_VALUE = {"L", "M", "F44L"}
CHAIN_OVERRIDE = {"M": 64, "S48": 48, "F3C48": 48, "F3C64": 64,
                  "F44C48": 48, "F44C64": 64}
SEGMENT = 120


def main(name, keys=(2, 3, 4)):
    kw = VARIANTS[name]
    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, n_chains, _ = \
        bench.build_problem(False)
    n_chains = CHAIN_OVERRIDE.get(name, n_chains)
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    if name in FUSED_VALUE:
        from vihmc_tpu.pipelines.common import make_deeponet_nll_log_posterior

        full_ll, _, _ = make_deeponet_nll_log_posterior(
            cfg, bx, tx, y, tau_var=1.0, prior=None)
    else:
        def full_ll(flat):
            return like(apply_flat(flat, bx, tx), y, 1.0)

    policy = (FrozenPolicy.DRAW if name in DRAW_POLICY
              else FrozenPolicy.REFRESH)
    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, policy, init_key=jax.random.key(0))

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    subset = None
    if name in COARSE_STRIDE:
        from vihmc_tpu.ops import grid_stride_subset

        nt = int(round(tx.shape[0] ** 0.5))
        subset = grid_stride_subset(nt, tx.shape[0] // nt, COARSE_STRIDE[name])
    fn_subset = None
    if name in FN_STRIDE:
        fn_subset = np.arange(0, bx.shape[0], FN_STRIDE[name])
    if name in GAUSS_FIELD:
        alpha = GAUSS_FIELD[name]
        inv_var = 1.0 / (alpha * spec.sub_sigma() ** 2)

        def gram_grad(q, aux):
            return -(q - spec.sub_mu()) * inv_var
    else:
        grad_full, _, _ = make_gram_grad_full(cfg, bx, tx, y, 1.0,
                                              query_subset=subset,
                                              fn_subset=fn_subset)
        gram_grad = make_subspace_grad(grad_full, spec, prior=prior)
    if name in CLIP_GRAD:
        from vihmc_tpu.hmc import clipped_grad_fn

        gram_grad = clipped_grad_fn(gram_grad, CLIP_GRAD[name],
                                    inv_mass=spec.sub_sigma() ** 2)
    if name in DRAW_POLICY:
        # overdispersed chain inits: one VI-posterior draw per chain (the
        # reference's init_prior+sample_prior mode) — honest pooled ESS
        from vihmc_tpu.hmc.subspace import draw_full

        keys_i = jax.random.split(jax.random.key(7), n_chains)
        inits = jax.vmap(lambda kk: draw_full(kk, spec)[spec.idx_array])(keys_i)
    else:
        inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    hmc_cfg = HMCConfig(**kw)

    for k in keys:
        t0 = time.perf_counter()
        if hmc_cfg.num_samples > SEGMENT:
            from vihmc_tpu.chains.resume import sample_chains_resumable

            res = sample_chains_resumable(
                log_prob, inits, jax.random.key(k), hmc_cfg,
                segment_size=SEGMENT, inv_mass=spec.sub_sigma() ** 2,
                aux=aux0, aux_refresh=refresh, grad_fn=gram_grad)
        else:
            res = sample_chains(log_prob, inits, jax.random.key(k), hmc_cfg,
                                inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                                aux_refresh=refresh, grad_fn=gram_grad)
        samples = np.asarray(res.samples)
        dt = time.perf_counter() - t0
        ess = float(np.median(
            effective_sample_size_np(samples[:, hmc_cfg.burn:, :])))
        print(f"{name}  key={k}  elapsed={dt:7.2f}s  "
              f"final_step={float(np.asarray(res.step_sizes)[0, -1]):.3e}  "
              f"accept={float(res.acceptance_rate):.3f}  "
              f"ESS={ess:8.1f}  ESS/s={ess / dt:7.2f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "I")
