"""On-chip NUTS-with-surrogate-field measurement (round-1 VERDICT item 9).

One variant per process (TPU-worker crash pattern: two large sampling
graphs in one process — CLAUDE.md). Variants:

  plain    multinomial NUTS, autodiff gradients (round-1 shelf-ware config)
  field    NUTS with the dual-stride Gram trajectory field + clip: dynamics
           follow the surrogate, every leaf weighted by the exact density
  hmc      the fixed-trajectory headline HMC (stride 5/5) for reference

Usage: python scripts/tpu_nuts_field.py <variant> [--draws N] [--depth D]
Prints one JSON line; append results to docs/performance.md.
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
    ap.add_argument("variant", choices=["plain", "field", "hmc"])
    ap.add_argument("--draws", type=int, default=120)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--key", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as B
    from vihmc_tpu.chains import (sample_chains, sample_chains_nuts,
                                  effective_sample_size_np, ess_bulk_np)
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                               make_subspace_log_prob, make_subspace_grad,
                               clipped_grad_fn)
    from vihmc_tpu.hmc.nuts import NUTSConfig
    from vihmc_tpu.ops import grid_stride_subset, infer_grid_shape, make_gram_grad_full

    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, n_chains, _ = \
        B.build_problem(False)
    n = args.draws
    burn = n // 5
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    lp_like, aux0, refresh = make_subspace_log_prob(
        lambda f: like(apply_flat(f, bx, tx), y, 1.0), spec,
        FrozenPolicy.REFRESH, init_key=jax.random.key(0))
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    grad_fn = None
    if args.variant in ("field", "hmc"):
        nt_g, nx_g = infer_grid_shape(tx)
        gf, _, _ = make_gram_grad_full(
            cfg, bx, tx, y, 1.0,
            query_subset=grid_stride_subset(nt_g, nx_g, 5),
            fn_subset=np.arange(0, bx.shape[0], 5))
        sub = make_subspace_grad(gf, spec, prior=prior)
        grad_fn = clipped_grad_fn(sub, B.BENCH_CLIP, inv_mass=spec.sub_sigma() ** 2)

    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    inv_mass = spec.sub_sigma() ** 2

    if args.variant == "hmc":
        hc = HMCConfig(num_samples=n, num_leapfrog=B.BENCH_L,
                       step_size=B.BENCH_STEP, burn=burn, sampler="hmc",
                       jitter_l=True, jitter_low_frac=0.5)
        run = lambda k: sample_chains(log_prob, inits, k, hc,
                                      inv_mass=inv_mass, aux=aux0,
                                      aux_refresh=refresh, grad_fn=grad_fn)
    else:
        nc = NUTSConfig(num_samples=n, max_depth=args.depth, step_size=1e-3,
                        burn=burn, adapt_step_size=True, target_accept=0.8,
                        da_axis="chains")
        run = lambda k: sample_chains_nuts(
            log_prob, inits, k, nc, inv_mass=inv_mass, aux=aux0,
            aux_refresh=refresh,
            grad_fn=grad_fn if args.variant == "field" else None)

    res = run(jax.random.key(1))
    np.asarray(res.samples)  # compile + warm
    t0 = time.perf_counter()
    res = run(jax.random.key(args.key))
    samples = np.asarray(res.samples)
    elapsed = time.perf_counter() - t0
    post = samples[:, burn:, :]
    ess = effective_sample_size_np(post)
    print(json.dumps({
        "variant": args.variant, "draws": n, "chains": n_chains,
        "depth": args.depth if args.variant != "hmc" else None,
        "elapsed_s": round(elapsed, 2),
        "acceptance": round(float(res.acceptance_rate), 4),
        "ess_median": round(float(np.median(ess)), 1),
        "ess_bulk_median": round(float(np.median(ess_bulk_np(post))), 1),
        "ess_per_s": round(float(np.median(ess)) / elapsed, 2),
    }))


if __name__ == "__main__":
    main()
