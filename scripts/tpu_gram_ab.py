"""A/B the Gram-form trajectory gradient vs composed autodiff on-chip.

Runs the exact headline bench configuration (32 chains x 120 draws, L=31 @
0.55 target, 2048-dim subspace, refresh policy) for both gradient paths over
several PRNG keys, printing per-run wall clock, final adapted step size,
acceptance, and pooled ESS. Purpose: separate the Gram path's throughput
effect from dual-averaging outcome variance (24 burn draws make the adapted
step a high-variance statistic; each float-level change re-rolls it).

One TPU process; run alone (CLAUDE.md TPU rules).
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


def main(keys=(2, 3, 4)):
    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, n_chains, n_samples = \
        bench.build_problem(False)
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def full_ll(flat):
        return like(apply_flat(flat, bx, tx), y, 1.0)

    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    grad_full, _, _ = make_gram_grad_full(cfg, bx, tx, y, 1.0)
    gram_grad = make_subspace_grad(grad_full, spec, prior=prior)

    n_burn = n_samples // 5
    hmc_cfg = HMCConfig(num_samples=n_samples, num_leapfrog=bench.BENCH_L,
                        step_size=1e-4, burn=n_burn, sampler="hmc_nuts",
                        target_accept=bench.BENCH_TARGET_ACCEPT)
    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))

    for name, gfn in (("composed", None), ("gram", gram_grad)):
        for k in keys:
            t0 = time.perf_counter()
            res = sample_chains(log_prob, inits, jax.random.key(k), hmc_cfg,
                                inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                                aux_refresh=refresh, grad_fn=gfn)
            samples = np.asarray(res.samples)
            dt = time.perf_counter() - t0
            ess = float(np.median(effective_sample_size_np(samples[:, n_burn:, :])))
            final_step = float(np.asarray(res.step_sizes)[0, -1])
            print(f"{name:9s} key={k}  elapsed={dt:7.2f}s  "
                  f"final_step={final_step:.3e}  "
                  f"accept={float(res.acceptance_rate):.3f}  "
                  f"ESS={ess:8.1f}  ESS/s={ess / dt:7.2f}", flush=True)


if __name__ == "__main__":
    main()
