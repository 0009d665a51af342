"""Stabilize headline mixing: jittered trajectories / longer adaptation.

Follow-up to scripts/tpu_gram_ab.py, which showed pooled ESS at the headline
config swings ~8x with the PRNG key — near-identical frozen step sizes
(0.0835 vs 0.0856) give ESS 199 vs 1511, i.e. fixed-L resonance on the
near-Gaussian VI-preconditioned subspace posterior. Candidates (all on the
Gram gradient path, 32 chains, keys 2/3/4, ESS on post-burn draws,
ESS/s over full elapsed):

  A jitter L=31  burn 24, 120 draws   (mean trajectory ~16 steps)
  B jitter L=63  burn 24, 120 draws   (mean ~32 ~= fixed-31 reach, 2x cost)
  C fixed  L=31  burn 64, 160 draws   (attack DA variance with a longer burn)

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


# Measured (keys 2/3/4):
#   A_jit_L31_b24 (jitter [1,L]): ESS 518/379/169, ESS/s 6.7/8.9/4.0 — mean
#     trajectory halves, strictly worse than fixed L.
#   B_jit_L63_b24: TPU worker crash (L=63 at 32 chains remains off-limits
#     even on the gram path).
# Round 2: Algorithm-4 init-step search so dual averaging starts at the
# right scale instead of climbing 3 decades inside 24 burn draws.
VARIANTS = (
    ("G_search_L31", dict(num_samples=120, num_leapfrog=31, burn=24,
                          init_step_search=True)),
    ("H_search_jit.5", dict(num_samples=120, num_leapfrog=31, burn=24,
                            init_step_search=True, jitter_l=True,
                            jitter_low_frac=0.5)),
)


def main(keys=(2, 3, 4)):
    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, n_chains, _ = \
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
    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))

    for name, kw in VARIANTS:
        hmc_cfg = HMCConfig(step_size=1e-4, sampler="hmc_nuts",
                            target_accept=bench.BENCH_TARGET_ACCEPT, **kw)
        for k in keys:
            t0 = time.perf_counter()
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
    main()
