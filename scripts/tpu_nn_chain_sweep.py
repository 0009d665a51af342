"""NN-workload chain-count sweep on the chip.

The 141-param MLP VI-HMC bench is latency-bound, not compute-bound (11.3k
draws/s over 32 chains = 1.7M leapfrog steps/s with the MXU essentially
idle), so vmapping more chains should cost ~no wall clock while pooled ESS
scales linearly — unlike the operator workload whose 48/64-chain runs crash
the worker at reference scale. Graphs here are tiny, so several chain counts
in one process are safe (the crash pattern was second LARGE graph per
process — CLAUDE.md).

Usage: python scripts/tpu_nn_chain_sweep.py [chains ...]   (default 64 128 256)
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_nn_problem
from vihmc_tpu.chains import sample_chains, effective_sample_size_np
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                           clipped_grad_fn, make_subspace_log_prob)


def main(chain_counts):
    _, apply_flat, x, y, mu, sigma, idx = build_nn_problem()
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")

    def full_ll(flat):
        return like(apply_flat(flat, x), y, 5e-2 ** 2)

    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    n_samples, L = 120, 196  # bench_nn methodology
    cfg = HMCConfig(num_samples=n_samples, num_leapfrog=L, step_size=5e-4,
                    burn=n_samples // 5, sampler="hmc_nuts",
                    target_accept=0.65, jitter_l=True, jitter_low_frac=0.5)
    grad_fn = clipped_grad_fn(log_prob, 13.0 * len(idx) ** 0.5,
                              inv_mass=spec.sub_sigma() ** 2, is_grad=False)

    for n_chains in chain_counts:
        inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))

        def run(key):
            return sample_chains(log_prob, inits, key, cfg,
                                 inv_mass=spec.sub_sigma() ** 2,
                                 aux=aux0, aux_refresh=refresh,
                                 grad_fn=grad_fn)

        res = run(jax.random.key(1))          # compile + warm
        np.asarray(res.samples)
        for k in (2, 3):
            t0 = time.perf_counter()
            res = run(jax.random.key(k))
            samples = np.asarray(res.samples)
            dt = time.perf_counter() - t0
            ess = float(np.median(
                effective_sample_size_np(samples[:, n_samples // 5:, :])))
            print(f"chains={n_chains:4d} key={k}  elapsed={dt:6.2f}s  "
                  f"draws/s={n_chains * n_samples / dt:8.1f}  "
                  f"accept={float(res.acceptance_rate):.3f}  "
                  f"ESS={ess:8.1f}  ESS/s={ess / dt:8.2f}", flush=True)


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    main(counts)
