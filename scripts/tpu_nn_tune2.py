"""NN-workload chains x L x draws sweep at the tuned step (0.1).

Round-1 tune (scripts/tpu_nn_tune.py at 1024 chains) found step 0.1, L=32
the honest optimum (~500 ESS/s at acceptance 0.64; larger steps push the
printed ESS/s up only through estimator artifacts at near-zero acceptance).
The wall clock is latency-bound (~1.6 s for ANY config at 120 draws), so
chains and draws should be nearly free — this sweep maps how far pooled
ESS/s actually scales with both.

Usage: python scripts/tpu_nn_tune2.py
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

CONFIGS = (
    # (step, chains, L, draws). Round 1 measured at step 0.1 (keys 2/3,
    # ESS/s):
    #   1024/32/120: 303-552   4096/32/120: 183-261 (leaves the latency-
    #   bound regime)   1024/64/120: 597-686   1024/32/360: 102-174 (pooled
    #   ESS saturates with draws under the refresh policy)
    #   1024/96/120: 758-777 (accept 0.32)   1024/128/120: 467-663
    #   2048/64/120: 528-610   2048/96/120: 364-624
    # -> third round: acceptance falls with L at step 0.1 (integration
    #    error), so trade step down for long L around the 1024/96 winner.
    (0.07, 1024, 96, 120),
    (0.07, 1024, 128, 120),
    (0.05, 1024, 128, 120),
    (0.1, 1024, 80, 120),
)


def main():
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

    grad_fn = clipped_grad_fn(log_prob, 13.0 * len(idx) ** 0.5,
                              inv_mass=spec.sub_sigma() ** 2, is_grad=False)

    for step, n_chains, L, n_samples in CONFIGS:
        cfg = HMCConfig(num_samples=n_samples, num_leapfrog=L, step_size=step,
                        burn=n_samples // 5, sampler="hmc",
                        jitter_l=True, jitter_low_frac=0.5)
        inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))

        def run(key):
            return sample_chains(log_prob, inits, key, cfg,
                                 inv_mass=spec.sub_sigma() ** 2,
                                 aux=aux0, aux_refresh=refresh,
                                 grad_fn=grad_fn)

        res = run(jax.random.key(1))
        np.asarray(res.samples)
        for k in (2, 3):
            t0 = time.perf_counter()
            res = run(jax.random.key(k))
            samples = np.asarray(res.samples)
            dt = time.perf_counter() - t0
            ess = float(np.median(
                effective_sample_size_np(samples[:, n_samples // 5:, :])))
            print(f"s={step:4.2f} C={n_chains:5d} L={L:3d} N={n_samples:4d} key={k}  "
                  f"elapsed={dt:6.2f}s  accept={float(res.acceptance_rate):.3f}  "
                  f"ESS={ess:9.1f}  ESS/s={ess / dt:9.2f}", flush=True)


if __name__ == "__main__":
    main()
