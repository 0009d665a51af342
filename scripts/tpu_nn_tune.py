"""NN-workload (step, L) trajectory tuning at high chain count.

The NN bench inherited the reference's analytic configuration (L=196 at
step 5e-4) whose pooled-ESS efficiency measures ~1.2% — the operator
headline was instead tuned on-chip (L=31 at the d^-1/4 step, 76-95%
efficiency). Same treatment here: the 78-dim VI-preconditioned subspace has
d^-1/4 ~ 0.34, so sweep steps around that scale and short trajectories.
Tiny graphs -> several configs per process are safe.

Usage: python scripts/tpu_nn_tune.py [chains]   (default 256)
"""

import itertools
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

STEPS = (0.1, 0.2, 0.3)
LS = (8, 16, 32)


def main(n_chains=256):
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
    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    n_samples = 120

    for step, L in itertools.product(STEPS, LS):
        cfg = HMCConfig(num_samples=n_samples, num_leapfrog=L, step_size=step,
                        burn=n_samples // 5, sampler="hmc",
                        jitter_l=True, jitter_low_frac=0.5)

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
            print(f"step={step:4.2f} L={L:3d} key={k}  elapsed={dt:5.2f}s  "
                  f"accept={float(res.acceptance_rate):.3f}  "
                  f"ESS={ess:8.1f}  ESS/s={ess / dt:9.2f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
