"""Chains-per-chip sweep at reference scale: draws/s and ESS/s vs C."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from vihmc_tpu.chains import sample_chains, effective_sample_size_np
from vihmc_tpu.hmc import HMCConfig, FrozenPolicy, SubspaceSpec, make_subspace_log_prob
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.dists.likelihoods import get_likelihood

cfg, apply_flat, (branch_x, trunk_x, y), mu, sigma, idx, _, _ = \
    B.build_problem(False)
spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
like = get_likelihood("NLL")
prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())


def full_ll(flat):
    return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)


lp_like, aux0, refresh = make_subspace_log_prob(
    full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))


def log_prob(q, aux):
    return lp_like(q, aux) + prior.log_prob(q)


DRAWS = 120
hmc = HMCConfig(num_samples=DRAWS, num_leapfrog=7, step_size=1e-4,
                burn=DRAWS // 5, sampler="hmc_nuts")

for C in (8, 16, 32, 64):
    inits = jnp.tile(spec.sub_mu()[None, :], (C, 1))
    try:
        f = lambda k: sample_chains(log_prob, inits, k, hmc,
                                    inv_mass=spec.sub_sigma() ** 2,
                                    aux=aux0, aux_refresh=refresh)
        r = f(jax.random.key(1)); jax.block_until_ready(r.samples)
        t0 = time.perf_counter()
        r = f(jax.random.key(2))
        samples = np.asarray(r.samples)
        dt = time.perf_counter() - t0
        ess = effective_sample_size_np(samples[:, DRAWS // 5:, :])
        print(f"C={C:3d}  {dt:6.2f}s  {C*DRAWS/dt:7.1f} draws/s  "
              f"ess_med={np.median(ess):7.2f}  ess/s={np.median(ess)/dt:7.2f}  "
              f"acc={float(r.acceptance_rate):.3f}", flush=True)
    except Exception as e:
        print(f"C={C}: FAILED {type(e).__name__}: {e}", flush=True)
        break
