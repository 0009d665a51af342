"""On-chip NUTS validation at bench scale: subspace VI-HMC with adaptive
trajectories (depth 5 = up to 31 leapfrog steps/draw), 8 chains."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from vihmc_tpu.chains import sample_chains_nuts, effective_sample_size_np
from vihmc_tpu.hmc import NUTSConfig, FrozenPolicy, SubspaceSpec, make_subspace_log_prob
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


C, DRAWS = 8, 60
nuts_cfg = NUTSConfig(num_samples=DRAWS, max_depth=5, step_size=1e-4,
                      burn=DRAWS // 3)
inits = jnp.tile(spec.sub_mu()[None, :], (C, 1))

t0 = time.perf_counter()
res = sample_chains_nuts(log_prob, inits, jax.random.key(1), nuts_cfg,
                         inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                         aux_refresh=refresh)
samples = np.asarray(res.samples)
compile_and_run = time.perf_counter() - t0

t0 = time.perf_counter()
res = sample_chains_nuts(log_prob, inits, jax.random.key(2), nuts_cfg,
                         inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                         aux_refresh=refresh)
samples = np.asarray(res.samples)
dt = time.perf_counter() - t0

ess = effective_sample_size_np(samples[:, DRAWS // 3:, :])
print(f"NUTS depth5 {C}x{DRAWS}: compile+run {compile_and_run:.1f}s, "
      f"steady {dt:.1f}s = {C*DRAWS/dt:.1f} draws/s  "
      f"accept={float(res.acceptance_rate):.3f}  "
      f"ess_med={np.median(ess):.2f}  ess/s={np.median(ess)/dt:.3f}  "
      f"finite={np.isfinite(samples).all()}", flush=True)
