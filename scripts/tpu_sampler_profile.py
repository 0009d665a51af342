"""Decompose bench-sampler time: marginal leapfrog-grad cost vs fixed
per-draw overhead, refresh vs mean policy, fused vs composed likelihood."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from vihmc_tpu.chains import sample_chains
from vihmc_tpu.hmc import HMCConfig, FrozenPolicy, SubspaceSpec, make_subspace_log_prob
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.pipelines.common import make_deeponet_nll_log_posterior

cfg, apply_flat, (branch_x, trunk_x, y), mu, sigma, idx, n_chains, _ = \
    B.build_problem(False)
spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
like = get_likelihood("NLL")
prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

fused_ll, _, _ = make_deeponet_nll_log_posterior(cfg, branch_x, trunk_x, y,
                                                 tau_var=1.0, prior=None)

def composed_ll(flat):
    return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)

inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
DRAWS = 40

def run_case(name, full_ll, policy, L):
    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, policy, init_key=jax.random.key(0))

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    hmc = HMCConfig(num_samples=DRAWS, num_leapfrog=L, step_size=1e-4)
    f = lambda k: sample_chains(log_prob, inits, k, hmc,
                                inv_mass=spec.sub_sigma() ** 2,
                                aux=aux0, aux_refresh=refresh)
    r = f(jax.random.key(1)); jax.block_until_ready(r.samples)  # compile
    t0 = time.perf_counter()
    r = f(jax.random.key(2)); jax.block_until_ready(r.samples)
    dt = time.perf_counter() - t0
    grads = n_chains * DRAWS * (L + (1 if policy is FrozenPolicy.REFRESH else 0))
    print(f"{name:32s} L={L}  {dt:7.2f}s  {n_chains*DRAWS/dt:7.1f} draws/s  "
          f"{grads/dt:8.1f} chain-grads/s", flush=True)
    return dt

for name, ll in (("fused", fused_ll), ("composed", composed_ll)):
    for L in (1, 7):
        run_case(f"{name}/refresh", ll, FrozenPolicy.REFRESH, L)
    run_case(f"{name}/mean", ll, FrozenPolicy.MEAN, 7)
