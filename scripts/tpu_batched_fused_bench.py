"""On-chip timing: vmap'd composed vs batched-fused likelihood gradients
at reference scale (16 chains x 172k-param DeepONet, 1000x10201 batch)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.dists.priors import IsotropicGaussianPrior
from vihmc_tpu.models import DeepONetConfig
from vihmc_tpu.pipelines.common import (
    make_deeponet_nll_log_posterior,
    make_flat_deeponet,
    make_log_posterior,
)

C = 16
cfg = DeepONetConfig()
rng = np.random.default_rng(0)
branch_x = jnp.asarray(rng.normal(size=(1000, 101)), jnp.float32)
tt, xx = np.meshgrid(np.linspace(0, 1, 101), np.linspace(0, 1, 101), indexing="ij")
trunk_x = jnp.asarray(np.stack([tt.ravel(), xx.ravel()], -1), jnp.float32)
y = jnp.asarray(rng.normal(size=(1000, 10201)), jnp.float32)
prior = IsotropicGaussianPrior(scale=0.1)

apply_flat, flat0, _ = make_flat_deeponet(cfg)
lp_comp = make_log_posterior(lambda f: apply_flat(f, branch_x, trunk_x), y,
                             "NLL", 1.0, prior)
lp_fused, _, _ = make_deeponet_nll_log_posterior(cfg, branch_x, trunk_x, y,
                                                 tau_var=1.0, prior=prior)

flats = jnp.tile(flat0[None], (C, 1)) + 0.001 * jnp.asarray(
    rng.normal(size=(C, flat0.shape[0])), jnp.float32)

for name, lp in (("composed", lp_comp), ("fused-batched", lp_fused)):
    g = jax.jit(jax.vmap(jax.value_and_grad(lp)))
    try:
        v0, g0 = g(flats)
        np.asarray(v0)
        t0 = time.perf_counter()
        iters = 20
        x = flats
        for _ in range(iters):
            v, gr = g(x)
            x = x + 0.0 * gr
        np.asarray(x[0, 0])
        dt = time.perf_counter() - t0
        print(f"{name}: {C * iters / dt:9.1f} chain-grads/s  "
              f"({iters / dt:6.2f} batched evals/s)  lp[0]={float(v[0]):.1f}",
              flush=True)
    except Exception as e:
        import traceback

        print(f"{name} FAILED:", flush=True)
        traceback.print_exc()
