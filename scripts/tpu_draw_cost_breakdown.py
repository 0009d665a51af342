"""Decompose the headline bench's per-draw cost on-chip.

At the dual stride-5 config the official bench measures ~46 ms/draw
(5.5 s / 120 draws at 32 chains). Components, each timed as its own
120-iteration lax.scan at bench scale (32 chains vmapped):

  endpoint_composed  exact full-grid density eval (what MH uses), composed XLA
  endpoint_fused     same via the fused Pallas merge+NLL kernel
  traj24             24 surrogate (stride 5/5) gram-gradient steps
  refresh            the frozen-coordinate refresh draw (172k normals/chain)
  momentum           subspace momentum draw (2048/chain)

Each component is one jit per process-run; graphs are small-to-medium so a
single process is within the environment's compile budget.

Usage: python scripts/tpu_draw_cost_breakdown.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.hmc import SubspaceSpec, make_subspace_grad, make_subspace_log_prob, FrozenPolicy
from vihmc_tpu.ops import grid_stride_subset, infer_grid_shape, make_gram_grad_full
from vihmc_tpu.pipelines.common import make_deeponet_nll_log_posterior

N_ITER = 120


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
        out)
    dt = time.perf_counter() - t0
    print(f"{name:22s} {dt:7.3f}s  ({1e3 * dt / N_ITER:7.2f} ms/iter)",
          flush=True)
    return dt


def main():
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

    nt_g, nx_g = infer_grid_shape(tx)
    subset = grid_stride_subset(nt_g, nx_g, 5)
    fsel = np.arange(0, bx.shape[0], 5)
    grad_full, _, _ = make_gram_grad_full(cfg, bx, tx, y, 1.0,
                                          query_subset=subset, fn_subset=fsel)
    sub_grad = make_subspace_grad(grad_full, spec, prior=prior)

    q0 = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    aux_b = jax.vmap(lambda _: aux0)(jnp.arange(n_chains))

    # --- endpoint density, composed XLA ---
    @jax.jit
    def ep_composed(q, aux):
        def step(c, _):
            q, aux = c
            lp = jax.vmap(log_prob)(q, aux)
            return (q + 0.0 * lp[:, None], aux), lp

        (_, _), lps = jax.lax.scan(step, (q, aux), None, length=N_ITER)
        return lps

    timed("endpoint_composed", ep_composed, q0, aux_b)

    # --- endpoint density, fused Pallas kernel ---
    fused_ll, _, _ = make_deeponet_nll_log_posterior(cfg, bx, tx, y,
                                                     tau_var=1.0, prior=None)
    lp_like_f, aux0f, _ = make_subspace_log_prob(
        fused_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))

    def log_prob_f(q, aux):
        return lp_like_f(q, aux) + prior.log_prob(q)

    aux_bf = jax.vmap(lambda _: aux0f)(jnp.arange(n_chains))

    @jax.jit
    def ep_fused(q, aux):
        def step(c, _):
            q, aux = c
            lp = jax.vmap(log_prob_f)(q, aux)
            return (q + 0.0 * lp[:, None], aux), lp

        (_, _), lps = jax.lax.scan(step, (q, aux), None, length=N_ITER)
        return lps

    try:
        timed("endpoint_fused", ep_fused, q0, aux_bf)
    except Exception as e:
        print(f"endpoint_fused FAILED: {type(e).__name__}: {e}", flush=True)

    # --- trajectory: 24 surrogate gradient steps per iteration ---
    @jax.jit
    def traj(q, aux):
        def step(c, _):
            q, aux = c

            def leap(qq, _):
                g = jax.vmap(sub_grad)(qq, aux)
                return qq + 1e-6 * g, None

            q, _ = jax.lax.scan(leap, q, None, length=24)
            return (q, aux), q[:, 0]

        (_, _), out = jax.lax.scan(step, (q, aux), None, length=N_ITER)
        return out

    timed("traj24", traj, q0, aux_b)

    # --- refresh draw ---
    @jax.jit
    def refresh_scan(q, aux, key):
        def step(c, k):
            q, aux = c
            ks = jax.random.split(k, q.shape[0])
            aux = jax.vmap(refresh)(ks, aux)
            return (q, aux), aux[:, 0]

        keys = jax.random.split(key, N_ITER)
        (_, aux), _ = jax.lax.scan(step, (q, aux), keys)
        return aux

    try:
        timed("refresh", refresh_scan, q0, aux_b, jax.random.key(3))
    except Exception as e:
        print(f"refresh FAILED: {type(e).__name__}: {e}", flush=True)

    # --- momentum draw ---
    @jax.jit
    def momentum(key):
        def step(_, k):
            p = jax.random.normal(k, (n_chains, len(idx)))
            return 0.0, p[0, 0]

        keys = jax.random.split(key, N_ITER)
        _, out = jax.lax.scan(step, 0.0, keys)
        return out

    timed("momentum", momentum, jax.random.key(4))


if __name__ == "__main__":
    main()
