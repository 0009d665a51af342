"""Diagnose the draw-policy transient on the prod-asset headline posterior.

Round-4 observation: under the 'draw' frozen policy the 2048-dim headline
chains measure pooled ESS pinned at the C/2 floor (tau capped at 2S on
EVERY dim) even after an 800-step preconditioned-Adam warm start — the
chains are still drifting through the whole run. Two candidate causes:

(a) mode distance — the warm start underconverged and chains keep climbing
    the conditional (lp rising monotonically through sampling);
(b) scale mismatch — chains sit AT the mode but the kinetic metric
    misstates the conditional scales, so relaxation from the mode into the
    typical set (lp falling by ~d/2 nats) is diffusive and slow.

This script separates them: it runs warm starts of increasing depth
(tracking conditional lp + preconditioned gradient norm), then samples a
short chain from the deepest warm start and prints the lp trajectory
quantiles per segment. Climbing lp = (a); falling-toward-(lp*-d/2) = (b).

One process, one posterior, TPU: run bare (no env prefix).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from vihmc_tpu.chains import sample_chains
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                               make_subspace_log_prob, make_subspace_grad,
                               clipped_grad_fn)
    from vihmc_tpu.ops import (grid_stride_subset, infer_grid_shape,
                               make_gram_grad_full)

    cfg, apply_flat, (branch_x, trunk_x, y), mu, sigma, idx, n_chains, _ = \
        B.build_problem(False, asset=os.environ.get("DIAG_ASSET", "prod"))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")

    def full_ll(flat):
        return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)

    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.DRAW, init_key=jax.random.key(0))
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    # laplace diagonal (bench --laplace-mass path)
    z = np.load(B.LAST_PROBLEM_PROVENANCE["asset_path"])
    idx_np = np.asarray(idx)
    g2 = z["scores"][idx_np] / np.maximum(z["sigma"][idx_np] ** 2, 1e-30)
    n_eff = branch_x.shape[0] * trunk_x.shape[0]
    lap_var = 1.0 / (1.0 / np.maximum(z["sigma"][idx_np] ** 2, 1e-30)
                     + n_eff * g2)
    inv_mass = jnp.asarray(lap_var, jnp.float32)

    # dual-stride Gram trajectory oracle (headline config)
    nt_g, nx_g = infer_grid_shape(trunk_x)
    grad_full, _, _ = make_gram_grad_full(
        cfg, branch_x, trunk_x, y, 1.0,
        query_subset=grid_stride_subset(nt_g, nx_g, B.BENCH_STRIDE),
        fn_subset=np.arange(0, branch_x.shape[0], B.BENCH_FN_STRIDE))
    sub_grad = make_subspace_grad(grad_full, spec, prior=prior)
    clip = B.BENCH_CLIP * (len(idx) / 2048.0) ** 0.5
    grad_fn = clipped_grad_fn(sub_grad, clip, inv_mass=inv_mass)

    d = spec.subspace_dim
    scale = jnp.sqrt(inv_mass)
    q0 = spec.sub_mu()
    opt = optax.adam(0.1)

    @jax.jit
    def warm(z0, n):
        def step(carry, _):
            zz, st = carry
            g_z = scale * grad_fn(q0 + scale * zz, aux0)
            upd, st = opt.update(jax.tree_util.tree_map(lambda x: -x, g_z),
                                 st, zz)
            return (optax.apply_updates(zz, upd), st), None

        (z1, _), _ = jax.lax.scan(step, (z0, opt.init(z0)), None, length=800)
        return z1

    @jax.jit
    def probe(q):
        lp = log_prob(q, aux0)
        g = grad_fn(q, aux0)
        return lp, jnp.sqrt(jnp.sum(inv_mass * g * g))

    zz = jnp.zeros_like(q0)
    lp, gn = probe(q0 + scale * zz)
    print(f"warm    0: lp {float(lp):.1f}  precond|g| {float(gn):.1f}  "
          f"(healthy |g| ~ sqrt(d) = {d ** 0.5:.0f})", flush=True)
    for k in range(1, 7):
        zz = warm(zz, 800)
        lp, gn = probe(q0 + scale * zz)
        print(f"warm {800 * k:5d}: lp {float(lp):.1f}  precond|g| "
              f"{float(gn):.1f}", flush=True)

    # short chain from the deepest warm start; lp per segment
    q_star = q0 + scale * zz
    inits = q_star[None, :] + 0.5 * scale * jax.random.normal(
        jax.random.key(7), (8, d))
    hmc = HMCConfig(num_samples=120, num_leapfrog=B.BENCH_L, step_size=0.1,
                    burn=24, sampler="hmc_nuts", target_accept=0.65,
                    da_axis="chains", adapt_forever=True, jitter_eps=True,
                    jitter_low_frac=0.5)
    t0 = time.time()
    res = sample_chains(log_prob, inits, jax.random.key(3), hmc,
                        inv_mass=inv_mass, aux=aux0, aux_refresh=refresh,
                        grad_fn=grad_fn)
    lps = np.asarray(res.log_probs)  # (C, S)
    print(f"sampled 8x120 in {time.time() - t0:.1f}s  acceptance "
          f"{float(res.acceptance_rate):.3f}  step "
          f"{float(np.exp(np.median(np.asarray(res.final_state.da.log_step)))):.4g}",
          flush=True)
    print(f"typical-set target: lp* - d/2 ~ {float(lp) - d / 2:.1f}")
    for s0 in range(0, 120, 20):
        seg = lps[:, s0:s0 + 20]
        print(f"draws {s0:3d}-{s0 + 20:3d}: lp median {np.median(seg):.1f} "
              f"iqr [{np.quantile(seg, 0.25):.1f}, {np.quantile(seg, 0.75):.1f}]",
              flush=True)


if __name__ == "__main__":
    main()
