"""Fixed-eps acceptance sweep on the draw-policy conditional (round 4).

Every adaptive probe on the prod-asset draw conditional collapsed the step
to ~2e-6 with pooled ESS at the C/2 floor, while Lanczos at the warm-started
mode measures preconditioned curvature lambda_max = 345 (stable eps ~0.1).
This script maps acceptance, |Delta H|, and actual positional movement as a
function of a FIXED eps (no dual averaging) with the Laplace diagonal and
the rank-256 low-rank metric, full-grid trajectory gradients, f32 density —
the most exact configuration available. The shape of the acceptance cliff
distinguishes: smooth Gaussian-ish target (acceptance ~1 up to ~0.1),
non-Gaussian glass (cliff orders of magnitude below the mode's curvature
scale), or f32-resolution artifacts (no movement at the bottom end).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from vihmc_tpu.chains import sample_chains
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                               make_subspace_log_prob, make_subspace_grad,
                               clipped_grad_fn)
    from vihmc_tpu.hmc.metric import lowrank_from_eigs
    from vihmc_tpu.ops import make_gram_grad_full

    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, _, _ = B.build_problem(
        False, asset=os.environ.get("DIAG_ASSET", "prod"))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")

    def full_ll(flat):
        with jax.default_matmul_precision("float32"):
            pred = apply_flat(flat, bx, tx)
        return like(pred, y, 1.0)

    lp_like, aux0, _ = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.DRAW, init_key=jax.random.key(0))
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    z = np.load(B.LAST_PROBLEM_PROVENANCE["asset_path"])
    idx_np = np.asarray(idx)
    g2 = z["scores"][idx_np] / np.maximum(z["sigma"][idx_np] ** 2, 1e-30)
    lap_var = 1.0 / (1.0 / np.maximum(z["sigma"][idx_np] ** 2, 1e-30)
                     + bx.shape[0] * tx.shape[0] * g2)
    inv_mass = jnp.asarray(lap_var, jnp.float32)

    # cached eigenpairs from the bench probe (same tag)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "runs", "lanczos_cache",
        "burgers_stage12_r2.npz_d2048_lap_draw_w800_k256_i512.npz")
    zc = np.load(cache)
    metric = lowrank_from_eigs(inv_mass, jnp.maximum(
        jnp.asarray(zc["eigvals"]), 1.0), jnp.asarray(zc["eigvecs"]))

    # full-grid Gram trajectory gradients + clip (bench --stride 1 path)
    grad_full, _, _ = make_gram_grad_full(cfg, bx, tx, y, 1.0)
    sub_grad = make_subspace_grad(grad_full, spec, prior=prior)
    grad_fn = clipped_grad_fn(sub_grad, 600.0, inv_mass=inv_mass)

    # warm start (same as bench)
    inits, _ = B._conditional_warm_start(log_prob, aux0, spec.sub_mu(),
                                         inv_mass, grad_fn, 800, 8,
                                         jax.random.key(0xA11))
    inits = jnp.asarray(inits)

    for eps in (1e-5, 1e-4, 1e-3, 1e-2, 3e-2, 1e-1):
        hmc = HMCConfig(num_samples=24, num_leapfrog=8, step_size=float(eps),
                        burn=0, sampler="hmc")
        res = sample_chains(log_prob, inits, jax.random.key(5), hmc,
                            inv_mass=metric, aux=aux0, grad_fn=grad_fn)
        acc = float(res.acceptance_rate)
        ap = np.asarray(res.accept_probs)
        samples = np.asarray(res.samples)
        move = np.sqrt(((samples[:, -1] - np.asarray(inits)) ** 2
                        / np.maximum(lap_var, 1e-30)).sum(-1)).mean()
        lp_t = np.asarray(res.log_probs)
        print(f"eps {eps:8.0e}: accept {acc:.3f}  mean_ap {ap.mean():.3f}  "
              f"precond-move {move:9.3f}  lp [{lp_t.min():.0f}, "
              f"{lp_t.max():.0f}]  div {int(np.asarray(res.divergent).sum())}",
              flush=True)


if __name__ == "__main__":
    main()
