"""Profile the paired MH density evaluators at headline scale (round 5).

The round-4 recipe's self-identified largest per-draw cost is the paired
f32 density evaluation (2 full-grid forwards whose (B, P) predictions
round-trip HBM). This probe measures, in ONE process (medium graphs only —
no large sampling scan):

  delta_composed   the shipping evaluator (pipelines/common.py
                   make_paired_subspace_delta), 120-iter scan x 32 chains
  delta_fused      the round-5 fused Pallas kernel (ops/deeponet_merge.py
                   fused_paired_delta) at the same scale
  traj_step_bf16   ONE bf16 Gram trajectory-gradient eval x 32 chains
                   (the headline pays L=4 of these per draw + 1 at init)
  value agreement  max |dll_fused - dll_composed| over 16 trajectory-scale
                   displacement pairs — bounds the MH perturbation of
                   swapping evaluators (both are deterministic, so either
                   is EXACT MCMC for its own evaluated density; agreement
                   just confirms they evaluate the same density)

Usage: python scripts/tpu_delta_profile.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.hmc import SubspaceSpec, FrozenPolicy, make_subspace_grad, \
    make_subspace_log_prob
from vihmc_tpu.ops import make_gram_grad_full
from vihmc_tpu.pipelines.common import (make_fused_paired_subspace_delta,
                                        make_paired_subspace_delta)

N_ITER = 120


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    dt = time.perf_counter() - t0
    print(f"{name:18s} {dt:7.3f}s  ({1e3 * dt / N_ITER:7.2f} ms/iter)",
          flush=True)
    return dt


def main():
    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, n_chains, _ = \
        bench.build_problem(False)
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())
    composed = make_paired_subspace_delta(apply_flat, bx, tx, y, 1.0, spec,
                                          prior)
    fused = make_fused_paired_subspace_delta(cfg, bx, tx, y, 1.0, spec,
                                             prior)

    _, aux0, _ = make_subspace_log_prob(
        lambda f: jnp.sum(f) * 0.0, spec, FrozenPolicy.DRAW,
        init_key=jax.random.key(0))
    aux_b = jax.vmap(lambda _: aux0)(jnp.arange(n_chains))
    q0 = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    # trajectory-scale displacement: eps*L ~ 0.5 preconditioned units
    disp = 0.5 * spec.sub_sigma()[None, :] * jax.random.normal(
        jax.random.key(1), q0.shape) / np.sqrt(len(idx))
    q1 = q0 + disp

    def scan_delta(delta_fn):
        @jax.jit
        def run(q1, q0, aux):
            def step(c, _):
                q1, q0 = c
                d, lp1 = jax.vmap(delta_fn)(q1, q0, aux)
                return (q1 + 0.0 * d[:, None], q0), d

            (_, _), ds = jax.lax.scan(step, (q1, q0), None, length=N_ITER)
            return ds

        return run

    t_comp = timed("delta_composed", scan_delta(composed), q1, q0, aux_b)
    try:
        t_fused = timed("delta_fused", scan_delta(fused), q1, q0, aux_b)
    except Exception as e:
        print(f"delta_fused FAILED: {type(e).__name__}: {e}", flush=True)
        t_fused = None

    # one bf16 Gram trajectory-gradient eval (headline pays L=4+1 per draw)
    grad_full, _, _ = make_gram_grad_full(cfg, bx, tx, y, 1.0,
                                          compute_dtype=jnp.bfloat16)
    sub_grad = make_subspace_grad(grad_full, spec, prior=prior)

    @jax.jit
    def traj(q, aux):
        def step(qq, _):
            g = jax.vmap(sub_grad)(qq, aux)
            return qq + 1e-6 * g, None

        q, _ = jax.lax.scan(step, q, None, length=N_ITER)
        return q

    t_traj = timed("traj_step_bf16", traj, q0, aux_b)

    # value agreement over 16 displacement pairs (chain 0..15)
    dc, _ = jax.vmap(composed)(q1[:16], q0[:16], aux_b[:16])
    df, _ = jax.vmap(fused)(q1[:16], q0[:16], aux_b[:16])
    dc, df = np.asarray(dc), np.asarray(df)
    out = {
        "delta_composed_ms": round(1e3 * t_comp / N_ITER, 2),
        "delta_fused_ms": (round(1e3 * t_fused / N_ITER, 2)
                           if t_fused else None),
        "traj_step_bf16_ms": round(1e3 * t_traj / N_ITER, 2),
        "per_draw_density_ms_composed": round(1e3 * t_comp / N_ITER, 2),
        "per_draw_traj_ms_L4": round(5 * 1e3 * t_traj / N_ITER, 2),
        "dll_scale": round(float(np.median(np.abs(dc))), 3),
        "dll_max_abs_diff": float(np.max(np.abs(dc - df))),
        "dll_median_abs_diff": float(np.median(np.abs(dc - df))),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
