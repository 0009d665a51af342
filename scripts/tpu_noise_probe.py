"""Measure the TPU density-evaluation noise in MH deltas at tiny steps.

Hypothesis (round 4): on TPU the DeepONet forward's matmuls ride the bf16
MXU datapath, so the 10M-term NLL carries evaluation noise of order
O(0.1-10) nats that is CHAOTIC in q — at small proposal steps the true
|Delta H| falls below that noise, the MH acceptance saturates at a
noise-determined ceiling BELOW the dual-averaging target, and DA drives
the step to ~1e-6 chasing an unreachable target (measured:
acceptance 0.604-0.612 vs target 0.65 at eps 1.9e-6, pooled ESS pinned at
the C/2 floor — logs/bench_r4_probe_*.log).

This script quantifies it on-chip: lp deltas over tiny random steps vs the
first-order prediction g . dq, at default matmul precision AND at
precision='float32' (the 3-pass bf16 emulation of f32 matmuls), plus the
repeat-evaluation determinism check. One process, one posterior.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (FrozenPolicy, SubspaceSpec,
                               make_subspace_log_prob)

    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, _, _ = B.build_problem(
        False, asset=os.environ.get("DIAG_ASSET", "prod"))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def build_lp(precision):
        def full_ll(flat):
            with jax.default_matmul_precision(precision):
                pred = apply_flat(flat, bx, tx)
            return like(pred, y, 1.0)

        lp_like, aux0, _ = make_subspace_log_prob(
            full_ll, spec, FrozenPolicy.DRAW, init_key=jax.random.key(0))

        @jax.jit
        def lp_and_grad(q):
            f = lambda qq: lp_like(qq, aux0) + prior.log_prob(qq)
            return jax.value_and_grad(f)(q)

        return lp_and_grad

    q0 = spec.sub_mu()
    sg = spec.sub_sigma()
    rng = np.random.default_rng(0)
    dirs = rng.standard_normal((8, len(idx))).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    for precision in ("default", "float32"):
        lpg = build_lp(precision)
        lp0, g0 = lpg(q0)
        lp0b, _ = lpg(q0)
        print(f"[{precision}] lp(q0) {float(lp0):.4f}  repeat-determinism "
              f"{float(lp0b - lp0):+.2e}", flush=True)
        for s in (1e-7, 1e-6, 1e-5, 1e-4):
            errs = []
            for u in dirs:
                dq = s * np.asarray(sg) * u
                lp1, _ = lpg(q0 + jnp.asarray(dq))
                lin = float(jnp.sum(g0 * jnp.asarray(dq)))
                errs.append(float(lp1 - lp0) - lin)
            errs = np.asarray(errs)
            print(f"[{precision}] step {s:g}: delta-vs-linear residual "
                  f"mean {errs.mean():+.4f}  std {errs.std():.4f}  "
                  f"max|.| {np.abs(errs).max():.4f}", flush=True)


if __name__ == "__main__":
    main()
