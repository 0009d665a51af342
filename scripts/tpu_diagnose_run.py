"""Run ONE headline variant+key and dump samples/diagnostics to /tmp.

Usage: python scripts/tpu_diagnose_run.py N360 3
Offline analysis then explains pooled-ESS collapses (between-chain drift vs
within-chain stickiness) without re-burning chip time.
"""

import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from scripts.tpu_headline_variant import VARIANTS, FUSED_VALUE, CHAIN_OVERRIDE, SEGMENT
from vihmc_tpu.chains import sample_chains, effective_sample_size_np
from vihmc_tpu.chains.diagnostics import potential_scale_reduction_np
from vihmc_tpu.chains.resume import sample_chains_resumable
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.hmc import (HMCConfig, FrozenPolicy, SubspaceSpec,
                           make_subspace_grad, make_subspace_log_prob)
from vihmc_tpu.ops import make_gram_grad_full


def main(name, key_i):
    kw = VARIANTS[name]
    cfg, apply_flat, (bx, tx, y), mu, sigma, idx, n_chains, _ = \
        bench.build_problem(False)
    n_chains = CHAIN_OVERRIDE.get(name, n_chains)
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def full_ll(flat):
        return like(apply_flat(flat, bx, tx), y, 1.0)

    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    grad_full, _, _ = make_gram_grad_full(cfg, bx, tx, y, 1.0)
    gram_grad = make_subspace_grad(grad_full, spec, prior=prior)
    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    hmc_cfg = HMCConfig(**kw)

    if hmc_cfg.num_samples > SEGMENT:
        res = sample_chains_resumable(
            log_prob, inits, jax.random.key(key_i), hmc_cfg,
            segment_size=SEGMENT, inv_mass=spec.sub_sigma() ** 2,
            aux=aux0, aux_refresh=refresh, grad_fn=gram_grad)
    else:
        res = sample_chains(log_prob, inits, jax.random.key(key_i), hmc_cfg,
                            inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                            aux_refresh=refresh, grad_fn=gram_grad)

    samples = np.asarray(res.samples)[:, hmc_cfg.burn:, :]
    lps = np.asarray(res.log_probs)[:, hmc_cfg.burn:]
    acc = np.asarray(res.accepted)[:, hmc_cfg.burn:]
    np.savez(f"/tmp/diag_{name}_k{key_i}.npz", samples=samples, lps=lps,
             acc=acc, steps=np.asarray(res.step_sizes))

    ess = effective_sample_size_np(samples)
    rhat = potential_scale_reduction_np(samples)
    print(f"pooled ESS median={np.median(ess):.1f}  max R-hat={rhat.max():.3f}")
    # per-chain ESS (treat each chain as its own run)
    per = np.stack([np.median(effective_sample_size_np(samples[i:i + 1]))
                    for i in range(samples.shape[0])])
    print("per-chain median-ESS quartiles:", np.percentile(per, [0, 25, 50, 75, 100]).round(1))
    print("per-chain acceptance:", acc.mean(axis=1).round(3))
    print("per-chain mean lp:", lps.mean(axis=1).round(1))
    print("per-chain lp std:", lps.std(axis=1).round(1))
    # between-chain displacement in units of pooled std
    m = samples.mean(axis=1)  # (C, D)
    sd = samples.reshape(-1, samples.shape[-1]).std(axis=0) + 1e-12
    disp = np.abs(m - m.mean(axis=0)) / sd
    print("max chain displacement (in sd):", disp.max(axis=1).round(2))


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]))
