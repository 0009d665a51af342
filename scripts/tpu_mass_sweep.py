"""On-chip ESS/s sweep: headline HMC vs windowed-mass vs NUTS bench variants.

Run WITHOUT the CPU env prefix (claims the TPU; one process at a time):

    python scripts/tpu_mass_sweep.py --variants head,wmass,nuts3

Each variant is one extra compiled computation; remote compile makes the
first run of each slow (minutes). Results print one JSON line per variant.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import build_problem  # noqa: E402


def run_variant(name, quick):
    import jax
    import jax.numpy as jnp

    from vihmc_tpu.chains import (effective_sample_size_np, sample_chains,
                                  sample_chains_nuts)
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (FrozenPolicy, HMCConfig, SubspaceSpec,
                               make_subspace_log_prob)

    cfg, apply_flat, (branch_x, trunk_x, y), mu, sigma, idx, n_chains, n_samples = \
        build_problem(quick)
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")

    def full_ll(flat):
        return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)

    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    import re

    label = name
    m = re.match(r"^c(\d+)_(.+)$", name)  # e.g. c64_ta55L31, c16_head
    if m:
        n_chains, name = int(m.group(1)), m.group(2)

    inits = jnp.tile(spec.sub_mu()[None, :], (n_chains, 1))
    inv_mass = spec.sub_sigma() ** 2
    if name.startswith("draws"):
        n_samples = int(name[5:])
    target_accept = 0.8
    num_leapfrog = 7
    if name.startswith("ta"):  # e.g. ta65, ta55d360, ta65L15, ta65L31d240
        spec_str = name[2:]
        if "d" in spec_str:
            spec_str, d_str = spec_str.split("d")
            n_samples = int(d_str)
        if "L" in spec_str:
            spec_str, l_str = spec_str.split("L")
            num_leapfrog = int(l_str)
        target_accept = int(spec_str) / 100.0
    burn = n_samples // 5

    if name.startswith("chees"):  # chees, cheesd360
        from vihmc_tpu.chains import sample_chains_chees
        from vihmc_tpu.hmc.chees import ChEESConfig

        rest = name[5:]
        adam_lr = 0.025
        if rest.startswith("fast"):  # cheesfast: short-burn-friendly lr
            adam_lr = 0.15
            rest = rest[4:]
        if rest.startswith("d"):
            n_samples = int(rest[1:])
            burn = n_samples // 5
        ccfg = ChEESConfig(num_samples=n_samples, step_size=1e-4,
                           init_traj_length=7 * 1e-4, burn=burn,
                           max_steps=256, target_accept=0.651,
                           adam_lr=adam_lr)

        def run(key):
            return sample_chains_chees(log_prob, inits, key, ccfg,
                                       inv_mass=inv_mass, aux=aux0,
                                       aux_refresh=refresh)
        grads_per_draw = -1  # dynamic; reported from the trace below
    elif name.startswith("nuts"):
        from vihmc_tpu.hmc.nuts import NUTSConfig

        depth = int(name[4:] or 3)
        ncfg = NUTSConfig(num_samples=n_samples, max_depth=depth,
                          step_size=1e-4, burn=burn, adapt_step_size=True,
                          target_accept=0.8)

        def run(key):
            return sample_chains_nuts(log_prob, inits, key, ncfg,
                                      inv_mass=inv_mass, aux=aux0,
                                      aux_refresh=refresh)
        grads_per_draw = 2 ** depth - 1
    else:
        hcfg = HMCConfig(num_samples=n_samples, num_leapfrog=num_leapfrog,
                         step_size=1e-4,
                         burn=burn, sampler="hmc_nuts",
                         adapt_mass=(name == "wmass"),
                         mass_schedule="windowed" if name == "wmass" else "half",
                         jitter_l=(name == "jitter"),
                         target_accept=target_accept)

        def run(key):
            return sample_chains(log_prob, inits, key, hcfg, inv_mass=inv_mass,
                                 aux=aux0, aux_refresh=refresh)
        grads_per_draw = num_leapfrog + 1

    res = run(jax.random.key(1))
    np.asarray(res.samples)  # compile + warm
    t0 = time.perf_counter()
    res = run(jax.random.key(2))
    samples = np.asarray(res.samples)
    elapsed = time.perf_counter() - t0

    ess = effective_sample_size_np(samples[:, burn:, :])
    extra = {}
    if grads_per_draw < 0:  # chees: realized dynamic step counts
        steps = np.asarray(res.aux_trace["n_steps"])
        grads_per_draw = round(float(steps.mean()), 1)
        extra = {"final_T": round(float(np.exp(res.final_state.log_T)), 6),
                 "final_eps": round(float(np.exp(res.final_state.da.log_step_avg)), 6)}
    out = {
        "variant": label,
        **extra,
        "elapsed_s": round(elapsed, 3),
        "samples_per_s": round(n_chains * n_samples / elapsed, 1),
        "ess_median": round(float(np.median(ess)), 2),
        "ess_per_s": round(float(np.median(ess)) / elapsed, 3),
        "acceptance": round(float(res.acceptance_rate), 3),
        "grads_per_draw": grads_per_draw,
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="head,wmass")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    for v in args.variants.split(","):
        run_variant(v.strip(), args.quick)


if __name__ == "__main__":
    main()
