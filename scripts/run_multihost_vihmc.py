"""Multi-host VI-HMC launch example (one process per TPU host).

Launch identically on every host of a pod slice (the TPU runtime supplies
coordinator metadata), or under SLURM:

    srun --ntasks=<hosts> python scripts/run_multihost_vihmc.py \
        --chains 128 --num-samples 200 --data-shards 2

Every process executes the same program (SPMD): `jax.distributed` is
initialized, the ('chains','data') mesh spans the GLOBAL device list, the
dataset is generated identically on each host, and `sample_chains(mesh=...)`
shards the chain axis across all chips — ICI within a slice, DCN across
slices. Cross-chain diagnostics (split R-hat, ESS) are computed on the
sharded sample array; XLA inserts the collectives.

Single-host smoke (8 virtual devices):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/run_multihost_vihmc.py --chains 16 --num-samples 50
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=32)
    ap.add_argument("--num-samples", type=int, default=120)
    ap.add_argument("--data-shards", type=int, default=1)
    ap.add_argument("--subspace", type=int, default=256)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on TPU pods/SLURM)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--init-timeout", type=float, default=None,
                    help="coordinator handshake timeout (seconds)")
    args = ap.parse_args()

    from vihmc_tpu.chains import initialize_distributed

    dist = initialize_distributed(args.coordinator, args.num_processes,
                                  args.process_id,
                                  initialization_timeout=args.init_timeout)

    import jax
    import jax.numpy as jnp

    from vihmc_tpu.chains import (global_chain_mesh, sample_chains,
                                  shard_batch, summarize_np)
    from vihmc_tpu.dists.likelihoods import get_likelihood
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import (FrozenPolicy, HMCConfig, SubspaceSpec,
                               make_subspace_log_prob)
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines.common import make_flat_deeponet

    if jax.process_index() == 0:
        print(f"distributed={dist} processes={jax.process_count()} "
              f"devices={len(jax.devices())}")

    mesh = global_chain_mesh(n_data_shards=args.data_shards)

    # identical dataset on every host (generated; swap in load_burgers_mat)
    cfg = DeepONetConfig(in_branch=31, in_trunk=5, width_branch=32,
                         width_trunk=32, depth_branch=4, depth_trunk=4)
    apply_flat, flat0, _ = make_flat_deeponet(cfg)
    d = flat0.shape[0]
    rng = np.random.default_rng(0)
    branch_x = jnp.asarray(rng.normal(size=(64, cfg.in_branch)), jnp.float32)
    trunk_x = jnp.asarray(rng.uniform(size=(512, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(64, 512)), jnp.float32)
    branch_x, y = shard_batch(mesh, (branch_x, y))  # likelihood -> psum

    mu = jnp.asarray(0.05 * rng.normal(size=d), jnp.float32)
    sigma = jnp.asarray(0.01 + 0.02 * rng.random(d), jnp.float32)
    idx = np.sort(rng.choice(d, size=min(args.subspace, d // 2), replace=False))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")

    def full_ll(flat):
        return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)

    lp, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp(q, aux) + prior.log_prob(q)

    inits = jnp.tile(spec.sub_mu()[None, :], (args.chains, 1))
    hmc = HMCConfig(num_samples=args.num_samples, num_leapfrog=15,
                    step_size=1e-3, burn=args.num_samples // 5,
                    sampler="hmc_nuts", target_accept=0.55)
    res = sample_chains(log_prob, inits, jax.random.key(1), hmc,
                        inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                        aux_refresh=refresh, mesh=mesh)

    if jax.process_count() > 1:
        # chain-sharded outputs span non-addressable devices: gather the
        # global arrays (every host gets the full result — the standard
        # multi-host pattern for host-side diagnostics)
        from jax.experimental import multihost_utils

        samples, accepted = multihost_utils.process_allgather(
            (res.samples, res.accepted), tiled=True)
        samples = np.asarray(samples)
        acceptance = float(np.mean(np.asarray(accepted, np.float32)))
    else:
        samples = np.asarray(jax.device_get(res.samples))
        acceptance = float(res.acceptance_rate)
    if jax.process_index() == 0:
        import json

        stats = summarize_np(samples[:, args.num_samples // 5:, :],
                             rank_normalized=False)
        # machine-parsable line for tests/test_distributed.py: the
        # cross-process run must reproduce the single-process diagnostics
        # exactly (chain keys fold_in by chain index — mesh-layout
        # independent)
        print("RESULT " + json.dumps({
            "distributed": bool(dist),
            "processes": jax.process_count(),
            "devices": len(jax.devices()),
            "mesh": {k: int(v) for k, v in mesh.shape.items()},
            "chains": args.chains,
            "draws": args.num_samples,
            "acceptance": round(acceptance, 6),
            "max_rhat": round(float(np.max(stats["r_hat"])), 6),
            "median_ess": round(float(np.median(stats["ess"])), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
