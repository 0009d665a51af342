"""On-chip wall-clock probe of the VERDICT r3 item-4 MFU levers.

One process, a handful of small jitted gradient graphs (no sampling scans —
the worker-crash history is about large scan graphs, CLAUDE.md). Measures
the per-evaluation wall of the chain-batched Gram trajectory gradient (the
headline hot loop: 8 of these per draw) under each lever:

  * f32 (current headline datapath) at the reference width-100 DeepONet;
  * bf16 compute_dtype (gram_merge.py round-4 option): halves the stack
    residual HBM traffic that bounds the f32 path;
  * width-128 "MXU padding" variant: the VERDICT suggested padding 100->128;
    the MXU pads tiles to 128 lanes regardless, so width-128 should cost the
    SAME wall while doing 1.6x the useful FLOPs — this probe decides whether
    padding is a real lever or an accounting trick;
  * chain-axis scaling C in {8, 32}: whether vmap folds chains into matmul
    batch dims efficiently (near-flat wall per eval => chains are cheap).

Usage: python scripts/tpu_mfu_probe.py [reps]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

import bench
from vihmc_tpu.models.deeponet import DeepONetConfig, init_deeponet
from vihmc_tpu.core.ravel import ravel_pytree
from vihmc_tpu.ops import make_gram_grad_full


def time_grad(grad_full, flat0, n_chains, reps):
    """Median wall of one chain-batched gradient dispatch (s)."""
    q = jnp.tile(flat0[None], (n_chains, 1))
    q = q + 0.01 * jax.random.normal(jax.random.key(0), q.shape, q.dtype)
    f = jax.jit(jax.vmap(grad_full))
    out = f(q)
    jax.block_until_ready(out)  # compile
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(q))
        walls.append(time.perf_counter() - t0)
    return float(np.median(walls))


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg, apply_flat, (branch_x, trunk_x, y), mu, sigma, idx, _, _ = \
        bench.build_problem(False)
    flat0, _ = ravel_pytree(init_deeponet(jax.random.key(0), cfg))
    rows = []

    def probe(name, c, n_chains, compute_dtype=None):
        grad_full, f0, _ = make_gram_grad_full(c, branch_x, trunk_x, y, 1.0,
                                               compute_dtype=compute_dtype)
        w = time_grad(grad_full, f0, n_chains, reps)
        # useful (unpadded) flops per chain-eval: fwd + vjp of both stacks
        # (~3x fwd) + the four data contractions
        b, p, k = branch_x.shape[0], trunk_x.shape[0], c.latent
        stack = sum(2 * di * do for di, do in c.branch_dims) * b \
            + sum(2 * di * do for di, do in c.trunk_dims) * p
        contr = 2 * 2 * b * p * k + 2 * (b + p) * k * k
        fl = 3 * stack + contr
        rows.append({"variant": name, "chains": n_chains,
                     "wall_ms": round(1e3 * w, 2),
                     "evals_per_s": round(n_chains / w, 1),
                     "gf_per_chain_eval": round(fl / 1e9, 2),
                     "tf_per_s": round(n_chains * fl / w / 1e12, 2)})
        print(json.dumps(rows[-1]))

    probe("f32_w100", cfg, 32)
    probe("bf16_w100", cfg, 32, compute_dtype=jnp.bfloat16)
    probe("f32_w100_c8", cfg, 8)
    probe("bf16_w100_c8", cfg, 8, compute_dtype=jnp.bfloat16)
    cfg128 = dataclasses.replace(cfg, width_branch=128, width_trunk=128,
                                 output_neurons=128)
    probe("f32_w128", cfg128, 32)
    probe("bf16_w128", cfg128, 32, compute_dtype=jnp.bfloat16)

    peak = bench._device_peak_flops()[1]
    for r in rows:
        r["mfu_vs_bf16_peak"] = round(r["tf_per_s"] * 1e12 / peak, 4) \
            if peak else None
    print(json.dumps({"rows": rows, "device": jax.devices()[0].device_kind}))


if __name__ == "__main__":
    main()
