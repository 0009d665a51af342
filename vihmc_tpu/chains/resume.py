"""Preemption-safe sampling: chunked scans with checkpointed sampler state.

The reference persists only final sample arrays keyed by run uid (SURVEY.md
section 5 "Checkpoint / resume"); long TPU runs need mid-run resume. A scan
cannot checkpoint from inside jit, so the chain is split into segments: each
segment is one compiled scan, and between segments the full sampler state
(positions, log-probs, grads, dual-averaging state, frozen vectors, sample
count) plus collected samples are written via orbax. Restart picks up at the
last completed segment — bitwise-identical to an uninterrupted run because
per-segment PRNG keys derive from (base key, segment index).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc.kernel import HMCConfig, SampleResult, make_kernel, init_state
from vihmc_tpu.hmc.metric import as_inv_mass
from vihmc_tpu.io.checkpoint import save_checkpoint, load_checkpoint, latest_step


@functools.lru_cache(maxsize=64)
def _build_segment_runner(log_prob_fn, config: HMCConfig, segment_size: int,
                          aux_refresh, grad_fn=None, delta_fn=None):
    """One compiled scan of ``segment_size`` draws, reused across segments AND
    across calls (the kernel never reads ``config.num_samples``, so it is
    normalized out of the cache key). Array inputs (state, key, inv_mass) are
    traced arguments, mirroring ``parallel._build_chain_sampler``."""

    def run_segment(state, seg_idx, key, inv_mass):
        kernel = make_kernel(log_prob_fn, config, inv_mass=inv_mass,
                             aux_refresh=aux_refresh, grad_fn=grad_fn,
                             delta_fn=delta_fn)
        seg_key = jax.random.fold_in(key, seg_idx)
        n_chains = state.position.shape[0]

        def one_chain(chain_state, chain_idx):
            ck = jax.random.fold_in(seg_key, chain_idx)
            start = seg_idx * segment_size

            def step(st, xs):
                k, i = xs
                st, info = kernel(st, k, i)
                return st, {"position": st.position, **info}

            keys = jax.random.split(ck, segment_size)
            iters = start + jnp.arange(segment_size)
            return jax.lax.scan(step, chain_state, (keys, iters))

        return jax.vmap(one_chain, axis_name="chains")(state,
                                                       jnp.arange(n_chains))

    return jax.jit(run_segment)


def sample_chains_resumable(
    log_prob_fn,
    init_positions,
    key,
    config: HMCConfig,
    segment_size: int,
    checkpoint_dir: Optional[str] = None,
    inv_mass=1.0,
    aux=None,
    aux_refresh=None,
    progress: Optional[callable] = None,
    grad_fn=None,
    thin: int = 1,
    delta_fn=None,
):
    """Like :func:`vihmc_tpu.chains.sample_chains` but in checkpointed segments.

    ``config.num_samples`` total draws split into ceil(N/segment_size)
    segments. With ``checkpoint_dir`` set, state + samples persist after every
    segment and an interrupted run resumes automatically.

    ``thin``: keep every ``thin``-th draw in the returned/persisted sample
    array (the sampler state advances through every draw; per-draw info
    arrays stay unthinned). For reference-scale subspaces (~81k dims) a
    month of draws doesn't fit host RAM or checkpoint IO unthinned; with
    ``thin`` well below the autocorrelation time the pooled-ESS estimate is
    unchanged (tau shrinks by the same factor the sample count does).
    Requires ``segment_size % thin == 0`` so segments stay aligned.
    """
    n_chains, d = init_positions.shape
    n_total = config.num_samples
    n_segments = -(-n_total // segment_size)
    if thin < 1 or segment_size % thin:
        raise ValueError("thin must divide segment_size")

    inv_mass = as_inv_mass(inv_mass)
    runner = _build_segment_runner(
        log_prob_fn, dataclasses.replace(config, num_samples=0), segment_size,
        aux_refresh, grad_fn, delta_fn)

    def run_segment(state, seg_idx):
        return runner(state, jnp.asarray(seg_idx), key, inv_mass)

    # initial or resumed state (samples are stored as plain .npy next to the
    # orbax state checkpoint; the state restores against a live template so
    # the flax struct / optax types survive the round trip)
    start_seg = 0
    collected = []
    state = jax.vmap(
        lambda q, i: init_state(log_prob_fn, q, config, aux=aux,
                                inv_mass=inv_mass, grad_fn=grad_fn,
                                key=jax.random.fold_in(key, i))
    )(init_positions, jnp.arange(n_chains, dtype=jnp.uint32) + jnp.uint32(0x1517))
    if checkpoint_dir is not None:
        step0 = latest_step(checkpoint_dir)
        if step0 is not None:
            payload = load_checkpoint(checkpoint_dir, step0,
                                      template={"state": state})
            state = jax.tree_util.tree_map(jnp.asarray, payload["state"])
            legacy = os.path.join(checkpoint_dir, "samples.npy")
            seg_files = sorted(
                f for f in os.listdir(checkpoint_dir)
                if f.startswith("samples_seg") and f.endswith(".npy"))
            if seg_files:
                collected = [np.load(os.path.join(checkpoint_dir, f))
                             for f in seg_files[:step0]]
            elif os.path.exists(legacy):  # pre-round-2 layout
                collected = [np.load(legacy)]
            start_seg = step0

    infos = {"accepted": [], "accept_prob": [], "step_size": [], "divergent": [],
             "log_prob": []}
    for seg in range(start_seg, n_segments):
        state, outs = run_segment(state, seg)
        pos = outs["position"]  # (C, seg, D) on device
        if thin > 1:
            # thin ON DEVICE before the host transfer: at the 90%-subspace
            # scale the unthinned (32, 60, 81k) segment is hundreds of MB
            # and the host link (a tunnel on this backend) is the sampler's
            # measured bottleneck — moving thin x less data is a pure win
            pos = pos[:, thin - 1::thin]
        seg_samples = np.asarray(pos)
        collected.append(seg_samples)
        for k in infos:
            infos[k].append(np.asarray(outs[k]))
        if progress is not None:
            progress(seg + 1, n_segments, state)
        if checkpoint_dir is not None:
            save_checkpoint(checkpoint_dir, seg + 1, {"state": jax.device_get(state)})
            # one file per segment: O(segment) IO instead of rewriting the
            # whole growing history every segment
            np.save(os.path.join(checkpoint_dir, f"samples_seg{seg:05d}.npy"),
                    seg_samples)

    samples = np.concatenate(collected, axis=1)[:, :n_total // thin]
    out_infos = {k: (np.concatenate(v, axis=1)[:, :n_total] if v else
                     np.zeros((n_chains, 0))) for k, v in infos.items()}
    # note: on resume the per-draw info arrays cover only the segments run in
    # this process; samples are always complete. The collected history stays
    # HOST-side (numpy): re-wrapping with jnp.asarray would push the full
    # (C, S, D) history back through the device link just for the caller to
    # pull it out again — a measured 2x round trip of the entire sample
    # history at reference scale. numpy arrays satisfy every downstream
    # consumer (diagnostics are *_np; jnp ops accept numpy operands).
    return SampleResult(
        samples=samples,
        log_probs=out_infos["log_prob"],
        accept_probs=out_infos["accept_prob"],
        accepted=out_infos["accepted"],
        step_sizes=out_infos["step_size"],
        divergent=out_infos["divergent"],
        final_state=state,
    )
