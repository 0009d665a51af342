"""Multi-host setup: jax.distributed + global ('chains','data') meshes.

The reference has no distributed backend (SURVEY.md section 2.5); the only
cluster trace is a SLURM job id in run uids. TPU-natively, multi-host runs
initialize ``jax.distributed`` (one process per host) and build the mesh over
``jax.devices()`` — the *global* device list — so `sample_chains(mesh=...)`
shards chains across hosts with zero code change: XLA routes the 'chains'
axis over ICI within a slice and DCN across slices.

Per-host data handling: every host loads (or generates) the same dataset and
shards it identically (`shard_batch` places only the local shard on local
devices under GSPMD). Chain PRNG keys derive from fold_in(chain_index), so
chain assignment to hosts does not affect results.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           initialization_timeout: Optional[float] = None) -> bool:
    """Initialize jax.distributed if running multi-process.

    With no arguments, auto-detects the environment (TPU pods set the
    necessary metadata; SLURM via the standard env vars). Returns True if
    distributed mode was initialized, False for single-process runs.

    ``initialization_timeout`` (seconds) bounds the coordinator handshake.
    SCOPE of the graceful False-return fallback (ADVICE r3): it covers only
    NON-ZERO ranks whose coordinator TCP port is unreachable (probed with a
    plain connect below). Process 0 — and any rank whose coordinator is
    reachable but whose peers never complete the handshake — still reaches
    ``jax.distributed.initialize``, where the coordination-service client
    aborts the process at the deadline (C++ LOG(FATAL)) instead of
    returning; there is no Python-level hook to soften that path.
    ``coordinator_address`` must be ``host:port`` when the timeout fallback
    is requested (validated below).
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("SLURM_NTASKS", "0")) or None
    if process_id is None and os.environ.get("SLURM_PROCID") is not None:
        process_id = int(os.environ["SLURM_PROCID"])
    kw = {}
    if initialization_timeout is not None:
        kw["initialization_timeout"] = int(initialization_timeout)
    if (initialization_timeout is not None and coordinator_address and
            process_id not in (None, 0)):
        # graceful failure mode: the coordination-service client aborts the
        # whole process (C++ LOG(FATAL)) when the handshake deadline
        # expires, so an unreachable coordinator is probed with a plain TCP
        # connect first and degrades to a single-process False return
        import socket
        import time as _time

        host, sep, port = coordinator_address.rpartition(":")
        if not sep or not port.isdigit():
            raise ValueError(
                f"coordinator_address must be 'host:port' when "
                f"initialization_timeout is set (got {coordinator_address!r})")
        deadline = _time.time() + initialization_timeout
        reachable = False
        while _time.time() < deadline and not reachable:
            try:
                with socket.create_connection((host or "localhost", int(port)),
                                              timeout=1.0):
                    reachable = True
            except OSError:
                _time.sleep(0.2)
        if not reachable:
            return False
    try:
        if coordinator_address or (num_processes and num_processes > 1):
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id, **kw)
            return True
        # TPU pod runtimes auto-detect with no arguments
        if os.environ.get("TPU_WORKER_HOSTNAMES") and num_processes is None:
            jax.distributed.initialize()
            return jax.process_count() > 1
    except Exception:
        return False
    return False


def global_chain_mesh(n_data_shards: int = 1):
    """('chains','data') mesh over ALL processes' devices (global SPMD)."""
    import jax

    from vihmc_tpu.chains.parallel import make_chain_mesh

    return make_chain_mesh(
        n_chain_shards=len(jax.devices()) // n_data_shards,
        n_data_shards=n_data_shards,
        devices=jax.devices(),
    )


def chains_per_host(total_chains: int) -> int:
    """Even chains-per-process split (errors on remainders, mirroring the
    reference's equal-shard check for split-HMC)."""
    import jax

    n = jax.process_count()
    if total_chains % n:
        raise ValueError(f"{total_chains} chains cannot split over {n} hosts")
    return total_chains // n
