"""Matmul precision policy for TPU.

TPU MXU matmuls on float32 inputs are bf16-accumulated at DEFAULT precision.
That is the right trade for VI training throughput, but Hamiltonian energy
differences feed a Metropolis accept/reject and benefit from full-fp32
("highest") matmuls; HMC log-prob evaluation therefore defaults to HIGHEST
(see SURVEY.md section 7.3 "TPU numerics").
"""

from __future__ import annotations

import contextlib

import jax

#: precision used inside sampler log-prob/grad evaluation
SAMPLER_PRECISION = "highest"
#: precision used for VI training forward/backward
TRAIN_PRECISION = "default"


@contextlib.contextmanager
def matmul_precision(mode: str):
    """Context manager pinning jax default matmul precision ('default'|'high'|'highest')."""
    with jax.default_matmul_precision(mode):
        yield
