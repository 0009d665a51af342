"""Orbax checkpointing of VI training state and sampler state.

Reference behavior to reproduce: checkpoint dict
``{model, optimizer, lr_sched, metrics, net}`` saved on best-validation and
every ``n_save`` epochs, restartable via ``restart`` + ``model_file``
(/root/reference/Neural_network/VI/main_regression_VI.py:301-303,328-344).
Here the checkpointed pytree is the full :class:`~vihmc_tpu.vi.train.VITrainState`
(variational params, noise param, optimizer state, plateau state, epoch) or an
HMC chain state — preemption-safe resume for long sampling runs on TPU
(SURVEY.md section 5 "Checkpoint / resume").
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, step: int, state: Any) -> str:
    """Save a pytree checkpoint under ``directory/step_<step>``."""
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    _checkpointer().save(path, jax.device_get(state), force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for d in os.listdir(directory):
        if d.startswith("step_"):
            try:
                steps.append(int(d[len("step_"):]))
            except ValueError:
                pass
    return max(steps) if steps else None


def load_checkpoint(directory: str, step: Optional[int] = None, template: Any = None) -> Any:
    """Restore a checkpoint (latest step by default). ``template`` restores
    with matching structure/dtypes when given."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    if template is not None:
        return _checkpointer().restore(path, item=jax.device_get(template))
    return _checkpointer().restore(path)
