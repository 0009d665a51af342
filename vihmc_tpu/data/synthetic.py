"""Synthetic 1-D regression data: y = 4 sin(4x) + 5 cos(12x) + noise.

Matches the reference generator
(/root/reference/Neural_network/HMC/main_regression_hmc.py:25-60): validation
on a uniform grid over [-1.2, 1.2], training on two segments
[-1, -0.2] and [0.2, 1] (a gap around 0 so the posterior shows genuine
epistemic uncertainty there), Gaussian noise with std 1/sqrt(tau_out).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _f(x):
    return 4.0 * jnp.sin(4.0 * x) + 5.0 * jnp.cos(12.0 * x)


def regression_data(key, n_train: int = 20, n_val: int = 300, noise_std: float = 0.05):
    """Returns dict with x_train (N,1), y_train (N,1), x_val (M,1), y_val (M,1)."""
    x_val = jnp.linspace(-1.2, 1.2, n_val).reshape(-1, 1)
    y_val = _f(x_val)
    x_train = jnp.concatenate(
        [jnp.linspace(-1.0, -0.2, n_train // 2), jnp.linspace(0.2, 1.0, n_train // 2)]
    ).reshape(-1, 1)
    y_train = _f(x_train) + noise_std * jax.random.normal(key, x_train.shape)
    return {"x_train": x_train, "y_train": y_train, "x_val": x_val, "y_val": y_val}


def load_reference_regression_data(data_dir: str):
    """Load the reference's pickled tensors (20 train / 300 val points,
    /root/reference/Neural_network/Data) for bit-comparable parity runs.
    Requires torch; returns the same dict as :func:`regression_data`."""
    import os
    import torch

    out = {}
    for name in ("x_train", "y_train", "x_val", "y_val"):
        path = os.path.join(data_dir, name)
        with torch.no_grad():
            out[name] = jnp.asarray(torch.load(path, map_location="cpu").numpy())
    return out
