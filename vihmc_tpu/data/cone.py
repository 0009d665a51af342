"""Cone dataset support: the reference's second (never-shipped) operator workload.

Throughout the reference, every pipeline carries a ``dataset = 'Cone'`` code
path whose actual loader raises ``NotImplementedError``
(/root/reference/Operator_network/VI/utils.py:54-55,
/root/reference/Operator_network/HMC/util.py:441-443), while the surrounding
surface is fully present:

* dict-structured batches ``{'Xf', 'Xp', 'Y'}`` — branch input ``Xf`` (a
  sensed profile), a *per-example* 2-feature query ``Xp``, scalar target
  ``Y`` (/root/reference/Operator_network/VI/main_VI_deeponet.py:59-63,
  metrics.py:41-45, sensitivity.py:52-55);
* min-max normalization with recorded dataset statistics
  (``normalize_data``/``data_normalize``,
  /root/reference/Operator_network/VI/utils.py:60-80,
  /root/reference/Operator_network/HMC/NUTS_DeepOnets.py:27-47) — note the
  reference's convention is ``(x - max)/(max - min)`` (range [-1, 0]), which
  is reproduced verbatim here for artifact compatibility;
* no trunk subsampling ("Always false for cone",
  /root/reference/Operator_network/VI_HMC/config.py:23);
* 988 validation examples hinted at
  /root/reference/Operator_network/VI/sensitivity.py:87.

This module makes the capability real: the recorded normalization, a loader
for a user-supplied ``.mat``/``.npz`` with the reference's keys, a synthetic
generator so the path is exercisable without the (unavailable) original data,
and an adapter to the operator-pipeline split layout where ``Xp`` becomes a
per-example single query point — the DeepONet's batched-einsum merge path
(models/deeponet.py) rather than the shared-grid MXU matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConeStats:
    """Min/max normalization statistics.

    Defaults are the reference's recorded Cone dataset statistics
    (/root/reference/Operator_network/VI/utils.py:61-66).
    """

    xp_min: tuple = (0.241, 50.0)
    xp_max: tuple = (3.16e-01, 5.00e+02)
    xf_min: tuple = (-3.38642632,)
    xf_max: tuple = (3.09895004,)
    y_min: tuple = (-0.66139158,)
    y_max: tuple = (2.27885358,)


CONE_STATS = ConeStats()


def _norm(x, lo, hi):
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    # reference convention: (x - max)/(max - min) -> [-1, 0]
    return (x - hi) / (hi - lo)


def normalize_cone(feat: dict, stats: ConeStats = CONE_STATS) -> dict:
    """Normalize a ``{'Xf','Xp','Y'}`` dict (reference ``normalize_data``,
    /root/reference/Operator_network/VI/utils.py:60-71)."""
    out = dict(feat)
    out["Xf"] = _norm(feat["Xf"], stats.xf_min, stats.xf_max)
    out["Xp"] = _norm(feat["Xp"], stats.xp_min, stats.xp_max)
    out["Y"] = _norm(feat["Y"], stats.y_min, stats.y_max)
    return out


def normalize_cone_inputs(Xf, Xp, stats: ConeStats = CONE_STATS):
    """Inputs-only variant (reference ``data_normalize``,
    /root/reference/Operator_network/VI/utils.py:74-80)."""
    return (_norm(Xf, stats.xf_min, stats.xf_max),
            _norm(Xp, stats.xp_min, stats.xp_max))


def generate_cone_dataset(key, n: int, in_branch: int = 101) -> dict:
    """Synthetic stand-in in *physical* units (the original data is not
    distributable; the reference itself ships no loader).

    ``Xf``: smooth periodic profiles within the recorded [-3.39, 3.10] range;
    ``Xp``: uniform over the recorded physical box [0.241, 0.316] x [50, 500];
    ``Y``: a smooth nonlinear functional of (Xf, Xp) landing in the recorded
    output range — enough structure for an operator network to learn and for
    pipelines/tests to run end-to-end.
    """
    kf, kf2, kp, ky = jax.random.split(key, 4)
    # smooth profiles: few random Fourier modes over the sensor grid
    grid = jnp.linspace(0.0, 1.0, in_branch)
    modes = jnp.arange(1, 7, dtype=jnp.float32)
    amp = jax.random.normal(kf, (n, 6)) / modes
    phase = jax.random.uniform(kf2, (n, 6), minval=0.0, maxval=2 * jnp.pi)
    xf = jnp.sum(amp[:, :, None] * jnp.sin(
        2 * jnp.pi * modes[None, :, None] * grid[None, None, :] + phase[:, :, None]),
        axis=1)
    xf = jnp.clip(xf, -3.3, 3.0)

    u = jax.random.uniform(kp, (n, 2))
    xp = jnp.stack([0.241 + u[:, 0] * (0.316 - 0.241),
                    50.0 + u[:, 1] * (500.0 - 50.0)], axis=-1)

    xp0n = (xp[:, 0] - 0.241) / (0.316 - 0.241)
    xp1n = jnp.log(xp[:, 1] / 50.0) / jnp.log(10.0)
    y = (0.8 + 0.9 * jnp.tanh(xf.mean(-1))
         + 0.45 * xp0n * xp1n
         + 0.3 * jnp.sin(2 * jnp.pi * xp0n)
         + 0.15 * jnp.sqrt(jnp.mean(xf * xf, -1)))
    y = y + 0.01 * jax.random.normal(ky, y.shape)
    return {"Xf": xf, "Xp": xp, "Y": y}


def load_cone(path: Optional[str], n_train: int, n_valid: int):
    """Load a user-supplied Cone dataset (``.mat`` or ``.npz`` with keys
    ``Xf``/``Xp``/``Y`` in physical units), normalize with the recorded
    statistics, and split train/valid.

    With ``path=None`` this raises the reference's error verbatim
    (/root/reference/Operator_network/HMC/util.py:441-443) — the original
    data was never shipped; use :func:`generate_cone_dataset` instead.
    """
    if path is None:
        raise NotImplementedError("Cone dataset is not available")
    if str(path).endswith(".mat"):
        import scipy.io

        raw = scipy.io.loadmat(path)
    else:
        raw = np.load(path)
    feat = {k: np.asarray(raw[k], np.float32) for k in ("Xf", "Xp", "Y")}
    n = feat["Xf"].shape[0]
    if n < n_train + n_valid:
        raise ValueError(f"Cone dataset has {n} examples; "
                         f"n_train + n_valid = {n_train + n_valid} requested")
    feat["Y"] = feat["Y"].reshape(n)
    feat = normalize_cone(feat)
    train = {k: v[:n_train] for k, v in feat.items()}
    valid = {k: v[n_train:n_train + n_valid] for k, v in feat.items()}
    return train, valid


def cone_to_operator_splits(feat: dict) -> dict:
    """Adapt a ``{'Xf','Xp','Y'}`` dict to the operator-pipeline split layout:
    ``branch_in`` (N, F), per-example ``trunk_in`` (N, 1, 2), ``solution``
    (N, 1). Downstream this selects the DeepONet's per-example-query merge
    (models/deeponet.py batched einsum) and disables trunk subsampling."""
    return {
        "branch_in": jnp.asarray(feat["Xf"], jnp.float32),
        "trunk_in": jnp.asarray(feat["Xp"], jnp.float32)[:, None, :],
        "solution": jnp.asarray(feat["Y"], jnp.float32)[:, None],
    }


def get_cone(key, n_train: int, n_valid: int, path: Optional[str] = None,
             in_branch: int = 101):
    """(train_split, valid_split) in operator layout: from ``path`` when the
    user has the data, else generated + normalized."""
    if path is not None:
        train, valid = load_cone(path, n_train, n_valid)
    else:
        feat = generate_cone_dataset(key, n_train + n_valid, in_branch)
        feat = normalize_cone(jax.tree_util.tree_map(np.asarray, feat))
        train = {k: v[:n_train] for k, v in feat.items()}
        valid = {k: v[n_train:] for k, v in feat.items()}
    return cone_to_operator_splits(train), cone_to_operator_splits(valid)
