"""Flat-vector <-> pytree raveling and subspace scatter/gather.

The reference keeps 6 duplicated ``flatten``/``unflatten`` helpers
(e.g. /root/reference/Neural_network/VI_HMC/util.py:121-141,
/root/reference/Operator_network/VI/utils.py:95-111); here the single source
of truth is ``jax.flatten_util.ravel_pytree``, which returns a jit-compatible
unravel closure with static shapes — the form XLA wants.

Subspace HMC (VI-HMC) samples only a *sensitive* coordinate subset of the flat
parameter vector; the insensitive coordinates stay frozen at VI-posterior
values (reference scatter: /root/reference/Operator_network/VI/my_make_func.py:51-53).
``scatter_subspace``/``gather_subspace`` implement that with static index sets
so the whole log-posterior compiles to one fused XLA computation.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def segment_sizes(tree) -> list[int]:
    """Number of elements in each leaf of ``tree`` (traversal order)."""
    return [int(np.prod(np.shape(leaf))) for leaf in jax.tree_util.tree_leaves(tree)]


def segment_slices(tree) -> list[tuple[int, int]]:
    """(start, stop) index ranges of each leaf inside the raveled vector."""
    out, start = [], 0
    for n in segment_sizes(tree):
        out.append((start, start + n))
        start += n
    return out


def per_segment_vector(tree, values) -> jnp.ndarray:
    """Broadcast one scalar per leaf into a flat vector matching ``ravel_pytree(tree)``.

    Used to build per-tensor prior scale vectors (the reference builds a
    Python list of per-tensor ``tau`` values and loops over distributions,
    /root/reference/Neural_network/HMC/main_regression_hmc.py:118-121; here it
    is a single elementwise op over the flat vector).
    """
    sizes = segment_sizes(tree)
    vals = list(values)
    if len(vals) != len(sizes):
        raise ValueError(f"{len(vals)} values for {len(sizes)} leaves")
    parts = [jnp.full((n,), v, dtype=jnp.result_type(float)) for n, v in zip(sizes, vals)]
    return jnp.concatenate(parts) if parts else jnp.zeros((0,))


def scatter_subspace(frozen: jnp.ndarray, sub: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Place subspace coordinates ``sub`` into the full vector at ``idx``.

    ``idx`` must be static (constant per compilation) for XLA to lower this to
    a dynamic-update-free scatter.
    """
    return frozen.at[idx].set(sub)


def gather_subspace(full: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Extract subspace coordinates from a full flat vector."""
    return full[idx]
