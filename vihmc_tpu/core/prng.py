"""PRNG threading helpers.

The reference mixes a fixed ``torch.manual_seed(0)`` in VI with *time-based*
seeding at import in the HMC utils (/root/reference/Neural_network/VI_HMC/util.py:13-25).
Here every source of randomness is an explicit ``jax.random`` key threaded
through the computation, so runs are reproducible and chains are independent
by construction (``fold_in`` per chain / per iteration).
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp


def split_like(key, tree):
    """One fresh key per leaf of ``tree``, returned as a matching pytree."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))


def fold_in_str(key, name: str):
    """Deterministically derive a named subkey (stable across processes)."""
    h = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")
    return jax.random.fold_in(key, jnp.uint32(h))
