"""Dense calculus + NaN-guard helpers (vendored-hamiltorch-util parity).

The reference vendors generic autograd helpers in its three ``util.py``
copies — ``gradient``/``hessian``/``jacobian`` building dense derivative
arrays of a scalar/vector function over a pytree of inputs
(/root/reference/Neural_network/VI_HMC/util.py:145-235) and the NaN/Inf
guard pair ``has_nan_or_inf`` / ``LogProbError``
(/root/reference/Neural_network/VI_HMC/util.py:106-117) that turns a
non-finite log-prob into a rejected HMC proposal.

TPU-natively these are thin compositions of JAX transforms: derivatives are
functional (``jax.grad``/``jax.jacrev``/``jax.hessian``) instead of
graph-walking, and each helper flattens pytree inputs to one dense array so
callers get the same "one flat matrix" shape contract the reference's
helpers produce. The sampler itself never raises on NaN — non-finite
Hamiltonians reject inside the compiled kernel (``hmc/kernel.py``) — but the
guard is exposed for host-side pipeline code and API parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vihmc_tpu.core.ravel import ravel_pytree


class LogProbError(RuntimeError):
    """A log-probability evaluation produced NaN/Inf (reference util.py:117)."""


def has_nan_or_inf(value) -> bool:
    """True if any leaf of ``value`` contains NaN or +-Inf (host-side).

    Mirrors the reference's guard (util.py:106-114) over arrays, scalars,
    and arbitrary pytrees. Not for use inside jit — the kernel handles
    non-finite energies with ``jnp.isfinite`` masking instead.
    """
    for leaf in jax.tree_util.tree_leaves(value):
        if not bool(jnp.all(jnp.isfinite(jnp.asarray(leaf)))):
            return True
    return False


def _flat_fn(fn, example):
    flat0, unravel = ravel_pytree(example)
    return lambda flat: fn(unravel(flat)), flat0


def gradient(fn, inputs):
    """Dense gradient of scalar ``fn`` at pytree ``inputs`` -> (D,) array.

    Functional analog of the reference's ``gradient(outputs, inputs)``
    (util.py:145-160): the result is one flat vector over every input leaf,
    in ravel order.
    """
    flat_fn, flat0 = _flat_fn(fn, inputs)
    return jax.grad(flat_fn)(flat0)


def jacobian(fn, inputs):
    """Dense Jacobian of ``fn`` at pytree ``inputs`` -> (O, D) array.

    Functional analog of the reference's ``jacobian(outputs, inputs)``
    (util.py:207-235): outputs are flattened to one axis of size O, inputs
    ravel to D.
    """
    flat_fn, flat0 = _flat_fn(fn, inputs)
    jac = jax.jacrev(lambda f: ravel_pytree(flat_fn(f))[0])(flat0)
    return jac


def hessian(fn, inputs):
    """Dense Hessian of scalar ``fn`` at pytree ``inputs`` -> (D, D) array.

    Functional analog of the reference's ``hessian(output, inputs)``
    (util.py:164-204).
    """
    flat_fn, flat0 = _flat_fn(fn, inputs)
    return jax.hessian(flat_fn)(flat0)
