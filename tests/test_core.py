import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.core import (
    ravel_pytree,
    segment_sizes,
    segment_slices,
    per_segment_vector,
    scatter_subspace,
    gather_subspace,
)


def _tree():
    return {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(4), "c": jnp.zeros(())}


def test_ravel_roundtrip():
    tree = _tree()
    flat, unravel = ravel_pytree(tree)
    assert flat.shape == (11,)
    back = unravel(flat)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tree[k]))


def test_segment_sizes_and_slices():
    tree = _tree()
    assert sum(segment_sizes(tree)) == 11
    slices = segment_slices(tree)
    assert slices[0][0] == 0 and slices[-1][1] == 11
    # contiguous, non-overlapping
    for (s0, e0), (s1, e1) in zip(slices[:-1], slices[1:]):
        assert e0 == s1


def test_per_segment_vector():
    tree = _tree()
    sizes = segment_sizes(tree)
    vec = per_segment_vector(tree, [1.0, 2.0, 3.0])
    assert vec.shape == (11,)
    start = 0
    for n, v in zip(sizes, [1.0, 2.0, 3.0]):
        np.testing.assert_allclose(np.asarray(vec[start:start + n]), v)
        start += n


def test_scatter_gather_roundtrip():
    frozen = jnp.arange(10.0)
    idx = jnp.array([1, 4, 7])
    sub = jnp.array([-1.0, -2.0, -3.0])
    full = scatter_subspace(frozen, sub, idx)
    np.testing.assert_allclose(np.asarray(gather_subspace(full, idx)), np.asarray(sub))
    # untouched coordinates preserved
    mask = np.ones(10, bool)
    mask[[1, 4, 7]] = False
    np.testing.assert_allclose(np.asarray(full)[mask], np.arange(10.0)[mask])


def test_scatter_is_jittable_with_static_idx():
    idx = jnp.array([0, 2])

    @jax.jit
    def f(frozen, sub):
        return scatter_subspace(frozen, sub, idx)

    out = f(jnp.zeros(4), jnp.array([5.0, 6.0]))
    np.testing.assert_allclose(np.asarray(out), [5.0, 0.0, 6.0, 0.0])
