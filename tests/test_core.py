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


def test_has_nan_or_inf_and_logprob_error():
    from vihmc_tpu.core import LogProbError, has_nan_or_inf

    assert not has_nan_or_inf({"a": jnp.ones(3), "b": 2.0})
    assert has_nan_or_inf(jnp.array([1.0, jnp.nan]))
    assert has_nan_or_inf({"a": jnp.ones(2), "b": jnp.array(jnp.inf)})
    assert has_nan_or_inf(float("-inf"))
    assert issubclass(LogProbError, RuntimeError)


def test_dense_calculus_helpers():
    from vihmc_tpu.core import gradient, hessian, jacobian

    # scalar quadratic over a pytree: grad/hessian known in closed form
    def f(tree):
        return jnp.sum(tree["x"] ** 2) + 3.0 * jnp.sum(tree["y"])

    tree = {"x": jnp.array([1.0, 2.0]), "y": jnp.array([[1.0], [4.0]])}
    flat = np.r_[np.asarray(tree["x"]), np.asarray(tree["y"]).ravel()]
    g = np.asarray(gradient(f, tree))
    np.testing.assert_allclose(g, np.r_[2.0 * flat[:2], 3.0, 3.0])
    h = np.asarray(hessian(f, tree))
    np.testing.assert_allclose(h, np.diag([2.0, 2.0, 0.0, 0.0]))

    # vector output -> dense (O, D) jacobian
    def vf(tree):
        return {"out": tree["x"] * tree["y"].ravel()}

    j = np.asarray(jacobian(vf, tree))
    assert j.shape == (2, 4)
    np.testing.assert_allclose(j[0], [flat[2], 0.0, flat[0], 0.0])
    np.testing.assert_allclose(j[1], [0.0, flat[3], 0.0, flat[1]])
