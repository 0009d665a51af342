"""Pallas kernel correctness (interpret mode on CPU; compiled path on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.ops import (
    fused_leapfrog_update,
    leapfrog_update_reference,
    fused_merge_nll,
    merge_nll_reference,
)


def test_leapfrog_kernel_matches_reference_interpret():
    rng = np.random.default_rng(0)
    d = 5000  # non-multiple of the block size -> exercises padding
    q = jnp.asarray(rng.normal(size=d), jnp.float32)
    p = jnp.asarray(rng.normal(size=d), jnp.float32)
    g = jnp.asarray(rng.normal(size=d), jnp.float32)
    im = jnp.asarray(0.5 + rng.random(d), jnp.float32)
    eps = 1e-2
    q_ref, p_ref = leapfrog_update_reference(q, p, g, eps, im)
    q_k, p_k = fused_leapfrog_update(q, p, g, eps, im, interpret=True)
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_ref), atol=1e-6)


def test_leapfrog_kernel_scalar_mass():
    q = jnp.ones(100); p = jnp.zeros(100); g = jnp.ones(100)
    q_k, p_k = fused_leapfrog_update(q, p, g, 0.1, None, interpret=True)
    np.testing.assert_allclose(np.asarray(p_k), 0.05, atol=1e-6)
    np.testing.assert_allclose(np.asarray(q_k), 1.0 + 0.1 * 0.05, atol=1e-6)


def test_merge_nll_kernel_matches_reference_interpret():
    rng = np.random.default_rng(1)
    b, p, k = 256, 512, 128  # tileable shapes
    bout = jnp.asarray(rng.normal(size=(b, k)) * 0.1, jnp.float32)
    tout = jnp.asarray(rng.normal(size=(p, k)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, p)) * 0.1, jnp.float32)
    bias = jnp.asarray(0.3, jnp.float32)
    want = float(merge_nll_reference(bout, tout, bias, y, 1.0))
    got = float(fused_merge_nll(bout, tout, bias, y, 1.0, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_merge_nll_fallback_non_tileable():
    rng = np.random.default_rng(2)
    bout = jnp.asarray(rng.normal(size=(7, 5)), jnp.float32)
    tout = jnp.asarray(rng.normal(size=(11, 5)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(7, 11)), jnp.float32)
    got = float(fused_merge_nll(bout, tout, 0.1, y, 0.5))
    want = float(merge_nll_reference(bout, tout, 0.1, y, 0.5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_merge_nll_padded_matches_reference_interpret():
    """Non-tile-aligned shapes route through the padded kernel (interpret)."""
    rng = np.random.default_rng(4)
    b, p, k = 100, 300, 100  # all misaligned (the reference-scale pattern)
    bout = jnp.asarray(rng.normal(size=(b, k)) * 0.1, jnp.float32)
    tout = jnp.asarray(rng.normal(size=(p, k)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, p)) * 0.1, jnp.float32)
    bias = jnp.asarray(-0.7, jnp.float32)
    want = float(merge_nll_reference(bout, tout, bias, y, 0.8))
    got = float(fused_merge_nll(bout, tout, bias, y, 0.8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-5)

    # gradients through the padded path
    g_f = jax.grad(lambda bo, to, bi: fused_merge_nll(bo, to, bi, y, 0.8,
                                                      interpret=True),
                   argnums=(0, 1, 2))(bout, tout, bias)
    g_r = jax.grad(lambda bo, to, bi: merge_nll_reference(bo, to, bi, y, 0.8),
                   argnums=(0, 1, 2))(bout, tout, bias)
    for a, b_ in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=2e-4)


def test_merge_nll_gradients_match():
    """Custom VJP of the fused op == autodiff of the reference."""
    rng = np.random.default_rng(3)
    b, p, k = 256, 256, 128
    bout = jnp.asarray(rng.normal(size=(b, k)) * 0.1, jnp.float32)
    tout = jnp.asarray(rng.normal(size=(p, k)) * 0.1, jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, p)) * 0.1, jnp.float32)

    def f_fused(bo, to, bi):
        return fused_merge_nll(bo, to, bi, y, 1.0, interpret=True)

    def f_ref(bo, to, bi):
        return merge_nll_reference(bo, to, bi, y, 1.0)

    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(bout, tout, jnp.asarray(0.2))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(bout, tout, jnp.asarray(0.2))
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
