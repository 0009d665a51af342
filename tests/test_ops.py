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


def test_paired_delta_kernel_matches_reference_interpret():
    """Fused paired-delta accumulators + host bias closure == materialized
    reference (non-tile-aligned shapes exercise the padding closure)."""
    import numpy as np
    from vihmc_tpu.ops.deeponet_merge import (fused_paired_delta,
                                              paired_delta_reference)

    rng = np.random.default_rng(5)
    b, p, k = 130, 301, 12
    bout0 = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    tout0 = jnp.asarray(rng.normal(size=(p, k)), jnp.float32)
    # q1 one small step from q0: the regime the paired form exists for
    bout1 = bout0 + jnp.asarray(1e-3 * rng.normal(size=(b, k)), jnp.float32)
    tout1 = tout0 + jnp.asarray(1e-3 * rng.normal(size=(p, k)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, p)), jnp.float32)
    b0, b1 = 0.31, 0.34
    want_d, want_lp1 = paired_delta_reference(bout1, tout1, b1, bout0, tout0,
                                              b0, y, 0.7)
    got_d, got_lp1 = fused_paired_delta(bout1, tout1, b1, bout0, tout0, b0,
                                        y, 0.7, interpret=True)
    np.testing.assert_allclose(float(got_d), float(want_d), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(float(got_lp1), float(want_lp1), rtol=1e-5)


def test_paired_delta_kernel_vmap_batched():
    """vmap over chains hits the chain-batched kernel and matches per-chain
    reference results."""
    import numpy as np
    from vihmc_tpu.ops.deeponet_merge import (_make_paired_sums,
                                              paired_delta_reference)

    rng = np.random.default_rng(6)
    c, b, p, k = 3, 256, 256, 8
    bout0 = jnp.asarray(rng.normal(size=(c, b, k)), jnp.float32)
    tout0 = jnp.asarray(rng.normal(size=(c, p, k)), jnp.float32)
    bout1 = bout0 + 1e-3
    tout1 = tout0 - 1e-3
    y = jnp.asarray(rng.normal(size=(b, p)), jnp.float32)
    paired = _make_paired_sums(True)
    outs = jax.vmap(lambda a1, t1, a0, t0: paired(a1, t1, a0, t0, y))(
        bout1, tout1, bout0, tout0)
    for ci in range(c):
        m1 = bout1[ci] @ tout1[ci].T
        m0 = bout0[ci] @ tout0[ci].T
        np.testing.assert_allclose(float(outs[0][ci]),
                                   float(jnp.sum((m1 - m0) * (m1 + m0 - 2 * y))),
                                   rtol=2e-4, atol=1e-2)
        np.testing.assert_allclose(float(outs[3][ci]),
                                   float(jnp.sum(m1 * m1)), rtol=1e-5)


def test_fused_paired_subspace_delta_matches_composed():
    """Pipeline wrapper (interpret kernel) == composed paired evaluator on a
    tiny DeepONet posterior."""
    import numpy as np
    from vihmc_tpu.dists.priors import DiagonalGaussianPrior
    from vihmc_tpu.hmc import SubspaceSpec
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines.common import (make_flat_deeponet,
                                            make_fused_paired_subspace_delta,
                                            make_paired_subspace_delta)

    cfg = DeepONetConfig(in_branch=7, in_trunk=5, width_branch=16,
                         width_trunk=16, depth_branch=2, depth_trunk=2)
    apply_flat, flat0, _ = make_flat_deeponet(cfg)
    rng = np.random.default_rng(7)
    bx = jnp.asarray(rng.normal(size=(9, 7)), jnp.float32)
    tx = jnp.asarray(rng.uniform(size=(11, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(9, 11)), jnp.float32)
    d = flat0.shape[0]
    mu = jnp.asarray(0.05 * rng.normal(size=d), jnp.float32)
    sigma = jnp.asarray(0.05 + 0.02 * rng.random(d), jnp.float32)
    idx = np.sort(rng.choice(d, size=24, replace=False))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())
    composed = make_paired_subspace_delta(apply_flat, bx, tx, y, 0.9, spec,
                                          prior)
    fused = make_fused_paired_subspace_delta(cfg, bx, tx, y, 0.9, spec,
                                             prior, interpret=True)
    aux = mu + 0.0
    q0 = spec.sub_mu()
    q1 = q0 + jnp.asarray(1e-2 * rng.normal(size=len(idx)), jnp.float32)
    dll_c, lp1_c = composed(q1, q0, aux)
    dll_f, lp1_f = fused(q1, q0, aux)
    np.testing.assert_allclose(float(dll_f), float(dll_c), rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(float(lp1_f), float(lp1_c), rtol=1e-4,
                               atol=1e-2)
