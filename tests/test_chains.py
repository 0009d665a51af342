"""Multi-chain vmap + mesh-sharded sampling and diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import HMCConfig
from vihmc_tpu.chains import (
    sample_chains,
    make_chain_mesh,
    shard_batch,
    potential_scale_reduction,
    effective_sample_size,
    summarize,
)


def std_normal_lp(q):
    return -0.5 * jnp.sum(q * q)


def test_vmap_chains_moments():
    cfg = HMCConfig(num_samples=800, num_leapfrog=8, step_size=0.35)
    inits = jnp.zeros((4, 3))
    res = sample_chains(std_normal_lp, inits, jax.random.key(0), cfg)
    assert res.samples.shape == (4, 800, 3)
    post = np.asarray(res.samples[:, 200:, :])
    np.testing.assert_allclose(post.mean((0, 1)), 0.0, atol=0.1)
    np.testing.assert_allclose(post.std((0, 1)), 1.0, atol=0.1)


def test_chains_differ_and_are_reproducible():
    cfg = HMCConfig(num_samples=50, num_leapfrog=5, step_size=0.3)
    inits = jnp.zeros((3, 2))
    r1 = sample_chains(std_normal_lp, inits, jax.random.key(1), cfg)
    r2 = sample_chains(std_normal_lp, inits, jax.random.key(1), cfg)
    np.testing.assert_array_equal(np.asarray(r1.samples), np.asarray(r2.samples))
    assert not np.allclose(np.asarray(r1.samples[0]), np.asarray(r1.samples[1]))


def test_mesh_sharded_chains_match_unsharded(devices):
    cfg = HMCConfig(num_samples=200, num_leapfrog=5, step_size=0.35)
    inits = jnp.zeros((8, 2))
    mesh = make_chain_mesh(n_chain_shards=8)
    r_mesh = sample_chains(std_normal_lp, inits, jax.random.key(2), cfg, mesh=mesh)
    r_plain = sample_chains(std_normal_lp, inits, jax.random.key(2), cfg)
    np.testing.assert_allclose(np.asarray(r_mesh.samples), np.asarray(r_plain.samples),
                               atol=1e-5)


def test_data_sharded_likelihood(devices):
    """Likelihood batch axis sharded over 'data'; XLA inserts the psum."""
    mesh = make_chain_mesh(n_chain_shards=2, n_data_shards=4)
    x = jnp.linspace(-1, 1, 64).reshape(-1, 1)
    y = 2.0 * x
    x_s, y_s = shard_batch(mesh, (x, y))

    def lp(q):
        pred = x_s @ q.reshape(1, 1)
        return -0.5 * jnp.sum((pred - y_s) ** 2) - 0.5 * jnp.sum(q * q) * 1e-2

    cfg = HMCConfig(num_samples=300, num_leapfrog=5, step_size=0.05)
    res = sample_chains(lp, jnp.zeros((2, 1)), jax.random.key(3), cfg, mesh=mesh)
    post = np.asarray(res.samples[:, 100:, 0])
    assert abs(post.mean() - 2.0) < 0.1


def test_rhat_converged_vs_not():
    key = jax.random.key(0)
    # converged: all chains from the same distribution
    good = jax.random.normal(key, (4, 500, 2))
    rhat_good = np.asarray(potential_scale_reduction(good))
    assert np.all(rhat_good < 1.05)
    # broken: one chain offset by 5
    bad = good.at[0].add(5.0)
    rhat_bad = np.asarray(potential_scale_reduction(bad))
    assert np.all(rhat_bad > 1.5)


def test_ess_iid_vs_correlated():
    key = jax.random.key(1)
    iid = jax.random.normal(key, (2, 1000, 1))
    ess_iid = float(effective_sample_size(iid)[0])
    assert ess_iid > 1200  # ~ C*S for iid draws

    # AR(1) with strong correlation -> much smaller ESS
    def ar1(key):
        eps = jax.random.normal(key, (1000,))
        def step(c, e):
            c = 0.95 * c + e
            return c, c
        _, xs = jax.lax.scan(step, 0.0, eps)
        return xs

    corr = jnp.stack([ar1(jax.random.key(2)), ar1(jax.random.key(3))])[:, :, None]
    ess_corr = float(effective_sample_size(corr)[0])
    assert ess_corr < 0.2 * ess_iid


def test_summarize_keys():
    s = jax.random.normal(jax.random.key(0), (2, 100, 3))
    out = summarize(s)
    assert set(out) == {"mean", "std", "r_hat", "ess"}
    assert out["ess"].shape == (3,)


def test_summarize_np_matches_device_version():
    from vihmc_tpu.chains import summarize_np

    s = jax.random.normal(jax.random.key(1), (3, 200, 4))
    a = summarize(s)
    b = summarize_np(np.asarray(s))
    for k in ("mean", "std", "r_hat", "ess"):
        np.testing.assert_allclose(np.asarray(a[k]), b[k], rtol=2e-4)
