"""Multi-chain vmap + mesh-sharded sampling and diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_query_sharded_likelihood_matches_unsharded(devices):
    """DeepONet QUERY/trunk axis sharded over 'data' (shard_query — the
    sequence-parallel analog, SURVEY 2.5 / VERDICT r3 item 8): the sharded
    log-posterior, its gradient, and a short sampling run must match the
    unsharded computation."""
    from vihmc_tpu.chains import shard_query
    from vihmc_tpu.models import DeepONetConfig
    from vihmc_tpu.pipelines.common import make_flat_deeponet

    mesh = make_chain_mesh(n_chain_shards=2, n_data_shards=4)
    cfg = DeepONetConfig(in_branch=5, in_trunk=5, width_branch=6,
                         width_trunk=6, depth_branch=2, depth_trunk=2)
    apply_flat, flat0, _ = make_flat_deeponet(cfg)
    rng = np.random.default_rng(0)
    b, p = 6, 32
    branch_x = jnp.asarray(rng.normal(size=(b, cfg.in_branch)), jnp.float32)
    trunk_x = jnp.asarray(rng.uniform(size=(p, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, p)), jnp.float32)
    trunk_s, y_s = shard_query(mesh, trunk_x, y)

    def make_lp(tx, yy):
        def lp(q):
            pred = apply_flat(q, branch_x, tx)
            return (-0.5 * jnp.sum((pred - yy) ** 2)
                    - 0.5 * jnp.sum(q * q) * 1e-2)
        return lp

    lp_u, lp_s = make_lp(trunk_x, y), make_lp(trunk_s, y_s)
    v_u, g_u = jax.jit(jax.value_and_grad(lp_u))(flat0)
    v_s, g_s = jax.jit(jax.value_and_grad(lp_s))(flat0)
    assert float(v_s) == pytest.approx(float(v_u), rel=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_u),
                               rtol=1e-4, atol=1e-6)

    cfg_h = HMCConfig(num_samples=20, num_leapfrog=3, step_size=1e-3)
    inits = jnp.tile(flat0[None], (2, 1))
    r_u = sample_chains(lp_u, inits, jax.random.key(7), cfg_h)
    r_s = sample_chains(lp_s, inits, jax.random.key(7), cfg_h, mesh=mesh)
    np.testing.assert_allclose(np.asarray(r_s.samples),
                               np.asarray(r_u.samples), rtol=1e-3, atol=1e-5)


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


def _ar1_np(rho, c, s, d, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    eps = rng.normal(size=(c, s, d)) * np.sqrt(1 - rho ** 2)
    x = np.zeros((c, s, d))
    x[:, 0] = rng.normal(size=(c, d))
    for t in range(1, s):
        x[:, t] = rho * x[:, t - 1] + eps[:, t]
    return x


def test_ess_bulk_matches_ar1_theory():
    """Rank-normalized bulk ESS on a known AR(1) chain: tau = (1+rho)/(1-rho),
    so ESS ~ C*S*(1-rho)/(1+rho). Vehtari et al. 2021 validation target."""
    from vihmc_tpu.chains import ess_bulk_np, effective_sample_size_np

    for rho, rtol in [(0.0, 0.25), (0.5, 0.25), (0.9, 0.35)]:
        x = _ar1_np(rho, c=4, s=4000, d=3, seed=int(rho * 10))
        expected = 4 * 4000 * (1 - rho) / (1 + rho)
        bulk = ess_bulk_np(x)
        raw = effective_sample_size_np(x)
        assert np.all(np.abs(bulk / expected - 1) < rtol), (rho, bulk, expected)
        assert np.all(np.abs(raw / expected - 1) < rtol), (rho, raw, expected)


def test_ess_bulk_robust_to_heavy_tails():
    """On a Cauchy target the raw ESS estimator is dominated by single draws;
    the rank-normalized bulk ESS stays near C*S for iid draws."""
    from vihmc_tpu.chains import ess_bulk_np

    rng = np.random.default_rng(7)
    x = rng.standard_cauchy(size=(4, 2000, 2))
    bulk = ess_bulk_np(x)
    assert np.all(bulk > 0.7 * 8000)


def test_ess_tail_detects_stuck_tails():
    """Chains that agree in the bulk but each miss one tail: tail ESS
    collapses while bulk ESS looks fine — the stuck-chain regime the raw
    estimator's tau floor flatters (round-1 VERDICT weak #2)."""
    from vihmc_tpu.chains import ess_bulk_np, ess_tail_np

    rng = np.random.default_rng(8)
    x = rng.normal(size=(4, 1000, 1))
    # truncate each chain's draws to one side (chain-specific censoring)
    x[:2] = np.abs(x[:2])
    x[2:] = -np.abs(x[2:])
    tail = ess_tail_np(x)
    healthy = ess_tail_np(rng.normal(size=(4, 1000, 1)))
    assert np.all(tail < 0.05 * healthy)


def test_rhat_rank_folded_catches_variance_mismatch():
    """Chains sharing a mean but differing 4x in spread: classic split-R-hat
    can stay near 1; the folded rank-normalized variant must flag it."""
    from vihmc_tpu.chains import rhat_rank_np
    from vihmc_tpu.chains.diagnostics import potential_scale_reduction_np

    rng = np.random.default_rng(9)
    x = rng.normal(size=(4, 1000, 1))
    x[2:] *= 4.0
    assert np.all(rhat_rank_np(x) > 1.2)
    good = rng.normal(size=(4, 1000, 1))
    assert np.all(rhat_rank_np(good) < 1.02)


def test_summarize_np_rank_normalized_keys():
    from vihmc_tpu.chains import summarize_np

    rng = np.random.default_rng(10)
    out = summarize_np(rng.normal(size=(4, 300, 2)))
    for k in ("ess_bulk", "ess_tail", "r_hat_rank", "tau_floor_frac"):
        assert k in out
    assert out["tau_floor_frac"] == 0.0
    # completely frozen dims (every chain stuck at the same value, e.g. a
    # zero-gradient coordinate): the raw estimator's sub-1 tau floor reports
    # ESS ~ 1.66*C*S there — tau_floor_frac is the flag that exposes it
    frozen = np.zeros((4, 300, 2))
    out_frozen = summarize_np(frozen)
    assert out_frozen["tau_floor_frac"] == 1.0
    assert np.all(out_frozen["ess"] > 4 * 300)  # the inflation being flagged


def test_chain_sampler_handle_matches_sample_chains():
    """ChainSampler (explicit compiled handle) produces identical results to
    sample_chains and does not retrace across calls (round-1 VERDICT weak
    #3: the identity-keyed cache is fragile as a framework contract)."""
    from vihmc_tpu.chains import ChainSampler

    def lp(q):
        return -0.5 * jnp.sum(q * q)

    cfg = HMCConfig(num_samples=30, num_leapfrog=4, step_size=0.3)
    inits = jnp.zeros((3, 2))
    want = sample_chains(lp, inits, jax.random.key(7), cfg)
    handle = ChainSampler(lp, cfg)
    got1 = handle(jax.random.key(7), inits)
    got2 = handle(jax.random.key(8), inits)
    np.testing.assert_array_equal(np.asarray(want.samples), np.asarray(got1.samples))
    assert not np.allclose(np.asarray(got1.samples), np.asarray(got2.samples))
