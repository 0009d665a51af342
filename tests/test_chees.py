"""ChEES-HMC: cross-chain trajectory-length adaptation (hmc/chees.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import ChEESConfig, chees_sample
from vihmc_tpu.hmc.chees import halton_base2
from vihmc_tpu.dists import diag_normal_logpdf_sum


def test_halton_base2_first_values():
    vals = [float(halton_base2(jnp.asarray(i))) for i in range(4)]
    np.testing.assert_allclose(vals, [0.5, 0.25, 0.75, 0.125])


def test_chees_recovers_standard_normal_moments():
    def lp(q):
        return -0.5 * jnp.sum(q * q)

    cfg = ChEESConfig(num_samples=600, step_size=0.2, init_traj_length=0.4,
                      burn=200, max_steps=64)
    inits = jax.random.normal(jax.random.key(0), (8, 3))
    res = jax.jit(lambda k: chees_sample(lp, inits, k, cfg))(jax.random.key(1))
    post = np.asarray(res.samples[:, 200:, :]).reshape(-1, 3)
    np.testing.assert_allclose(post.mean(0), 0.0, atol=0.1)
    np.testing.assert_allclose(post.std(0), 1.0, atol=0.1)
    # acceptance lands near the 0.651 target after adaptation
    acc = np.asarray(res.accept_probs[:, 200:]).mean()
    assert 0.45 < acc < 0.95
    assert not np.asarray(res.divergent).any()


def test_chees_grows_trajectory_on_wide_target():
    """On a wide Gaussian (std 10) started with a tiny trajectory, the ChEES
    gradient must push T up by a large factor."""
    def lp(q):
        return diag_normal_logpdf_sum(q, 0.0, 10.0)

    cfg = ChEESConfig(num_samples=400, step_size=0.5, init_traj_length=1.0,
                      burn=300, max_steps=128)
    inits = 10.0 * jax.random.normal(jax.random.key(2), (16, 2))
    res = jax.jit(lambda k: chees_sample(lp, inits, k, cfg))(jax.random.key(3))
    T_final = float(np.exp(res.final_state.log_T))
    assert T_final > 5.0  # grew from 1.0 toward the O(std) optimum
    # realized per-draw step counts follow the jittered schedule
    n_steps = np.asarray(res.aux_trace["n_steps"])
    assert n_steps.min() >= 1 and n_steps.max() <= 128
    post = np.asarray(res.samples[:, 300:, :]).reshape(-1, 2)
    np.testing.assert_allclose(post.std(0), 10.0, rtol=0.2)


def test_chees_beats_short_fixed_l_on_correlated_target():
    """ESS per gradient evaluation: adapted trajectories vs 2-step HMC."""
    from vihmc_tpu.chains import effective_sample_size_np, sample_chains
    from vihmc_tpu.hmc import HMCConfig

    rho = 0.95
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)

    def lp(q):
        return -0.5 * q @ prec @ q

    inits = jax.random.normal(jax.random.key(4), (8, 2))
    burn = 250
    cfg_c = ChEESConfig(num_samples=750, step_size=0.2, init_traj_length=0.3,
                        burn=burn, max_steps=64)
    res_c = jax.jit(lambda k: chees_sample(lp, inits, k, cfg_c))(jax.random.key(5))
    grads_c = float(np.asarray(res_c.aux_trace["n_steps"])[burn:].sum())
    ess_c = np.median(effective_sample_size_np(
        np.asarray(res_c.samples[:, burn:, :])))

    cfg_h = HMCConfig(num_samples=750, num_leapfrog=2, step_size=0.2,
                      burn=burn, sampler="hmc_nuts",
                      target_accept=0.651)
    res_h = sample_chains(lp, inits, jax.random.key(6), cfg_h)
    grads_h = 500.0 * 2
    ess_h = np.median(effective_sample_size_np(
        np.asarray(res_h.samples[:, burn:, :])))

    assert ess_c / grads_c > ess_h / grads_h


def test_chees_sharded_matches_unsharded():
    """Coupled-chain ChEES under a ('chains','data') mesh: cross-chain
    reductions become collectives; results must match the single-device run."""
    from vihmc_tpu.chains import make_chain_mesh, sample_chains_chees

    def lp(q):
        return -0.5 * jnp.sum(q * q)

    inits = jax.random.normal(jax.random.key(8), (8, 3))
    cfg = ChEESConfig(num_samples=40, step_size=0.3, init_traj_length=0.6,
                      burn=20, max_steps=16)
    res_plain = sample_chains_chees(lp, inits, jax.random.key(9), cfg)
    mesh = make_chain_mesh(n_chain_shards=4, n_data_shards=2)
    res_mesh = sample_chains_chees(lp, inits, jax.random.key(9), cfg, mesh=mesh)
    # sharded reduction order perturbs fp32 cross-chain means and the
    # Hamiltonian flow amplifies it; agreement is statistical, with the
    # adapted hyper-parameters near-identical
    np.testing.assert_allclose(np.asarray(res_mesh.samples),
                               np.asarray(res_plain.samples), atol=0.05)
    np.testing.assert_allclose(float(res_mesh.final_state.log_T),
                               float(res_plain.final_state.log_T), atol=0.05)
    np.testing.assert_allclose(float(res_mesh.final_state.da.log_step_avg),
                               float(res_plain.final_state.da.log_step_avg),
                               atol=0.05)


def test_chees_divergences_do_not_poison_adaptation():
    """A huge initial step makes early trajectories diverge (non-finite
    proposals); the cross-chain ChEES statistics must stay finite and the
    sampler must still recover the target once dual averaging shrinks eps."""
    def lp(q):
        return -0.5 * jnp.sum((q / 0.05) ** 2)  # narrow target

    cfg = ChEESConfig(num_samples=500, step_size=5.0, init_traj_length=10.0,
                      burn=300, max_steps=32)
    inits = 0.05 * jax.random.normal(jax.random.key(10), (8, 2))
    res = jax.jit(lambda k: chees_sample(lp, inits, k, cfg))(jax.random.key(11))
    assert np.asarray(res.divergent).any()  # the scenario actually triggered
    assert np.isfinite(float(res.final_state.log_T))
    assert np.isfinite(np.asarray(res.samples)).all()
    post = np.asarray(res.samples[:, 300:, :]).reshape(-1, 2)
    np.testing.assert_allclose(post.std(0), 0.05, rtol=0.3)


def test_chees_aux_refresh_per_chain():
    """Subspace-style aux: per-chain frozen vectors, refreshed per draw."""
    d, sub = 6, 3
    mu = jnp.arange(d, dtype=jnp.float32) * 0.1
    sigma = 0.1 * jnp.ones(d)
    idx = jnp.array([0, 2, 4])

    def lp(q_sub, frozen):
        full = frozen.at[idx].set(q_sub)
        return -0.5 * jnp.sum(full * full)

    def refresh(key, frozen):
        return mu + sigma * jax.random.normal(key, frozen.shape)

    n_chains = 4
    aux0 = jnp.tile(mu[None, :], (n_chains, 1))
    inits = jnp.zeros((n_chains, sub))
    cfg = ChEESConfig(num_samples=50, step_size=0.3, init_traj_length=0.6,
                      burn=20, max_steps=32)
    res = jax.jit(lambda k: chees_sample(lp, inits, k, cfg, aux=aux0,
                                         aux_refresh=refresh))(jax.random.key(7))
    assert np.isfinite(np.asarray(res.samples)).all()
    assert res.samples.shape == (n_chains, 50, sub)
    # per-chain frozen states diverge after refresh
    final_aux = np.asarray(res.final_state.aux)
    assert not np.allclose(final_aux[0], final_aux[1])


def test_chees_grad_fn_matches_autodiff_path():
    """grad_fn = grad(lp) reproduces the autodiff ChEES run draw-for-draw."""
    import numpy as np

    var = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)

    def lp(q):
        return -0.5 * jnp.sum(q * q / var)

    cfg = ChEESConfig(num_samples=40, step_size=0.2, init_traj_length=1.0,
                      burn=20, max_steps=32)
    q0 = jax.random.normal(jax.random.key(0), (4, 3))
    base = chees_sample(lp, q0, jax.random.key(1), cfg)
    got = chees_sample(lp, q0, jax.random.key(1), cfg, grad_fn=jax.grad(lp))
    np.testing.assert_allclose(np.asarray(got.samples),
                               np.asarray(base.samples), rtol=1e-5, atol=1e-6)
