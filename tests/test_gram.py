"""Gram-form DeepONet gradients + the HMC kernel's grad_fn trajectory path.

The Gram trick (vihmc_tpu/ops/gram_merge.py) computes the exact likelihood
gradient without materializing the (B, P) prediction matrix; the kernel's
``grad_fn`` option runs the leapfrog trajectory on such a gradient oracle and
evaluates the exact density only at trajectory endpoints. Correctness bar:
gradients match autodiff to fp32 rounding, and with ``grad_fn = grad(lp)``
the sampler reproduces the default path draw-for-draw.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.chains import sample_chains
from vihmc_tpu.chains.resume import sample_chains_resumable
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior, IsotropicGaussianPrior
from vihmc_tpu.hmc import (FrozenPolicy, HMCConfig, SubspaceSpec,
                           make_subspace_grad, make_subspace_log_prob, sample)
from vihmc_tpu.models import DeepONetConfig
from vihmc_tpu.ops import make_gram_grad_full, merge_nll_gram_cotangents
from vihmc_tpu.ops.deeponet_merge import merge_nll_reference
from vihmc_tpu.pipelines.common import make_flat_deeponet


SMALL = DeepONetConfig(in_branch=11, in_trunk=5, width_branch=16,
                       width_trunk=16, depth_branch=2, depth_trunk=2)


def _problem(rng, cfg=SMALL, n_fn=13, n_pts=29):
    branch_x = jnp.asarray(rng.normal(size=(n_fn, cfg.in_branch)), jnp.float32)
    trunk_x = jnp.asarray(rng.random(size=(n_pts, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n_fn, n_pts)), jnp.float32)
    return branch_x, trunk_x, y


def test_gram_cotangents_match_autodiff():
    rng = np.random.default_rng(0)
    b, p, k = 13, 29, 8
    bout = jnp.asarray(rng.normal(size=(b, k)), jnp.float32)
    tout = jnp.asarray(rng.normal(size=(p, k)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(b, p)), jnp.float32)
    bias = jnp.asarray(0.37, jnp.float32)
    tau = 0.8

    want = jax.grad(lambda bo, to, bi: merge_nll_reference(bo, to, bi, y, tau),
                    argnums=(0, 1, 2))(bout, tout, bias)
    got = merge_nll_gram_cotangents(bout, tout, bias, y, tau)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-4, atol=2e-4)


def test_gram_cotangents_variance_clamp():
    """tau below the torch gaussian_nll_loss eps clamps to eps (both paths)."""
    rng = np.random.default_rng(3)
    bout = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    tout = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    want = jax.grad(lambda bo: merge_nll_reference(bo, tout, 0.0, y, 1e-9))(bout)
    got, _, _ = merge_nll_gram_cotangents(bout, tout, 0.0, y, 1e-9)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3)


def test_gram_grad_full_matches_autodiff():
    rng = np.random.default_rng(1)
    branch_x, trunk_x, y = _problem(rng)
    prior = IsotropicGaussianPrior(scale=0.5)
    apply_flat, flat0, _ = make_flat_deeponet(SMALL)
    like = get_likelihood("NLL")
    tau = 0.7

    def log_post(flat):
        return like(apply_flat(flat, branch_x, trunk_x), y, tau) \
            + prior.log_prob(flat)

    grad_full, flat0_g, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y,
                                                tau, prior=prior)
    np.testing.assert_allclose(np.asarray(flat0_g), np.asarray(flat0))

    flat = flat0 + 0.05 * jnp.asarray(rng.normal(size=flat0.shape), jnp.float32)
    want = jax.grad(log_post)(flat)
    got = grad_full(flat)
    # fp32 Gram cancellation: compare against the gradient's overall scale
    scale = float(jnp.max(jnp.abs(want))) + 1e-8
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=5e-4)


def test_gram_grad_bf16_tracks_f32_field():
    """compute_dtype=bfloat16 is a trajectory-FIELD precision choice: the
    gradient must stay f32-typed and direction-aligned with the exact field
    (cosine ~1 at bf16 resolution), while MH density evaluations are
    untouched — so validity is unaffected and only acceptance could degrade
    (gram_merge.py docstring; adopted after on-chip measurement,
    docs/performance.md round 4)."""
    rng = np.random.default_rng(5)
    branch_x, trunk_x, y = _problem(rng)
    prior = IsotropicGaussianPrior(scale=0.5)
    grad_f32, flat0, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y,
                                             0.7, prior=prior)
    grad_bf16, _, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y,
                                          0.7, prior=prior,
                                          compute_dtype=jnp.bfloat16)
    flat = flat0 + 0.05 * jnp.asarray(rng.normal(size=flat0.shape),
                                      jnp.float32)
    g32 = np.asarray(grad_f32(flat), np.float64)
    gbf = np.asarray(grad_bf16(flat))
    assert gbf.dtype == np.float32  # field output stays f32
    gbf = gbf.astype(np.float64)
    cos = gbf @ g32 / (np.linalg.norm(gbf) * np.linalg.norm(g32) + 1e-30)
    assert cos > 0.999, cos
    # magnitude agreement at bf16 resolution (relative, against the field
    # scale — elementwise comparison is meaningless where g ~ 0)
    scale = np.max(np.abs(g32)) + 1e-30
    assert np.max(np.abs(gbf - g32)) / scale < 0.05


def test_gram_grad_bf16_composes_with_subsets():
    """bf16 and the stride surrogates are orthogonal switches."""
    rng = np.random.default_rng(6)
    branch_x, trunk_x, y = _problem(rng)
    fn_subset = np.arange(0, branch_x.shape[0], 2)
    grad_f32, flat0, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y,
                                             0.7, fn_subset=fn_subset)
    grad_bf16, _, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y, 0.7,
                                          fn_subset=fn_subset,
                                          compute_dtype=jnp.bfloat16)
    flat = flat0 + 0.05 * jnp.asarray(rng.normal(size=flat0.shape),
                                      jnp.float32)
    g32 = np.asarray(grad_f32(flat), np.float64)
    gbf = np.asarray(grad_bf16(flat), np.float64)
    cos = gbf @ g32 / (np.linalg.norm(gbf) * np.linalg.norm(g32) + 1e-30)
    assert cos > 0.999, cos


def test_gram_grad_guards():
    rng = np.random.default_rng(5)
    branch_x, trunk_x, y = _problem(rng)
    with pytest.raises(ValueError):
        make_gram_grad_full(dataclasses.replace(SMALL, noise_neurons=2),
                            branch_x, trunk_x, y, 1.0)
    with pytest.raises(ValueError):
        make_gram_grad_full(SMALL, branch_x, jnp.tile(trunk_x[None], (3, 1, 1)),
                            y[:3], 1.0)


def test_subspace_grad_matches_autodiff():
    rng = np.random.default_rng(2)
    branch_x, trunk_x, y = _problem(rng)
    apply_flat, flat0, _ = make_flat_deeponet(SMALL)
    d = flat0.shape[0]
    mu = jnp.asarray(0.05 * rng.normal(size=d), jnp.float32)
    sigma = jnp.asarray(0.01 + 0.05 * rng.random(d), jnp.float32)
    idx = np.sort(rng.choice(d, size=32, replace=False))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def full_ll(flat):
        return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)

    lp_like, aux0, _ = make_subspace_log_prob(full_ll, spec, FrozenPolicy.MEAN)

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    grad_full, _, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y, 1.0)
    grad_fn = make_subspace_grad(grad_full, spec, prior=prior)

    q = spec.sub_mu() + 0.02 * jnp.asarray(rng.normal(size=len(idx)), jnp.float32)
    want = jax.grad(log_prob)(q, aux0)
    got = grad_fn(q, aux0)
    scale = float(jnp.max(jnp.abs(want))) + 1e-8
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=5e-4)


def _gauss_target():
    var = jnp.asarray([0.5, 1.0, 2.0, 4.0], jnp.float32)

    def lp(q):
        return -0.5 * jnp.sum(q * q / var)

    return lp, var


@pytest.mark.parametrize("jitter", [False, True])
def test_grad_fn_exact_matches_default_path(jitter):
    """grad_fn = grad(log_prob) must reproduce the autodiff path draw-for-draw."""
    lp, var = _gauss_target()
    cfg = HMCConfig(num_samples=40, num_leapfrog=7, step_size=0.3, burn=10,
                    sampler="hmc_nuts", jitter_l=jitter)
    q0 = jnp.ones(4)
    key = jax.random.key(7)
    base = sample(lp, q0, key, cfg)
    via_grad_fn = sample(lp, q0, key, cfg, grad_fn=jax.grad(lp))
    np.testing.assert_allclose(np.asarray(via_grad_fn.samples),
                               np.asarray(base.samples), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(via_grad_fn.accepted),
                                  np.asarray(base.accepted))


def test_grad_fn_with_aux_refresh_matches_default_path():
    var = jnp.asarray([0.5, 1.0, 2.0, 4.0], jnp.float32)

    def lp(q, aux):
        return -0.5 * jnp.sum((q - aux) ** 2 / var)

    def refresh(key, aux):
        return 0.1 * jax.random.normal(key, aux.shape)

    grad_fn = jax.grad(lp)
    cfg = HMCConfig(num_samples=30, num_leapfrog=5, step_size=0.3)
    q0 = jnp.zeros((2, 4))
    aux0 = jnp.zeros(4)
    key = jax.random.key(3)
    base = sample_chains(lp, q0, key, cfg, aux=aux0, aux_refresh=refresh)
    got = sample_chains(lp, q0, key, cfg, aux=aux0, aux_refresh=refresh,
                        grad_fn=grad_fn)
    np.testing.assert_allclose(np.asarray(got.samples),
                               np.asarray(base.samples), rtol=1e-5, atol=1e-6)


def test_grad_fn_resumable_matches_single_dispatch():
    lp, _ = _gauss_target()
    grad_fn = jax.grad(lp)
    cfg = HMCConfig(num_samples=24, num_leapfrog=5, step_size=0.3)
    q0 = jnp.zeros((2, 4))
    key = jax.random.key(11)
    seg = sample_chains_resumable(lp, q0, key, cfg, segment_size=8,
                                  grad_fn=grad_fn)
    assert seg.samples.shape == (2, 24, 4)
    assert np.isfinite(np.asarray(seg.log_probs)).all()
    # acceptance sane on a well-conditioned Gaussian
    assert float(np.mean(np.asarray(seg.accepted))) > 0.5


def test_grad_fn_splitting_rejected():
    lp, _ = _gauss_target()
    from vihmc_tpu.hmc.kernel import make_kernel

    cfg = HMCConfig(integrator="splitting")
    with pytest.raises(ValueError):
        make_kernel(lp, cfg, shard_log_prob_fn=lambda q, s: lp(q),
                    shard_data=jnp.ones((2, 3)), grad_fn=jax.grad(lp))


def test_gram_grad_fn_end_to_end_sampler():
    """Subspace VI-HMC with the Gram gradient: acceptance stays high (the
    gradient is exact up to fp32 rounding) and the chain mixes."""
    rng = np.random.default_rng(9)
    branch_x, trunk_x, y = _problem(rng)
    apply_flat, flat0, _ = make_flat_deeponet(SMALL)
    d = flat0.shape[0]
    mu = jnp.asarray(0.05 * rng.normal(size=d), jnp.float32)
    sigma = jnp.asarray(0.01 + 0.02 * rng.random(d), jnp.float32)
    idx = np.sort(rng.choice(d, size=24, replace=False))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def full_ll(flat):
        return like(apply_flat(flat, branch_x, trunk_x), y, 1.0)

    lp_like, aux0, refresh = make_subspace_log_prob(
        full_ll, spec, FrozenPolicy.REFRESH, init_key=jax.random.key(0))

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    grad_full, _, _ = make_gram_grad_full(SMALL, branch_x, trunk_x, y, 1.0)
    grad_fn = make_subspace_grad(grad_full, spec, prior=prior)

    cfg = HMCConfig(num_samples=50, num_leapfrog=8, step_size=1e-3, burn=10,
                    sampler="hmc_nuts", target_accept=0.8)
    inits = jnp.tile(spec.sub_mu()[None], (2, 1))
    res = sample_chains(log_prob, inits, jax.random.key(1), cfg,
                        inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                        aux_refresh=refresh, grad_fn=grad_fn)
    assert np.isfinite(np.asarray(res.samples)).all()
    assert float(res.acceptance_rate) > 0.4
    # draws actually move (chain not stuck)
    assert float(np.std(np.asarray(res.samples[:, 10:, 0]))) > 0.0


def test_jitter_low_frac_one_equals_fixed_length():
    """jitter range [L, L] must reproduce the fixed-L trajectory exactly
    (same drawn length every step; only rounding-identical ops differ)."""
    lp, _ = _gauss_target()
    cfg_fix = HMCConfig(num_samples=25, num_leapfrog=6, step_size=0.3)
    cfg_jit = dataclasses.replace(cfg_fix, jitter_l=True, jitter_low_frac=1.0)
    q0 = jnp.ones(4)
    key = jax.random.key(13)
    a = sample(lp, q0, key, cfg_fix)
    b = sample(lp, q0, key, cfg_jit)
    np.testing.assert_allclose(np.asarray(b.samples), np.asarray(a.samples),
                               rtol=1e-6, atol=1e-7)


def test_jitter_low_frac_bounds_lengths():
    """With low_frac=0.5 the positions move every draw (length >= L/2 >= 1)
    and sampling stays finite/correct on a Gaussian."""
    lp, var = _gauss_target()
    cfg = HMCConfig(num_samples=400, num_leapfrog=8, step_size=0.25,
                    jitter_l=True, jitter_low_frac=0.5)
    res = sample(lp, jnp.zeros(4), jax.random.key(5), cfg)
    s = np.asarray(res.samples[100:])
    assert np.isfinite(s).all()
    np.testing.assert_allclose(s.var(axis=0), np.asarray(var), rtol=0.45)


def test_init_step_search_recovers_from_bad_scale():
    """With step_size 1000x too small, Algorithm-4 init anchors dual
    averaging near the right scale so the frozen step actually mixes."""
    lp, var = _gauss_target()
    cfg = dict(num_samples=60, num_leapfrog=5, burn=30, sampler="hmc_nuts",
               target_accept=0.65, step_size=1e-4)
    key = jax.random.key(2)
    q0 = jnp.zeros(4)
    plain = sample(lp, q0, key, HMCConfig(**cfg))
    searched = sample(lp, q0, key, HMCConfig(**cfg, init_step_search=True))
    # adaptation starts at the searched scale, not the configured 1e-4
    assert float(np.asarray(plain.step_sizes)[0]) < 1e-3
    assert float(np.asarray(searched.step_sizes)[0]) > 1e-2
    # the searched chain explores from the first draws
    post = np.asarray(searched.samples)[30:]
    assert post.std(axis=0).min() > 0.3
    assert 0.4 < float(searched.acceptance_rate) <= 1.0


def test_init_step_search_requires_key():
    from vihmc_tpu.hmc.kernel import init_state

    lp, _ = _gauss_target()
    cfg = HMCConfig(sampler="hmc_nuts", init_step_search=True)
    with pytest.raises(ValueError):
        init_state(lp, jnp.zeros(4), cfg)


def test_da_axis_couples_chain_step_adaptation():
    """da_axis='chains': all chains share one pmean-coupled adapted step."""
    lp, var = _gauss_target()
    cfg = HMCConfig(num_samples=40, num_leapfrog=5, step_size=0.05, burn=20,
                    sampler="hmc_nuts", target_accept=0.7, da_axis="chains")
    q0 = jnp.zeros((4, 4))
    res = sample_chains(lp, q0, jax.random.key(1), cfg)
    steps = np.asarray(res.step_sizes)  # (C, S)
    # identical trace across chains
    np.testing.assert_allclose(steps, np.broadcast_to(steps[:1], steps.shape),
                               rtol=1e-6)
    # and it actually adapted away from the init
    assert abs(float(steps[0, -1]) / 0.05 - 1.0) > 0.1
    # uncoupled control: chains end at different steps
    res_u = sample_chains(lp, q0, jax.random.key(1),
                          dataclasses.replace(cfg, da_axis=None))
    steps_u = np.asarray(res_u.step_sizes)
    assert np.std(steps_u[:, -1]) > 0.0


def test_da_axis_resumable_matches_single_dispatch():
    lp, _ = _gauss_target()
    cfg = HMCConfig(num_samples=24, num_leapfrog=5, step_size=0.1, burn=12,
                    sampler="hmc_nuts", target_accept=0.7, da_axis="chains")
    q0 = jnp.zeros((3, 4))
    res = sample_chains_resumable(lp, q0, jax.random.key(4), cfg,
                                  segment_size=8)
    steps = np.asarray(res.step_sizes)
    np.testing.assert_allclose(steps, np.broadcast_to(steps[:1], steps.shape),
                               rtol=1e-6)
    assert np.isfinite(np.asarray(res.samples)).all()


def test_max_step_clamps_adaptation():
    lp, _ = _gauss_target()
    cfg = HMCConfig(num_samples=40, num_leapfrog=5, step_size=0.05, burn=20,
                    sampler="hmc_nuts", target_accept=0.7, max_step=0.08)
    res = sample(lp, jnp.zeros(4), jax.random.key(1), cfg)
    assert float(np.max(np.asarray(res.step_sizes))) <= 0.08 + 1e-7


def test_refresh_during_burn_off_holds_aux():
    def lp(q, aux):
        return -0.5 * jnp.sum((q - aux) ** 2)

    def refresh(key, aux):
        return jax.random.normal(key, aux.shape)

    cfg = HMCConfig(num_samples=20, num_leapfrog=3, step_size=0.5, burn=10,
                    refresh_during_burn=False, store_aux_trace=True)
    res = sample(lp, jnp.zeros(3), jax.random.key(0), cfg, aux=jnp.ones(3),
                 aux_refresh=refresh)
    trace = np.asarray(res.aux_trace)  # (S, 3)
    # frozen at the initial aux through burn, refreshed after
    np.testing.assert_allclose(trace[:10], 1.0)
    assert np.std(trace[10:]) > 0.1


def test_adapt_forever_rescues_mis_scaled_step():
    """A frozen step 50x too large rejects ~everything; continuous
    (diminishing) adaptation self-heals and the chain mixes."""
    var = jnp.asarray([1e-4] * 4, jnp.float32)

    def lp(q):
        return -0.5 * jnp.sum(q * q / var)

    # burn=4: the frozen average has no time to leave the bad scale
    base = dict(num_samples=300, num_leapfrog=8, step_size=0.5, burn=4,
                sampler="hmc_nuts", target_accept=0.7)
    frozen = sample(lp, jnp.full(4, 0.05), jax.random.key(0), HMCConfig(**base))
    healed = sample(lp, jnp.full(4, 0.05), jax.random.key(0),
                    HMCConfig(**base, adapt_forever=True))
    acc_f = float(np.mean(np.asarray(frozen.accepted)[100:]))
    acc_h = float(np.mean(np.asarray(healed.accepted)[100:]))
    assert acc_f < 0.2          # trapped at the frozen scale
    assert acc_h > 0.5          # recovered
    # healed chain reaches the target's scale
    post = np.asarray(healed.samples)[150:]
    assert np.abs(post.std(axis=0) / 1e-2 - 1.0).max() < 1.0


def test_metric_axis_pools_welford_across_chains():
    """Pooled windowed metric: all chains share one variance estimate that
    approaches the target variances; per-chain metric stays noisy."""
    var = jnp.asarray([0.25, 1.0, 4.0, 9.0], jnp.float32)

    def lp(q):
        return -0.5 * jnp.sum(q * q / var)

    cfg = HMCConfig(num_samples=260, num_leapfrog=8, step_size=0.3, burn=200,
                    sampler="hmc_nuts", target_accept=0.8, adapt_mass=True,
                    mass_schedule="windowed", da_axis="chains",
                    metric_axis="chains")
    q0 = jax.random.normal(jax.random.key(0), (8, 4))
    res = sample_chains(lp, q0, jax.random.key(1), cfg)
    inv = np.asarray(res.final_state.inv_mass)  # (C, D)
    # identical across chains (pooled estimate)
    np.testing.assert_allclose(inv, np.broadcast_to(inv[:1], inv.shape),
                               rtol=1e-5)
    # close to the true marginal variances (pooled over 8 chains)
    ratio = inv[0] / np.asarray(var)
    assert ratio.max() < 3.0 and ratio.min() > 1 / 3.0
    # post-burn sampling healthy under the pooled metric
    assert float(np.mean(np.asarray(res.accepted)[:, 200:])) > 0.5


def test_clipped_grad_escapes_tail_trap():
    """A chain started deep in a quartic tail (curvature grows with
    distance) rejects everything under the raw gradient — the first kick
    explodes; the clipped field walks it home and sampling proceeds. MH
    stays exact: post-equilibration moments match the target."""
    from vihmc_tpu.hmc import clipped_grad_fn

    def lp(q):
        return -0.25 * jnp.sum(q ** 4)

    cfg = HMCConfig(num_samples=500, num_leapfrog=10, step_size=0.4)
    q0 = jnp.full(4, 8.0)
    raw = sample(lp, q0, jax.random.key(0), cfg)
    acc_raw = float(np.mean(np.asarray(raw.accepted)))
    clipped = sample(lp, q0, jax.random.key(0), cfg,
                     grad_fn=clipped_grad_fn(lp, max_norm=10.0, is_grad=False))
    post = np.asarray(clipped.samples)[300:]
    assert acc_raw < 0.05                      # trapped under the raw field
    assert float(np.mean(np.asarray(clipped.accepted)[300:])) > 0.3
    # p(q) ~ exp(-q^4/4): sd = sqrt(2 Gamma(3/4)/Gamma(1/4)) ~ 0.82
    np.testing.assert_allclose(post.std(axis=0), 0.82, rtol=0.4)
    np.testing.assert_allclose(post.mean(axis=0), 0.0, atol=0.5)


def test_clipped_grad_inactive_in_equilibrium():
    """With a generous max_norm the clipped path reproduces the raw path
    draw-for-draw (clip never binds)."""
    from vihmc_tpu.hmc import clipped_grad_fn

    lp, _ = _gauss_target()
    cfg = HMCConfig(num_samples=30, num_leapfrog=5, step_size=0.3)
    q0 = jnp.ones(4)
    a = sample(lp, q0, jax.random.key(3), cfg)
    b = sample(lp, q0, jax.random.key(3), cfg,
               grad_fn=clipped_grad_fn(lp, max_norm=1e6, is_grad=False))
    np.testing.assert_allclose(np.asarray(b.samples), np.asarray(a.samples),
                               rtol=1e-5, atol=1e-6)


def test_query_subset_gradient_is_scaled_subgrid_gradient():
    """make_gram_grad_full(query_subset=sel) == (P/p) * autodiff gradient of
    the likelihood restricted to the selected query points."""
    rng = np.random.default_rng(11)
    bx, tx, y = _problem(rng, n_fn=7, n_pts=24)
    sel = np.array([0, 3, 6, 9, 12, 15, 18, 21])
    grad_sub, flat0, unravel = make_gram_grad_full(
        SMALL, bx, tx, y, tau_var=0.7, query_subset=sel)
    apply_flat, _, _ = make_flat_deeponet(SMALL)
    like = get_likelihood("NLL")

    def lp_subgrid(flat):
        return like(apply_flat(flat, bx, tx[sel]), y[:, sel], 0.7)

    flat = flat0 + 0.05 * jnp.asarray(rng.normal(size=flat0.shape), jnp.float32)
    want = (24 / 8) * jax.grad(lp_subgrid)(flat)
    got = grad_sub(flat)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fn_subset_gradient_is_scaled_subset_gradient():
    """make_gram_grad_full(fn_subset=sel) == (B/b) * autodiff gradient of
    the likelihood restricted to the selected training functions; composes
    with query_subset (scale = (B*P)/(b*p))."""
    rng = np.random.default_rng(19)
    bx, tx, y = _problem(rng, n_fn=9, n_pts=20)
    fsel = np.array([0, 2, 4, 6, 8])
    qsel = np.array([0, 4, 8, 12, 16])
    apply_flat, flat0, _ = make_flat_deeponet(SMALL)
    like = get_likelihood("NLL")
    flat = flat0 + 0.05 * jnp.asarray(rng.normal(size=flat0.shape), jnp.float32)

    grad_f, _, _ = make_gram_grad_full(SMALL, bx, tx, y, tau_var=0.7,
                                       fn_subset=fsel)

    def lp_fns(flat):
        return like(apply_flat(flat, bx[fsel], tx), y[fsel], 0.7)

    np.testing.assert_allclose(np.asarray(grad_f(flat)),
                               np.asarray((9 / 5) * jax.grad(lp_fns)(flat)),
                               rtol=2e-3, atol=2e-3)

    grad_fq, _, _ = make_gram_grad_full(SMALL, bx, tx, y, tau_var=0.7,
                                        fn_subset=fsel, query_subset=qsel)

    def lp_both(flat):
        return like(apply_flat(flat, bx[fsel], tx[qsel]), y[np.ix_(fsel, qsel)], 0.7)

    want = (9 / 5) * (20 / 5) * jax.grad(lp_both)(flat)
    np.testing.assert_allclose(np.asarray(grad_fq(flat)), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_grid_stride_subset_covers_grid():
    from vihmc_tpu.ops import grid_stride_subset

    sel = grid_stride_subset(5, 7, 2)
    # t-major ravel: rows 0,2,4 x cols 0,2,4,6
    want = sorted(t * 7 + x for t in (0, 2, 4) for x in (0, 2, 4, 6))
    assert sorted(int(i) for i in sel) == want


def test_coarse_grid_surrogate_tracks_full_gradient():
    """On a smooth problem the stride-2 surrogate gradient points in nearly
    the same direction as the full-grid gradient (cosine ~ 1) — that is why
    acceptance survives the 4x-cheaper trajectory."""
    from vihmc_tpu.ops import grid_stride_subset

    rng = np.random.default_rng(13)
    nt, nx = 9, 9
    bx = jnp.asarray(rng.normal(size=(6, SMALL.in_branch)), jnp.float32)
    tt, xx = np.meshgrid(np.linspace(0, 1, nt), np.linspace(0, 1, nx),
                         indexing="ij")
    tx = jnp.asarray(np.stack([tt.ravel(), xx.ravel()], -1), jnp.float32)
    apply_flat, flat0, _ = make_flat_deeponet(SMALL)
    flat_true = flat0 + 0.1 * jnp.asarray(rng.normal(size=flat0.shape), jnp.float32)
    y = apply_flat(flat_true, bx, tx)  # smooth targets from the model itself

    grad_full, _, _ = make_gram_grad_full(SMALL, bx, tx, y, tau_var=1.0)
    sel = grid_stride_subset(nt, nx, 2)
    grad_coarse, _, _ = make_gram_grad_full(SMALL, bx, tx, y, tau_var=1.0,
                                            query_subset=sel)
    flat = flat0 + 0.05 * jnp.asarray(rng.normal(size=flat0.shape), jnp.float32)
    g_full = np.asarray(grad_full(flat))
    g_coarse = np.asarray(grad_coarse(flat))
    cos = g_full @ g_coarse / (np.linalg.norm(g_full) * np.linalg.norm(g_coarse))
    assert cos > 0.99
    np.testing.assert_allclose(np.linalg.norm(g_coarse),
                               np.linalg.norm(g_full), rtol=0.2)


def test_clipped_grad_always_binding_stays_exact():
    """Statistical exactness under an ALWAYS-binding clip: with max_norm
    far below the typical gradient norm the proposal field is wrong
    everywhere, yet MH on the exact density must still target N(0, I).
    This is the guarantee the headline bench configuration rests on."""
    from vihmc_tpu.hmc import clipped_grad_fn

    d = 3

    def lp(q):
        return -0.5 * jnp.sum(q ** 2)

    # typical |grad| = |q| ~ sqrt(3) ~ 1.7; clip at 0.3 binds ~always
    cfg = HMCConfig(num_samples=1500, num_leapfrog=8, step_size=0.35,
                    jitter_l=True, jitter_low_frac=0.5)
    inits = jnp.linspace(-2.0, 2.0, 8)[:, None] * jnp.ones((8, d))
    res = sample_chains(lp, inits, jax.random.key(5), cfg,
                        grad_fn=clipped_grad_fn(lp, max_norm=0.3,
                                                is_grad=False))
    post = np.asarray(res.samples)[:, 500:, :].reshape(-1, d)
    assert float(np.mean(np.asarray(res.accepted)[:, 500:])) > 0.2
    np.testing.assert_allclose(post.mean(axis=0), 0.0, atol=0.12)
    np.testing.assert_allclose(post.var(axis=0), 1.0, rtol=0.12)


def test_coarse_stride_surrogate_stays_statistically_exact():
    """MH-exactness of the coarse-grid surrogate trajectory field: sampling
    the SAME small DeepONet subspace posterior with (a) exact full-grid
    trajectory gradients and (b) the stride-2 surrogate must produce the
    same posterior moments within MC error — the surrogate only shapes the
    proposal; the accept step uses the exact full-grid density. This is the
    statistical guarantee the headline bench configuration (dual stride-5
    query/function surrogate, bench.BENCH_STRIDE/BENCH_FN_STRIDE) rests on;
    the same argument covers the function-stride axis (a fixed fn subset is
    also a deterministic field), complementing the gradient-level checks
    above."""
    from vihmc_tpu.ops import grid_stride_subset

    rng = np.random.default_rng(17)
    nt, nx = 9, 9
    bx = jnp.asarray(rng.normal(size=(6, SMALL.in_branch)), jnp.float32)
    tt, xx = np.meshgrid(np.linspace(0, 1, nt), np.linspace(0, 1, nx),
                         indexing="ij")
    tx = jnp.asarray(np.stack([tt.ravel(), xx.ravel()], -1), jnp.float32)
    apply_flat, flat0, _ = make_flat_deeponet(SMALL)
    flat_true = flat0 + 0.1 * jnp.asarray(rng.normal(size=flat0.shape), jnp.float32)
    y = apply_flat(flat_true, bx, tx) + \
        0.1 * jnp.asarray(rng.normal(size=(6, nt * nx)), jnp.float32)

    d = flat0.shape[0]
    mu = flat_true
    sigma = jnp.asarray(0.02 + 0.02 * rng.random(d), jnp.float32)
    idx = np.sort(rng.choice(d, size=8, replace=False))
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def full_ll(flat):
        return like(apply_flat(flat, bx, tx), y, 1.0)

    # frozen-at-mean policy: deterministic aux -> a FIXED target posterior
    lp_like, aux0, _ = make_subspace_log_prob(full_ll, spec, FrozenPolicy.MEAN)

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    grad_exact, _, _ = make_gram_grad_full(SMALL, bx, tx, y, 1.0)
    sel = grid_stride_subset(nt, nx, 2)
    grad_coarse, _, _ = make_gram_grad_full(SMALL, bx, tx, y, 1.0,
                                            query_subset=sel)

    cfg = HMCConfig(num_samples=1200, num_leapfrog=8, step_size=0.25,
                    burn=0, jitter_l=True, jitter_low_frac=0.5)
    inits = jnp.tile(spec.sub_mu()[None], (8, 1))

    def moments(grad_full):
        grad_fn = make_subspace_grad(grad_full, spec, prior=prior)
        res = sample_chains(log_prob, inits, jax.random.key(3), cfg,
                            inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                            grad_fn=grad_fn)
        assert float(res.acceptance_rate) > 0.3
        post = np.asarray(res.samples)[:, 300:, :].reshape(-1, len(idx))
        return post.mean(axis=0), post.std(axis=0)

    m_exact, s_exact = moments(grad_exact)
    m_coarse, s_coarse = moments(grad_coarse)
    # means agree within a fraction of the posterior scale; stds match
    np.testing.assert_allclose(m_coarse, m_exact, atol=0.25 * s_exact.max())
    np.testing.assert_allclose(s_coarse, s_exact, rtol=0.25)


def test_gaussian_field_stays_exact_on_non_gaussian_target():
    """The VI-Gaussian trajectory field (hmc.gaussian_field_grad) on a
    NON-Gaussian target: proposals come from harmonic trajectories around a
    WRONG (Gaussian) approximation, yet MH on the exact density must still
    recover the true moments. Target: product of gamma-like densities
    log p = sum(a*q - exp(q)) (log-gamma; mean digamma(a), skewed), with
    the field centered at a moment-matched Gaussian."""
    from scipy.special import digamma, polygamma

    from vihmc_tpu.hmc import gaussian_field_grad

    a = jnp.asarray([2.0, 5.0, 10.0])
    true_mean = digamma(np.asarray(a))
    true_var = polygamma(1, np.asarray(a))

    def lp(q):
        return jnp.sum(a * q - jnp.exp(q))

    field = gaussian_field_grad(jnp.asarray(true_mean, jnp.float32),
                                jnp.asarray(true_var ** 0.5, jnp.float32))
    cfg = HMCConfig(num_samples=3000, num_leapfrog=8, step_size=0.5,
                    jitter_l=True, jitter_low_frac=0.5)
    inits = jnp.tile(jnp.asarray(true_mean, jnp.float32)[None], (8, 1))
    res = sample_chains(lp, inits, jax.random.key(11), cfg,
                        inv_mass=jnp.asarray(true_var, jnp.float32),
                        grad_fn=field)
    assert float(res.acceptance_rate) > 0.3
    post = np.asarray(res.samples)[:, 1000:, :].reshape(-1, 3)
    np.testing.assert_allclose(post.mean(axis=0), true_mean,
                               atol=0.1 * true_var.max() ** 0.5)
    np.testing.assert_allclose(post.var(axis=0), true_var, rtol=0.15)
    # the skewness of log-gamma must survive (a pure Gaussian sampler that
    # ignored MH would erase it): third central moment is negative
    third = ((post - post.mean(0)) ** 3).mean(0)
    assert (third < 0).all()


def test_pipeline_gauss_field_option():
    """VIHMCRunConfig.gauss_field flows through both pipelines and is
    rejected in combination with the Gram strides."""
    import dataclasses as dc

    from vihmc_tpu.data.burgers import get_burgers
    from vihmc_tpu.models import MLPConfig
    from vihmc_tpu.pipelines import vi_hmc
    from vihmc_tpu.pipelines.configs import VIHMCRunConfig

    dcfg = dataclasses.replace(SMALL, in_branch=12)
    train, valid = get_burgers(jax.random.key(0), 6, 6, None, nx=12, nt=9)
    apply_flat, flat0, _ = make_flat_deeponet(dcfg)
    rng = np.random.default_rng(0)
    d = flat0.shape[0]
    arts = {"mu": jnp.asarray(0.05 * rng.normal(size=d), jnp.float32),
            "sigma": jnp.asarray(0.01 + 0.02 * rng.random(d), jnp.float32),
            "indices": np.sort(rng.choice(d, size=24, replace=False))}
    cfg = VIHMCRunConfig(num_samples=20, num_chains=2, step_size=0.1,
                         num_leapfrog=4, jitter_l=True, jitter_low_frac=0.5,
                         gauss_field=1.0, vi_mass=True)
    out = vi_hmc.run_operator(cfg, dcfg, arts, key=jax.random.key(1),
                              data=(train, valid))
    assert np.isfinite(np.asarray(out["result"].samples)).all()
    with pytest.raises(ValueError):
        vi_hmc.run_operator(dc.replace(cfg, coarse_stride=2), dcfg, arts,
                            key=jax.random.key(1), data=(train, valid))
    mlp = MLPConfig()
    d_nn = mlp.num_params
    arts_nn = {"mu": jnp.asarray(0.05 * rng.normal(size=d_nn), jnp.float32),
               "sigma": jnp.asarray(0.01 + 0.02 * rng.random(d_nn), jnp.float32),
               "indices": np.sort(rng.choice(d_nn, size=16, replace=False))}
    out_nn = vi_hmc.run_nn(cfg, mlp, arts_nn, key=jax.random.key(1))
    assert np.isfinite(np.asarray(out_nn["result"].samples)).all()


def test_pipeline_clip_and_jitter_options():
    """VIHMCRunConfig.clip_grad / jitter_l flow through run_operator."""
    import dataclasses as dc

    from vihmc_tpu.data.burgers import get_burgers
    from vihmc_tpu.pipelines import vi_hmc
    from vihmc_tpu.pipelines.configs import VIHMCRunConfig

    dcfg = dataclasses.replace(SMALL, in_branch=12)
    train, valid = get_burgers(jax.random.key(0), 6, 6, None, nx=12, nt=9)
    apply_flat, flat0, _ = make_flat_deeponet(dcfg)
    rng = np.random.default_rng(0)
    d = flat0.shape[0]
    arts = {"mu": jnp.asarray(0.05 * rng.normal(size=d), jnp.float32),
            "sigma": jnp.asarray(0.01 + 0.02 * rng.random(d), jnp.float32),
            "indices": np.sort(rng.choice(d, size=24, replace=False))}
    cfg = VIHMCRunConfig(num_samples=20, num_chains=2, step_size=1e-3,
                         num_leapfrog=4, jitter_l=True, jitter_low_frac=0.5,
                         clip_grad=13.0 * 24 ** 0.5, vi_mass=True)
    out = vi_hmc.run_operator(cfg, dcfg, arts, key=jax.random.key(1),
                              data=(train, valid))
    assert np.isfinite(np.asarray(out["result"].samples)).all()
    # clip_grad composes with NUTS since the surrogate-field extension
    # (round-1 VERDICT item 9): the clipped field drives the dynamics,
    # every leaf is weighted by the exact density
    out_n = vi_hmc.run_operator(
        dc.replace(cfg, algorithm="nuts", nuts_max_depth=3, num_samples=6,
                   jitter_l=False, jitter_low_frac=0.0),
        dcfg, arts, key=jax.random.key(1), data=(train, valid))
    assert np.isfinite(np.asarray(out_n["result"].samples)).all()
    # coarse_stride flows through the gram path (non-square 9x12 grid)
    out2 = vi_hmc.run_operator(dc.replace(cfg, coarse_stride=2), dcfg, arts,
                               key=jax.random.key(1), data=(train, valid))
    assert np.isfinite(np.asarray(out2["result"].samples)).all()
    # ... and is rejected off the gram path / on the NN workload
    with pytest.raises(ValueError):
        vi_hmc.run_operator(dc.replace(cfg, coarse_stride=2), dcfg, arts,
                            key=jax.random.key(1), data=(train, valid),
                            use_gram=False)
    from vihmc_tpu.models import MLPConfig
    with pytest.raises(ValueError):
        vi_hmc.run_nn(dc.replace(cfg, coarse_stride=2), MLPConfig(), arts,
                      key=jax.random.key(1))
    # fn_stride flows through the gram path and composes with coarse_stride
    out3 = vi_hmc.run_operator(dc.replace(cfg, coarse_stride=2, fn_stride=2),
                               dcfg, arts, key=jax.random.key(1),
                               data=(train, valid))
    assert np.isfinite(np.asarray(out3["result"].samples)).all()
    with pytest.raises(ValueError):
        vi_hmc.run_operator(dc.replace(cfg, fn_stride=2), dcfg, arts,
                            key=jax.random.key(1), data=(train, valid),
                            use_gram=False)
    with pytest.raises(ValueError):
        vi_hmc.run_nn(dc.replace(cfg, fn_stride=2), MLPConfig(), arts,
                      key=jax.random.key(1))
    # grad_dtype='bfloat16' flows through the gram path (field precision
    # only — round-4 headline recipe) and is rejected off it
    out4 = vi_hmc.run_operator(dc.replace(cfg, grad_dtype="bfloat16"), dcfg,
                               arts, key=jax.random.key(1),
                               data=(train, valid))
    assert np.isfinite(np.asarray(out4["result"].samples)).all()
    with pytest.raises(ValueError):
        vi_hmc.run_operator(dc.replace(cfg, grad_dtype="bfloat16"), dcfg,
                            arts, key=jax.random.key(1), data=(train, valid),
                            use_gram=False)


def test_infer_grid_shape():
    from vihmc_tpu.ops import infer_grid_shape

    tt, xx = np.meshgrid(np.linspace(0, 1, 7), np.linspace(0, 1, 5),
                         indexing="ij")
    grid = np.stack([tt.ravel(), xx.ravel()], -1)
    assert infer_grid_shape(grid) == (7, 5)
    shuffled = grid[np.random.default_rng(0).permutation(len(grid))]
    with pytest.raises(ValueError):
        infer_grid_shape(shuffled)


def test_hmc_nuts_pipeline_gram_parity():
    """Full-parameter NUTS-DeepONet pipeline: auto-Gram vs autodiff agree."""
    from vihmc_tpu.data.burgers import get_burgers
    from vihmc_tpu.pipelines import hmc_nuts
    from vihmc_tpu.pipelines.configs import OperatorHMCRunConfig

    dcfg = dataclasses.replace(SMALL, in_branch=12)
    data = get_burgers(jax.random.key(0), 6, 6, None, nx=12, nt=9)
    # L = int(pi*post_var/(2*step)) = 3 at these settings (analytic rule)
    cfg = OperatorHMCRunConfig(model=dcfg, num_samples=10, step_size=2e-4,
                               n_train=6, n_valid=6)
    a = hmc_nuts.run(cfg, key=jax.random.key(1), data=data, use_gram=True)
    b = hmc_nuts.run(cfg, key=jax.random.key(1), data=data, use_gram=False)
    np.testing.assert_allclose(float(a["metrics"]["expected_mse_of_mean"]),
                               float(b["metrics"]["expected_mse_of_mean"]),
                               rtol=1e-4)
