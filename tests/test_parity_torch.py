"""Torch <-> JAX posterior-moment parity (round-1 VERDICT item 4).

BASELINE.md's north star requires "matching the reference's posterior
predictive moments within MC error". The reference substrate is
torch(+hamiltorch); hamiltorch is not installable here, so the torch side is
the same HMC kernel written directly in torch (the construction
bench.py:454-562 uses for timing), sampling the SAME posterior: the 141-param
regression MLP's NLL posterior restricted to a 16-dim VI subspace with the
frozen coordinates fixed at the VI mean (deterministic target, so both
frameworks sample the identical density; reference behavior defined at
/root/reference/Neural_network/VI_HMC/main_VI_HMC.py:337-381).

The assertion is statistical: per-dimension subspace means and stds must
agree within Monte-Carlo error (z-scores from ESS-based standard errors).
A kernel-semantics divergence (wrong acceptance rule, step scaling, mass
handling, likelihood constant) shifts moments by many MC sigmas and fails.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vihmc_tpu.chains import sample_chains, effective_sample_size_np
from vihmc_tpu.dists.likelihoods import get_likelihood
from vihmc_tpu.dists.priors import DiagonalGaussianPrior
from vihmc_tpu.hmc import HMCConfig, FrozenPolicy, SubspaceSpec, make_subspace_log_prob
from vihmc_tpu.models import MLPConfig
from vihmc_tpu.pipelines.common import make_flat_mlp
from vihmc_tpu.data.synthetic import regression_data

TAU_VAR = 5e-2 ** 2
L, STEP = 16, 0.02
DRAWS, BURN, CHAINS = 1200, 200, 4


def _problem():
    mlp = MLPConfig()
    apply_flat, flat0, _ = make_flat_mlp(mlp)
    d = flat0.shape[0]
    data = regression_data(jax.random.key(0), 20, 50, noise_std=5e-2)
    rng = np.random.default_rng(0)
    mu = jnp.asarray(0.1 * rng.normal(size=d), jnp.float32)
    sigma = jnp.asarray(0.05 + 0.05 * rng.random(d), jnp.float32)
    idx = np.sort(rng.choice(d, size=16, replace=False))
    return mlp, apply_flat, data, mu, sigma, idx


def _torch_forward_factory(mlp, x_np):
    import torch

    x_t = torch.tensor(x_np)
    dims = mlp.layer_dims

    def forward(flat):
        # jax ravel_pytree order: per layer {'b','w'} sorted -> bias then
        # row-major (out, in) weight (same unpack as bench.py's baseline)
        i, h = 0, x_t
        for li, (d_in, d_out) in enumerate(dims):
            b = flat[i:i + d_out]; i += d_out
            w = flat[i:i + d_in * d_out].view(d_out, d_in); i += d_in * d_out
            h = torch.nn.functional.linear(h, w, b)
            if li < len(dims) - 1:
                h = torch.tanh(h)
        return h

    return forward


def _torch_sample(mlp, data, mu, sigma, idx, seed=0):
    """Plain fixed-step HMC in torch on the identical (MEAN-frozen) target;
    returns (draws, d_sub) post-burn samples."""
    import torch

    torch.manual_seed(seed)
    forward = _torch_forward_factory(mlp, np.asarray(data["x_train"]))
    y_t = torch.tensor(np.asarray(data["y_train"]))
    mu_t = torch.tensor(np.asarray(mu))
    sigma_t = torch.tensor(np.asarray(sigma))
    idx_t = torch.tensor(np.asarray(idx), dtype=torch.long)
    nll = torch.nn.GaussianNLLLoss(reduction="sum")
    inv_mass = sigma_t[idx_t] ** 2

    def log_prob(q_sub):
        full = mu_t.clone()
        full[idx_t] = q_sub
        pred = forward(full)
        ll = -nll(pred, y_t, TAU_VAR * torch.ones_like(pred))
        pr = torch.distributions.Normal(
            mu_t[idx_t], sigma_t[idx_t]).log_prob(q_sub).sum()
        return ll + pr

    def grad_lp(q):
        q = q.detach().requires_grad_(True)
        lp = log_prob(q)
        (g,) = torch.autograd.grad(lp, q)
        return lp.detach(), g

    q = mu_t[idx_t].clone()
    lp0, g = grad_lp(q)
    out = []
    for it in range(DRAWS):
        p = torch.randn_like(q) / inv_mass.sqrt()
        q_new, p_new, g_new, lp1 = q.clone(), p.clone(), g.clone(), lp0
        for _ in range(L):
            p_new = p_new + 0.5 * STEP * g_new
            q_new = q_new + STEP * inv_mass * p_new
            lp1, g_new = grad_lp(q_new)
            p_new = p_new + 0.5 * STEP * g_new
        delta = (lp1 - 0.5 * (inv_mass * p_new * p_new).sum()) - \
                (lp0 - 0.5 * (inv_mass * p * p).sum())
        if torch.isfinite(delta) and torch.log(torch.rand(())) < delta:
            q, lp0, g = q_new, lp1, g_new
        if it >= BURN:
            out.append(q.clone().numpy())
    return np.stack(out)


@pytest.mark.slow
def test_posterior_moments_match_torch_kernel():
    mlp, apply_flat, data, mu, sigma, idx = _problem()

    # forward-parity gate: the two flat-vector unpacks must agree, else the
    # moment comparison below compares different posteriors
    import torch

    forward = _torch_forward_factory(mlp, np.asarray(data["x_train"]))
    want = np.asarray(apply_flat(mu, data["x_train"]))
    got = forward(torch.tensor(np.asarray(mu))).numpy()
    np.testing.assert_allclose(want, got, rtol=1e-4, atol=1e-5)

    # --- jax chains ---
    spec = SubspaceSpec(idx=tuple(int(i) for i in idx), mu=mu, sigma=sigma)
    like = get_likelihood("NLL")

    def full_ll(flat):
        return like(apply_flat(flat, data["x_train"]), data["y_train"], TAU_VAR)

    lp_like, aux0, refresh = make_subspace_log_prob(full_ll, spec,
                                                    FrozenPolicy.MEAN)
    prior = DiagonalGaussianPrior(loc=spec.sub_mu(), scale=spec.sub_sigma())

    def log_prob(q, aux):
        return lp_like(q, aux) + prior.log_prob(q)

    cfg = HMCConfig(num_samples=DRAWS, num_leapfrog=L, step_size=STEP,
                    burn=0, sampler="hmc")
    inits = jnp.tile(spec.sub_mu()[None, :], (CHAINS, 1))
    res = sample_chains(log_prob, inits, jax.random.key(1), cfg,
                        inv_mass=spec.sub_sigma() ** 2, aux=aux0,
                        aux_refresh=refresh)
    jx = np.asarray(res.samples)[:, BURN:, :]          # (C, S, d)
    assert float(res.acceptance_rate) > 0.5

    # --- torch chains (2 independent seeds = 2 chains) ---
    tx = np.stack([_torch_sample(mlp, data, mu, sigma, idx, seed=s)
                   for s in (0, 1)])                   # (2, S, d)

    ess_j = np.maximum(effective_sample_size_np(jx), 4.0)
    ess_t = np.maximum(effective_sample_size_np(tx), 4.0)

    mean_j, mean_t = jx.mean(axis=(0, 1)), tx.mean(axis=(0, 1))
    std_j, std_t = jx.std(axis=(0, 1)), tx.std(axis=(0, 1))
    pooled_var = 0.5 * (std_j ** 2 + std_t ** 2)

    se_mean = np.sqrt(pooled_var * (1.0 / ess_j + 1.0 / ess_t))
    z_mean = np.abs(mean_j - mean_t) / se_mean
    # std standard error ~ std / sqrt(2 ess)
    se_std = np.sqrt(pooled_var * (0.5 / ess_j + 0.5 / ess_t))
    z_std = np.abs(std_j - std_t) / se_std

    # 16 dims, two statistics: 5-sigma per-dim bound keeps the false-alarm
    # rate negligible while a kernel-semantics bug (wrong temperature, step
    # scaling, accept rule) shifts moments by tens of sigmas
    assert z_mean.max() < 5.0, (z_mean, mean_j - mean_t)
    assert z_std.max() < 5.0, (z_std, std_j, std_t)
