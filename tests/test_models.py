import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.core import ravel_pytree
from vihmc_tpu.models import (
    MLPConfig,
    init_mlp,
    mlp_apply,
    DeepONetConfig,
    init_deeponet,
    deeponet_apply,
    bc_embedding,
    init_variational,
    sample_params,
    kl_gaussian,
    kl_divergence,
    bayesian_mlp_apply,
    bayesian_deeponet_apply,
    bbb_conv2d_apply,
    lrt_conv2d_apply,
)


def test_mlp_param_count_reference_nn():
    # reference MLP 1->10->10->1 tanh = 141 params (verified against torch;
    # printed at Neural_network/HMC/main_regression_hmc.py:116)
    cfg = MLPConfig(in_dim=1, widths=(10, 10), out_dim=1, activation="tanh")
    assert cfg.num_params == 141
    params = init_mlp(jax.random.key(0), cfg)
    flat, _ = ravel_pytree(params)
    assert flat.shape == (141,)


def test_mlp_no_last_bias():
    cfg = MLPConfig(in_dim=1, widths=(10, 10), out_dim=1, last_bias=False)
    assert cfg.num_params == 140
    params = init_mlp(jax.random.key(0), cfg)
    assert "b" not in params[-1]
    y = mlp_apply(cfg, params, jnp.ones((5, 1)))
    assert y.shape == (5, 1)


def test_mlp_matches_torch_forward():
    import torch
    import torch.nn as nn

    cfg = MLPConfig(in_dim=1, widths=(10, 10), out_dim=1, activation="tanh")
    params = init_mlp(jax.random.key(0), cfg)

    net = nn.Sequential(
        nn.Linear(1, 10), nn.Tanh(), nn.Linear(10, 10), nn.Tanh(), nn.Linear(10, 1)
    )
    with torch.no_grad():
        for i, lin in enumerate([net[0], net[2], net[4]]):
            lin.weight.copy_(torch.tensor(np.asarray(params[i]["w"])))
            lin.bias.copy_(torch.tensor(np.asarray(params[i]["b"])))

    x = np.linspace(-1, 1, 13).reshape(-1, 1).astype(np.float32)
    want = net(torch.tensor(x)).detach().numpy()
    got = np.asarray(mlp_apply(cfg, params, jnp.array(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_deeponet_param_count_reference_operator():
    # reference DeepONet: branch 101->[100 x 8]->100, trunk 5->[100 x 8]->100,
    # + scalar merge bias (Operator_network/VI_HMC/config.py:12-27) ~ 172.4k
    cfg = DeepONetConfig()
    expected = 1
    expected += (101 * 100 + 100) + 7 * (100 * 100 + 100) + (100 * 100 + 100)  # branch
    expected += (5 * 100 + 100) + 7 * (100 * 100 + 100) + (100 * 100 + 100)    # trunk
    assert cfg.num_params == expected
    params = init_deeponet(jax.random.key(0), cfg)
    flat, _ = ravel_pytree(params)
    assert flat.shape == (expected,)


def test_bc_embedding():
    xy = jnp.array([[[0.5, 0.25]]])  # (..., [t, x])
    emb = np.asarray(bc_embedding(xy))[0, 0]
    np.testing.assert_allclose(
        emb,
        [0.5, np.sin(np.pi / 2), np.sin(np.pi), np.cos(np.pi / 2), np.cos(np.pi)],
        atol=1e-6,
    )


def test_deeponet_shared_vs_per_example_trunk_agree():
    cfg = DeepONetConfig(in_branch=7, in_trunk=5, width_branch=8, width_trunk=8,
                         depth_branch=3, depth_trunk=3)
    params = init_deeponet(jax.random.key(1), cfg)
    B, P = 4, 6
    bx = jax.random.normal(jax.random.key(2), (B, 7))
    tx = jax.random.normal(jax.random.key(3), (P, 2))
    y_shared = deeponet_apply(cfg, params, bx, tx)
    y_batched = deeponet_apply(cfg, params, bx, jnp.broadcast_to(tx, (B, P, 2)))
    assert y_shared.shape == (B, P)
    np.testing.assert_allclose(np.asarray(y_shared), np.asarray(y_batched), atol=1e-5)


def test_deeponet_matches_torch_reference_arch():
    """Forward parity with the reference DeepONet (Operator_network/HMC/model.py)."""
    import torch
    import torch.nn as nn

    cfg = DeepONetConfig(in_branch=6, in_trunk=5, width_branch=8, width_trunk=8,
                         depth_branch=3, depth_trunk=3, impose_bc=True)
    params = init_deeponet(jax.random.key(0), cfg)

    class TorchDeepONet(nn.Module):
        def __init__(self):
            super().__init__()
            self.b = nn.Parameter(torch.tensor(0.0))
            self.b1 = nn.Sequential(nn.Linear(6, 8), nn.Tanh(), nn.Linear(8, 8),
                                    nn.Tanh(), nn.Linear(8, 8))
            self.b2 = nn.Sequential(nn.Linear(5, 8), nn.Tanh(), nn.Linear(8, 8),
                                    nn.Tanh(), nn.Linear(8, 8))

        def lambda_layer(self, x):
            pi = np.pi
            return torch.stack([torch.sin(2 * pi * x), torch.sin(4 * pi * x),
                                torch.cos(2 * pi * x), torch.cos(4 * pi * x)], dim=2)

        def forward(self, x1, x2):
            x1_out = self.b1(x1)
            x_bc = self.lambda_layer(x2[:, :, 1])
            x_bc = torch.cat([x2[:, :, 0].unsqueeze(dim=2), x_bc], dim=2)
            x2_out = self.b2(x_bc)
            y = torch.einsum("...i,...i->...", x1_out.unsqueeze(1), x2_out)
            return y + self.b

    net = TorchDeepONet()
    with torch.no_grad():
        for stack, layers in [("branch", [net.b1[0], net.b1[2], net.b1[4]]),
                              ("trunk", [net.b2[0], net.b2[2], net.b2[4]])]:
            for i, lin in enumerate(layers):
                lin.weight.copy_(torch.tensor(np.asarray(params[stack][i]["w"])))
                lin.bias.copy_(torch.tensor(np.asarray(params[stack][i]["b"])))

    B, P = 3, 5
    rng = np.random.default_rng(0)
    bx = rng.normal(size=(B, 6)).astype(np.float32)
    tx = rng.uniform(size=(B, P, 2)).astype(np.float32)
    want = net(torch.tensor(bx), torch.tensor(tx)).detach().numpy()
    got = np.asarray(deeponet_apply(cfg, params, jnp.array(bx), jnp.array(tx)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_deeponet_hetero_head_shapes():
    cfg = DeepONetConfig(in_branch=7, in_trunk=5, width_branch=8, width_trunk=8,
                         depth_branch=3, depth_trunk=3, noise_neurons=2)
    params = init_deeponet(jax.random.key(1), cfg)
    y, noise = deeponet_apply(cfg, params, jnp.ones((4, 7)), jnp.ones((6, 2)))
    assert y.shape == (4, 6) and noise.shape == (4, 6)


# ---------------------------------------------------------------------------
# Bayesian variants
# ---------------------------------------------------------------------------

def test_kl_gaussian_matches_reference_formula():
    import torch

    def torch_kl(mu_q, sig_q, mu_p, sig_p):
        # verbatim reference formula (Neural_network/VI/metrics.py:40-42)
        return 0.5 * (2 * torch.log(sig_p / sig_q) - 1 + (sig_q / sig_p).pow(2)
                      + ((mu_p - mu_q) / sig_p).pow(2)).sum()

    mu_p = torch.tensor([0.3, -0.2]); sig_p = torch.tensor([0.5, 1.5])
    want = float(torch_kl(torch.tensor(0.0), torch.tensor(1.0), mu_p, sig_p))
    got = float(kl_gaussian(0.0, 1.0, jnp.array([0.3, -0.2]), jnp.array([0.5, 1.5])))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_zero_when_posterior_equals_prior():
    cfg = MLPConfig(in_dim=1, widths=(4,), out_dim=1)
    template = init_mlp(jax.random.key(0), cfg)
    # force posterior == prior: mu=0, sigma=1 => rho = softplus^-1(1)
    rho_val = float(np.log(np.expm1(1.0)))
    vp = {
        "mu": jax.tree_util.tree_map(jnp.zeros_like, template),
        "rho": jax.tree_util.tree_map(lambda p: jnp.full_like(p, rho_val), template),
    }
    for direction in ("reference", "standard"):
        np.testing.assert_allclose(float(kl_divergence(vp, 0.0, 1.0, direction)), 0.0, atol=1e-5)


def test_bayesian_mlp_modes():
    cfg = MLPConfig(in_dim=1, widths=(5, 5), out_dim=1)
    template = init_mlp(jax.random.key(0), cfg)
    vp = init_variational(jax.random.key(1), template)
    x = jnp.linspace(-1, 1, 9).reshape(-1, 1)
    for mode in ("bbb", "lrt"):
        y1 = bayesian_mlp_apply(cfg, vp, x, jax.random.key(2), mode=mode, sample=True)
        y2 = bayesian_mlp_apply(cfg, vp, x, jax.random.key(3), mode=mode, sample=True)
        assert y1.shape == (9, 1)
        assert not np.allclose(np.asarray(y1), np.asarray(y2))  # stochastic
        # eval mode deterministic and equal across modes (both use the mean)
        e1 = bayesian_mlp_apply(cfg, vp, x, jax.random.key(4), mode=mode, sample=False)
        e2 = bayesian_mlp_apply(cfg, vp, x, jax.random.key(5), mode=mode, sample=False)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_lrt_moments_match_bbb_moments():
    """LRT and BBB induce the same predictive mean/variance for a single layer."""
    key = jax.random.key(0)
    cfg = MLPConfig(in_dim=3, widths=(), out_dim=2)
    template = init_mlp(key, cfg)
    vp = init_variational(jax.random.key(1), template,
                          posterior_mu_initial=(0.5, 0.1), posterior_rho_initial=(0.0, 0.1))
    x = jnp.array([[0.3, -1.0, 2.0]])
    n = 4000
    keys = jax.random.split(jax.random.key(2), n)
    ys_bbb = jax.vmap(lambda k: bayesian_mlp_apply(cfg, vp, x, k, mode="bbb"))(keys)
    ys_lrt = jax.vmap(lambda k: bayesian_mlp_apply(cfg, vp, x, k, mode="lrt"))(keys)
    m_b, v_b = np.mean(np.asarray(ys_bbb), 0), np.var(np.asarray(ys_bbb), 0)
    m_l, v_l = np.mean(np.asarray(ys_lrt), 0), np.var(np.asarray(ys_lrt), 0)
    np.testing.assert_allclose(m_b, m_l, atol=0.1)
    np.testing.assert_allclose(v_b, v_l, rtol=0.25)


def test_bayesian_deeponet_runs_and_hetero():
    cfg = DeepONetConfig(in_branch=7, in_trunk=5, width_branch=8, width_trunk=8,
                         depth_branch=3, depth_trunk=3, noise_neurons=2)
    template = init_deeponet(jax.random.key(0), cfg)
    vp = init_variational(jax.random.key(1), template)
    y, noise = bayesian_deeponet_apply(cfg, vp, jnp.ones((4, 7)), jnp.ones((6, 2)),
                                       jax.random.key(2))
    assert y.shape == (4, 6) and noise.shape == (4, 6)
    assert float(kl_divergence(vp, 0.0, 0.1)) > 0


def test_bayesian_conv_layers():
    key = jax.random.key(0)
    layer_mu = {"w": 0.1 * jax.random.normal(key, (4, 3, 3, 3)), "b": jnp.zeros(4)}
    layer_rho = {"w": jnp.full((4, 3, 3, 3), -3.0), "b": jnp.full((4,), -3.0)}
    x = jax.random.normal(jax.random.key(1), (2, 3, 8, 8))
    for fn in (bbb_conv2d_apply, lrt_conv2d_apply):
        y = fn(jax.random.key(2), layer_mu, layer_rho, x)
        assert y.shape == (2, 4, 8, 8)
        ye = fn(jax.random.key(3), layer_mu, layer_rho, x, sample=False)
        # eval mode equals deterministic conv with mean weights
        import jax.lax as lax
        want = lax.conv_general_dilated(x, layer_mu["w"], (1, 1), "SAME",
                                        dimension_numbers=("NCHW", "OIHW", "NCHW"))
        want = want + layer_mu["b"][None, :, None, None]
        np.testing.assert_allclose(np.asarray(ye), np.asarray(want), atol=1e-5)
