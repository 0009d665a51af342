import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.models import MLPConfig, init_mlp, init_variational
from vihmc_tpu.vi import (
    ELBOConfig,
    elbo_loss,
    get_beta,
    VIConfig,
    init_train_state,
    make_train_step,
    make_eval_fn,
    train,
    predictive_samples,
)
from vihmc_tpu.vi.train import plateau_init, plateau_update
from vihmc_tpu.pipelines.common import mlp_vi_apply


def test_elbo_sum_matches_torch():
    import torch
    import torch.nn.functional as F

    pred = np.array([[0.1], [1.2], [-0.4]], dtype=np.float32)
    y = np.array([[0.0], [1.0], [0.0]], dtype=np.float32)
    kl, beta, var = 3.7, 0.5, 0.25
    got = float(elbo_loss(ELBOConfig(reduction="sum", fixed_noise_var=var),
                          jnp.array(pred), jnp.array(y), kl, beta, train_size=3))
    want = float(F.gaussian_nll_loss(torch.tensor(pred), torch.tensor(y),
                                     var * torch.ones_like(torch.tensor(y)),
                                     reduction="sum") + beta * kl)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_elbo_mean_x_n_matches_torch():
    import torch
    import torch.nn.functional as F

    pred = np.random.default_rng(0).normal(size=(4, 7)).astype(np.float32)
    y = np.random.default_rng(1).normal(size=(4, 7)).astype(np.float32)
    kl, beta, n = 10.0, 1.0, 1000
    got = float(elbo_loss(ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0),
                          jnp.array(pred), jnp.array(y), kl, beta, train_size=n))
    want = float(F.gaussian_nll_loss(torch.tensor(pred), torch.tensor(y),
                                     torch.ones_like(torch.tensor(y)),
                                     reduction="mean") * n + beta * kl)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_elbo_learned_noise_homoscedastic():
    pred = jnp.zeros((3, 1)); y = jnp.ones((3, 1))
    log_var = jnp.asarray(0.5)
    cfg = ELBOConfig(reduction="sum", learn_noise=True, noise_type=0)
    got = float(elbo_loss(cfg, pred, y, 0.0, 0.0, 3, log_var))
    var = float(jnp.exp(log_var))
    want = 3 * 0.5 * (np.log(var) + 1.0 / var)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_beta_schedules_match_reference():
    # constant
    assert get_beta(0, 10, 1.0, 0, 100) == 1.0
    # Blundell: 2^(m - i - 1) / (2^m - 1)
    m = 5
    np.testing.assert_allclose(get_beta(0, m, "Blundell", 0, 1), 2 ** (m - 1) / (2 ** m - 1))
    total = sum(get_beta(i, m, "Blundell", 0, 1) for i in range(m))
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)
    # Standard
    np.testing.assert_allclose(get_beta(3, 8, "Standard", 0, 1), 1 / 8)
    # Soenderby ramps to 1
    assert get_beta(0, 1, "Soenderby", 0, 100) == 0.0
    assert get_beta(0, 1, "Soenderby", 50, 100) == 1.0
    # linear
    np.testing.assert_allclose(get_beta(0, 1, "linear", 0, 100), 1e-4)
    assert get_beta(0, 1, "linear", 100, 100) == 1.0


def test_plateau_reduces_after_patience():
    st = plateau_init()
    st = plateau_update(st, jnp.asarray(1.0), patience=2, factor=0.1, min_scale=0.01)
    assert float(st.scale) == 1.0
    for _ in range(4):  # no improvement
        st = plateau_update(st, jnp.asarray(1.0), patience=2, factor=0.1, min_scale=0.01)
    np.testing.assert_allclose(float(st.scale), 0.1, rtol=1e-6)
    # floor at min_scale
    for _ in range(20):
        st = plateau_update(st, jnp.asarray(1.0), patience=2, factor=0.1, min_scale=0.01)
    assert float(st.scale) >= 0.01 - 1e-9


def _tiny_setup():
    mlp = MLPConfig(in_dim=1, widths=(8,), out_dim=1)
    template = init_mlp(jax.random.key(0), mlp)
    vp = init_variational(jax.random.key(1), template,
                          posterior_mu_initial=(0.0, 0.1),
                          posterior_rho_initial=(-3.0, 0.1))
    x = jnp.linspace(-1, 1, 16).reshape(-1, 1)
    y = jnp.sin(3 * x)
    cfg = VIConfig(epochs=60, lr_start=5e-2, patience=20, num_ens=3,
                   prior_sigma=1.0,
                   elbo=ELBOConfig(reduction="sum", fixed_noise_var=0.01))
    return mlp, vp, {"x": x, "y": y}, cfg


def test_vi_training_reduces_loss_and_fits():
    mlp, vp, batch, cfg = _tiny_setup()
    apply_fn = mlp_vi_apply(mlp)
    state = init_train_state(vp, cfg)
    step = make_train_step(apply_fn, cfg, train_size=16)
    evaluate = make_eval_fn(apply_fn, cfg, train_size=16)
    _, mse0 = evaluate(state, batch, jax.random.key(9), 1.0)
    key = jax.random.key(2)
    for i in range(cfg.epochs):
        key, sk = jax.random.split(key)
        state, loss = step(state, batch, sk, 1.0)
    _, mse1 = evaluate(state, batch, jax.random.key(9), 1.0)
    assert float(mse1) < float(mse0) * 0.5


def test_train_loop_runs_with_metrics_and_best():
    mlp, vp, batch, cfg = _tiny_setup()
    cfg = VIConfig(**{**cfg.__dict__, "epochs": 10})
    apply_fn = mlp_vi_apply(mlp)
    state = init_train_state(vp, cfg)
    final, best, metrics = train(apply_fn, state, cfg,
                                 lambda k, e: [batch], batch, batch,
                                 train_size=16, key=jax.random.key(3))
    assert metrics.shape == (10, 4)
    assert int(final.epoch) == 10


def test_predictive_samples_shape():
    mlp, vp, batch, cfg = _tiny_setup()
    apply_fn = mlp_vi_apply(mlp)
    preds = predictive_samples(apply_fn, vp, batch, jax.random.key(0), 20)
    assert preds.shape == (20, 16, 1)
    assert np.std(np.asarray(preds), axis=0).mean() > 0  # stochastic
