"""Learned-noise operator VI (homo + heteroscedastic) and subsampled VI-HMC."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.models import DeepONetConfig
from vihmc_tpu.vi import VIConfig, accuracy
from vihmc_tpu.vi.elbo import ELBOConfig
from vihmc_tpu.pipelines import vi_train, vi_hmc, configs as C
from vihmc_tpu.data import get_burgers

TINY = DeepONetConfig(in_branch=9, in_trunk=5, width_branch=8, width_trunk=8,
                      depth_branch=3, depth_trunk=3)
TINY_HETERO = DeepONetConfig(in_branch=9, in_trunk=5, width_branch=8,
                             width_trunk=8, depth_branch=3, depth_trunk=3,
                             noise_neurons=2)


def _data():
    return get_burgers(jax.random.key(0), 8, 4, nx=9, nt=5)


def test_operator_vi_learned_homoscedastic_noise():
    cfg = C.OperatorVIRunConfig(
        model=TINY, n_train=8, n_valid=4, batch_size=4, p=20,
        vi=VIConfig(epochs=3, lr_start=1e-3, num_ens=2, prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n", learn_noise=True,
                                    noise_type=0)))
    out = vi_train.run_operator(cfg, key=jax.random.key(1), data=_data())
    # metrics rows gain the aleatoric-noise column
    assert out["metrics"].shape[1] == 5
    assert np.isfinite(out["metrics"]).all()
    # the noise parameter moved from its zero init
    assert float(out["state"].noise_param) != 0.0


def test_operator_vi_heteroscedastic_noise_head():
    cfg = C.OperatorVIRunConfig(
        model=TINY_HETERO, n_train=8, n_valid=4, batch_size=4, p=20,
        vi=VIConfig(epochs=3, lr_start=1e-3, num_ens=2, prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n", learn_noise=True,
                                    noise_type=1)))
    out = vi_train.run_operator(cfg, key=jax.random.key(2), data=_data())
    assert np.isfinite(out["metrics"]).all()


def test_vihmc_operator_trunk_subsampling():
    data = _data()
    d = TINY.num_params
    rng = np.random.default_rng(0)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.05,
                 "sigma": (0.02 + 0.02 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=12, replace=False))}
    cfg = C.VIHMCRunConfig(num_samples=12, step_size=1e-3, post_std=0.02,
                           num_chains=2, loss="NLL", tau_out=1.0,
                           frozen_policy="refresh", sample_data=True, p=10)
    out = vi_hmc.run_operator(cfg, TINY, artifacts, key=jax.random.key(3),
                              data=data)
    assert out["result"].samples.shape == (2, 12, 12)
    assert np.isfinite(np.asarray(out["result"].samples)).all()
    assert np.isfinite(float(out["metrics"]["mean_sample_mse"]))
    # also with a non-refresh frozen policy (tidx still refreshes)
    cfg2 = C.VIHMCRunConfig(num_samples=6, step_size=1e-3, post_std=0.02,
                            num_chains=1, loss="NLL", tau_out=1.0,
                            frozen_policy="mean", sample_data=True, p=10)
    out2 = vi_hmc.run_operator(cfg2, TINY, artifacts, key=jax.random.key(4),
                               data=data)
    assert np.isfinite(np.asarray(out2["result"].samples)).all()


def test_accuracy_metric():
    logits = np.array([[2.0, 1.0], [0.1, 3.0], [5.0, 0.0]])
    assert accuracy(logits, np.array([0, 1, 1])) == 2 / 3
