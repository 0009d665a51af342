"""Cone dataset capability (reference's second, never-shipped operator workload).

Reference surface: dict batches {'Xf','Xp','Y'}, recorded min-max
normalization (/root/reference/Operator_network/VI/utils.py:60-80), loader
stub raising NotImplementedError
(/root/reference/Operator_network/HMC/util.py:441-443).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vihmc_tpu.data.cone import (
    CONE_STATS,
    cone_to_operator_splits,
    generate_cone_dataset,
    get_cone,
    load_cone,
    normalize_cone,
    normalize_cone_inputs,
)


def test_normalize_matches_reference_formula():
    """(x - max)/(max - min) with the recorded constants — value checks at
    the recorded min (-> -1) and max (-> 0)."""
    feat = {
        "Xf": np.array([[CONE_STATS.xf_min[0]], [CONE_STATS.xf_max[0]]], np.float32),
        "Xp": np.array([list(CONE_STATS.xp_min), list(CONE_STATS.xp_max)], np.float32),
        "Y": np.array([CONE_STATS.y_min[0], CONE_STATS.y_max[0]], np.float32),
    }
    out = normalize_cone(feat)
    np.testing.assert_allclose(out["Xf"][:, 0], [-1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out["Xp"][0], [-1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(out["Xp"][1], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out["Y"], [-1.0, 0.0], atol=1e-6)

    xf, xp = normalize_cone_inputs(feat["Xf"], feat["Xp"])
    np.testing.assert_allclose(xf, out["Xf"], atol=1e-6)
    np.testing.assert_allclose(xp, out["Xp"], atol=1e-6)


def test_load_cone_without_path_matches_reference_error():
    with pytest.raises(NotImplementedError, match="Cone dataset is not available"):
        load_cone(None, 10, 10)


def test_load_cone_npz_roundtrip(tmp_path):
    feat = generate_cone_dataset(jax.random.key(0), 20, in_branch=9)
    path = tmp_path / "cone.npz"
    np.savez(path, **{k: np.asarray(v) for k, v in feat.items()})
    train, valid = load_cone(str(path), 12, 8)
    assert train["Xf"].shape == (12, 9) and valid["Xf"].shape == (8, 9)
    assert train["Xp"].shape == (12, 2) and train["Y"].shape == (12,)
    # loader normalizes: recorded box maps into [-1, 0]
    assert train["Xp"].min() >= -1.001 and train["Xp"].max() <= 0.001


def test_generate_within_recorded_ranges():
    feat = generate_cone_dataset(jax.random.key(1), 200, in_branch=17)
    xp = np.asarray(feat["Xp"])
    assert xp[:, 0].min() >= 0.241 and xp[:, 0].max() <= 0.316
    assert xp[:, 1].min() >= 50.0 and xp[:, 1].max() <= 500.0
    xf = np.asarray(feat["Xf"])
    assert xf.min() >= CONE_STATS.xf_min[0] and xf.max() <= CONE_STATS.xf_max[0]


def test_cone_operator_split_layout():
    feat = generate_cone_dataset(jax.random.key(2), 10, in_branch=7)
    split = cone_to_operator_splits(feat)
    assert split["branch_in"].shape == (10, 7)
    assert split["trunk_in"].shape == (10, 1, 2)
    assert split["solution"].shape == (10, 1)


def _tiny_cone_setup():
    from vihmc_tpu.models import DeepONetConfig

    model = DeepONetConfig(in_branch=9, in_trunk=2, width_branch=8,
                           width_trunk=8, depth_branch=3, depth_trunk=3,
                           impose_bc=False)
    data = get_cone(jax.random.key(0), 24, 16, in_branch=9)
    return model, data


def test_cone_vi_training_end_to_end():
    from vihmc_tpu.pipelines import vi_train, configs as C
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    model, data = _tiny_cone_setup()
    cfg = C.OperatorVIRunConfig(
        model=model, dataset="Cone", n_train=24, n_valid=16, batch_size=8,
        vi=VIConfig(epochs=30, lr_start=1e-2, num_ens=2, beta_type=1.0,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=0.1)))
    out = vi_train.run_operator(cfg, key=jax.random.key(3), data=data)
    metrics = np.asarray(out["metrics"])
    assert np.isfinite(metrics).all()
    # training reduces the train MSE on the synthetic functional
    assert metrics[-1, 2] < metrics[0, 2]


def test_cone_dataset_switch_and_unknown_dataset():
    from vihmc_tpu.pipelines import vi_train, configs as C
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    model, _ = _tiny_cone_setup()
    cfg = C.OperatorVIRunConfig(
        model=model, dataset="Cone", n_train=12, n_valid=8, batch_size=4,
        vi=VIConfig(epochs=2, lr_start=1e-2, num_ens=1, beta_type=1.0,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=0.1)))
    out = vi_train.run_operator(cfg, key=jax.random.key(4))  # loads via get_cone
    assert np.isfinite(np.asarray(out["metrics"])).all()

    bad = C.OperatorVIRunConfig(model=model, dataset="Wedge")
    with pytest.raises(NotImplementedError, match="Burgers or Cone"):
        vi_train.run_operator(bad, key=jax.random.key(5))


def test_cone_sensitivity_and_vihmc_end_to_end():
    """Three-stage VI -> sensitivity -> VI-HMC on the cone layout (per-example
    query points exercise the DeepONet batched-einsum merge under the
    subspace sampler)."""
    from vihmc_tpu.pipelines import vi_train, sensitivity, vi_hmc, configs as C
    from vihmc_tpu.vi import VIConfig
    from vihmc_tpu.vi.elbo import ELBOConfig

    model, data = _tiny_cone_setup()
    vi_cfg = C.OperatorVIRunConfig(
        model=model, dataset="Cone", n_train=24, n_valid=16, batch_size=8,
        vi=VIConfig(epochs=10, lr_start=1e-2, num_ens=2, beta_type=1.0,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=0.1)))
    vi_out = vi_train.run_operator(vi_cfg, key=jax.random.key(6), data=data)

    sens = sensitivity.run_operator(vi_out["best_state"].vp, model, data[1],
                                    C.SensitivityRunConfig(importance_threshold=0.9))
    assert np.isfinite(sens["scores"]).all() and sens["scores"].max() > 0
    # at tiny scale one parameter can capture >90% alone (the reference's
    # <=-threshold count is then 0); pin a top-8 subspace for the HMC stage
    indices = np.sort(np.argsort(-sens["scores"])[:8])

    hmc_cfg = C.VIHMCRunConfig(num_samples=30, num_chains=2, step_size=1e-3,
                               tau_out=0.1, sample_data=False)
    out = vi_hmc.run_operator(
        hmc_cfg, model,
        {"mu": sens["mu"], "sigma": sens["sigma"], "indices": indices},
        key=jax.random.key(7), data=data)
    samples = np.asarray(out["result"].samples)
    assert samples.shape[:2] == (2, 30)
    assert np.isfinite(samples).all()
