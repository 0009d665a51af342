"""End-to-end pipeline tests at tiny scale: the 8 reference entry points.

Mirrors the reference's manual quality controls (SURVEY.md section 4) as
automated golden checks: each pipeline runs on shrunken configs, produces
finite metrics, persists its artifact contract, and the full three-stage
VI -> sensitivity -> VI-HMC chain runs end to end for both workloads.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.models import MLPConfig, DeepONetConfig
from vihmc_tpu.vi import VIConfig
from vihmc_tpu.vi.elbo import ELBOConfig
from vihmc_tpu.pipelines import configs as C
from vihmc_tpu.pipelines import hmc_full, vi_train, sensitivity, vi_hmc, hmc_nuts, hmc_split
from vihmc_tpu.pipelines.postprocess import (
    l2_relative_error,
    error_report,
    error_sigma_correlation,
    function_space_diagnostics,
    stack_runs,
)
from vihmc_tpu.io import RunStore

TINY_MLP = MLPConfig(in_dim=1, widths=(8, 8), out_dim=1, activation="tanh")
TINY_DEEPONET = DeepONetConfig(in_branch=9, in_trunk=5, width_branch=8, width_trunk=8,
                               depth_branch=3, depth_trunk=3)


@pytest.fixture(scope="module")
def tiny_burgers():
    from vihmc_tpu.data import get_burgers

    return get_burgers(jax.random.key(0), 8, 4, nx=9, nt=5)


def test_hmc_full_nn_end_to_end(tmp_path):
    cfg = C.NNHMCRunConfig(model=TINY_MLP, num_samples=60, step_size=2e-3,
                           post_std=0.05, num_chains=2)
    store = RunStore(str(tmp_path))
    out = hmc_full.run(cfg, key=jax.random.key(0), store=store)
    m = out["metrics"]
    assert np.isfinite(float(m["expected_mse_of_mean"]))
    assert float(m["acceptance_rate"]) > 0.2
    assert out["result"].samples.shape == (2, 60, TINY_MLP.num_params)
    assert store.load_array("hmc_params").shape == (2, 60, TINY_MLP.num_params)
    assert np.isfinite(store.load_array("sample_mse")).all()


def _nn_vi_cfg(epochs=30):
    return C.NNVIRunConfig(
        model=TINY_MLP,
        vi=VIConfig(epochs=epochs, lr_start=2e-2, patience=10, num_ens=2,
                    prior_sigma=1.0,
                    elbo=ELBOConfig(reduction="sum", fixed_noise_var=5e-2 ** 2)),
    )


def test_nn_three_stage_vi_sensitivity_vihmc(tmp_path):
    """The flagship chain for the NN workload."""
    key = jax.random.key(0)
    # stage 1: VI
    vi_out = vi_train.run_nn(_nn_vi_cfg(), key=key)
    assert vi_out["metrics"].shape[0] == 30
    assert np.isfinite(vi_out["metrics"]).all()

    # stage 2: sensitivity
    store = RunStore(str(tmp_path))
    sens = sensitivity.run_nn(vi_out["best_state"].vp, TINY_MLP,
                              vi_out["data"]["x_val"][:50],
                              C.SensitivityRunConfig(importance_threshold=0.9),
                              store=store)
    d = TINY_MLP.num_params
    assert sens["scores"].shape == (d,)
    assert 0 < sens["num_sensitive"] < d
    assert store.load_array("gradient_indices").shape == sens["indices"].shape

    # stage 3: subspace HMC from the artifacts
    artifacts = {"mu": store.load_array("means_flattened"),
                 "sigma": store.load_array("stds_flattened"),
                 "indices": store.load_array("gradient_indices")}
    cfg = C.VIHMCRunConfig(num_samples=40, step_size=1e-3, post_std=0.05,
                           num_chains=2, frozen_policy="refresh",
                           tau_out=5e-2 ** 2, loss="NLL")
    out = vi_hmc.run_nn(cfg, TINY_MLP, artifacts, key=jax.random.key(1),
                        data=vi_out["data"])
    assert out["result"].samples.shape == (2, 40, sens["num_sensitive"])
    assert np.isfinite(float(out["metrics"]["expected_mse_of_mean"]))
    assert np.isfinite(np.asarray(out["ess"])).all()


def test_vihmc_policies_and_priors(tmp_path):
    """All frozen policies x prior options compile and run."""
    d = TINY_MLP.num_params
    rng = np.random.default_rng(0)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=10, replace=False))}
    for policy in ("mean", "draw", "refresh"):
        for load_prior, load_std, vi_mass in [(True, True, False), (True, False, True),
                                              (False, False, False)]:
            cfg = C.VIHMCRunConfig(num_samples=10, step_size=1e-3, post_std=0.05,
                                   num_chains=1, frozen_policy=policy,
                                   load_prior=load_prior, load_std=load_std,
                                   vi_mass=vi_mass, tau_out=5e-2 ** 2)
            out = vi_hmc.run_nn(cfg, TINY_MLP, artifacts, key=jax.random.key(2))
            assert np.isfinite(np.asarray(out["result"].samples)).all()


def test_vihmc_lowrank_metric():
    """lowrank_rank>0 builds the Lanczos low-rank+diagonal kinetic metric
    (hmc/metric.py — round-3 finding: the 90%-subspace conditional is
    off-diagonally stiff beyond any diagonal metric) and samples with it."""
    d = TINY_MLP.num_params
    rng = np.random.default_rng(5)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=12, replace=False))}
    cfg = C.VIHMCRunConfig(num_samples=20, num_chains=2, step_size=1e-2,
                           frozen_policy="draw", vi_mass=True,
                           lowrank_rank=3, tau_out=5e-2 ** 2)
    out = vi_hmc.run_nn(cfg, TINY_MLP, artifacts, key=jax.random.key(6))
    samples = np.asarray(out["result"].samples)
    assert samples.shape[:2] == (2, 20)
    assert np.isfinite(samples).all()
    # unsupported combos surface as clear errors
    import pytest as _pytest

    bad = C.VIHMCRunConfig(num_samples=4, num_chains=1, lowrank_rank=2,
                           algorithm="nuts", tau_out=5e-2 ** 2)
    with _pytest.raises(ValueError, match="lowrank_rank"):
        vi_hmc.run_nn(bad, TINY_MLP, artifacts, key=jax.random.key(7))


def test_vihmc_auto_algorithm_probe():
    """algorithm='auto' probes the preconditioned conditional curvature and
    picks the regime's measured-best sampler (VERDICT r3 item 9): soft or
    metric-corrected -> fixed-L 'hmc'; residual stiffness -> 'nuts'."""
    d = TINY_MLP.num_params
    rng = np.random.default_rng(9)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=10, replace=False))}
    # tau_out tiny -> likelihood curvature enormous relative to the
    # VI-sigma preconditioner -> stiff -> NUTS
    stiff = C.VIHMCRunConfig(num_samples=8, num_chains=1, algorithm="auto",
                             vi_mass=True, tau_out=1e-8)
    out = vi_hmc.run_nn(stiff, TINY_MLP, artifacts, key=jax.random.key(10))
    assert out["auto_probe"]["algorithm"] == "nuts"
    assert out["auto_probe"]["lambda_max"] > 100.0
    # same stiffness but a low-rank metric configured -> metric absorbs it,
    # fixed-L hmc chosen
    stiff_lr = C.VIHMCRunConfig(num_samples=8, num_chains=1,
                                algorithm="auto", vi_mass=True,
                                tau_out=1e-8, lowrank_rank=4)
    out = vi_hmc.run_nn(stiff_lr, TINY_MLP, artifacts,
                        key=jax.random.key(11))
    assert out["auto_probe"]["algorithm"] == "hmc"
    # soft conditional (huge noise variance -> prior-dominated) -> hmc
    soft = C.VIHMCRunConfig(num_samples=8, num_chains=1, algorithm="auto",
                            vi_mass=True, tau_out=1e4)
    out = vi_hmc.run_nn(soft, TINY_MLP, artifacts, key=jax.random.key(12))
    assert out["auto_probe"]["algorithm"] == "hmc"
    assert out["auto_probe"]["lambda_max"] < 100.0


def test_vihmc_chees_algorithm():
    """algorithm='chees' runs the coupled-chain adaptive sampler end-to-end."""
    d = TINY_MLP.num_params
    rng = np.random.default_rng(3)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=10, replace=False))}
    cfg = C.VIHMCRunConfig(num_samples=30, num_chains=4, step_size=1e-3,
                           algorithm="chees", chees_max_steps=32,
                           frozen_policy="refresh", tau_out=5e-2 ** 2)
    out = vi_hmc.run_nn(cfg, TINY_MLP, artifacts, key=jax.random.key(4))
    samples = np.asarray(out["result"].samples)
    assert samples.shape[:2] == (4, 30)
    assert np.isfinite(samples).all()
    assert np.isfinite(np.asarray(out["result"].aux_trace["n_steps"])).all()


def test_vihmc_saves_vi_draw_trace(tmp_path):
    """save_vi_trace persists the per-iteration frozen VI draw as the
    'vi_params' artifact (reference my_make_func.py:45-50), and REFRESH
    actually redraws it each iteration."""
    d = TINY_MLP.num_params
    rng = np.random.default_rng(1)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=10, replace=False))}
    store = RunStore(str(tmp_path))
    cfg = C.VIHMCRunConfig(num_samples=8, step_size=1e-3, post_std=0.05,
                           num_chains=2, frozen_policy="refresh",
                           save_vi_trace=True, tau_out=5e-2 ** 2)
    out = vi_hmc.run_nn(cfg, TINY_MLP, artifacts, key=jax.random.key(2),
                        store=store)
    trace = np.asarray(out["result"].aux_trace)
    assert trace.shape == (2, 8, d)
    # refresh: consecutive frozen draws differ
    assert not np.allclose(trace[:, 0], trace[:, 1])
    saved = store.load_array("vi_params")
    np.testing.assert_allclose(saved, trace)

    with pytest.raises(ValueError, match="save_vi_trace"):
        vi_hmc.run_nn(C.VIHMCRunConfig(num_samples=4, num_chains=1,
                                       algorithm="nuts", save_vi_trace=True),
                      TINY_MLP, artifacts, key=jax.random.key(3))


def test_vihmc_gauss_field_auto_probe():
    """gauss_field_auto probes the VI-Gaussian trajectory field for
    gauss_field_probe_draws and keeps it iff the probe's mean MH acceptance
    clears gauss_field_floor (ADVICE.md round-1 high finding)."""
    d = TINY_MLP.num_params
    rng = np.random.default_rng(5)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=10, replace=False))}
    base = dict(num_samples=12, step_size=1e-3, post_std=0.05, num_chains=2,
                frozen_policy="refresh", tau_out=5e-2 ** 2, loss="NLL",
                gauss_field_auto=True, gauss_field_probe_draws=4)

    # floor 0: any acceptance keeps the Gaussian field
    out = vi_hmc.run_nn(C.VIHMCRunConfig(**base, gauss_field_floor=0.0),
                        TINY_MLP, artifacts, key=jax.random.key(7))
    assert out["gauss_field_used"] is True
    assert 0.0 <= out["gauss_field_probe_acceptance"] <= 1.0
    assert np.isfinite(np.asarray(out["result"].samples)).all()

    # floor > 1 is unattainable: must fall back to the autodiff field
    out = vi_hmc.run_nn(C.VIHMCRunConfig(**base, gauss_field_floor=1.5),
                        TINY_MLP, artifacts, key=jax.random.key(7))
    assert out["gauss_field_used"] is False
    assert np.isfinite(np.asarray(out["result"].samples)).all()


def test_vihmc_gauss_field_auto_builds_gram_fallback(tiny_burgers):
    """In auto mode the Gram/stride oracle is built alongside the Gaussian
    field as the probe's fallback (ADVICE.md round-1 medium finding): the
    gauss_field + coarse_stride combination must run, not raise."""
    rng = np.random.default_rng(6)
    d = TINY_DEEPONET.num_params
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.05,
                 "sigma": (0.02 + 0.05 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=12, replace=False))}
    cfg = C.VIHMCRunConfig(num_samples=8, step_size=1e-3, post_std=0.02,
                           num_chains=1, loss="NLL", tau_out=1.0,
                           frozen_policy="refresh", gauss_field=1.0,
                           gauss_field_auto=True, gauss_field_probe_draws=3,
                           gauss_field_floor=1.5, coarse_stride=2)
    out = vi_hmc.run_operator(cfg, TINY_DEEPONET, artifacts,
                              key=jax.random.key(3), data=tiny_burgers)
    assert out["gauss_field_used"] is False  # floor unattainable -> Gram path
    assert np.isfinite(np.asarray(out["result"].samples)).all()

    # without auto, the combination stays an error
    with pytest.raises(ValueError, match="gauss_field replaces"):
        vi_hmc.run_operator(
            dataclasses.replace(cfg, gauss_field_auto=False),
            TINY_DEEPONET, artifacts, key=jax.random.key(3),
            data=tiny_burgers)


def test_operator_three_stage(tmp_path, tiny_burgers):
    """VI -> sensitivity -> VI-HMC for the DeepONet workload."""
    cfg_vi = C.OperatorVIRunConfig(
        model=TINY_DEEPONET, n_train=8, n_valid=4, batch_size=4, p=20,
        vi=VIConfig(epochs=4, lr_start=1e-3, patience=5, num_ens=2,
                    prior_sigma=0.1,
                    elbo=ELBOConfig(reduction="mean_x_n", fixed_noise_var=1.0)),
    )
    vi_out = vi_train.run_operator(cfg_vi, key=jax.random.key(0), data=tiny_burgers)
    assert np.isfinite(vi_out["metrics"]).all()

    store = RunStore(str(tmp_path))
    sens = sensitivity.run_operator(
        vi_out["best_state"].vp, TINY_DEEPONET, tiny_burgers[1],
        C.SensitivityRunConfig(importance_threshold=0.9, p_subsample=10),
        key=jax.random.key(1), store=store)
    assert sens["num_sensitive"] > 0

    artifacts = {"mu": sens["mu"], "sigma": sens["sigma"], "indices": sens["indices"]}
    cfg = C.VIHMCRunConfig(num_samples=15, step_size=1e-3, post_std=0.02,
                           num_chains=2, loss="NLL", tau_out=1.0,
                           frozen_policy="refresh")
    out = vi_hmc.run_operator(cfg, TINY_DEEPONET, artifacts,
                              key=jax.random.key(2), data=tiny_burgers)
    assert out["result"].samples.shape[0] == 2
    assert np.isfinite(float(out["metrics"]["mean_sample_mse"]))


def test_hmc_nuts_operator(tiny_burgers):
    cfg = C.OperatorHMCRunConfig(model=TINY_DEEPONET, n_train=8, n_valid=4,
                                 num_samples=30, step_size=5e-4, post_std=0.05,
                                 sample_data=False)
    out = hmc_nuts.run(cfg, key=jax.random.key(0), data=tiny_burgers)
    assert np.isfinite(float(out["metrics"]["mean_sample_mse"]))
    # dual averaging ran: step size changed from init during burn
    eps = np.asarray(out["result"].step_sizes)
    assert not np.allclose(eps[0, 0], eps[0, -1])


def test_hmc_nuts_trunk_subsampling(tiny_burgers):
    cfg = C.OperatorHMCRunConfig(model=TINY_DEEPONET, n_train=8, n_valid=4,
                                 num_samples=10, step_size=5e-4, post_std=0.05,
                                 sample_data=True, p=12)
    out = hmc_nuts.run(cfg, key=jax.random.key(1), data=tiny_burgers)
    assert np.isfinite(np.asarray(out["result"].samples)).all()


def test_hmc_split_operator(tiny_burgers):
    cfg = C.SplitHMCRunConfig(model=TINY_DEEPONET, n_train=8, n_valid=4,
                              num_splits=2, num_samples=20, step_size=5e-4,
                              post_std=0.05)
    out = hmc_split.run(cfg, key=jax.random.key(0), data=tiny_burgers)
    assert np.isfinite(float(out["metrics"]["mean_sample_mse"]))
    assert float(out["metrics"]["acceptance_rate"]) > 0.1


def test_hmc_split_nuts_toggle(tiny_burgers):
    cfg = C.SplitHMCRunConfig(model=TINY_DEEPONET, n_train=8, n_valid=4,
                              num_splits=2, num_samples=12, step_size=5e-4,
                              post_std=0.05, is_nuts=True)
    out = hmc_split.run(cfg, key=jax.random.key(1), data=tiny_burgers)
    assert np.isfinite(np.asarray(out["result"].samples)).all()


def test_trajectory_length_rule():
    # reference derived value: L = int(pi * 0.0214^2 / 2e-4) = 7
    assert C.trajectory_length(0.0214 ** 2, 1e-4) == 7
    # NN HMC: int(pi * 0.2024^2 / 2e-4) = 643
    assert C.trajectory_length(0.2024 ** 2, 1e-4) == 643


def test_postprocess_metrics():
    rng = np.random.default_rng(0)
    truth = rng.normal(size=(3, 20))
    preds = truth[None] + 0.1 * rng.normal(size=(5, 3, 20))
    rel = l2_relative_error(preds.mean(0), truth)
    assert rel.shape == (3,) and np.all(rel < 1)
    rep = error_report(preds, truth, log_probs=rng.normal(size=5))
    assert 0 < rep["mean_relative_l2"] < 1
    assert "map_relative_l2" in rep
    corr = error_sigma_correlation(preds, truth, nt=4, nx=5)
    assert corr["per_time_correlation"].shape == (4,)


def test_stack_runs(tmp_path):
    s1 = RunStore(str(tmp_path), uid="run1")
    s2 = RunStore(str(tmp_path), uid="run2")
    s1.save_array("hmc_params", np.zeros((10, 3)))
    s2.save_array("hmc_params", np.ones((2, 10, 3)))  # (C,S,D)
    stacked = stack_runs([s1, s2], burn=5)
    assert stacked.shape == (5 + 2 * 5, 3)


def test_function_space_diagnostics_symmetry_invariant():
    """Sign-flipped chains of f(x) = a*tanh(b*x) are different weight-space
    modes but the SAME predictive function: weight-space R-hat must flag
    them, function-space R-hat must not (the flagship-demo convergence
    measure; scripts/fs_diagnostics_operator.py)."""
    from vihmc_tpu.chains import potential_scale_reduction_np

    rng = np.random.default_rng(0)
    base = rng.normal([1.0, 1.0], 0.05, size=(2, 200, 2))  # 2 chains near (1,1)
    flipped = -base[1]                                     # symmetric image
    samples = np.stack([base[0], flipped])                 # (2, 200, 2)

    rhat_w = potential_scale_reduction_np(samples)
    assert np.max(rhat_w) > 2.0  # weight space correctly screams

    x_probe = jnp.linspace(-1.0, 1.0, 8)

    def predict_fn(q):
        return q[0] * jnp.tanh(q[1] * x_probe)

    diag = function_space_diagnostics(samples, predict_fn, thin=2, chunk=64)
    assert diag["probes"].shape == (2, 100, 8)
    assert float(np.nanmax(diag["r_hat"])) < 1.05
    assert float(np.nanmax(diag["r_hat_rank"])) < 1.05
