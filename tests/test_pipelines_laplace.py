"""Laplace (stage-2 Fisher) kinetic metric on the subspace sampler."""

import jax
import numpy as np
import pytest

from vihmc_tpu.models import MLPConfig
from vihmc_tpu.pipelines import vi_hmc, configs as C
from vihmc_tpu.pipelines.common import make_flat_mlp


def _artifacts(d, rng):
    mu = 0.1 * rng.normal(size=d).astype(np.float32)
    sigma = (0.05 + 0.05 * rng.random(d)).astype(np.float32)
    scores = (rng.random(d) ** 2).astype(np.float32)
    idx = np.sort(rng.choice(d, size=16, replace=False))
    return {"mu": mu, "sigma": sigma, "indices": idx, "scores": scores}


def test_laplace_inv_mass_formula():
    mlp = MLPConfig(in_dim=1, widths=(8,), out_dim=1)
    apply_flat, flat0, _ = make_flat_mlp(mlp)
    d = flat0.shape[0]
    rng = np.random.default_rng(0)
    art = _artifacts(d, rng)
    y = rng.normal(size=(12, 1)).astype(np.float32)
    x = rng.uniform(-1, 1, size=(12, 1)).astype(np.float32)
    cfg = C.VIHMCRunConfig(laplace_mass=True, laplace_n_data=12,
                           tau_out=0.25, load_prior=True, load_std=True)
    _, _, _, spec, prior, inv_mass = vi_hmc.build_subspace_posterior(
        cfg, lambda f: apply_flat(f, x), y, art, jax.random.key(0))
    idx = np.sort(art["indices"])
    g2 = art["scores"][idx] / art["sigma"][idx] ** 2
    want = 1.0 / (1.0 / art["sigma"][idx] ** 2 + 12 * g2 / 0.25)
    np.testing.assert_allclose(np.asarray(inv_mass), want, rtol=1e-5)


def test_laplace_mass_requires_scores_and_n():
    mlp = MLPConfig(in_dim=1, widths=(8,), out_dim=1)
    apply_flat, flat0, _ = make_flat_mlp(mlp)
    rng = np.random.default_rng(1)
    art = _artifacts(flat0.shape[0], rng)
    y = rng.normal(size=(4, 1)).astype(np.float32)
    x = rng.uniform(-1, 1, size=(4, 1)).astype(np.float32)
    bad = dict(art)
    bad.pop("scores")
    cfg = C.VIHMCRunConfig(laplace_mass=True, laplace_n_data=4)
    with pytest.raises(ValueError, match="scores"):
        vi_hmc.build_subspace_posterior(cfg, lambda f: apply_flat(f, x), y,
                                        bad, jax.random.key(0))
    cfg2 = C.VIHMCRunConfig(laplace_mass=True)
    with pytest.raises(ValueError, match="n_data"):
        vi_hmc.build_subspace_posterior(cfg2, lambda f: apply_flat(f, x), y,
                                        art, jax.random.key(0))


def test_laplace_mass_samples_end_to_end():
    mlp = MLPConfig(in_dim=1, widths=(8,), out_dim=1)
    apply_flat, flat0, _ = make_flat_mlp(mlp)
    rng = np.random.default_rng(2)
    art = _artifacts(flat0.shape[0], rng)
    x = rng.uniform(-1, 1, size=(16, 1)).astype(np.float32)
    y = np.sin(3 * x).astype(np.float32)
    cfg = C.VIHMCRunConfig(num_samples=40, num_chains=2, step_size=5e-3,
                           laplace_mass=True, laplace_n_data=16,
                           tau_out=0.04)
    out = vi_hmc.run_nn(cfg, mlp, art, key=jax.random.key(3),
                        data={"x_train": x, "y_train": y,
                              "x_val": x, "y_val": y})
    s = np.asarray(out["result"].samples)
    assert s.shape[:2] == (2, 40) and np.isfinite(s).all()
