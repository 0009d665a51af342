import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.data import (
    regression_data,
    generate_burgers_dataset,
    get_burgers,
    subsample_trunk,
    split_shards,
)
from vihmc_tpu.data.burgers import solve_burgers


def test_regression_data_matches_reference_formula():
    d = regression_data(jax.random.key(0), 20, 300, noise_std=0.05)
    assert d["x_train"].shape == (20, 1) and d["x_val"].shape == (300, 1)
    # validation has no noise: y = 4 sin 4x + 5 cos 12x exactly
    x = np.asarray(d["x_val"]).ravel()
    np.testing.assert_allclose(np.asarray(d["y_val"]).ravel(),
                               4 * np.sin(4 * x) + 5 * np.cos(12 * x), atol=1e-5)
    # train has a gap around 0
    xt = np.asarray(d["x_train"]).ravel()
    assert np.all((np.abs(xt) >= 0.2 - 1e-6))
    # train noise is small
    resid = np.asarray(d["y_train"]).ravel() - (4 * np.sin(4 * xt) + 5 * np.cos(12 * xt))
    assert np.abs(resid).max() < 0.25


import os

_REF_DATA = "/root/reference/Neural_network/Data"


@pytest.mark.skipif(not os.path.exists(os.path.join(_REF_DATA, "x_train")),
                    reason="reference data not mounted")
def test_load_reference_regression_data_parity():
    """The reference's stored tensors load and match its generator's formula
    (20 train / 300 val points, Neural_network/Data)."""
    from vihmc_tpu.data import load_reference_regression_data

    d = load_reference_regression_data(_REF_DATA)
    assert d["x_train"].shape[0] == 20 and d["x_val"].shape[0] == 300
    x = np.asarray(d["x_val"]).ravel()
    np.testing.assert_allclose(np.asarray(d["y_val"]).ravel(),
                               4 * np.sin(4 * x) + 5 * np.cos(12 * x), atol=1e-4)
    xt = np.asarray(d["x_train"]).ravel()
    resid = np.asarray(d["y_train"]).ravel() - (4 * np.sin(4 * xt) + 5 * np.cos(12 * xt))
    assert np.abs(resid).max() < 0.3  # noise_std 0.05


def test_burgers_solver_conserves_and_decays():
    """Viscous Burgers on a periodic domain: mean is conserved, energy decays."""
    key = jax.random.key(0)
    u0 = jnp.sin(2 * jnp.pi * jnp.linspace(0, 1, 100, endpoint=False))[None, :]
    sol = solve_burgers(u0, nu=0.05, nt_save=11, steps_per_save=50)
    sol = np.asarray(sol)[0]  # (11, 100)
    assert np.all(np.isfinite(sol))
    # momentum conservation
    np.testing.assert_allclose(sol.mean(axis=1), 0.0, atol=1e-4)
    # energy monotone decay
    energy = (sol ** 2).sum(axis=1)
    assert np.all(np.diff(energy) < 0)
    # diffusion: final amplitude smaller
    assert np.abs(sol[-1]).max() < np.abs(sol[0]).max()


def test_burgers_solver_heat_limit():
    """With tiny initial amplitude the equation is ~linear heat:
    u(t) = exp(-nu k^2 t) sin(kx)."""
    nu = 0.05
    eps = 1e-3
    x = jnp.linspace(0, 1, 128, endpoint=False)
    u0 = eps * jnp.sin(2 * jnp.pi * x)[None, :]
    sol = solve_burgers(u0, nu=nu, t_final=1.0, nt_save=3, steps_per_save=100)
    k = 2 * np.pi
    expected = eps * np.exp(-nu * k * k * 1.0) * np.sin(k * np.asarray(x))
    np.testing.assert_allclose(np.asarray(sol)[0, -1], expected, atol=eps * 0.02)


def test_generate_burgers_dataset_shapes():
    d = generate_burgers_dataset(jax.random.key(1), 4, nx=33, nt=17)
    assert d["branch_in"].shape == (4, 33)
    assert d["trunk_in"].shape == (17 * 33, 2)
    assert d["solution"].shape == (4, 17 * 33)
    # trunk columns are (t, x) with x periodic wrap included
    tr = np.asarray(d["trunk_in"])
    assert tr[:, 0].min() == 0 and tr[:, 0].max() == 1
    assert tr[:, 1].min() == 0 and tr[:, 1].max() == 1
    # branch_in equals the t=0 slice of solution
    sol0 = np.asarray(d["solution"]).reshape(4, 17, 33)[:, 0, :]
    np.testing.assert_allclose(np.asarray(d["branch_in"]), sol0, atol=1e-6)
    # periodic wrap: last column equals first
    sol = np.asarray(d["solution"]).reshape(4, 17, 33)
    np.testing.assert_allclose(sol[..., -1], sol[..., 0], atol=1e-6)


def test_get_burgers_split():
    tr, va = get_burgers(jax.random.key(2), 3, 2, nx=17, nt=9)
    assert tr["branch_in"].shape[0] == 3 and va["branch_in"].shape[0] == 2
    assert tr["trunk_in"].shape == va["trunk_in"].shape


def test_subsample_trunk():
    tr, _ = get_burgers(jax.random.key(3), 3, 1, nx=17, nt=9)
    trunk, y = subsample_trunk(jax.random.key(4), tr, p=10)
    assert trunk.shape == (3, 10, 2) and y.shape == (3, 10)
    # subsampled values exist in the full grid
    full = np.asarray(tr["trunk_in"])
    one = np.asarray(trunk[0])
    for row in one:
        assert np.any(np.all(np.isclose(full, row), axis=1))


def test_split_shards():
    tr, _ = get_burgers(jax.random.key(5), 4, 1, nx=9, nt=5)
    sh = split_shards(tr, 2)
    assert sh["branch_in"].shape == (2, 2, 9)
    assert sh["solution"].shape == (2, 2, 45)
    with pytest.raises(ValueError):
        split_shards(tr, 3)


def test_generate_burgers_dataset_even_nx():
    """nx even => odd periodic interior grid; irfft needs the explicit length
    (regression: default irfft n assumes an even signal and dropped a point)."""
    d = generate_burgers_dataset(jax.random.key(2), 2, nx=12, nt=7)
    assert d["branch_in"].shape == (2, 12)
    assert d["solution"].shape == (2, 7 * 12)
    assert np.isfinite(np.asarray(d["solution"])).all()
