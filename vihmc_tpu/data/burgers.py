"""Burgers/DeepONet data: .mat loader + on-device spectral solver fallback.

The reference trains on ``DeepOnet_data.mat`` (downloaded from OSF, pointer at
/root/reference/Operator_network/Data/data.txt:1) with keys ``branch_in``
(N x 101 initial conditions sensed on a 101-point spatial grid), ``trunk_in``
(10201 x 2 = 101x101 (t, x) space-time grid), ``solution`` (N x 10201)
(/root/reference/Operator_network/HMC/NUTS_DeepOnets.py:64-67). The BC feature
embedding treats trunk column 1 as the periodic spatial coordinate
(/root/reference/Operator_network/HMC/model.py:67-70), fixing the column
order as (t, x).

Since the .mat is not redistributed, this module also *generates* a
compatible dataset by solving the viscous Burgers equation

    u_t + u u_x = nu u_xx,  x in [0, 1) periodic,  t in [0, 1]

with Gaussian-random-field initial conditions, using a Fourier pseudo-spectral
RK4 integrator written as ``lax.scan`` — it runs on the TPU itself, no host
dataset required.

Supporting utilities mirror the reference's data handling: per-example random
trunk subsampling (/root/reference/Operator_network/VI/utils.py:39-41) and
equal-shard splitting for split-HMC
(/root/reference/Operator_network/HMC/main_HMC_splitting.py:28-76).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _grf_initial_conditions(key, n, n_grid, n_modes=12, decay=2.0, amplitude=1.0):
    """Periodic GRF samples: sum_k a_k sin(2 pi k x) + b_k cos(2 pi k x),
    a_k, b_k ~ N(0, (amplitude / k^decay)^2)."""
    x = jnp.linspace(0.0, 1.0, n_grid, endpoint=False)
    k = jnp.arange(1, n_modes + 1, dtype=jnp.float32)
    ka, kb = jax.random.split(key)
    scale = amplitude / k ** decay
    a = jax.random.normal(ka, (n, n_modes)) * scale
    b = jax.random.normal(kb, (n, n_modes)) * scale
    phases = 2 * jnp.pi * k[None, :, None] * x[None, None, :]
    return jnp.sum(a[..., None] * jnp.sin(phases) + b[..., None] * jnp.cos(phases), axis=1)


def solve_burgers(u0, nu: float = 0.05, t_final: float = 1.0, nt_save: int = 101,
                  steps_per_save: int = 20):
    """Integrate periodic viscous Burgers from u0 (..., nx); returns
    (..., nt_save, nx) snapshots at uniform times including t=0.

    Pseudo-spectral in x with 2/3 dealiasing; integrating-factor RK4 in time
    (the stiff diffusion term exp(-nu k^2 t) is handled exactly, so the step
    is limited only by the advective CFL), compiled as one ``lax.scan`` — a
    TPU-resident data generator.
    """
    nx = u0.shape[-1]
    k = 2 * jnp.pi * jnp.fft.rfftfreq(nx, d=1.0 / nx)
    mask = (jnp.arange(k.shape[0]) < (nx // 3 + 1)).astype(u0.dtype)  # 2/3 rule
    dt = t_final / ((nt_save - 1) * steps_per_save)

    e_half = jnp.exp(-nu * k * k * dt / 2.0)
    e_full = e_half * e_half

    def nonlinear(u_hat):
        # explicit n: irfft defaults to 2*(coeffs-1), wrong for odd nx
        u = jnp.fft.irfft(u_hat * mask, n=nx, axis=-1)
        return -1j * k * jnp.fft.rfft(0.5 * u * u, axis=-1) * mask

    def rk4_step(u_hat, _):
        # integrating-factor RK4 (Kassam & Trefethen 2005 style)
        k1 = nonlinear(u_hat)
        k2 = nonlinear(e_half * (u_hat + 0.5 * dt * k1))
        k3 = nonlinear(e_half * u_hat + 0.5 * dt * k2)
        k4 = nonlinear(e_full * u_hat + dt * e_half * k3)
        u_new = e_full * u_hat + dt / 6.0 * (e_full * k1 + 2 * e_half * (k2 + k3) + k4)
        return u_new, None

    def save_step(u_hat, _):
        u_hat, _ = jax.lax.scan(rk4_step, u_hat, None, length=steps_per_save)
        return u_hat, jnp.fft.irfft(u_hat, n=nx, axis=-1)

    u_hat0 = jnp.fft.rfft(u0, axis=-1)
    _, frames = jax.lax.scan(save_step, u_hat0, None, length=nt_save - 1)
    # frames: (nt_save-1, ..., nx) -> (..., nt_save, nx) with u0 prepended
    frames = jnp.moveaxis(frames, 0, -2)
    return jnp.concatenate([u0[..., None, :], frames], axis=-2)


def generate_burgers_dataset(key, n_functions: int, nx: int = 101, nt: int = 101,
                             nu: float = 0.05):
    """Reference-shaped dataset dict: branch_in (N, nx), trunk_in (nt*nx, 2)
    with columns (t, x), solution (N, nt*nx)."""
    n_solve = nx - 1  # periodic interior grid; last point wraps to x=1 == x=0
    u0 = _grf_initial_conditions(key, n_functions, n_solve)
    sol = solve_burgers(u0, nu=nu, nt_save=nt)                  # (N, nt, n_solve)
    sol_full = jnp.concatenate([sol, sol[..., :1]], axis=-1)     # append wrap point -> nx
    u0_full = sol_full[:, 0, :]                                  # (N, nx)

    t = jnp.linspace(0.0, 1.0, nt)
    x = jnp.linspace(0.0, 1.0, nx)
    tt, xx = jnp.meshgrid(t, x, indexing="ij")
    trunk = jnp.stack([tt.ravel(), xx.ravel()], axis=-1)         # (nt*nx, 2)
    return {
        "branch_in": u0_full,
        "trunk_in": trunk,
        "solution": sol_full.reshape(n_functions, nt * nx),
    }


def load_burgers_mat(path: str):
    """Load the reference's DeepOnet_data.mat (same keys/shapes)."""
    import scipy.io

    mat = scipy.io.loadmat(path)
    return {
        "branch_in": jnp.asarray(mat["branch_in"], jnp.float32),
        "trunk_in": jnp.asarray(mat["trunk_in"], jnp.float32),
        "solution": jnp.asarray(mat["solution"], jnp.float32),
    }


def get_burgers(key, n_train: int, n_valid: int, mat_path: Optional[str] = None,
                nx: int = 101, nt: int = 101, nu: float = 0.05):
    """Train/valid split matching the reference loader's [0:N_train] /
    [N_train:N_train+N_valid] slicing (Operator_network/VI/utils.py:44-50)."""
    if mat_path is not None:
        data = load_burgers_mat(mat_path)
    else:
        data = generate_burgers_dataset(key, n_train + n_valid, nx=nx, nt=nt, nu=nu)
    train = {
        "branch_in": data["branch_in"][:n_train],
        "trunk_in": data["trunk_in"],
        "solution": data["solution"][:n_train],
    }
    valid = {
        "branch_in": data["branch_in"][n_train:n_train + n_valid],
        "trunk_in": data["trunk_in"],
        "solution": data["solution"][n_train:n_train + n_valid],
    }
    return train, valid


def subsample_trunk(key, split, p: int):
    """Per-example random choice of p query points (without replacement),
    the reference's stochastic-trunk-subsampling
    (Operator_network/VI/utils.py:39-41). Returns (trunk (B,p,2), y (B,p))."""
    n_points = split["trunk_in"].shape[0]
    b = split["branch_in"].shape[0]

    def one(k, sol_row):
        idx = jax.random.choice(k, n_points, shape=(p,), replace=False)
        return split["trunk_in"][idx], sol_row[idx]

    keys = jax.random.split(key, b)
    trunk_sub, y_sub = jax.vmap(one)(keys, split["solution"])
    return trunk_sub, y_sub


def split_shards(split, num_splits: int):
    """Partition the function axis into equal shards (error if unequal,
    reference main_HMC_splitting.py:41-42). Leaves gain a leading shard axis."""
    n = split["branch_in"].shape[0]
    if n % num_splits != 0:
        raise ValueError(f"{n} examples cannot be split into {num_splits} equal shards")
    per = n // num_splits
    return {
        "branch_in": split["branch_in"].reshape(num_splits, per, -1),
        "trunk_in": split["trunk_in"],  # shared query grid
        "solution": split["solution"].reshape(num_splits, per, -1),
    }
