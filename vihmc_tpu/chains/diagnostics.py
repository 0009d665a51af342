"""Cross-chain MCMC diagnostics: split-R-hat and effective sample size.

The reference has no convergence diagnostics (quality control is manual,
SURVEY.md section 4); these are the standard tools (Gelman et al., BDA3
section 11.4-11.5; Geyer initial positive sequence for ESS) implemented with
FFT autocorrelations so they run on-device. The north-star benchmark metric,
ESS/s per chip (BASELINE.md), is computed from :func:`effective_sample_size`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def potential_scale_reduction(samples: jnp.ndarray) -> jnp.ndarray:
    """Split-R-hat. ``samples``: (C, S, D) -> (D,).

    Each chain is split in half (2C half-chains of length S//2); values near 1
    indicate convergence.
    """
    c, s, d = samples.shape
    half = s // 2
    x = jnp.concatenate([samples[:, :half], samples[:, half: 2 * half]], axis=0)  # (2C, half, D)
    m = x.shape[0]
    chain_means = jnp.mean(x, axis=1)                      # (2C, D)
    grand_mean = jnp.mean(chain_means, axis=0)             # (D,)
    b = half * jnp.var(chain_means, axis=0, ddof=1)        # between-chain
    w = jnp.mean(jnp.var(x, axis=1, ddof=1), axis=0)       # within-chain
    var_plus = (half - 1) / half * w + b / half
    return jnp.sqrt(var_plus / w)


def _autocov(x):
    """Autocovariance of a 1-D series via FFT, biased (divided by n)."""
    n = x.shape[0]
    x = x - jnp.mean(x)
    nfft = 2 * n  # zero-pad to avoid circular wrap
    f = jnp.fft.rfft(x, nfft)
    acov = jnp.fft.irfft(f * jnp.conj(f), nfft)[:n].real
    return acov / n


def effective_sample_size(samples: jnp.ndarray) -> jnp.ndarray:
    """ESS with cross-chain pooling (Vehtari et al. 2021 style, monotone
    initial-positive-sequence truncation). ``samples``: (C, S, D) -> (D,)."""
    c, s, d = samples.shape

    def per_dim(x):  # x: (C, S)
        acov = jax.vmap(_autocov)(x)                       # (C, S)
        chain_var = jnp.var(x, axis=1, ddof=1)             # (C,)
        mean_acov = jnp.mean(acov, axis=0)                 # (S,)
        w = jnp.mean(chain_var)
        if c > 1:
            b_over_n = jnp.var(jnp.mean(x, axis=1), ddof=1)
        else:
            b_over_n = 0.0
        var_plus = w * (s - 1) / s + b_over_n
        rho = 1.0 - (w - mean_acov) / var_plus             # (S,) combined autocorrelation

        # Geyer: sum consecutive pairs, truncate at first negative pair, and
        # enforce monotone non-increase.
        n_pairs = s // 2
        pair = rho[: 2 * n_pairs].reshape(n_pairs, 2).sum(axis=1)     # (n_pairs,)
        pair_min = jax.lax.associative_scan(jnp.minimum, pair)        # monotone envelope
        positive = pair_min > 0
        tau = -1.0 + 2.0 * jnp.sum(jnp.where(positive, pair_min, 0.0))
        tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(c * s, jnp.float32) + 10.0))
        return c * s / tau

    return jax.vmap(per_dim, in_axes=2)(samples)


def effective_sample_size_np(samples) -> "np.ndarray":
    """NumPy twin of :func:`effective_sample_size` for host-side use (e.g. the
    benchmark, where compiling an FFT on the accelerator is wasted latency)."""
    import numpy as np

    x = np.asarray(samples)
    c, s, d = x.shape
    out = np.zeros(d)
    xc = x - x.mean(axis=1, keepdims=True)
    nfft = 2 * s
    f = np.fft.rfft(xc, nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :s, :].real / s  # (C,S,D)
    chain_var = x.var(axis=1, ddof=1)                                    # (C,D)
    w = chain_var.mean(axis=0)
    b_over_n = x.mean(axis=1).var(axis=0, ddof=1) if c > 1 else np.zeros(d)
    var_plus = w * (s - 1) / s + b_over_n
    rho = 1.0 - (w[None, :] - acov.mean(axis=0)) / var_plus[None, :]
    n_pairs = s // 2
    pair = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)
    pair_min = np.minimum.accumulate(pair, axis=0)
    tau = -1.0 + 2.0 * np.where(pair_min > 0, pair_min, 0.0).sum(axis=0)
    tau = np.maximum(tau, 1.0 / np.log10(c * s + 10.0))
    return c * s / tau


def potential_scale_reduction_np(samples):
    """NumPy split-R-hat (host-side twin of :func:`potential_scale_reduction`)."""
    import numpy as np

    x = np.asarray(samples)
    c, s, d = x.shape
    half = s // 2
    x = np.concatenate([x[:, :half], x[:, half: 2 * half]], axis=0)
    chain_means = x.mean(axis=1)
    b = half * chain_means.var(axis=0, ddof=1)
    w = x.var(axis=1, ddof=1).mean(axis=0)
    var_plus = (half - 1) / half * w + b / half
    return np.sqrt(var_plus / w)


def summarize(samples: jnp.ndarray) -> dict:
    """Convenience summary over (C, S, D) samples."""
    return {
        "mean": jnp.mean(samples, axis=(0, 1)),
        "std": jnp.std(samples, axis=(0, 1)),
        "r_hat": potential_scale_reduction(samples),
        "ess": effective_sample_size(samples),
    }


def summarize_np(samples) -> dict:
    """Host-side summary: required for very high-dimensional subspaces where
    the on-device FFT autocovariance would blow HBM (e.g. a ~79k-dim
    subspace OOM'd a 16 GB chip)."""
    import numpy as np

    x = np.asarray(samples)
    return {
        "mean": x.mean(axis=(0, 1)),
        "std": x.std(axis=(0, 1)),
        "r_hat": potential_scale_reduction_np(x),
        "ess": effective_sample_size_np(x),
    }
