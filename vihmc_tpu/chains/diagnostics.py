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


def effective_sample_size_np(samples, return_tau: bool = False):
    """NumPy twin of :func:`effective_sample_size` for host-side use (e.g. the
    benchmark, where compiling an FFT on the accelerator is wasted latency).

    ``return_tau=True`` additionally returns ``(tau, tau_floor)`` so callers
    can detect where the sub-1 autocorrelation-time floor binds — a bound
    floor means the estimator would otherwise report tau below the
    super-efficiency cap, which for frozen/stuck chains is an artifact, not
    antithetic mixing (round-1 VERDICT.md 'What's weak' #2).
    """
    import numpy as np

    x = np.asarray(samples)
    c, s, d = x.shape
    # chunk the dim axis: the complex FFT intermediate is (C, S+1, chunk)
    # complex128 — unchunked at reference scale (24 chains x ~1000 draws x
    # 81k dims) it would peak ~30 GB
    chunk = 4096
    if d > chunk:
        parts = [effective_sample_size_np(x[:, :, i:i + chunk],
                                          return_tau=return_tau)
                 for i in range(0, d, chunk)]
        if return_tau:
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]), parts[0][2])
        return np.concatenate(parts)
    xc = x - x.mean(axis=1, keepdims=True)
    nfft = 2 * s
    f = np.fft.rfft(xc, nfft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), nfft, axis=1)[:, :s, :].real / s  # (C,S,D)
    chain_var = x.var(axis=1, ddof=1)                                    # (C,D)
    w = chain_var.mean(axis=0)
    b_over_n = x.mean(axis=1).var(axis=0, ddof=1) if c > 1 else np.zeros(d)
    var_plus = w * (s - 1) / s + b_over_n
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = 1.0 - (w[None, :] - acov.mean(axis=0)) / var_plus[None, :]
    rho = np.where(np.isfinite(rho), rho, 0.0)  # constant dims -> tau floor
    n_pairs = s // 2
    pair = rho[: 2 * n_pairs].reshape(n_pairs, 2, d).sum(axis=1)
    pair_min = np.minimum.accumulate(pair, axis=0)
    raw_tau = -1.0 + 2.0 * np.where(pair_min > 0, pair_min, 0.0).sum(axis=0)
    tau_floor = 1.0 / np.log10(c * s + 10.0)
    tau = np.maximum(raw_tau, tau_floor)
    ess = c * s / tau
    if return_tau:
        return ess, raw_tau, tau_floor
    return ess


def _rank_normalize_np(x):
    """Fractional ranks over ALL chains/draws mapped through the normal
    quantile function (Vehtari et al. 2021 eq. 14: z = Phi^-1((r - 3/8) /
    (S + 1/4))). ``x``: (C, S, D) -> same shape, approximately N(0,1)
    marginals regardless of the target's tails."""
    import numpy as np
    from scipy.special import ndtri
    from scipy.stats import rankdata

    c, s, d = x.shape
    # average ranks for ties: a stable argsort would order tied values by
    # chain index, manufacturing between-chain rank differences (fatal for
    # the 0/1 indicators in ess_tail_np)
    ranks = rankdata(x.reshape(c * s, d), method="average", axis=0)
    z = ndtri((ranks - 0.375) / (c * s + 0.25))
    return z.reshape(c, s, d)


def ess_bulk_np(samples):
    """Rank-normalized bulk ESS (Vehtari et al. 2021): ESS of the
    rank-normalized draws. Robust to heavy tails and to the raw estimator's
    variance-inflation failure modes; the headline diagnostic for posterior
    means/medians."""
    import numpy as np

    return effective_sample_size_np(_rank_normalize_np(np.asarray(samples)))


def ess_tail_np(samples, prob: float = 0.05):
    """Rank-normalized tail ESS: min over the ``prob`` and ``1-prob``
    quantile-indicator ESSs (Vehtari et al. 2021 section 4.3) — detects
    chains that agree in the bulk but never visit the tails (exactly the
    stuck-chain regime where the raw-tau floor flatters ESS)."""
    import numpy as np

    x = np.asarray(samples)
    lo = x <= np.quantile(x, prob, axis=(0, 1), keepdims=True)
    hi = x <= np.quantile(x, 1.0 - prob, axis=(0, 1), keepdims=True)
    ess_lo = effective_sample_size_np(_rank_normalize_np(lo.astype(np.float64)))
    ess_hi = effective_sample_size_np(_rank_normalize_np(hi.astype(np.float64)))
    return np.minimum(ess_lo, ess_hi)


def rhat_rank_np(samples):
    """Rank-normalized split-R-hat, max of bulk and folded variants
    (Vehtari et al. 2021 eq. 13-15): folding (|x - median|) catches chains
    that share a mean but differ in spread."""
    import numpy as np

    x = np.asarray(samples)
    bulk = potential_scale_reduction_np(_rank_normalize_np(x))
    folded = np.abs(x - np.median(x, axis=(0, 1), keepdims=True))
    fold = potential_scale_reduction_np(_rank_normalize_np(folded))
    return np.maximum(bulk, fold)


def potential_scale_reduction_np(samples):
    """NumPy split-R-hat (host-side twin of :func:`potential_scale_reduction`)."""
    import numpy as np

    x = np.asarray(samples)
    c, s, d = x.shape
    half = s // 2
    if half < 2:
        return np.full(d, np.nan)  # too few draws to split
    x = np.concatenate([x[:, :half], x[:, half: 2 * half]], axis=0)
    chain_means = x.mean(axis=1)
    b = half * chain_means.var(axis=0, ddof=1)
    w = x.var(axis=1, ddof=1).mean(axis=0)
    var_plus = (half - 1) / half * w + b / half
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.sqrt(var_plus / w)  # NaN for constant dims, as in Stan


def summarize(samples: jnp.ndarray) -> dict:
    """Convenience summary over (C, S, D) samples."""
    return {
        "mean": jnp.mean(samples, axis=(0, 1)),
        "std": jnp.std(samples, axis=(0, 1)),
        "r_hat": potential_scale_reduction(samples),
        "ess": effective_sample_size(samples),
    }


def summarize_np(samples, rank_normalized: bool = True,
                 rank_dims: int = 16384) -> dict:
    """Host-side summary: required for very high-dimensional subspaces where
    the on-device FFT autocovariance would blow HBM (e.g. a ~79k-dim
    subspace OOM'd a 16 GB chip).

    With ``rank_normalized`` (default) also reports the Vehtari-2021
    rank-normalized diagnostics: ``ess_bulk``, ``ess_tail``, ``r_hat_rank``,
    and ``tau_floor_frac`` — the fraction of dimensions where the raw
    Geyer tau hit the super-efficiency floor (nonzero fractions on a
    low-acceptance run mean the raw ESS is flattering stuck chains and the
    bulk/tail numbers are the ones to trust).
    """
    import numpy as np

    x = np.asarray(samples)
    ess, raw_tau, tau_floor = effective_sample_size_np(x, return_tau=True)
    out = {
        "mean": x.mean(axis=(0, 1)),
        "std": x.std(axis=(0, 1)),
        "r_hat": potential_scale_reduction_np(x),
        "ess": ess,
    }
    if rank_normalized:
        # the rank battery costs ~5 full sort passes per dim; above
        # ``rank_dims`` dims it runs on a deterministic random subset
        # (raw r_hat/ess above remain full-dimension)
        xr = x
        if x.shape[2] > rank_dims:
            sub = np.random.default_rng(0).choice(x.shape[2], rank_dims,
                                                  replace=False)
            xr = x[:, :, np.sort(sub)]
            out["rank_dims_subsampled"] = int(rank_dims)
        out["ess_bulk"] = ess_bulk_np(xr)
        out["ess_tail"] = ess_tail_np(xr)
        out["r_hat_rank"] = rhat_rank_np(xr)
        out["tau_floor_frac"] = float(np.mean(raw_tau < tau_floor))
    return out
