"""Post-processing: error metrics, error-vs-uncertainty correlation, plots.

Reference: /root/reference/Operator_network/VI_HMC/post_process_burgers.py —
multi-run sample stacking (:261-289), relative-L2 errors (:105-121), mean/MAP
error + argmin/argmax (:124-148), per-time-slice error-vs-sigma correlation
(:151-215), predictive spaghetti plots (:218-258) and a mean+-3sigma solution
animation (:45-102). Numeric parts are pure functions; plotting is optional
(matplotlib imported lazily so headless/TPU runs never require it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def l2_relative_error(pred, truth, axis=-1):
    """||pred - truth||_2 / ||truth||_2 along ``axis`` (reference :105-121)."""
    pred = np.asarray(pred)
    truth = np.asarray(truth)
    num = np.linalg.norm(pred - truth, axis=axis)
    den = np.linalg.norm(truth, axis=axis)
    return num / den


def error_report(preds, truth, log_probs=None) -> dict:
    """Mean relative-L2, MAP error, argmin/argmax examples (reference
    ``print_error`` :124-148). ``preds``: (S, N, P), ``truth``: (N, P)."""
    preds = np.asarray(preds)
    truth = np.asarray(truth)
    mean_pred = preds.mean(axis=0)
    rel = l2_relative_error(mean_pred, truth)        # (N,)
    out = {
        "mean_relative_l2": float(rel.mean()),
        "per_example_relative_l2": rel,
        "argmin_example": int(rel.argmin()),
        "argmax_example": int(rel.argmax()),
    }
    if log_probs is not None:
        map_idx = int(np.asarray(log_probs).argmax())
        out["map_relative_l2"] = float(l2_relative_error(preds[map_idx], truth).mean())
        out["map_sample_index"] = map_idx
    return out


def error_sigma_correlation(preds, truth, nt: int, nx: int) -> dict:
    """Per-time-slice correlation between |error| and predictive sigma
    (reference ``plot_correlation`` :151-215). ``preds``: (S, N, nt*nx)."""
    preds = np.asarray(preds).reshape(len(preds), -1, nt, nx)
    truth = np.asarray(truth).reshape(-1, nt, nx)
    mean_pred = preds.mean(axis=0)
    sigma = preds.std(axis=0)
    abs_err = np.abs(mean_pred - truth)
    corrs = np.zeros(nt)
    for t in range(nt):
        e = abs_err[:, t, :].ravel()
        s = sigma[:, t, :].ravel()
        if e.std() > 0 and s.std() > 0:
            corrs[t] = float(np.corrcoef(e, s)[0, 1])
    return {"per_time_correlation": corrs, "mean_correlation": float(corrs.mean()),
            "sigma": sigma, "abs_error": abs_err}


def function_space_diagnostics(samples, predict_fn, thin: int = 1,
                               chunk: int = 256) -> dict:
    """Convergence diagnostics in FUNCTION space: the full Vehtari-2021
    battery (split-R-hat, rank R-hat, bulk/tail ESS) computed on posterior
    PREDICTIVE probe outputs instead of raw weight coordinates.

    Bayesian-network weight posteriors carry exact and near-exact symmetries
    (hidden-unit sign flips under odd activations; per-channel structure in
    the DeepONet dot-product merge) that make them genuinely multimodal in
    weight space while every mode realizes the same predictive function.
    Weight-space R-hat then correctly reports that a single HMC chain cannot
    visit all symmetric images — but that says nothing about convergence of
    the quantity the reference actually consumes, the posterior predictive
    (main_VI_HMC_burgers.py:286-301, which validates purely through
    predictions). Probe-output diagnostics are invariant to those symmetries
    and measure mixing of the predictive law itself.

    ``samples``: (C, S, d) subspace draws. ``predict_fn(q) -> (P,)`` maps one
    draw to probe outputs (e.g. the DeepONet forward at a fixed set of
    (function, query-point) pairs, frozen coordinates at the VI mean).
    Returns the :func:`vihmc_tpu.chains.summarize_np` dict over the
    (C, S//thin, P) probe traces plus the traces themselves.
    """
    import jax
    import jax.numpy as jnp

    from vihmc_tpu.chains import summarize_np

    x = np.asarray(samples)[:, ::thin, :]
    c, s, d = x.shape
    flat = x.reshape(c * s, d)
    fn = jax.jit(jax.vmap(predict_fn))
    outs = [np.asarray(fn(jnp.asarray(flat[i: i + chunk])))
            for i in range(0, flat.shape[0], chunk)]
    probes = np.concatenate(outs, axis=0).reshape(c, s, -1)
    diag = summarize_np(probes)
    diag["probes"] = probes
    return diag


def stack_runs(stores, name: str = "hmc_params", burn: int = 0) -> np.ndarray:
    """Stack post-burn samples across runs (reference fnames.txt workflow,
    post_process_burgers.py:261-289). ``stores``: RunStore sequence."""
    parts = []
    for store in stores:
        arr = np.asarray(store.load_array(name))
        if arr.ndim == 2:          # (S, D) single chain
            parts.append(arr[burn:])
        else:                      # (C, S, D)
            parts.append(arr[:, burn:].reshape(-1, arr.shape[-1]))
    return np.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# Optional plotting (lazy matplotlib)
# ---------------------------------------------------------------------------

def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_predictions(x, preds, truth=None, train_xy=None, path: str = "prediction.pdf",
                     alpha: float = 0.05):
    """Posterior-predictive spaghetti plot (reference validate() plots and
    ``plot_predictions`` :218-258)."""
    plt = _plt()
    preds = np.asarray(preds)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(x, preds.reshape(preds.shape[0], -1).T, "C0", alpha=alpha)
    ax.plot(x, preds.mean(axis=0).ravel(), "k", linewidth=3, label="Mean prediction")
    if truth is not None:
        ax.plot(x, np.asarray(truth).ravel(), "r", linewidth=2, label="True function")
    if train_xy is not None:
        ax.plot(train_xy[0], train_xy[1], ".C3", markersize=12, label="train", alpha=0.6)
    ax.set_xlabel("x"); ax.set_ylabel("f(x)"); ax.grid(True); ax.legend()
    fig.tight_layout(); fig.savefig(path, dpi=200); plt.close(fig)
    return path


def plot_uq(x, mean, std, truth=None, path: str = "uq.pdf", k: float = 3.0):
    """Mean +- k sigma band (reference ``plot_uq``, main_regression_VI.py:193-226)."""
    plt = _plt()
    x = np.asarray(x).ravel(); mean = np.asarray(mean).ravel(); std = np.asarray(std).ravel()
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.fill_between(x, mean - k * std, mean + k * std, alpha=0.3, label=f"±{k:g}σ")
    ax.plot(x, mean, "k", label="mean")
    if truth is not None:
        ax.plot(x, np.asarray(truth).ravel(), "r", label="truth")
    ax.grid(True); ax.legend(); fig.tight_layout(); fig.savefig(path, dpi=200)
    plt.close(fig)
    return path


def plot_metrics(metrics, path: str = "metrics.pdf"):
    """Loss/MSE curves (reference ``plot_metrics``, main_regression_VI.py:229-261)."""
    plt = _plt()
    m = np.asarray(metrics)
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    axes[0].plot(m[:, 0], label="train loss"); axes[0].plot(m[:, 1], label="valid loss")
    axes[0].set_yscale("symlog"); axes[0].legend(); axes[0].grid(True)
    axes[1].plot(m[:, 2], label="train mse"); axes[1].plot(m[:, 3], label="valid mse")
    axes[1].set_yscale("log"); axes[1].legend(); axes[1].grid(True)
    fig.tight_layout(); fig.savefig(path, dpi=200); plt.close(fig)
    return path


def plot_sensitivity_histogram(scores, path: str = "sensitivity_hist.pdf"):
    """Log-score histogram (reference ``plot_hists``, sensitivity.py)."""
    plt = _plt()
    s = np.asarray(scores)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.hist(np.log10(s[s > 0]), bins=60)
    ax.set_xlabel("log10 sensitivity"); ax.set_ylabel("count"); ax.grid(True)
    fig.tight_layout(); fig.savefig(path, dpi=200); plt.close(fig)
    return path


def plot_sensitivity_layers(scores, params_template, path_prefix: str = "sensitivity_layer"):
    """Per-layer sensitivity heatmaps (reference ``plot_grads`` /
    per-layer plots, Neural_network/VI/util.py:67-79). One image per
    parameter tensor; returns the file list."""
    import numpy as np

    from vihmc_tpu.core.ravel import segment_slices
    import jax

    plt = _plt()
    scores = np.asarray(scores)
    leaves = jax.tree_util.tree_leaves(params_template)
    paths = []
    for i, ((start, stop), leaf) in enumerate(zip(segment_slices(params_template), leaves)):
        block = scores[start:stop].reshape(np.shape(leaf))
        fig, ax = plt.subplots(figsize=(6, 4))
        if block.ndim == 1:
            block = block[None, :]
        im = ax.imshow(np.log10(np.maximum(block.reshape(block.shape[0], -1), 1e-30)),
                       aspect="auto", cmap="viridis")
        fig.colorbar(im, ax=ax, label="log10 sensitivity")
        out = f"{path_prefix}_{i}.pdf"
        fig.tight_layout(); fig.savefig(out, dpi=150); plt.close(fig)
        paths.append(out)
    return paths


def plot_captured_variance(scores, path: str = "captured_variance.pdf"):
    """Cumulative captured-variance curve (reference ``captured_var``)."""
    plt = _plt()
    s = np.sort(np.asarray(scores))[::-1]
    ratio = np.cumsum(s) / s.sum()
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(np.arange(1, len(ratio) + 1), ratio, linewidth=2)
    ax.set_xlabel("No of parameters"); ax.set_ylabel("Ratio of variance captured")
    ax.set_xscale("log"); ax.grid(True)
    fig.tight_layout(); fig.savefig(path, dpi=200); plt.close(fig)
    return path


def plot_error_sigma_correlation(preds, truth, nt: int, nx: int,
                                 path_prefix: str = "correlation",
                                 scatter_times: tuple = (0.25, 0.5, 0.75, 1.0)):
    """Error-vs-sigma scatter panels at selected time slices plus the
    per-time correlation-coefficient curve (the figures the reference's
    ``plot_correlation`` emits, post_process_burgers.py:151-215; the
    numbers come from :func:`error_sigma_correlation`)."""
    plt = _plt()
    stats = error_sigma_correlation(preds, truth, nt, nx)
    sigma, abs_err, corrs = stats["sigma"], stats["abs_error"], stats["per_time_correlation"]

    t_idx = [min(nt - 1, int(round(f * (nt - 1)))) for f in scatter_times]
    fig, axes = plt.subplots(1, len(t_idx), figsize=(4 * len(t_idx), 4),
                             sharey=True)
    for ax, t in zip(np.atleast_1d(axes), t_idx):
        ax.plot(sigma[:, t, :].ravel(), abs_err[:, t, :].ravel(), ".", ms=2,
                alpha=0.3)
        ax.set_title(f"t = {t / max(nt - 1, 1):.2f}  (r = {corrs[t]:+.2f})")
        ax.set_xlabel("predictive σ"); ax.grid(True)
    np.atleast_1d(axes)[0].set_ylabel("|error|")
    scatter_path = f"{path_prefix}_scatter.pdf"
    fig.tight_layout(); fig.savefig(scatter_path, dpi=150); plt.close(fig)

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(np.linspace(0, 1, nt), corrs, linewidth=2)
    ax.axhline(0.0, color="k", linewidth=0.8)
    ax.set_xlabel("t"); ax.set_ylabel("corr(|error|, σ)"); ax.grid(True)
    curve_path = f"{path_prefix}_curve.pdf"
    fig.tight_layout(); fig.savefig(curve_path, dpi=200); plt.close(fig)
    return [scatter_path, curve_path]


def animate_solution(preds, truth, nt: int, nx: int, path: str = "solution.mp4",
                     fps: int = 10):
    """Mean +- 3 sigma vs truth over time (reference ``animate_soln`` :45-102).
    Falls back to a GIF writer if ffmpeg is unavailable."""
    plt = _plt()
    from matplotlib import animation

    preds = np.asarray(preds).reshape(len(preds), nt, nx)
    truth = np.asarray(truth).reshape(nt, nx)
    mean = preds.mean(axis=0); std = preds.std(axis=0)
    x = np.linspace(0, 1, nx)

    fig, ax = plt.subplots(figsize=(8, 5))
    (line_m,) = ax.plot(x, mean[0], "k", label="mean")
    (line_t,) = ax.plot(x, truth[0], "r--", label="truth")
    band = [ax.fill_between(x, mean[0] - 3 * std[0], mean[0] + 3 * std[0], alpha=0.3)]
    ax.set_ylim(float((mean - 3 * std).min()), float((mean + 3 * std).max()))
    ax.legend(); ax.grid(True)

    def update(t):
        line_m.set_ydata(mean[t]); line_t.set_ydata(truth[t])
        band[0].remove()
        band[0] = ax.fill_between(x, mean[t] - 3 * std[t], mean[t] + 3 * std[t],
                                  alpha=0.3, color="C0")
        ax.set_title(f"t = {t / (nt - 1):.2f}")
        return line_m, line_t

    anim = animation.FuncAnimation(fig, update, frames=nt, blit=False)
    try:
        anim.save(path, fps=fps)
    except Exception:
        path = path.rsplit(".", 1)[0] + ".gif"
        anim.save(path, writer="pillow", fps=fps)
    plt.close(fig)
    return path
