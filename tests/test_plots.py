"""Smoke tests for the plotting/animation layer (Agg backend, tmp files)."""

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from vihmc_tpu.pipelines.postprocess import (
    plot_predictions,
    plot_uq,
    plot_metrics,
    plot_sensitivity_histogram,
    plot_captured_variance,
    plot_sensitivity_layers,
    plot_error_sigma_correlation,
    animate_solution,
)


def test_plot_predictions(tmp_path):
    rng = np.random.default_rng(0)
    x = np.linspace(-1, 1, 30)
    preds = rng.normal(size=(10, 30))
    out = plot_predictions(x, preds, truth=np.sin(x),
                           train_xy=(x[:5], np.sin(x[:5])),
                           path=str(tmp_path / "p.pdf"))
    assert (tmp_path / "p.pdf").exists()


def test_plot_uq_and_metrics(tmp_path):
    x = np.linspace(0, 1, 20)
    plot_uq(x, np.sin(x), 0.1 * np.ones(20), truth=np.sin(x),
            path=str(tmp_path / "uq.pdf"))
    plot_metrics(np.abs(np.random.default_rng(1).normal(size=(50, 4))) + 1e-3,
                 path=str(tmp_path / "m.pdf"))
    assert (tmp_path / "uq.pdf").exists() and (tmp_path / "m.pdf").exists()


def test_sensitivity_plots(tmp_path):
    rng = np.random.default_rng(2)
    scores = np.abs(rng.normal(size=100)) ** 3
    plot_sensitivity_histogram(scores, path=str(tmp_path / "h.pdf"))
    plot_captured_variance(scores, path=str(tmp_path / "cv.pdf"))
    template = [{"w": np.zeros((5, 10)), "b": np.zeros(5)},
                {"w": np.zeros((5, 5)), "b": np.zeros(5)},
                {"w": np.zeros((1, 5))}]
    layer_scores = np.abs(rng.normal(size=90)) ** 3  # 55 + 30 + 5 leaf elems
    paths = plot_sensitivity_layers(layer_scores, template,
                                    path_prefix=str(tmp_path / "layer"))
    assert len(paths) == 5  # one per leaf (b, w alphabetical per layer)
    import os

    assert all(os.path.exists(p) for p in paths)


def test_plot_error_sigma_correlation(tmp_path):
    rng = np.random.default_rng(4)
    nt, nx, n_fn, n_samps = 6, 8, 3, 10
    truth = rng.normal(size=(n_fn, nt * nx))
    preds = truth[None] + 0.1 * rng.normal(size=(n_samps, n_fn, nt * nx))
    paths = plot_error_sigma_correlation(preds, truth, nt=nt, nx=nx,
                                         path_prefix=str(tmp_path / "corr"))
    import os

    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_animate_solution(tmp_path):
    rng = np.random.default_rng(3)
    nt, nx = 5, 16
    truth = rng.normal(size=(nt, nx))
    preds = truth[None] + 0.1 * rng.normal(size=(6, nt, nx))
    out = animate_solution(preds, truth, nt=nt, nx=nx,
                           path=str(tmp_path / "sol.mp4"), fps=2)
    import os

    assert os.path.exists(out)  # mp4 or gif fallback
