"""CLI smoke tests (in-process main() to avoid interpreter startup cost)."""

import numpy as np
import pytest

from vihmc_tpu.pipelines.cli import build_parser, main


def test_parser_subcommands():
    ap = build_parser()
    for cmd in ("hmc-full", "vi-nn", "vi-operator", "vi-hmc", "hmc-nuts",
                "hmc-split", "bench"):
        args = ap.parse_args([cmd] + (["--artifacts", "x"] if cmd == "vi-hmc" else []))
        assert args.command == cmd


def test_cli_vi_nn_with_sensitivity_then_vi_hmc(tmp_path):
    out = str(tmp_path)
    rc = main(["vi-nn", "--epochs", "3", "--out", out, "--uid", "demo",
               "--with-sensitivity"])
    assert rc == 0
    for name in ("means_flattened", "stds_flattened", "gradient_indices"):
        assert (tmp_path / "demo" / f"{name}.npy").exists()

    rc = main(["vi-hmc", "--artifacts", str(tmp_path / "demo"),
               "--num-samples", "8", "--num-chains", "1", "--out", out,
               "--uid", "hmc"])
    assert rc == 0
    samples = np.load(tmp_path / "hmc" / "hmc_params.npy")
    assert samples.ndim == 3 and np.isfinite(samples).all()


def test_cli_vi_hmc_save_vi_trace(tmp_path):
    out = str(tmp_path)
    rc = main(["vi-nn", "--epochs", "2", "--out", out, "--uid", "demo",
               "--with-sensitivity"])
    assert rc == 0
    rc = main(["vi-hmc", "--artifacts", str(tmp_path / "demo"),
               "--num-samples", "6", "--num-chains", "1", "--policy", "refresh",
               "--save-vi-trace", "--out", out, "--uid", "hmc"])
    assert rc == 0
    trace = np.load(tmp_path / "hmc" / "vi_params.npy")
    assert trace.ndim == 3 and trace.shape[1] == 6 and np.isfinite(trace).all()


def test_cli_vi_hmc_algorithm_chees(tmp_path):
    out = str(tmp_path)
    rc = main(["vi-nn", "--epochs", "2", "--out", out, "--uid", "d",
               "--with-sensitivity"])
    assert rc == 0
    rc = main(["vi-hmc", "--artifacts", f"{out}/d", "--num-samples", "10",
               "--num-chains", "2", "--algorithm", "chees", "--out", out,
               "--uid", "hc"])
    assert rc == 0
    samples = np.load(tmp_path / "hc" / "hmc_params.npy")
    assert samples.shape[:2] == (2, 10) and np.isfinite(samples).all()


def test_cli_postprocess_stacks_runs(tmp_path, capsys):
    from vihmc_tpu.io import RunStore

    s1 = RunStore(str(tmp_path), uid="a")
    s2 = RunStore(str(tmp_path), uid="b")
    rng = np.random.default_rng(0)
    s1.save_array("hmc_params", rng.normal(size=(10, 3)))
    s2.save_array("hmc_params", rng.normal(size=(2, 10, 3)))
    out = str(tmp_path / "stacked.npy")
    rc = main(["postprocess", "--runs", str(tmp_path / "a"), str(tmp_path / "b"),
               "--burn", "4", "--out", out])
    assert rc == 0
    stacked = np.load(out)
    assert stacked.shape == (6 + 2 * 6, 3)


def test_cli_hmc_full(tmp_path):
    rc = main(["hmc-full", "--num-samples", "8", "--num-chains", "1",
               "--step-size", "1e-4", "--out", str(tmp_path), "--uid", "h"])
    assert rc == 0
    assert (tmp_path / "h" / "hmc_params.npy").exists()
    assert (tmp_path / "h" / "config.json").exists()


def test_cli_standalone_sensitivity_reevaluate_predict(tmp_path):
    """Round-1 VERDICT item 7: every stage runs standalone — VI, then
    sensitivity against the finished VI run, then VI-HMC, then reevaluate
    and predict against the finished sampling run (mirroring the
    reference's per-stage scripts + evaluate flags, README.md:20-24)."""
    out = str(tmp_path)
    rc = main(["vi-nn", "--epochs", "3", "--out", out, "--uid", "vi"])
    assert rc == 0
    # VI persists its flat posterior for the standalone sensitivity stage
    assert (tmp_path / "vi" / "vi_mu_flattened.npy").exists()
    assert (tmp_path / "vi" / "vi_sigma_flattened.npy").exists()

    rc = main(["sensitivity", "--vi-run", f"{out}/vi", "--out", out,
               "--uid", "sens"])
    assert rc == 0
    for name in ("means_flattened", "stds_flattened", "gradient_indices",
                 "sensitivity_scores"):
        assert (tmp_path / "sens" / f"{name}.npy").exists()

    rc = main(["vi-hmc", "--artifacts", f"{out}/sens", "--num-samples", "10",
               "--num-chains", "2", "--out", out, "--uid", "hmc"])
    assert rc == 0

    rc = main(["reevaluate", "--run", f"{out}/hmc", "--artifacts",
               f"{out}/sens", "--out", out, "--uid", "reeval"])
    assert rc == 0

    rc = main(["predict", "--run", f"{out}/hmc", "--artifacts", f"{out}/sens",
               "--keep", "5", "--out", out, "--uid", "pred"])
    assert rc == 0
    preds = np.load(tmp_path / "pred" / "predictions.npy")
    assert preds.shape[0] == 5 and np.isfinite(preds).all()
    assert np.isfinite(np.load(tmp_path / "pred" / "pred_mean.npy")).all()


def test_cli_vi_hmc_segmented_and_adaptive(tmp_path):
    """The production recipe flags (--segment/--ckpt/--thin, coupled and
    continuing dual averaging) flow through the vi-hmc CLI."""
    out = str(tmp_path)
    rc = main(["vi-nn", "--epochs", "2", "--out", out, "--uid", "d",
               "--with-sensitivity"])
    assert rc == 0
    rc = main(["vi-hmc", "--artifacts", f"{out}/d", "--num-samples", "12",
               "--num-chains", "2", "--segment", "6", "--thin", "2",
               "--ckpt", f"{out}/ck", "--adapt-step-size", "--da-axis",
               "--adapt-forever", "--target-accept", "0.7",
               "--out", out, "--uid", "h"])
    assert rc == 0
    samples = np.load(tmp_path / "h" / "hmc_params.npy")
    assert samples.shape[:2] == (2, 6) and np.isfinite(samples).all()  # thinned


def test_cli_vi_hmc_round4_recipe_flags(tmp_path):
    """The round-4 valid-recipe knobs (--laplace-mass/--lowrank-rank/
    --init-optimize, and algorithm=auto) flow through the vi-hmc CLI."""
    out = str(tmp_path)
    rc = main(["vi-nn", "--epochs", "2", "--out", out, "--uid", "d",
               "--with-sensitivity"])
    assert rc == 0
    rc = main(["vi-hmc", "--artifacts", f"{out}/d", "--num-samples", "10",
               "--num-chains", "2", "--policy", "draw",
               "--lowrank-rank", "4", "--init-optimize", "5",
               "--algorithm", "auto", "--out", out, "--uid", "r4"])
    assert rc == 0
    samples = np.load(tmp_path / "r4" / "hmc_params.npy")
    assert samples.shape[:2] == (2, 10) and np.isfinite(samples).all()
