"""Bench JSON schema: the split ESS/wall metric and MFU fields (round-2
VERDICT items 2 and 7) must survive refactors — the driver's BENCH_r*.json
is consumed cross-round."""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_operator_quick_schema():
    stats, _ = bench.bench_jax(True, keys=(2, 3))
    # split metric: pooled ESS per key (deterministic) and wall per key
    assert len(stats["ess_median_by_key"]) == 2
    assert len(stats["wall_s_by_key"]) == 2
    assert stats["wall_s_median"] > 0
    assert stats["wall_spread_frac"] >= 0
    # headline = median ESS / median wall
    med_ess = float(np.median(stats["ess_median_by_key"]))
    assert stats["ess_per_s"] > 0
    assert abs(stats["ess_per_s"] - med_ess / stats["wall_s_median"]) \
        / stats["ess_per_s"] < 0.05  # rounding of the reported lists only
    # MFU block from HLO cost analysis (peak is None on CPU)
    mfu = stats["mfu"]
    assert mfu["model_flops_total"] > 0
    assert mfu["flops_per_draw_per_chain"] > 0
    assert mfu["achieved_tflops"] > 0
    assert "device_kind" in mfu


def test_flops_scale_with_draws():
    s20, _ = bench.bench_jax(True, keys=(2,), draws=20)
    s40, _ = bench.bench_jax(True, keys=(2,), draws=40)
    r = s40["mfu"]["model_flops_total"] / s20["mfu"]["model_flops_total"]
    assert 1.9 < r < 2.1  # while-body trip count is applied manually
