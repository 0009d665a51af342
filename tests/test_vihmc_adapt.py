import jax
import numpy as np

from vihmc_tpu.models import MLPConfig
from vihmc_tpu.pipelines import vi_hmc, configs as C

TINY = MLPConfig(in_dim=1, widths=(8,), out_dim=1)


def test_vihmc_step_size_adaptation():
    d = TINY.num_params
    rng = np.random.default_rng(0)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=8, replace=False))}
    cfg = C.VIHMCRunConfig(num_samples=60, burn=30, step_size=1.0,  # bad init
                           post_std=0.05, num_chains=2, tau_out=5e-2 ** 2,
                           adapt_step_size=True, frozen_policy="mean")
    out = vi_hmc.run_nn(cfg, TINY, artifacts, key=jax.random.key(0))
    eps = np.asarray(out["result"].step_sizes)
    # adaptation moved the step away from the (bad) init and froze post-burn
    assert not np.allclose(eps[0, 0], eps[0, -1])
    post = eps[0, 31:]
    assert np.allclose(post, post[0])
    assert post[0] < 1.0
    # post-burn acceptance is near the 0.8 target
    acc = np.asarray(out["result"].accept_probs[:, 30:]).mean()
    assert 0.4 < acc <= 1.0
