import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.models import DeepONetConfig
from vihmc_tpu.dists.priors import IsotropicGaussianPrior
from vihmc_tpu.pipelines.common import (
    make_deeponet_nll_log_posterior,
    make_flat_deeponet,
    make_log_posterior,
)


def test_fused_posterior_matches_composed_path():
    cfg = DeepONetConfig(in_branch=7, in_trunk=5, width_branch=8, width_trunk=8,
                         depth_branch=3, depth_trunk=3)
    rng = np.random.default_rng(0)
    bx = jnp.asarray(rng.normal(size=(5, 7)), jnp.float32)
    tx = jnp.asarray(rng.uniform(size=(6, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(5, 6)), jnp.float32)
    prior = IsotropicGaussianPrior(scale=0.1)

    lp_fused, flat0, _ = make_deeponet_nll_log_posterior(
        cfg, bx, tx, y, tau_var=0.5, prior=prior)
    apply_flat, flat0b, _ = make_flat_deeponet(cfg)
    lp_ref = make_log_posterior(lambda f: apply_flat(f, bx, tx), y, "NLL",
                                0.5, prior)
    np.testing.assert_allclose(np.asarray(flat0), np.asarray(flat0b))
    v1 = float(lp_fused(flat0))
    v2 = float(lp_ref(flat0))
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    g1 = jax.grad(lp_fused)(flat0)
    g2 = jax.grad(lp_ref)(flat0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3,
                               atol=1e-5)
