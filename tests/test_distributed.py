import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.chains import global_chain_mesh, chains_per_host, initialize_distributed


def test_global_chain_mesh(devices):
    mesh = global_chain_mesh(n_data_shards=2)
    assert mesh.shape == {"chains": 4, "data": 2}


def test_chains_per_host_single_process():
    # single-process: every chain count is local
    assert chains_per_host(8) == 8
    assert chains_per_host(7) == 7


def test_initialize_distributed_single_process_noop():
    assert initialize_distributed() is False


def test_bf16_compute_dtype_forward():
    from vihmc_tpu.models import DeepONetConfig, MLPConfig
    from vihmc_tpu.pipelines.common import make_flat_deeponet, make_flat_mlp

    cfg = DeepONetConfig(in_branch=7, in_trunk=5, width_branch=8, width_trunk=8,
                         depth_branch=3, depth_trunk=3)
    f32, flat0, _ = make_flat_deeponet(cfg)
    bf16, _, _ = make_flat_deeponet(cfg, compute_dtype=jnp.bfloat16)
    bx = jnp.ones((3, 7)); tx = 0.3 * jnp.ones((4, 2))
    a = np.asarray(f32(flat0, bx, tx))
    b = np.asarray(bf16(flat0, bx, tx))
    assert b.dtype == np.float32  # output cast back for the likelihood
    np.testing.assert_allclose(a, b, atol=0.05)  # bf16 forward error bound
    # gradient path works through the casts
    g = jax.grad(lambda f: jnp.sum(bf16(f, bx, tx)))(flat0)
    assert np.isfinite(np.asarray(g)).all()

    mcfg = MLPConfig(in_dim=1, widths=(8,), out_dim=1)
    mbf16, mflat, _ = make_flat_mlp(mcfg, compute_dtype=jnp.bfloat16)
    y = mbf16(mflat, jnp.ones((5, 1)))
    assert y.dtype == jnp.float32 and y.shape == (5, 1)
