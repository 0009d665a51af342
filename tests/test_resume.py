"""Checkpoint/resume: segmented sampling and VI training restart."""

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.hmc import HMCConfig
from vihmc_tpu.chains import sample_chains_resumable
from vihmc_tpu.models import MLPConfig, init_mlp, init_variational
from vihmc_tpu.vi import VIConfig, init_train_state, train
from vihmc_tpu.vi.elbo import ELBOConfig
from vihmc_tpu.pipelines.common import mlp_vi_apply


def std_normal_lp(q):
    return -0.5 * jnp.sum(q * q)


def test_resumable_matches_uninterrupted(tmp_path):
    cfg = HMCConfig(num_samples=60, num_leapfrog=5, step_size=0.3)
    inits = jnp.zeros((2, 3))
    key = jax.random.key(0)

    full = sample_chains_resumable(std_normal_lp, inits, key, cfg, segment_size=20)
    assert full.samples.shape == (2, 60, 3)

    # run the first 2 segments with checkpointing, then "crash" and resume
    d1 = str(tmp_path / "ck")
    partial = sample_chains_resumable(
        std_normal_lp, inits, key,
        HMCConfig(num_samples=40, num_leapfrog=5, step_size=0.3),
        segment_size=20, checkpoint_dir=d1)
    resumed = sample_chains_resumable(std_normal_lp, inits, key, cfg,
                                      segment_size=20, checkpoint_dir=d1)
    np.testing.assert_allclose(np.asarray(resumed.samples),
                               np.asarray(full.samples), atol=1e-5)


def test_resumable_windowed_mass_matches_uninterrupted(tmp_path):
    """Stateful adaptation (windowed metric + dual averaging) must survive the
    segment boundaries and a checkpoint round-trip bit-for-bit."""
    from vihmc_tpu.dists import diag_normal_logpdf_sum

    def lp(q):
        return diag_normal_logpdf_sum(q, 0.0, jnp.array([0.2, 5.0]))

    cfg = HMCConfig(num_samples=120, num_leapfrog=4, step_size=0.05, burn=60,
                    sampler="hmc_nuts", adapt_mass=True,
                    mass_schedule="windowed")
    inits = jnp.zeros((2, 2))
    key = jax.random.key(3)
    inv0 = jnp.array([1.0, 1.0])

    full = sample_chains_resumable(lp, inits, key, cfg, segment_size=30,
                                   inv_mass=inv0)
    d = str(tmp_path / "ckw")
    sample_chains_resumable(lp, inits, key,
                            HMCConfig(num_samples=60, num_leapfrog=4,
                                      step_size=0.05, burn=60,
                                      sampler="hmc_nuts", adapt_mass=True,
                                      mass_schedule="windowed"),
                            segment_size=30, checkpoint_dir=d, inv_mass=inv0)
    resumed = sample_chains_resumable(lp, inits, key, cfg, segment_size=30,
                                      checkpoint_dir=d, inv_mass=inv0)
    np.testing.assert_allclose(np.asarray(resumed.samples),
                               np.asarray(full.samples), atol=1e-5)
    # the carried metric picked up the anisotropy (short windows -> rough
    # estimate; direction is what matters here, magnitude is tested in
    # test_mass_adaptation.py with a long warmup)
    inv_mass = np.asarray(resumed.final_state.inv_mass)
    assert (inv_mass[:, 1] / inv_mass[:, 0] > 2.0).all()


def test_resumable_statistics():
    cfg = HMCConfig(num_samples=600, num_leapfrog=6, step_size=0.4)
    res = sample_chains_resumable(std_normal_lp, jnp.zeros((2, 2)),
                                  jax.random.key(1), cfg, segment_size=100)
    post = np.asarray(res.samples[:, 150:, :])
    np.testing.assert_allclose(post.mean(), 0.0, atol=0.12)
    np.testing.assert_allclose(post.std(), 1.0, atol=0.12)


def test_vi_train_checkpoint_restart(tmp_path):
    mlp = MLPConfig(in_dim=1, widths=(6,), out_dim=1)
    template = init_mlp(jax.random.key(0), mlp)
    vp = init_variational(jax.random.key(1), template)
    cfg = VIConfig(epochs=8, lr_start=1e-2, num_ens=2, n_save=4,
                   elbo=ELBOConfig(reduction="sum", fixed_noise_var=0.01))
    batch = {"x": jnp.linspace(-1, 1, 8).reshape(-1, 1),
             "y": jnp.zeros((8, 1))}
    apply_fn = mlp_vi_apply(mlp)
    state = init_train_state(vp, cfg)
    ck = str(tmp_path / "vi")
    final, best, metrics = train(apply_fn, state, cfg, lambda k, e: [batch],
                                 batch, batch, 8, jax.random.key(2),
                                 ckpt_dir=ck)
    assert metrics.shape[0] == 8
    from vihmc_tpu.io.checkpoint import latest_step

    assert latest_step(ck) == 8          # final checkpoint
    assert latest_step(ck + "/best") == 0  # best checkpoint exists

    # restart from the final checkpoint: no epochs left -> metrics empty,
    # state carries the checkpointed epoch
    state2 = init_train_state(vp, cfg)
    final2, _, metrics2 = train(apply_fn, state2, cfg, lambda k, e: [batch],
                                batch, batch, 8, jax.random.key(3),
                                ckpt_dir=ck, restart=True)
    assert metrics2.shape[0] == 0
    assert int(final2.epoch) == int(final.epoch)


def test_vihmc_pipeline_segmented_resumable(tmp_path):
    """run_nn(segment_size=..., checkpoint_dir=...) samples in checkpointed
    segments; a rerun against the same checkpoint dir resumes (returning the
    already-collected samples) instead of re-sampling."""
    import numpy as np
    import jax

    from vihmc_tpu.models import MLPConfig
    from vihmc_tpu.pipelines import vi_hmc, configs as C

    mlp = MLPConfig(in_dim=1, widths=(8, 8), out_dim=1, activation="tanh")
    d = mlp.num_params
    rng = np.random.default_rng(2)
    artifacts = {"mu": rng.normal(size=d).astype(np.float32) * 0.1,
                 "sigma": (0.05 + 0.1 * rng.random(d)).astype(np.float32),
                 "indices": np.sort(rng.choice(d, size=10, replace=False))}
    cfg = C.VIHMCRunConfig(num_samples=12, step_size=1e-3, post_std=0.05,
                           num_chains=2, frozen_policy="refresh",
                           tau_out=5e-2 ** 2, loss="NLL")
    ck = str(tmp_path / "ck")
    segs = []
    out = vi_hmc.run_nn(cfg, mlp, artifacts, key=jax.random.key(5),
                        segment_size=5, checkpoint_dir=ck,
                        progress=lambda s, n, st: segs.append((s, n)))
    assert segs == [(1, 3), (2, 3), (3, 3)]
    s1 = np.asarray(out["result"].samples)
    assert s1.shape == (2, 12, 10) and np.isfinite(s1).all()

    out2 = vi_hmc.run_nn(cfg, mlp, artifacts, key=jax.random.key(5),
                         segment_size=5, checkpoint_dir=ck)
    np.testing.assert_array_equal(np.asarray(out2["result"].samples), s1)
