"""Weight-space symmetry canonicalization (models/symmetry.py).

The properties that make the round-2 demo's R-hat analysis airtight:
(1) symmetry-group elements preserve the network function, (2) the
canonicalization map is exactly orbit-invariant (same orbit -> identical
canonical vector), (3) canonicalizing symmetric chains collapses the
spurious split-R-hat without touching genuinely divergent chains.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vihmc_tpu.chains import potential_scale_reduction_np
from vihmc_tpu.models import DeepONetConfig, MLPConfig
from vihmc_tpu.models.symmetry import (
    canonicalize_deeponet,
    canonicalize_mlp,
    random_orbit_element,
)
from vihmc_tpu.pipelines.common import make_flat_deeponet, make_flat_mlp

DO_CFG = DeepONetConfig(in_branch=9, in_trunk=5, width_branch=6,
                        width_trunk=6, depth_branch=3, depth_trunk=3)
MLP_CFG = MLPConfig()  # reference 1->10->10->1 tanh


def _rand_flat(key, apply_maker, cfg):
    _, flat0, _ = apply_maker(cfg)
    rng = np.random.default_rng(int(key))
    return np.asarray(flat0) + 0.3 * rng.normal(size=flat0.shape[0])


def test_orbit_element_preserves_deeponet_function():
    apply_flat, _, _ = make_flat_deeponet(DO_CFG)
    flat = _rand_flat(0, make_flat_deeponet, DO_CFG)
    bx = jnp.asarray(np.random.default_rng(1).normal(size=(4, 9)), jnp.float32)
    tx = jnp.asarray(np.random.default_rng(2).uniform(size=(7, 2)), jnp.float32)
    for seed in range(3):
        orb = random_orbit_element(seed, flat, DO_CFG, kind="deeponet")
        assert not np.allclose(orb, flat)  # actually moved in weight space
        np.testing.assert_allclose(
            np.asarray(apply_flat(jnp.asarray(flat, jnp.float32), bx, tx)),
            np.asarray(apply_flat(jnp.asarray(orb, jnp.float32), bx, tx)),
            atol=1e-4)


def test_orbit_element_preserves_hetero_head_function():
    """With noise_neurons > 0 the mean and noise heads read DISJOINT channel
    ranges, so merge-channel permutations must stay within each block
    (ADVICE r3: a cross-boundary permutation changed the function by ~1.27)."""
    cfg = DeepONetConfig(in_branch=9, in_trunk=5, width_branch=6,
                         width_trunk=6, depth_branch=3, depth_trunk=3,
                         noise_neurons=2)
    apply_flat, _, _ = make_flat_deeponet(cfg)
    flat = _rand_flat(11, make_flat_deeponet, cfg)
    bx = jnp.asarray(np.random.default_rng(1).normal(size=(4, 9)), jnp.float32)
    tx = jnp.asarray(np.random.default_rng(2).uniform(size=(7, 2)), jnp.float32)
    y0, n0 = apply_flat(jnp.asarray(flat, jnp.float32), bx, tx)
    for seed in range(3):
        orb = random_orbit_element(seed, flat, cfg, kind="deeponet",
                                   permute=True)
        y1, n1 = apply_flat(jnp.asarray(orb, jnp.float32), bx, tx)
        np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
        np.testing.assert_allclose(np.asarray(n0), np.asarray(n1), atol=1e-4)
    # canonicalization with permutation also preserves both heads
    ref = _rand_flat(12, make_flat_deeponet, cfg)
    can = canonicalize_deeponet(flat, ref, cfg, permute=True)
    y1, n1 = apply_flat(jnp.asarray(can, jnp.float32), bx, tx)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(n0), np.asarray(n1), atol=1e-4)
    # and is still orbit-invariant within the blocked group
    orb = random_orbit_element(5, flat, cfg, kind="deeponet", permute=True)
    can2 = canonicalize_deeponet(orb, ref, cfg, permute=True)
    np.testing.assert_allclose(can, can2, atol=1e-6)


def test_orbit_element_preserves_mlp_function():
    apply_flat, _, _ = make_flat_mlp(MLP_CFG)
    flat = _rand_flat(3, make_flat_mlp, MLP_CFG)
    x = jnp.linspace(-1, 1, 11)[:, None]
    orb = random_orbit_element(7, flat, MLP_CFG, kind="mlp")
    np.testing.assert_allclose(
        np.asarray(apply_flat(jnp.asarray(flat, jnp.float32), x)),
        np.asarray(apply_flat(jnp.asarray(orb, jnp.float32), x)), atol=1e-5)


@pytest.mark.parametrize("permute", [False, True])
def test_canonicalization_is_orbit_invariant_deeponet(permute):
    flat = _rand_flat(4, make_flat_deeponet, DO_CFG)
    ref = _rand_flat(5, make_flat_deeponet, DO_CFG)
    canon = canonicalize_deeponet(flat, ref, DO_CFG, permute=permute)
    for seed in range(4):
        orb = random_orbit_element(seed, flat, DO_CFG, kind="deeponet",
                                   permute=permute)
        canon_orb = canonicalize_deeponet(orb, ref, DO_CFG, permute=permute)
        np.testing.assert_allclose(canon_orb, canon, atol=1e-10)


@pytest.mark.parametrize("permute", [False, True])
def test_canonicalization_is_orbit_invariant_mlp(permute):
    flat = _rand_flat(6, make_flat_mlp, MLP_CFG)
    ref = _rand_flat(8, make_flat_mlp, MLP_CFG)
    canon = canonicalize_mlp(flat, ref, MLP_CFG, permute=permute)
    for seed in range(4):
        orb = random_orbit_element(seed, flat, MLP_CFG, kind="mlp",
                                   permute=permute)
        np.testing.assert_allclose(
            canonicalize_mlp(orb, ref, MLP_CFG, permute=permute), canon,
            atol=1e-10)


def test_canonicalization_preserves_function():
    apply_flat, _, _ = make_flat_deeponet(DO_CFG)
    flat = _rand_flat(9, make_flat_deeponet, DO_CFG)
    ref = _rand_flat(10, make_flat_deeponet, DO_CFG)
    canon = canonicalize_deeponet(flat, ref, DO_CFG, permute=True)
    bx = jnp.asarray(np.random.default_rng(1).normal(size=(4, 9)), jnp.float32)
    tx = jnp.asarray(np.random.default_rng(2).uniform(size=(7, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(apply_flat(jnp.asarray(flat, jnp.float32), bx, tx)),
        np.asarray(apply_flat(jnp.asarray(canon, jnp.float32), bx, tx)),
        atol=1e-4)


def test_canonicalization_collapses_symmetric_chain_rhat():
    """Two 'chains' sampling the SAME local mode, one of them carried to a
    different symmetry-orbit element: raw split-R-hat explodes on the
    affected coordinates, canonicalized split-R-hat is ~1."""
    rng = np.random.default_rng(0)
    center = _rand_flat(11, make_flat_deeponet, DO_CFG)
    d = center.shape[0]
    s = 80
    chain_a = center[None] + 0.01 * rng.normal(size=(s, d))
    chain_b = center[None] + 0.01 * rng.normal(size=(s, d))
    # apply the same flip pattern to every draw of chain b: a sign-only
    # group element acts as a fixed +-1 mask on the flat coordinates
    sign_pattern = np.where(
        random_orbit_element(1, np.ones(d), DO_CFG, permute=False) < 0, -1.0, 1.0)
    chain_b = chain_b * sign_pattern[None, :]

    raw = np.stack([chain_a, chain_b])  # (2, S, D)
    rhat_raw = potential_scale_reduction_np(raw)
    assert np.nanmax(rhat_raw) > 2.0  # symmetry split looks like divergence

    canon = np.stack([
        canonicalize_deeponet(chain_a, center, DO_CFG),
        canonicalize_deeponet(chain_b, center, DO_CFG),
    ])
    rhat_canon = potential_scale_reduction_np(canon)
    assert np.nanmax(rhat_canon) < 1.2, np.nanmax(rhat_canon)
    # genuinely different chains stay flagged
    shifted = np.stack([chain_a, chain_a + 0.2])
    assert np.nanmax(potential_scale_reduction_np(shifted)) > 2.0
