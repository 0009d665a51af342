"""Multi-chain execution: vmap within a chip, mesh-sharded across chips.

The reference runs ``num_chains`` chains in a *sequential Python loop*
(/root/reference/Neural_network/VI_HMC/main_VI_HMC.py:458-460, config
``num_chains=10`` at Neural_network/VI_HMC/config.py:29; a dormant ThreadPool
helper sits unused at Neural_network/VI_HMC/util.py:392-415). Here chains are
a ``vmap`` axis compiled into the same XLA computation, and that axis is laid
out over the ``'chains'`` dimension of a ``jax.sharding.Mesh`` so C chains on
N chips run C/N-per-chip with zero cross-chain communication; the data axis of
the likelihood can be sharded over the ``'data'`` mesh dimension, in which
case XLA inserts psum collectives for the log-likelihood/gradient reductions
inside the leapfrog (GSPMD; scaling-book recipe).
"""

from __future__ import annotations

import functools

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vihmc_tpu.hmc.kernel import HMCConfig, SampleResult, sample
from vihmc_tpu.hmc.metric import EigenMetric, LowRankMetric, as_inv_mass


def make_chain_mesh(n_chain_shards: Optional[int] = None, n_data_shards: int = 1,
                    devices=None) -> Mesh:
    """Build a ('chains', 'data') mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_chain_shards is None:
        n_chain_shards = devices.size // n_data_shards
    devices = devices[: n_chain_shards * n_data_shards]
    return Mesh(devices.reshape(n_chain_shards, n_data_shards), ("chains", "data"))


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """Place data so its batch axis is sharded over the 'data' mesh axis
    (replicated over 'chains'). Likelihood sums over this axis become psums."""
    def put(x):
        spec = [None] * np.ndim(x)
        spec[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, tree)


def shard_query(mesh: Mesh, trunk_x, y):
    """Shard the DeepONet QUERY/trunk axis over the 'data' mesh axis — the
    domain's sequence-parallel analog (SURVEY.md section 2.5: the nearest
    reference mechanism is stochastic trunk-point subsampling,
    /root/reference/Operator_network/VI/utils.py:39-41; here the full
    10201-point grid is partitioned across devices instead of subsampled).

    ``trunk_x`` (P, coords) shards along axis 0; ``y`` (B, P) along axis 1
    (the function-batch axis stays replicated — compose with
    :func:`shard_batch` on ``branch_x`` alone for 2-D data parallelism over
    a ('chains', 'fns', 'query') mesh if both axes need splitting). Under
    GSPMD the trunk MLP stack then computes P/N rows per device, the
    branch@trunk^T merge is sharded on its query axis, and the NLL
    reduction + its gradient lower to psum collectives over 'data'.
    """
    tx = jax.device_put(
        trunk_x, NamedSharding(mesh, P(*(["data"] + [None] * (np.ndim(trunk_x) - 1)))))
    yy = jax.device_put(y, NamedSharding(mesh, P(None, "data")))
    return tx, yy



@functools.lru_cache(maxsize=64)
def _build_chain_sampler(log_prob_fn, config, aux_refresh, shard_log_prob_fn,
                         mesh, grad_fn, delta_fn=None):
    """One jitted multi-chain sampler per (log_prob, config, hooks, mesh).

    Caching here is essential: a fresh ``jax.jit(jax.vmap(...))`` object per
    call would retrace/recompile the entire sampling scan on every
    invocation (on remote-compile TPU backends that costs tens of seconds —
    it silently dominated early benchmark timings). Array-valued inputs
    (inv_mass, aux, shard_data) are traced arguments, so the cache key is
    only the static structure.
    """

    def one_chain(k, q0, inv_mass, aux, shard_data):
        return sample(log_prob_fn, q0, k, config, inv_mass=inv_mass, aux=aux,
                      aux_refresh=aux_refresh, shard_log_prob_fn=shard_log_prob_fn,
                      shard_data=shard_data, grad_fn=grad_fn,
                      delta_fn=delta_fn)

    vmapped = jax.vmap(one_chain, in_axes=(0, 0, None, None, None),
                       axis_name="chains")
    if mesh is None:
        return jax.jit(vmapped)

    chain_sharding = NamedSharding(mesh, P("chains"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(
        vmapped,
        in_shardings=(chain_sharding, chain_sharding, replicated, replicated,
                      replicated),
        out_shardings=NamedSharding(mesh, P("chains")),
    )


class ChainSampler:
    """Explicit compiled-sampler handle (the framework-contract alternative
    to :func:`sample_chains`'s identity-keyed cache).

    :func:`sample_chains` caches compiled programs keyed on FUNCTION
    IDENTITY — callers that rebuild their log-prob closure each run (every
    pipeline construction does) silently recompile, and the cache pins
    compiled executables + closed-over arrays for process lifetime. Hold a
    ``ChainSampler`` instead when sampling the same posterior repeatedly:

        sampler = ChainSampler(log_prob, config, aux_refresh=refresh)
        res1 = sampler(key1, inits, inv_mass=m, aux=aux0)
        res2 = sampler(key2, inits, inv_mass=m, aux=aux0)  # no retrace

    The handle owns exactly one compiled program; dropping it releases the
    executable (nothing is interned in a global cache).
    """

    def __init__(self, log_prob_fn, config: HMCConfig, aux_refresh=None,
                 shard_log_prob_fn=None, mesh: Optional[Mesh] = None,
                 grad_fn=None):
        self.config = config
        # bypass the lru_cache: build an uncached instance-owned program
        self._fn = _build_chain_sampler.__wrapped__(
            log_prob_fn, config, aux_refresh, shard_log_prob_fn, mesh, grad_fn)

    def __call__(self, key, init_positions, inv_mass=1.0, aux=None,
                 shard_data=None) -> SampleResult:
        n_chains = init_positions.shape[0]
        chain_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            jnp.arange(n_chains))
        inv_mass = as_inv_mass(inv_mass)
        return self._fn(chain_keys, init_positions, inv_mass, aux, shard_data)


def sample_chains(
    log_prob_fn,
    init_positions: jnp.ndarray,   # (C, D)
    key,
    config: HMCConfig,
    inv_mass=1.0,
    aux=None,                      # shared across chains (replicated)
    aux_refresh=None,
    shard_log_prob_fn=None,
    shard_data=None,
    mesh: Optional[Mesh] = None,
    grad_fn=None,
    delta_fn=None,
) -> SampleResult:
    """Run C independent chains. Result arrays gain a leading chains axis.

    With ``mesh`` given, chain state/outputs are sharded over the 'chains'
    axis; per-chain PRNG keys derive deterministically from ``key`` by
    ``fold_in`` so results are independent of the mesh layout.

    Repeated calls with the same (log_prob_fn, config, hooks, mesh) reuse the
    compiled program (see :func:`_build_chain_sampler`). CONTRACT: the cache
    key is the IDENTITY of ``log_prob_fn``/``aux_refresh``/``grad_fn`` — a
    rebuilt closure (even if semantically identical) recompiles and occupies
    a new cache slot for process lifetime. Library code that samples one
    posterior many times should hold a :class:`ChainSampler` instead.
    """
    n_chains = init_positions.shape[0]
    chain_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))
    inv_mass = as_inv_mass(inv_mass)

    fn = _build_chain_sampler(log_prob_fn, config, aux_refresh,
                              shard_log_prob_fn, mesh, grad_fn, delta_fn)
    return fn(chain_keys, init_positions, inv_mass, aux, shard_data)


@functools.lru_cache(maxsize=64)
def _build_nuts_chain_sampler(log_prob_fn, config, aux_refresh, mesh,
                              grad_fn=None):
    from vihmc_tpu.hmc.nuts import nuts_sample

    def one_chain(k, q0, inv_mass, aux):
        return nuts_sample(log_prob_fn, q0, k, config, inv_mass=inv_mass,
                           aux=aux, aux_refresh=aux_refresh, grad_fn=grad_fn)

    vmapped = jax.vmap(one_chain, in_axes=(0, 0, None, None),
                       axis_name="chains")
    if mesh is None:
        return jax.jit(vmapped)
    chain_sharding = NamedSharding(mesh, P("chains"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(vmapped,
                   in_shardings=(chain_sharding, chain_sharding, replicated,
                                 replicated),
                   out_shardings=NamedSharding(mesh, P("chains")))


def sample_chains_nuts(log_prob_fn, init_positions, key, config, inv_mass=1.0,
                       aux=None, aux_refresh=None, mesh=None, grad_fn=None):
    """Multi-chain NUTS (vmap + mesh), mirroring :func:`sample_chains`."""
    if isinstance(inv_mass, (LowRankMetric, EigenMetric)):
        raise TypeError("structured metrics are supported by the HMC kernel "
                        "only (sample_chains); NUTS/ChEES take diagonal "
                        "metrics")
    n_chains = init_positions.shape[0]
    chain_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_chains))
    inv_mass = jnp.asarray(inv_mass, jnp.float32)
    fn = _build_nuts_chain_sampler(log_prob_fn, config, aux_refresh, mesh,
                                   grad_fn)
    return fn(chain_keys, init_positions, inv_mass, aux)


@functools.lru_cache(maxsize=64)
def _build_chees_chain_sampler(log_prob_fn, config, aux_refresh, mesh,
                               grad_fn=None):
    from vihmc_tpu.hmc.chees import chees_sample

    def run(key, inits, inv_mass, aux):
        return chees_sample(log_prob_fn, inits, key, config, inv_mass=inv_mass,
                            aux=aux, aux_refresh=aux_refresh, grad_fn=grad_fn)

    if mesh is None:
        return jax.jit(run)
    chain_sharding = NamedSharding(mesh, P("chains"))
    replicated = NamedSharding(mesh, P())
    return jax.jit(run,
                   in_shardings=(replicated, chain_sharding, replicated,
                                 chain_sharding),
                   out_shardings=None)


def sample_chains_chees(log_prob_fn, init_positions, key, config, inv_mass=1.0,
                        aux=None, aux_refresh=None, mesh=None, grad_fn=None):
    """Multi-chain ChEES-HMC. Unlike :func:`sample_chains`, the chains are
    *coupled* (cross-chain adaptation), so the chain axis lives inside one
    computation: chains shard over the 'chains' mesh axis and the ChEES/
    acceptance reductions become collectives.

    ``aux`` here is shared and gets a leading chain axis by tiling (each
    chain then refreshes its own copy via ``aux_refresh``).
    """
    if isinstance(inv_mass, (LowRankMetric, EigenMetric)):
        raise TypeError("structured metrics are supported by the HMC kernel "
                        "only (sample_chains); NUTS/ChEES take diagonal "
                        "metrics")
    n_chains = init_positions.shape[0]
    inv_mass = jnp.asarray(inv_mass, jnp.float32)
    if aux is not None:
        aux = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (n_chains,) + a.shape), aux)
    fn = _build_chees_chain_sampler(log_prob_fn, config, aux_refresh, mesh,
                                    grad_fn)
    return fn(key, init_positions, inv_mass, aux)
