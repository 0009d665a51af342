"""Pure-function DeepONet matching the reference's operator network.

Reference architecture (/root/reference/Operator_network/HMC/model.py:14-77):
branch MLP over the sensed initial condition (in 101), trunk MLP over query
coordinates (x, t), periodic boundary-condition feature embedding
``[t, sin 2*pi*x, sin 4*pi*x, cos 2*pi*x, cos 4*pi*x]`` applied to the spatial
column, dot-product merge over the latent dimension plus one learnable scalar
bias, and an optional heteroscedastic noise head that reserves
``noise_neurons`` latent channels for a predicted log-noise output
(/root/reference/Operator_network/VI/bayesian_model.py:86-114).

TPU-first design decisions
--------------------------
* When the trunk/query grid is *shared* across the batch (the common case:
  10201 fixed (x,t) points), the merge is a single (B,K)x(K,P) matmul on the
  MXU instead of a broadcast einsum — the dominant FLOPs ride the systolic
  array. Per-example subsampled query points (reference
  /root/reference/Operator_network/VI/utils.py:39-41) use the batched einsum
  path.
* Parameters are a pytree {'b': scalar, 'branch': [...], 'trunk': [...]}
  compatible with ``ravel_pytree`` for the flat-vector samplers.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from vihmc_tpu.models.mlp import get_activation, _init_linear, linear_apply


@dataclasses.dataclass(frozen=True)
class DeepONetConfig:
    in_branch: int = 101
    in_trunk: int = 5          # effective trunk input dim (5 with BC embedding of (x,t))
    width_branch: int = 100
    width_trunk: int = 100
    depth_branch: int = 9      # number of Linear layers in the branch
    depth_trunk: int = 9
    output_neurons: int | None = None  # latent merge width K; default width_branch
    activation: str = "tanh"
    impose_bc: bool = True
    noise_neurons: int = 0     # >0 reserves channels for the heteroscedastic head

    @property
    def latent(self) -> int:
        return self.width_branch if self.output_neurons is None else self.output_neurons

    def _stack_dims(self, d_in, width):
        dims = [(d_in, width)]
        dims += [(width, width)] * (self.depth_branch - 2)
        dims += [(width, self.latent)]
        return dims

    @property
    def branch_dims(self):
        return self._stack_dims(self.in_branch, self.width_branch)

    @property
    def trunk_dims(self):
        dims = [(self.in_trunk, self.width_trunk)]
        dims += [(self.width_trunk, self.width_trunk)] * (self.depth_trunk - 2)
        dims += [(self.width_trunk, self.latent)]
        return dims

    @property
    def num_params(self) -> int:
        n = 1  # scalar merge bias
        for d_in, d_out in self.branch_dims + self.trunk_dims:
            n += d_in * d_out + d_out
        return n


def bc_embedding(xy):
    """Periodic BC feature map on the spatial column of (..., 2) query points.

    Reference ``lambda_layer`` + concat
    (/root/reference/Operator_network/HMC/model.py:40-43,67-72): column 0 is
    kept, column 1 (the periodic spatial coordinate) is replaced by
    [sin 2*pi*x, sin 4*pi*x, cos 2*pi*x, cos 4*pi*x].
    """
    keep = xy[..., 0:1]
    x = xy[..., 1]
    two_pi = 2 * math.pi
    feats = jnp.stack(
        [jnp.sin(two_pi * x), jnp.sin(2 * two_pi * x), jnp.cos(two_pi * x), jnp.cos(2 * two_pi * x)],
        axis=-1,
    )
    return jnp.concatenate([keep, feats], axis=-1)


def init_deeponet(key, cfg: DeepONetConfig):
    kb, kt = jax.random.split(key)
    def stack(key, dims):
        keys = jax.random.split(key, len(dims))
        return [_init_linear(k, d_in, d_out, bias=True) for k, (d_in, d_out) in zip(keys, dims)]

    return {
        "b": jnp.zeros(()),  # reference inits the merge bias to 0.0 (model.py:29)
        "branch": stack(kb, cfg.branch_dims),
        "trunk": stack(kt, cfg.trunk_dims),
    }


def _mlp_stack(cfg, layers, x):
    act = get_activation(cfg.activation)
    h = x
    for layer in layers[:-1]:
        h = act(linear_apply(layer, h))
    return linear_apply(layers[-1], h)


def deeponet_features(cfg: DeepONetConfig, params, branch_x, trunk_x):
    """Branch/trunk latent features before the merge: ((B, K), (P, K)).

    Exposed so fused merge+loss kernels (vihmc_tpu.ops.deeponet_merge) can
    consume the features without materializing the (B, P) prediction.
    Shared-query-grid path only.
    """
    trunk_in = bc_embedding(trunk_x) if cfg.impose_bc else trunk_x
    return (_mlp_stack(cfg, params["branch"], branch_x),
            _mlp_stack(cfg, params["trunk"], trunk_in))


def deeponet_apply(cfg: DeepONetConfig, params, branch_x, trunk_x):
    """DeepONet forward.

    Parameters
    ----------
    branch_x : (B, in_branch) sensed input functions.
    trunk_x : (P, 2) shared query points, or (B, P, 2) per-example points.

    Returns
    -------
    (B, P) predictions, or ((B, P), (B, P)) with the heteroscedastic noise
    head when ``cfg.noise_neurons > 0``.
    """
    if cfg.impose_bc:
        trunk_in = bc_embedding(trunk_x)
    else:
        trunk_in = trunk_x

    bout = _mlp_stack(cfg, params["branch"], branch_x)     # (B, K)
    tout = _mlp_stack(cfg, params["trunk"], trunk_in)      # (P, K) or (B, P, K)

    n = cfg.noise_neurons
    k_main = cfg.latent - n
    if trunk_x.ndim == 2:
        # Shared query grid: one big MXU matmul.
        y = bout[:, :k_main] @ tout[:, :k_main].T + params["b"]
        if n:
            noise = bout[:, k_main:] @ tout[:, k_main:].T
            return y, noise
        return y
    # Per-example query points: batched contraction.
    y = jnp.einsum("bk,bpk->bp", bout[:, :k_main], tout[..., :k_main]) + params["b"]
    if n:
        noise = jnp.einsum("bk,bpk->bp", bout[:, k_main:], tout[..., k_main:])
        return y, noise
    return y
