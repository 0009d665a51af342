"""Pure-function MLP matching the reference's regression network.

Reference: an ``nn.Sequential`` stack of Linear+activation with relu/tanh/sine
activations and a switchable last-layer bias
(/root/reference/Neural_network/HMC/main_regression_hmc.py:63-99,
/root/reference/Neural_network/VI_HMC/my_make_func.py:52-73). Default config is
the 1 -> 10 -> 10 -> 1 tanh net (251 params,
/root/reference/Neural_network/HMC/config.py:13-18).

TPU-first design: parameters are a plain pytree (list of {'w','b'} dicts), the
apply function is pure and jit/vmap/grad-compatible, and the whole forward
lowers to a chain of MXU matmuls fused with their activations by XLA.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp


def get_activation(name: str) -> Callable:
    if name == "relu":
        return jax.nn.relu
    if name == "tanh":
        return jnp.tanh
    if name == "sine":
        return jnp.sin
    raise ValueError("Activation should be relu, sine or tanh")


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    """Static architecture config (hashable: usable as a jit static arg)."""

    in_dim: int = 1
    widths: tuple = (10, 10)
    out_dim: int = 1
    activation: str = "tanh"
    last_bias: bool = True  # reference `bias` flag for the output layer

    @property
    def layer_dims(self) -> tuple:
        dims = (self.in_dim,) + tuple(self.widths) + (self.out_dim,)
        return tuple(zip(dims[:-1], dims[1:]))

    @property
    def num_params(self) -> int:
        n = 0
        for i, (d_in, d_out) in enumerate(self.layer_dims):
            has_bias = self.last_bias or i < len(self.layer_dims) - 1
            n += d_in * d_out + (d_out if has_bias else 0)
        return n


def _init_linear(key, d_in, d_out, bias: bool):
    # torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
    # weight and bias — matches the reference's HMC initial state distribution.
    bound = 1.0 / math.sqrt(d_in)
    kw, kb = jax.random.split(key)
    layer = {"w": jax.random.uniform(kw, (d_out, d_in), minval=-bound, maxval=bound)}
    if bias:
        layer["b"] = jax.random.uniform(kb, (d_out,), minval=-bound, maxval=bound)
    return layer


def init_mlp(key, cfg: MLPConfig):
    """Initialize MLP parameters as a list of {'w': (out,in), 'b': (out,)} dicts."""
    dims = cfg.layer_dims
    keys = jax.random.split(key, len(dims))
    params = []
    for i, (k, (d_in, d_out)) in enumerate(zip(keys, dims)):
        has_bias = cfg.last_bias or i < len(dims) - 1
        params.append(_init_linear(k, d_in, d_out, has_bias))
    return params


def linear_apply(layer, x):
    y = x @ layer["w"].T
    if "b" in layer:
        y = y + layer["b"]
    return y


def mlp_apply(cfg: MLPConfig, params, x):
    """Forward pass: activation after every layer except the last."""
    act = get_activation(cfg.activation)
    h = x
    for layer in params[:-1]:
        h = act(linear_apply(layer, h))
    return linear_apply(params[-1], h)
