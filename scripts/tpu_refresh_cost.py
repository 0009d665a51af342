"""On-chip cost of the frozen-coordinate refresh: threefry vs rbg PRNG,
and the full sampler with refresh vs mean policy."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt*1e3:9.1f} ms", flush=True)
    return dt


D, C, S = 172401, 16, 120
mu = jnp.zeros(D)
sigma = 0.02 * jnp.ones(D)


def refresh_scan(key):
    def step(carry, k):
        frozen = mu + sigma * jax.random.normal(k, (D,))
        return carry + frozen[0], None

    keys = jax.random.split(key, S)
    out, _ = jax.lax.scan(step, 0.0, keys)
    return out


for impl in ("threefry2x32", "rbg"):
    key = jax.random.key(0, impl=impl)
    keys = jax.random.split(key, C)
    f = jax.jit(jax.vmap(refresh_scan))
    timed(f"refresh x{S} draws x{C} chains ({impl})", f, keys)
