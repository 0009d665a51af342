"""TPU repro: vmap over the fused Pallas merge+NLL kernel (debug aid)."""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.ops.deeponet_merge import fused_merge_nll

rng = np.random.default_rng(0)
b, p, k = 256, 256, 128
tout = jnp.asarray(rng.normal(size=(p, k)) * 0.1, jnp.float32)
y = jnp.asarray(rng.normal(size=(b, p)) * 0.1, jnp.float32)

# 1. unbatched compiled call
bout1 = jnp.asarray(rng.normal(size=(b, k)) * 0.1, jnp.float32)
try:
    v = jax.jit(lambda bo: fused_merge_nll(bo, tout, 0.1, y, 1.0))(bout1)
    print("unbatched ok:", float(v))
except Exception:
    print("UNBATCHED FAIL:")
    traceback.print_exc()

# 2. grad of unbatched
try:
    g = jax.jit(jax.grad(lambda bo: fused_merge_nll(bo, tout, 0.1, y, 1.0)))(bout1)
    print("grad ok:", np.asarray(g).sum())
except Exception:
    print("GRAD FAIL:")
    traceback.print_exc()

# 3. vmap value
bout3 = jnp.asarray(rng.normal(size=(3, b, k)) * 0.1, jnp.float32)
try:
    v = jax.jit(jax.vmap(lambda bo: fused_merge_nll(bo, tout, 0.1, y, 1.0)))(bout3)
    print("vmap ok:", np.asarray(v))
except Exception:
    print("VMAP FAIL:")
    traceback.print_exc()

# 4. vmap-of-grad (the sampler's pattern)
try:
    g = jax.jit(jax.vmap(jax.grad(lambda bo: fused_merge_nll(bo, tout, 0.1, y, 1.0))))(bout3)
    print("vmap-grad ok:", np.asarray(g).shape)
except Exception:
    print("VMAP-GRAD FAIL:")
    traceback.print_exc()

# 5. padded shapes (reference-scale pattern)
bout5 = jnp.asarray(rng.normal(size=(100, 100)) * 0.1, jnp.float32)
tout5 = jnp.asarray(rng.normal(size=(300, 100)) * 0.1, jnp.float32)
y5 = jnp.asarray(rng.normal(size=(100, 300)) * 0.1, jnp.float32)
try:
    v = jax.jit(lambda bo: fused_merge_nll(bo, tout5, 0.1, y5, 1.0))(bout5)
    print("padded ok:", float(v))
except Exception:
    print("PADDED FAIL:")
    traceback.print_exc()

# 6. fully batched (bout, tout, bias all per-chain — the sampler's real pattern)
tout6 = jnp.asarray(rng.normal(size=(3, p, k)) * 0.1, jnp.float32)
bias6 = jnp.asarray(rng.normal(size=(3,)) * 0.1, jnp.float32)
try:
    v = jax.jit(jax.vmap(lambda bo, to, bi: fused_merge_nll(bo, to, bi, y, 1.0)))(
        bout3, tout6, bias6)
    print("full-batched ok:", np.asarray(v))
except Exception:
    print("FULL-BATCHED FAIL:")
    traceback.print_exc()

# 7. full-batched grad (value_and_grad over all three)
try:
    f = lambda bo, to, bi: fused_merge_nll(bo, to, bi, y, 1.0)
    g = jax.jit(jax.vmap(jax.grad(f, argnums=(0, 1, 2))))(bout3, tout6, bias6)
    print("full-batched grad ok:", [np.asarray(x).shape for x in g])
except Exception:
    print("FULL-BATCHED-GRAD FAIL:")
    traceback.print_exc()

# 8. batched + padded (the reference-scale sampler pattern exactly)
bout8 = jnp.asarray(rng.normal(size=(3, 100, 100)) * 0.1, jnp.float32)
tout8 = jnp.asarray(rng.normal(size=(3, 300, 100)) * 0.1, jnp.float32)
y8 = jnp.asarray(rng.normal(size=(100, 300)) * 0.1, jnp.float32)
try:
    f = lambda bo, to, bi: fused_merge_nll(bo, to, bi, y8, 1.0)
    g = jax.jit(jax.vmap(jax.grad(f, argnums=(0, 1, 2))))(bout8, tout8, bias6)
    print("batched-padded grad ok:", [np.asarray(x).shape for x in g])
except Exception:
    print("BATCHED-PADDED FAIL:")
    traceback.print_exc()
