"""TPU repro: vmap over the fused Pallas merge+NLL kernel (debug aid)."""

import traceback

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
