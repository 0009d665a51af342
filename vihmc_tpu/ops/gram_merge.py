"""Gram-trick gradients for the DeepONet merge + Gaussian NLL.

The hot object in every operator-network sampler is

    pred = bout @ tout.T + b          # (B, P): 1000 x 10201 at reference scale
    ll   = -0.5 * sum(log var + (pred - y)^2 / var)

whose parameter gradient is conventionally computed by materializing ``pred``
(40 MB fp32/chain) plus its cotangent in the backward pass. Both are
algebraically unnecessary: with residual cotangent r = (y - pred)/var,

    d ll / d bout = r @ tout  = (y @ tout  - bout @ (tout.T tout) - b * sum_j tout_j) / var
    d ll / d tout = r.T @ bout = (y.T @ bout - tout @ (bout.T bout) - b * sum_i bout_i) / var
    d ll / d b    = sum(r)     = (sum(y) - (sum_i bout_i) . (sum_j tout_j) - B*P*b) / var

— only K x K Gram matrices (K = latent width, 100) and two thin contractions
against the constant data ``y`` ever exist. No (B, P) array is formed in the
entire gradient evaluation, cutting both FLOPs and (especially) HBM traffic
in the leapfrog hot loop.

**Numerics caveat**: the subtraction ``y @ tout - bout @ Gt`` cancels to the
residual scale, so the gradient carries a relative fp32 error of roughly
(signal/residual) * 1e-7. That is harmless for HMC: the leapfrog integrator
remains reversible and volume-preserving for ANY deterministic gradient field
(the momentum update depends only on position), so Metropolis-Hastings with
the EXACTLY-computed log-density stays unbiased — only the acceptance rate
would degrade if gradients were badly wrong. The same expansion is NOT safe
for the log-density itself (sum(m^2) = tr(Gb Gt) cancels catastrophically in
the MH energy difference), so samplers must pair this gradient with the
materialized/fused exact value at trajectory endpoints — the HMC kernel's
``grad_fn`` path does exactly that.

The reference computes this gradient by torch autograd through the
materialized prediction (/root/reference/Operator_network/VI_HMC/
main_VI_HMC_burgers.py:27-180 via hamiltorch's leapfrog); the Gram form is a
TPU-side optimization with identical math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vihmc_tpu.core.ravel import ravel_pytree

_GNLL_EPS = 1e-6  # torch.nn.functional.gaussian_nll_loss variance clamp


def merge_nll_gram_cotangents(bout, tout, bias, y, tau):
    """(d ll/d bout, d ll/d tout, d ll/d bias) without forming (B, P).

    ``ll = -sum gaussian_nll_loss(bout @ tout.T + bias, y, var=tau)`` with the
    torch variance clamp. ``y`` is (B, P); ``bout`` (B, K); ``tout`` (P, K).
    """
    var = max(float(tau), _GNLL_EPS)
    f32 = jnp.float32
    sum_t = jnp.sum(tout, axis=0, dtype=f32)            # (K,)
    sum_b = jnp.sum(bout, axis=0, dtype=f32)            # (K,)
    gram_t = jnp.dot(tout.T, tout, preferred_element_type=f32)   # (K, K)
    gram_b = jnp.dot(bout.T, bout, preferred_element_type=f32)   # (K, K)
    yt = jnp.dot(y, tout, preferred_element_type=f32)            # (B, K)
    yb = jnp.dot(y.T, bout, preferred_element_type=f32)          # (P, K)
    ct_bout = (yt - jnp.dot(bout, gram_t, preferred_element_type=f32)
               - bias * sum_t) / var
    ct_tout = (yb - jnp.dot(tout, gram_b, preferred_element_type=f32)
               - bias * sum_b) / var
    n = y.shape[0] * y.shape[1]
    ct_bias = (jnp.sum(y, dtype=f32) - jnp.dot(sum_b, sum_t)
               - n * jnp.asarray(bias, f32)) / var
    return ct_bout, ct_tout, ct_bias


def make_gram_grad_full(cfg, branch_x, trunk_x, y, tau_var, prior=None,
                        key=None, query_subset=None, fn_subset=None,
                        compute_dtype=None):
    """d log-posterior / d flat for the shared-grid homoscedastic-NLL DeepONet.

    Returns ``(grad_full, flat0, unravel)`` where ``grad_full(flat) -> (D,)``
    equals ``jax.grad`` of the composed log-posterior (likelihood 'NLL' with
    variance ``tau_var`` + optional ``prior``) up to the Gram-form fp32
    rounding discussed in the module docstring. Pair with the exact
    log-density as the HMC kernel's ``grad_fn``.

    ``query_subset`` (optional int array of indices into the P query points)
    makes this a **coarse-grid surrogate gradient**: the likelihood term is
    evaluated on only those query points and rescaled by ``P / len(subset)``.
    Every cost component of the gradient — trunk forward, the two
    ``y``-contractions, and the feature VJP — scales linearly in the number
    of query points, so a stride-2 subset of a regular grid costs ~4x less
    per leapfrog step. The subset is FIXED, so the field stays deterministic
    and MH with the exact full-grid density at trajectory endpoints remains
    unbiased (same argument as the fp32-rounding caveat above); only
    acceptance degrades if the surrogate tracks the full gradient poorly.
    For regular space-time grids pick a stride subset (see
    :func:`grid_stride_subset`) rather than a random one — it preserves
    coverage of the domain.

    ``fn_subset`` (optional int array of indices into the B training
    functions) is the same surrogate along the OTHER likelihood axis: the
    gradient sums the likelihood over only those functions, rescaled by
    ``B / len(subset)``. The branch forward/VJP and the ``y``-contractions
    scale with the function count (the trunk does not), so this attacks
    exactly the cost floor the query stride leaves behind. Both subsets
    compose; exactness is unchanged (fixed subsets -> deterministic field,
    MH on the exact full density at endpoints).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) runs the feature stacks, the
    data contractions, and the feature VJP in that dtype, returning an f32
    gradient. At f32 the chain-vmapped gradient is HBM-bound: the trunk
    stack's forward residuals alone are (chains, P, width) x depth arrays
    written in the forward and re-read in the VJP, roughly
    ``2 x chains x P x width x depth x 4`` bytes of traffic per evaluation —
    more wall than the matmul FLOPs at reference scale. bf16 halves that
    traffic (matmul accumulation stays f32 via ``preferred_element_type``
    inside XLA). This is a TRAJECTORY-FIELD precision choice only — the same
    argument as the fp32-rounding caveat above: leapfrog stays reversible
    and volume-preserving for any deterministic field, MH on the exact f32
    density stays unbiased, and only acceptance degrades if the bf16 field
    tracks the true gradient poorly (measured on-chip before adoption —
    docs/performance.md round 4).
    """
    from vihmc_tpu.models.deeponet import deeponet_features, init_deeponet

    if cfg.noise_neurons:
        raise ValueError("Gram-form gradient covers the homoscedastic merge "
                         "only (noise_neurons=0)")
    if jnp.ndim(trunk_x) != 2:
        raise ValueError("Gram-form gradient requires a shared query grid "
                         "(trunk_x of shape (P, coords))")
    key = jax.random.key(0) if key is None else key
    flat0, unravel = ravel_pytree(init_deeponet(key, cfg))

    ll_scale = 1.0
    if query_subset is not None:
        sel = jnp.asarray(query_subset)
        ll_scale = trunk_x.shape[0] / sel.shape[0]
        trunk_x = trunk_x[sel]
        y = y[:, sel]
    if fn_subset is not None:
        fsel = jnp.asarray(fn_subset)
        ll_scale = ll_scale * (branch_x.shape[0] / fsel.shape[0])
        branch_x = branch_x[fsel]
        y = y[fsel]

    if compute_dtype is not None:
        branch_x = branch_x.astype(compute_dtype)
        trunk_x = trunk_x.astype(compute_dtype)
        y = y.astype(compute_dtype)

    def feats_flat(flat):
        params = unravel(flat)
        if compute_dtype is not None:
            params = jax.tree.map(lambda p: p.astype(compute_dtype), params)
        bout, tout = deeponet_features(cfg, params, branch_x, trunk_x)
        return bout, tout, params["b"]

    def grad_full(flat):
        (bout, tout, bias), vjp = jax.vjp(feats_flat, flat)
        cts = merge_nll_gram_cotangents(bout, tout, bias, y, tau_var)
        if ll_scale != 1.0:
            cts = tuple(ll_scale * c for c in cts)
        if compute_dtype is not None:
            # cotangents re-enter the bf16 VJP; the cast chain inside
            # feats_flat casts the final parameter cotangent back to f32
            cts = tuple(c.astype(compute_dtype) for c in cts)
        (gflat,) = vjp(cts)
        if prior is not None:
            gflat = gflat + jax.grad(prior.log_prob)(flat)
        return gflat

    return grad_full, flat0, unravel


def infer_grid_shape(trunk_x):
    """(nt, nx) of a t-major raveled regular grid ``trunk_x`` of shape
    (nt*nx, 2) with columns (t, x) — each t value appears exactly nx times
    in a contiguous block (the layout of data.burgers.generate and the
    reference .mat grid). Raises ValueError if the layout doesn't hold."""
    import numpy as np

    t = np.asarray(trunk_x[:, 0])
    nx = int(np.sum(t == t[0]))
    p = t.shape[0]
    if nx == 0 or p % nx:
        raise ValueError(f"not a regular t-major grid: P={p}, nx={nx}")
    nt = p // nx
    rows = t.reshape(nt, nx)
    if not (rows == rows[:, :1]).all():
        raise ValueError("not a regular t-major grid: t varies within rows")
    return nt, nx


def grid_stride_subset(nt: int, nx: int, stride: int):
    """Indices of every ``stride``-th point of a t-major (nt, nx) raveled
    grid, in both dimensions — the coarse grid for the surrogate trajectory
    gradient. Includes the first point of each dimension; endpoint coverage
    follows from stride | (n-1) when applicable."""
    import numpy as np

    ti = np.arange(0, nt, stride)
    xi = np.arange(0, nx, stride)
    return (ti[:, None] * nx + xi[None, :]).ravel()
