"""Kinetic-energy metrics: diagonal and low-rank-plus-diagonal mass matrices.

The reference's sampler (external hamiltorch; call sites SURVEY.md section
2.4) only ever uses the identity mass matrix, and this framework's diagonal
extensions (VI-variance / conditional-Laplace preconditioners, Welford
adaptation — :mod:`vihmc_tpu.hmc.kernel`) cover posteriors whose curvature is
axis-aligned. The round-3 forensics (docs/performance.md, "Why
fixed-conditional sampling stalls") measured the 90%-captured-variance
VI-HMC conditional — the configuration the reference actually samples,
/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:283 +
/root/reference/Operator_network/VI/config_sens.py:33 — to be *off-diagonally*
stiff: curvature along a few correlated directions ~1e4x the diagonal Fisher.
No diagonal metric can precondition that; this module supplies the fix.

``LowRankMetric`` represents the mass matrix

    M = D + U U^T            (D diagonal (D,), U (D, k), k << D)

i.e. an estimated posterior *precision* whose diagonal comes from a cheap
per-coordinate estimate (VI sigma^-2, conditional Laplace) and whose low-rank
part carries the k stiffest curvature directions (from Lanczos on Hessian-
vector products — :func:`lanczos_eigs`). Everything the HMC kernel needs is
exact and O(Dk) per operation:

* momentum draw  ``p = sqrt(D) z1 + U z2`` with ``z1 ~ N(0, I_D)``,
  ``z2 ~ N(0, I_k)`` — ``Cov(p) = D + U U^T = M`` exactly;
* velocity ``M^{-1} p`` by the Woodbury identity
  ``M^{-1} = D^{-1} - D^{-1} U (I_k + U^T D^{-1} U)^{-1} U^T D^{-1}``,
  with the k x k capacitance Cholesky factored ONCE at construction;
* kinetic energy ``0.5 p^T M^{-1} p = 0.5 p . velocity(p)``.

A mass matrix changes proposal geometry only, never the stationary law: the
leapfrog drift ``q += eps * M^{-1} p`` with any symmetric positive-definite M
is reversible and volume-preserving in (q, p), and the MH test uses the exact
kinetic energy above.

The dispatch helpers (:func:`mass_velocity`, :func:`mass_kinetic_energy`,
:func:`mass_sample_momentum`) accept either a ``LowRankMetric`` or the
scalar/diagonal ``inv_mass`` arrays the rest of the package already uses, so
kernels are metric-agnostic. NOTE the convention difference: diagonal metrics
are passed around as the INVERSE mass (posterior variance estimate), while
``LowRankMetric`` stores the mass itself (posterior precision estimate) —
:func:`lowrank_from_eigs` converts from the diagonal-inverse-mass convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import cho_solve


@struct.dataclass
class LowRankMetric:
    """Mass matrix M = diag(diag_mass) + u @ u.T with precomputed capacitance.

    Build via :func:`make_lowrank_metric` / :func:`lowrank_from_eigs` (they
    compute ``chol_cap``); treat instances as immutable. A pytree — safe to
    pass through jit/vmap (broadcast with ``in_axes=None`` across chains).
    """

    diag_mass: jnp.ndarray  # (D,) diagonal part of the MASS matrix
    u: jnp.ndarray          # (D, k) low-rank factor
    chol_cap: jnp.ndarray   # (k, k) lower Cholesky of I_k + u^T D^-1 u

    @property
    def rank(self):
        return self.u.shape[-1]

    def dense(self):
        """Dense M — for tests/small problems only (O(D^2) memory)."""
        return jnp.diag(self.diag_mass) + self.u @ self.u.T


@struct.dataclass
class EigenMetric:
    """Two-sided eigenvalue-corrected metric (round 4).

    Mass matrix  ``M = S^-1 (I + V (Lam - I) V^T) S^-1``  with
    ``S = diag(sqrt(diag_inv_mass))`` and ORTHONORMAL ``V`` (D, k) — the
    base diagonal metric with k preconditioned curvature directions
    corrected to their measured eigenvalues ``Lam``, on BOTH sides:
    lambda > 1 stiffens (what :class:`LowRankMetric` does), lambda < 1
    SOFTENS — crucial when the surrogate diagonal overestimates curvature
    and the wide directions become the mixing bottleneck (measured round 4:
    the sensitivity-Laplace diagonal's preconditioned spectrum spans
    [~0.01, 345] on the prod-asset conditional; the lambda<1 tail made the
    median dimension decorrelate ~20x slower than a matched metric would).

    Because V is orthonormal, every operation is exact O(Dk) WITHOUT a
    Woodbury solve: with ``W(a) x = x + V diag(a - 1) V^T x``,

    * mass apply      M   = S^-1 W(Lam)      S^-1
    * momentum draw   p   = S^-1 W(sqrt Lam) z,   z ~ N(0, I)
      (Cov p = S^-1 W(sqrt Lam) W(sqrt Lam) S^-1 = M exactly)
    * velocity        M^-1 p = S W(1/Lam) S p
    * kinetic energy  0.5 p^T M^-1 p.

    Ritz pairs from :func:`lanczos_eigs` (``which='both'``) are orthonormal
    by construction. Floor the bottom eigenvalues (default 0.01 in
    :func:`eigen_metric_from_eigs`) — underconverged soft Ritz values
    overstate the widening and destabilize the integrator.
    """

    diag_inv_mass: jnp.ndarray  # (D,) base diagonal INVERSE mass
    v: jnp.ndarray              # (D, k) orthonormal preconditioned directions
    eigvals: jnp.ndarray        # (k,) corrected preconditioned curvatures

    @property
    def rank(self):
        return self.v.shape[-1]

    def _w_apply(self, a, x):
        return x + self.v @ ((a - 1.0) * (self.v.T @ x))

    def dense(self):
        s_inv = 1.0 / jnp.sqrt(self.diag_inv_mass)
        inner = (jnp.eye(self.v.shape[0], dtype=self.v.dtype)
                 + self.v @ ((self.eigvals - 1.0)[:, None] * self.v.T))
        return (s_inv[:, None] * inner) * s_inv[None, :]


def eigen_metric_from_eigs(diag_inv_mass, eigvals, eigvecs,
                           min_eig: float = 0.01,
                           max_eig: float = jnp.inf) -> EigenMetric:
    """Build an :class:`EigenMetric` from preconditioned Ritz pairs,
    flooring/capping the eigenvalues (see class docstring)."""
    diag_inv_mass = jnp.asarray(diag_inv_mass, jnp.float32)
    lam = jnp.clip(jnp.asarray(eigvals, jnp.float32), min_eig, max_eig)
    return EigenMetric(diag_inv_mass=diag_inv_mass,
                       v=jnp.asarray(eigvecs, jnp.float32), eigvals=lam)


def make_lowrank_metric(diag_mass, u) -> LowRankMetric:
    """Construct the metric from mass diagonal + low-rank factor.

    Factors the k x k capacitance ``I + u^T D^-1 u`` once; every later
    velocity solve is two triangular k x k solves plus O(Dk) matvecs.
    """
    diag_mass = jnp.asarray(diag_mass, jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    cap = jnp.eye(u.shape[-1], dtype=u.dtype) + (u.T / diag_mass[None, :]) @ u
    chol = jnp.linalg.cholesky(cap)
    return LowRankMetric(diag_mass=diag_mass, u=u, chol_cap=chol)


def lowrank_from_eigs(diag_inv_mass, eigvals, eigvecs) -> LowRankMetric:
    """Metric from leading eigenpairs of the PRECONDITIONED curvature.

    Parameters
    ----------
    diag_inv_mass : (D,) the diagonal inverse mass already in use (posterior
        marginal-variance estimate — VI sigma^2 or the conditional-Laplace
        variances of ``pipelines.vi_hmc``'s ``laplace_mass``).
    eigvals, eigvecs : (k,), (D, k) leading eigenpairs of the preconditioned
        negative Hessian ``A = S H S`` with ``S = diag(sqrt(diag_inv_mass))``
        and ``H = -hessian(log_prob)`` — e.g. from :func:`lanczos_eigs` on
        :func:`preconditioned_hvp`. Eigenvalues are the squared condition
        scales the DIAGONAL metric failed to remove: lambda ~ 1 means the
        diagonal already preconditions that direction; lambda >> 1 is
        off-diagonal stiffness.

    The returned mass is

        M = S^-2 + sum_i max(lambda_i - 1, 0) (S^-1 v_i)(S^-1 v_i)^T

    which equals ``S^-1 (I + sum (lambda_i - 1) v_i v_i^T) S^-1`` — the
    diagonal metric with its k stiffest preconditioned directions corrected
    to their measured curvature. Directions with lambda <= 1 are dropped
    (the diagonal is already right or conservative there).
    """
    diag_inv_mass = jnp.asarray(diag_inv_mass, jnp.float32)
    eigvals = jnp.asarray(eigvals, jnp.float32)
    eigvecs = jnp.asarray(eigvecs, jnp.float32)
    scale = jnp.sqrt(jnp.maximum(eigvals - 1.0, 0.0))
    u = (eigvecs / jnp.sqrt(diag_inv_mass)[:, None]) * scale[None, :]
    return make_lowrank_metric(1.0 / diag_inv_mass, u)


def mass_velocity(inv_mass, p):
    """``M^{-1} p`` — the leapfrog drift velocity.

    ``inv_mass`` is either the scalar/diagonal INVERSE mass (multiply) or a
    :class:`LowRankMetric` (Woodbury solve).
    """
    if isinstance(inv_mass, LowRankMetric):
        d_inv = 1.0 / inv_mass.diag_mass
        w = d_inv * p
        z = cho_solve((inv_mass.chol_cap, True), inv_mass.u.T @ w)
        return w - d_inv * (inv_mass.u @ z)
    if isinstance(inv_mass, EigenMetric):
        s = jnp.sqrt(inv_mass.diag_inv_mass)
        return s * inv_mass._w_apply(1.0 / inv_mass.eigvals, s * p)
    return inv_mass * p


def mass_kinetic_energy(inv_mass, p, velocity=None):
    """``0.5 p^T M^{-1} p``; pass ``velocity`` if already computed."""
    if velocity is None:
        velocity = mass_velocity(inv_mass, p)
    return 0.5 * jnp.sum(p * velocity)


def mass_sample_momentum(inv_mass, key, template):
    """Draw ``p ~ N(0, M)`` shaped like ``template``."""
    if isinstance(inv_mass, LowRankMetric):
        k1, k2 = jax.random.split(key)
        z1 = jax.random.normal(k1, template.shape, template.dtype)
        z2 = jax.random.normal(k2, (inv_mass.rank,), template.dtype)
        return jnp.sqrt(inv_mass.diag_mass) * z1 + inv_mass.u @ z2
    if isinstance(inv_mass, EigenMetric):
        z = jax.random.normal(key, template.shape, template.dtype)
        return inv_mass._w_apply(jnp.sqrt(inv_mass.eigvals), z) \
            / jnp.sqrt(inv_mass.diag_inv_mass)
    p = jax.random.normal(key, template.shape, template.dtype)
    return p / jnp.sqrt(inv_mass)


def mass_diag_inv(inv_mass, template=None):
    """A (D,) diagonal-inverse-mass view for preconditioned norms/clipping.

    For a :class:`LowRankMetric` this is ``1/diag_mass`` — an upper bound on
    the true ``diag(M^{-1})`` marginals, which is the conservative choice for
    gradient-norm clipping scales.
    """
    if isinstance(inv_mass, LowRankMetric):
        return 1.0 / inv_mass.diag_mass
    if isinstance(inv_mass, EigenMetric):
        return inv_mass.diag_inv_mass
    if template is not None:
        return inv_mass * jnp.ones_like(template)
    return inv_mass


def as_inv_mass(inv_mass):
    """Canonicalize a user-supplied metric argument: structured metrics pass
    through; scalars/arrays coerce to f32 (the chain-level entry points'
    historical behavior)."""
    if isinstance(inv_mass, (LowRankMetric, EigenMetric)):
        return inv_mass
    return jnp.asarray(inv_mass, jnp.float32)


# ---------------------------------------------------------------------------
# Lanczos eigenpair estimation from Hessian-vector products
# ---------------------------------------------------------------------------


def hvp_fn(log_prob, q0, aux=None):
    """Hessian-vector product oracle ``v -> -H(log_prob)(q0) v``.

    Forward-over-reverse: one jvp through the gradient, ~2x the cost of a
    gradient evaluation, no dense Hessian materialized — the only way to
    touch curvature at reference scale (37k-dim conditional over a
    10M-element likelihood). Sign: returns NEGATIVE-Hessian products, so the
    operator is PSD at a mode and its large eigenvalues are the stiff
    curvature directions.
    """
    if aux is not None:
        grad = jax.grad(lambda q: log_prob(q, aux))
    else:
        grad = jax.grad(log_prob)

    def hvp(v):
        return -jax.jvp(grad, (q0,), (v,))[1]

    return hvp


def preconditioned_hvp(log_prob, q0, diag_inv_mass, aux=None):
    """HVP of the PRECONDITIONED curvature ``A = S (-H) S``, S = diag(sqrt(m)).

    Eigenvalues of A are curvatures in units of the diagonal metric's own
    scale: lambda = 1 means the diagonal inverse mass already matches that
    direction, lambda >> 1 is residual (off-diagonal) stiffness — exactly
    the quantity :func:`lowrank_from_eigs` consumes.
    """
    s = jnp.sqrt(jnp.asarray(diag_inv_mass, jnp.float32))
    base = hvp_fn(log_prob, q0, aux=aux)

    def hvp(v):
        return s * base(s * v)

    return hvp


def hutchinson_diag(matvec, dim, n_probes, key, dtype=jnp.float32):
    """Hutchinson estimate of ``diag(A)`` from matrix-vector products.

    ``E[v * (A v)] = diag(A)`` for Rademacher ``v``. With ``n_probes``
    samples the per-entry relative error is ~sqrt(sum_j A_ij^2 / A_ii^2 /
    n) — tens of probes suffice for a kinetic-metric diagonal. One scan,
    jit-safe.

    Purpose (round 4): a surrogate diagonal (VI sigma^-2, sensitivity-
    Laplace) can MISestimate the conditional curvature in both directions —
    overestimates leave soft dimensions under-explored (measured: the
    Laplace-preconditioned spectrum dips to 0.16 by rank 256 on the prod
    asset, i.e. many conditional scales are >2.5x wider than the metric
    assumed), underestimates cap the step. The measured Hessian diagonal,
    floored at the prior precision, anchors the metric's diagonal; the
    low-rank term then carries the off-diagonal stiffness.
    """
    keys = jax.random.split(key, n_probes)

    def step(acc, k):
        v = jax.random.rademacher(k, (dim,), dtype)
        return acc + v * matvec(v), None

    acc, _ = jax.lax.scan(step, jnp.zeros((dim,), dtype), keys)
    return acc / n_probes


def lanczos_tridiag(matvec, dim, num_iters, key, dtype=jnp.float32):
    """Lanczos with full reorthogonalization. Returns ``(alphas, betas, V)``.

    ``V`` is ``(num_iters, dim)`` with orthonormal rows spanning the Krylov
    space; ``alphas`` (num_iters,) / ``betas`` (num_iters-1,) define the
    tridiagonal T. Full reorthogonalization (two classical Gram-Schmidt
    passes against the whole stored basis per iteration) keeps the basis
    orthogonal in f32 — plain Lanczos loses orthogonality long before the
    extreme eigenpairs converge. Memory: the (num_iters, dim) basis
    (~38 MB at 37k dims x 256 iters). The whole loop is one ``lax.scan`` —
    jit-safe, TPU-resident.
    """
    v0 = jax.random.normal(key, (dim,), dtype)
    v0 = v0 / jnp.linalg.norm(v0)
    basis0 = jnp.zeros((num_iters, dim), dtype).at[0].set(v0)

    def step(basis, i):
        v = basis[i]
        w = matvec(v)
        alpha = jnp.dot(w, v)
        # subtracting the full-basis projection removes alpha*v and
        # beta*v_prev (the classic three-term recurrence) AND reorthogonalizes
        # against every stored vector; rows > i are still zero so the full
        # buffer projection is exact. Two passes (CGS2) for f32 stability.
        for _ in range(2):
            w = w - basis.T @ (basis @ w)
        beta = jnp.linalg.norm(w)
        v_next = w / jnp.maximum(beta, 1e-30)
        write = i + 1 < num_iters
        basis = jax.lax.cond(
            write, lambda b: b.at[i + 1].set(v_next), lambda b: b, basis)
        return basis, (alpha, beta)

    basis, (alphas, betas) = jax.lax.scan(
        step, basis0, jnp.arange(num_iters))
    return alphas, betas[:-1], basis


def lanczos_eigs(matvec, dim, rank, num_iters=None, key=None,
                 dtype=jnp.float32, which: str = "top"):
    """Extreme eigenpairs of a symmetric operator via Lanczos + Ritz.

    ``which='top'``: the ``rank`` LARGEST eigenpairs, sorted descending.
    ``which='both'``: ``rank//2`` largest + ``rank - rank//2`` smallest —
    both spectrum extremes converge first in Lanczos, and a two-sided
    :class:`EigenMetric` needs both. ``num_iters`` defaults to
    ``min(dim, max(2*rank, rank+10))``. jit-compatible (static args).
    """
    if key is None:
        key = jax.random.key(0)
    if num_iters is None:
        num_iters = min(dim, max(2 * rank, rank + 10))
    if num_iters < rank:
        raise ValueError(f"num_iters={num_iters} < rank={rank}")
    alphas, betas, basis = lanczos_tridiag(matvec, dim, num_iters, key, dtype)
    t = (jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1))
    evals, evecs = jnp.linalg.eigh(t)          # ascending
    if which == "both":
        n_top = rank // 2
        n_bot = rank - n_top
        sel = jnp.concatenate([
            jnp.arange(num_iters - n_top, num_iters)[::-1],
            jnp.arange(n_bot)])
    else:
        sel = jnp.arange(num_iters - rank, num_iters)[::-1]
    ritz_vals = evals[sel]
    ritz_vecs = basis.T @ evecs[:, sel]         # (dim, rank)
    ritz_vecs = ritz_vecs / jnp.linalg.norm(ritz_vecs, axis=0, keepdims=True)
    return ritz_vals, ritz_vecs


def estimate_lowrank_metric(log_prob, q0, diag_inv_mass, rank,
                            num_iters=None, key=None, aux=None,
                            min_eig=1.0) -> LowRankMetric:
    """One-call pipeline: Lanczos on the preconditioned conditional curvature
    at ``q0`` -> :class:`LowRankMetric`.

    ``min_eig`` floors the Ritz values entering the metric (default 1.0:
    directions the diagonal already handles contribute nothing — see
    :func:`lowrank_from_eigs`). Negative-curvature directions (q0 not at a
    mode) are floored too, which is the conservative choice.

    The whole estimation (Lanczos scan + tridiagonal eigh + metric
    construction) compiles as ONE jit computation — essential on
    remote-compile TPU backends where eager op-by-op dispatch would compile
    hundreds of kernels.
    """
    if key is None:
        key = jax.random.key(0)

    @jax.jit
    def build(q0, diag_inv_mass, key):
        mv = preconditioned_hvp(log_prob, q0, diag_inv_mass, aux=aux)
        eigvals, eigvecs = lanczos_eigs(mv, q0.shape[0], rank,
                                        num_iters=num_iters, key=key)
        return lowrank_from_eigs(diag_inv_mass,
                                 jnp.maximum(eigvals, min_eig), eigvecs)

    return build(q0, diag_inv_mass, key)
