from vihmc_tpu.core.ravel import (
    ravel_pytree,
    segment_sizes,
    segment_slices,
    per_segment_vector,
    scatter_subspace,
    gather_subspace,
)
from vihmc_tpu.core.prng import split_like, fold_in_str
from vihmc_tpu.core.precision import matmul_precision
from vihmc_tpu.core.calculus import (
    LogProbError,
    has_nan_or_inf,
    gradient,
    jacobian,
    hessian,
)

__all__ = [
    "ravel_pytree",
    "segment_sizes",
    "segment_slices",
    "per_segment_vector",
    "scatter_subspace",
    "gather_subspace",
    "split_like",
    "fold_in_str",
    "matmul_precision",
    "LogProbError",
    "has_nan_or_inf",
    "gradient",
    "jacobian",
    "hessian",
]
