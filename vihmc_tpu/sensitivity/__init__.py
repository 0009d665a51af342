from vihmc_tpu.sensitivity.scores import (
    sensitivity_scores,
    mean_squared_jacobian,
    captured_variance_count,
    select_sensitive_indices,
    flatten_mean_std,
)

__all__ = [
    "sensitivity_scores",
    "mean_squared_jacobian",
    "captured_variance_count",
    "select_sensitive_indices",
    "flatten_mean_std",
]
