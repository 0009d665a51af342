from vihmc_tpu.dists.priors import (
    normal_logpdf,
    diag_normal_logpdf_sum,
    IsotropicGaussianPrior,
    DiagonalGaussianPrior,
    PerSegmentGaussianPrior,
)
from vihmc_tpu.dists.likelihoods import get_likelihood, gaussian_nll, LIKELIHOODS

__all__ = [
    "normal_logpdf",
    "diag_normal_logpdf_sum",
    "IsotropicGaussianPrior",
    "DiagonalGaussianPrior",
    "PerSegmentGaussianPrior",
    "get_likelihood",
    "gaussian_nll",
    "LIKELIHOODS",
]
