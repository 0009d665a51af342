from vihmc_tpu.hmc.kernel import (
    clipped_grad_fn,
    gaussian_field_grad,
    HMCConfig,
    HMCState,
    SampleResult,
    sample,
    init_state,
    make_kernel,
)
from vihmc_tpu.hmc.adaptation import DualAveragingState, da_init, da_update, find_reasonable_step_size
from vihmc_tpu.hmc.integrators import leapfrog, leapfrog_grad_only, split_leapfrog
from vihmc_tpu.hmc.subspace import (FrozenPolicy, make_subspace_grad,
                                    make_subspace_log_prob, SubspaceSpec)
from vihmc_tpu.hmc.nuts import NUTSConfig, nuts_sample
from vihmc_tpu.hmc.chees import ChEESConfig, chees_sample
from vihmc_tpu.hmc.metric import (EigenMetric, LowRankMetric,
                                  eigen_metric_from_eigs,
                                  estimate_lowrank_metric, lanczos_eigs,
                                  lowrank_from_eigs, make_lowrank_metric)


def sample_model(*args, **kwargs):
    """hamiltorch-style convenience wrapper (lazy import to avoid cycles)."""
    from vihmc_tpu.hmc.api import sample_model as _sm

    return _sm(*args, **kwargs)


def predict_model(*args, **kwargs):
    """hamiltorch-style convenience wrapper (lazy import to avoid cycles)."""
    from vihmc_tpu.hmc.api import predict_model as _pm

    return _pm(*args, **kwargs)

__all__ = [
    "clipped_grad_fn",
    "gaussian_field_grad",
    "HMCConfig",
    "HMCState",
    "SampleResult",
    "sample",
    "init_state",
    "make_kernel",
    "DualAveragingState",
    "da_init",
    "da_update",
    "find_reasonable_step_size",
    "leapfrog",
    "leapfrog_grad_only",
    "split_leapfrog",
    "FrozenPolicy",
    "make_subspace_log_prob",
    "make_subspace_grad",
    "SubspaceSpec",
    "sample_model",
    "predict_model",
    "NUTSConfig",
    "nuts_sample",
    "ChEESConfig",
    "chees_sample",
    "LowRankMetric",
    "EigenMetric",
    "eigen_metric_from_eigs",
    "estimate_lowrank_metric",
    "lanczos_eigs",
    "lowrank_from_eigs",
    "make_lowrank_metric",
]
