from vihmc_tpu.vi.elbo import (
    ELBOConfig,
    elbo_loss,
    get_beta,
    accuracy,
)
from vihmc_tpu.vi.train import (
    VIConfig,
    VITrainState,
    init_train_state,
    make_train_step,
    make_eval_fn,
    train,
    predictive_samples,
)

__all__ = [
    "ELBOConfig",
    "elbo_loss",
    "get_beta",
    "accuracy",
    "VIConfig",
    "VITrainState",
    "init_train_state",
    "make_train_step",
    "make_eval_fn",
    "train",
    "predictive_samples",
]
