from vihmc_tpu.models.mlp import MLPConfig, init_mlp, mlp_apply, get_activation
from vihmc_tpu.models.deeponet import (
    DeepONetConfig,
    init_deeponet,
    deeponet_apply,
    deeponet_features,
    bc_embedding,
)
from vihmc_tpu.models.bayesian import (
    VariationalParams,
    init_variational,
    sample_params,
    mean_params,
    kl_gaussian,
    kl_divergence,
    bayesian_mlp_apply,
    bayesian_deeponet_apply,
    bbb_linear_apply,
    lrt_linear_apply,
    bbb_conv2d_apply,
    lrt_conv2d_apply,
)
from vihmc_tpu.models.symmetry import (
    canonicalize_mlp,
    canonicalize_deeponet,
)

__all__ = [
    "MLPConfig",
    "init_mlp",
    "mlp_apply",
    "get_activation",
    "DeepONetConfig",
    "init_deeponet",
    "deeponet_apply",
    "deeponet_features",
    "bc_embedding",
    "VariationalParams",
    "init_variational",
    "sample_params",
    "mean_params",
    "kl_gaussian",
    "kl_divergence",
    "bayesian_mlp_apply",
    "bayesian_deeponet_apply",
    "bbb_linear_apply",
    "lrt_linear_apply",
    "bbb_conv2d_apply",
    "lrt_conv2d_apply",
    "canonicalize_mlp",
    "canonicalize_deeponet",
]
