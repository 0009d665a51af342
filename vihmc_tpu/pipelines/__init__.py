"""The reference's 8 entry points as thin library pipelines.

Reference entry points (SURVEY.md section 1, L4):
  Neural_network/HMC/main_regression_hmc.py      -> pipelines.hmc_full
  Neural_network/VI/main_regression_VI.py        -> pipelines.vi_train (nn)
  Neural_network/VI/sensitivity.py               -> pipelines.sensitivity (nn)
  Neural_network/VI_HMC/main_VI_HMC.py           -> pipelines.vi_hmc (nn)
  Operator_network/VI/main_VI_deeponet.py        -> pipelines.vi_train (operator)
  Operator_network/VI/sensitivity.py             -> pipelines.sensitivity (operator)
  Operator_network/HMC/NUTS_DeepOnets.py         -> pipelines.hmc_nuts
  Operator_network/HMC/main_HMC_splitting.py     -> pipelines.hmc_split
  Operator_network/VI_HMC/main_VI_HMC_burgers.py -> pipelines.vi_hmc (operator)
  Operator_network/VI_HMC/post_process_burgers.py-> pipelines.postprocess
"""

from vihmc_tpu.pipelines import configs
from vihmc_tpu.pipelines.common import (
    make_flat_mlp,
    make_flat_deeponet,
    make_log_posterior,
    mlp_vi_apply,
    deeponet_vi_apply,
)
from vihmc_tpu.pipelines.predict import posterior_predictive, predictive_metrics

__all__ = [
    "configs",
    "make_flat_mlp",
    "make_flat_deeponet",
    "make_log_posterior",
    "mlp_vi_apply",
    "deeponet_vi_apply",
    "posterior_predictive",
    "predictive_metrics",
]
