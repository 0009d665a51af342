from vihmc_tpu.ops.deeponet_merge import fused_merge_nll, merge_nll_reference
from vihmc_tpu.ops.gram_merge import (grid_stride_subset, infer_grid_shape,
                                      make_gram_grad_full,
                                      merge_nll_gram_cotangents)
from vihmc_tpu.ops.leapfrog import fused_leapfrog_update, leapfrog_update_reference

__all__ = [
    "fused_merge_nll",
    "merge_nll_reference",
    "grid_stride_subset",
    "infer_grid_shape",
    "make_gram_grad_full",
    "merge_nll_gram_cotangents",
    "fused_leapfrog_update",
    "leapfrog_update_reference",
]
