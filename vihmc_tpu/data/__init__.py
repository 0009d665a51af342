from vihmc_tpu.data.synthetic import regression_data, load_reference_regression_data
from vihmc_tpu.data.burgers import (
    generate_burgers_dataset,
    load_burgers_mat,
    get_burgers,
    subsample_trunk,
    split_shards,
)
from vihmc_tpu.data.cone import (
    CONE_STATS,
    ConeStats,
    cone_to_operator_splits,
    generate_cone_dataset,
    get_cone,
    load_cone,
    normalize_cone,
    normalize_cone_inputs,
)

__all__ = [
    "regression_data",
    "load_reference_regression_data",
    "generate_burgers_dataset",
    "load_burgers_mat",
    "get_burgers",
    "subsample_trunk",
    "split_shards",
    "CONE_STATS",
    "ConeStats",
    "cone_to_operator_splits",
    "generate_cone_dataset",
    "get_cone",
    "load_cone",
    "normalize_cone",
    "normalize_cone_inputs",
]
