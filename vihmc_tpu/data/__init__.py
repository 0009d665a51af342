from vihmc_tpu.data.synthetic import regression_data, load_reference_regression_data
from vihmc_tpu.data.burgers import (
    generate_burgers_dataset,
    load_burgers_mat,
    get_burgers,
    subsample_trunk,
    split_shards,
)

__all__ = [
    "regression_data",
    "load_reference_regression_data",
    "generate_burgers_dataset",
    "load_burgers_mat",
    "get_burgers",
    "subsample_trunk",
    "split_shards",
]
