from vihmc_tpu.io.artifacts import RunStore, make_uid
from vihmc_tpu.io.checkpoint import save_checkpoint, load_checkpoint, latest_step

__all__ = ["RunStore", "make_uid", "save_checkpoint", "load_checkpoint", "latest_step"]
