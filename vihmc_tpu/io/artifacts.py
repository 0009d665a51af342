"""Run-uid artifact store: the filesystem contract between pipeline stages.

The reference's stages communicate through files keyed by a timestamp uid
(+ SLURM job id when present): VI writes ``max_model_<uid>.pt`` checkpoints,
sensitivity writes ``means_flattened_<uid>`` / ``stds_flattened_<uid>`` /
``gradient_indices_<uid>.npy`` / ``sensitivity_scores_<uid>.npy``, VI-HMC
reads those and writes ``hmc_params_<uid>.npy`` + ``sample_mse_<uid>.npy``,
and every run snapshots its config next to the artifacts
(SURVEY.md section 1 "Data flows"; uid construction at
/root/reference/Operator_network/VI_HMC/main_VI_HMC_burgers.py:252).

Here the same contract is a small typed store: one directory per run uid,
arrays as ``.npz`` members, the config serialized as JSON (instead of
``os.system('cp config.py ...')``), and a manifest for discovery.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
from typing import Any, Optional

import numpy as np


def make_uid(now: Optional[datetime.datetime] = None) -> str:
    """Timestamp uid, '<%d_%m_%Y_%H_%M_%S>' like the reference, plus the SLURM
    job id when running under SLURM."""
    now = now or datetime.datetime.now()
    uid = now.strftime("%d_%m_%Y_%H_%M_%S")
    slurm = os.environ.get("SLURM_JOB_ID")
    return f"{uid}_{slurm}" if slurm else uid


def _to_jsonable(obj):
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {k: _to_jsonable(v) for k, v in dataclasses.asdict(obj).items()}
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


class RunStore:
    """Artifact directory for one run uid."""

    def __init__(self, root: str, uid: Optional[str] = None):
        self.uid = uid or make_uid()
        self.path = os.path.join(root, self.uid)
        os.makedirs(self.path, exist_ok=True)

    def save_array(self, name: str, array) -> str:
        out = os.path.join(self.path, f"{name}.npy")
        np.save(out, np.asarray(array))
        return out

    def load_array(self, name: str) -> np.ndarray:
        return np.load(os.path.join(self.path, f"{name}.npy"), allow_pickle=False)

    def save_arrays(self, name: str, **arrays) -> str:
        out = os.path.join(self.path, f"{name}.npz")
        np.savez(out, **{k: np.asarray(v) for k, v in arrays.items()})
        return out

    def load_arrays(self, name: str) -> dict:
        with np.load(os.path.join(self.path, f"{name}.npz")) as z:
            return dict(z)

    def save_config(self, config: Any, name: str = "config") -> str:
        """Config snapshot (the reference copies config.py next to artifacts)."""
        out = os.path.join(self.path, f"{name}.json")
        with open(out, "w") as f:
            json.dump(_to_jsonable(config), f, indent=2, default=str)
        return out

    def load_config(self, name: str = "config") -> dict:
        with open(os.path.join(self.path, f"{name}.json")) as f:
            return json.load(f)

    def append_metrics_row(self, row, name: str = "output") -> None:
        """Per-epoch metric lines, one file per run (reference
        main_regression_VI.py:322-327 writes '<uid>_output.txt')."""
        with open(os.path.join(self.path, f"{name}.txt"), "a") as f:
            f.write(" ".join(f"{v:.8g}" for v in row) + "\n")

    @classmethod
    def open(cls, root: str, uid: str) -> "RunStore":
        store = cls.__new__(cls)
        store.uid = uid
        store.path = os.path.join(root, uid)
        if not os.path.isdir(store.path):
            raise FileNotFoundError(store.path)
        return store

    @staticmethod
    def list_runs(root: str) -> list:
        if not os.path.isdir(root):
            return []
        return sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
