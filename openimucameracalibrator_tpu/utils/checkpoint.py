"""Solver-state checkpointing (npz pytree snapshots).

The reference only has stage-level file artifacts (extract_board_to_json.cc:
60-64); intra-optimization state is lost on interruption. Here every LM
stage of the continuous-time batch problem can snapshot its solution
(parameter pytree + scalar solver state) so a long calibration — or a
pre-empted TPU job — resumes from the last completed stage instead of
re-running the whole schedule (SURVEY.md §5 checkpoint/resume).

Format: one ``.npz`` per stage holding every array leaf keyed by its dict
name, plus ``__cost``/``__lam``/``__iterations``. Loading restores numpy
arrays; callers move them on-device (they are jit inputs anyway).
"""

from __future__ import annotations

import os

import numpy as np


def stage_path(ckpt_dir: str, stage_idx: int) -> str:
    return os.path.join(ckpt_dir, f"solver_stage_{stage_idx}.npz")


def save_stage(ckpt_dir: str, stage_idx: int, params: dict, *,
               cost=None, lam=None, iterations=None) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    arrs = {k: np.asarray(v) for k, v in params.items()}
    if cost is not None:
        arrs["__cost"] = np.asarray(cost)
    if lam is not None:
        arrs["__lam"] = np.asarray(lam)
    if iterations is not None:
        arrs["__iterations"] = np.asarray(iterations)
    path = stage_path(ckpt_dir, stage_idx)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrs)
    os.replace(tmp, path)  # atomic: never leaves a torn checkpoint
    return path


def load_stage(ckpt_dir: str, stage_idx: int):
    """Returns (params dict, meta dict) or None when absent/unreadable."""
    path = stage_path(ckpt_dir, stage_idx)
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            params = {k: z[k] for k in z.files if not k.startswith("__")}
            meta = {k[2:]: z[k] for k in z.files if k.startswith("__")}
    except (OSError, ValueError):
        return None
    return params, meta
