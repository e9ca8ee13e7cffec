"""Checkpoint save/load (orbax-backed).

Reference parity: ``Trainer._save_checkpoint`` (sg_trainer.py:649-739) —
``ckpt_latest`` every validated epoch, ``ckpt_best`` on metric_to_watch improvement,
``ckpt_epoch_N`` list, plus state (net/ema/opt/step/metric/processing params). The
directory scheme is ``ckpt_root_dir/<experiment>/RUN_<ts>/<name>/`` with orbax pytree
dirs instead of ``.pth`` files; each save is preemption-safe (atomic rename by orbax)
— an improvement the TPU environment requires (SURVEY §5 checkpoint/resume).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from super_gradients_tpu.common.logging_utils import get_logger

logger = get_logger(__name__)

_METADATA_FILE = "sg_metadata.json"


def save_checkpoint(ckpt_dir: str, name: str, state_tree: Dict, metadata: Optional[Dict] = None):
    """Save a pytree checkpoint under ``ckpt_dir/name`` (overwrites)."""
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    state_tree = jax.device_get(state_tree)
    ckptr.save(path, state_tree)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(ckpt_dir, f"{name}_{_METADATA_FILE}"), "w") as f:
            json.dump(metadata, f, default=float)


def load_checkpoint(ckpt_dir: str, name: str, target_tree: Optional[Dict] = None) -> Dict:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target_tree) if target_tree is not None else ckptr.restore(path)
    return restored


def load_metadata(ckpt_dir: str, name: str) -> Dict:
    p = os.path.join(ckpt_dir, f"{name}_{_METADATA_FILE}")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def checkpoint_exists(ckpt_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(ckpt_dir, name))


def resolve_subtree_key(tree, subtree: str):
    """Find the top-level key matching ``subtree``, resolving common naming
    aliases (flax models here often prefix private submodules, e.g. YOLOX/
    SegFormer name theirs ``_backbone`` while checkpoint_params says ``backbone``)."""
    for cand in (subtree, f"_{subtree}", subtree.lstrip("_")):
        if cand in tree:
            return cand
    return None


def load_checkpoint_into_model(model, checkpoint_path: str, only_subtree: str = None):
    """Load an orbax checkpoint dir (saved variables) into an SgModel.

    ``only_subtree="backbone"`` grafts just that top-level module subtree
    (ref checkpoint_params.load_backbone)."""
    if os.path.basename(checkpoint_path) == "":
        checkpoint_path = checkpoint_path.rstrip("/")
    ckpt_dir, name = os.path.split(os.path.abspath(checkpoint_path))
    restored = load_checkpoint(ckpt_dir, name)
    # accept either raw variables or a full train-state dict
    if "variables" in restored:
        variables = restored["variables"]
    elif "params" in restored:
        variables = {"params": restored["params"]}
        if "batch_stats" in restored and restored["batch_stats"]:
            variables["batch_stats"] = restored["batch_stats"]
    else:
        variables = restored
    if only_subtree:
        model_key = resolve_subtree_key(model.variables.get("params", {}), only_subtree)
        if model_key is None:
            raise KeyError(
                f"only_subtree='{only_subtree}' matches no top-level module in the model param tree "
                f"(top-level modules: {sorted(model.variables.get('params', {}))}) — nothing would be loaded"
            )
        src_key = resolve_subtree_key(variables.get("params", {}), only_subtree)
        if src_key is None:
            raise KeyError(
                f"only_subtree='{only_subtree}' matches no top-level key in the checkpoint "
                f"(top-level keys: {sorted(variables.get('params', {}))}) — nothing would be loaded"
            )
        merged = {}
        for col, tree in model.variables.items():
            merged[col] = dict(tree)
            if src_key in variables.get(col, {}):
                merged[col][model_key] = variables[col][src_key]
        variables = merged
    model.update_variables(variables)
    logger.info(f"Loaded checkpoint from {checkpoint_path}" + (f" (subtree {only_subtree})" if only_subtree else ""))
    return model


class BestCheckpointTracker:
    """metric_to_watch bookkeeping (ref sg_trainer metric_to_watch logic)."""

    def __init__(self, greater_is_better: bool = True):
        self.greater_is_better = greater_is_better
        self.best: Optional[float] = None

    def is_improvement(self, value: float) -> bool:
        if value is None or (isinstance(value, float) and np.isnan(value)):
            return False
        if self.best is None:
            self.best = value
            return True
        better = value > self.best if self.greater_is_better else value < self.best
        if better:
            self.best = value
        return better


class AverageBestModels:
    """Running average of the N best snapshots (ref weight_averaging_utils.py:1-132)."""

    def __init__(self, n_best: int = 10, greater_is_better: bool = True):
        self.n_best = n_best
        self.greater_is_better = greater_is_better
        self.snapshots: list = []  # (metric, params) pairs

    def update(self, metric: float, params):
        params = jax.device_get(params)
        self.snapshots.append((metric, params))
        self.snapshots.sort(key=lambda t: -t[0] if self.greater_is_better else t[0])
        self.snapshots = self.snapshots[: self.n_best]

    def averaged_params(self):
        if not self.snapshots:
            return None
        trees = [p for _, p in self.snapshots]
        return jax.tree_util.tree_map(lambda *xs: np.mean(np.stack(xs), axis=0), *trees)


def transfer_weights(src_tree: Dict, dst_tree: Dict) -> Dict:
    """Copy every leaf whose path AND shape match from ``src_tree`` into a copy of
    ``dst_tree`` (ref checkpoint_utils.py:30 ``transfer_weights`` — the partial-load
    used by fine-tuning / head replacement). Mismatched or missing leaves keep the
    destination's (freshly initialized) values.

    Returns the merged tree; the number of transferred leaves is attached as
    ``transfer_weights.last_transferred`` for logging/tests.
    """
    transferred = 0

    def walk(src, dst):
        nonlocal transferred
        out = {}
        for k, v in dst.items():
            s = src.get(k) if isinstance(src, dict) else None
            if isinstance(v, dict):
                out[k] = walk(s if isinstance(s, dict) else {}, v)
            elif s is not None and hasattr(s, "shape") and hasattr(v, "shape") and tuple(s.shape) == tuple(v.shape):
                out[k] = s
                transferred += 1
            else:
                out[k] = v
        return out

    merged = walk(src_tree, dst_tree)
    transfer_weights.last_transferred = transferred
    return merged
