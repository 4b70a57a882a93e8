"""Checkpointing with best-metric retention.

Replaces ``tf.train.Saver`` usage: the reference saves
``best_model_epoch_%03d.ckpt`` whenever val mIoU improves
(``attention_points/train.py:273-276``) and restores
``tf.train.latest_checkpoint`` for inference
(``benchmark/generate_predictions.py:128-130``).

Storage is a plain numpy-pytree writer (npz + json manifest): flat, portable,
dependency-free, and byte-identical across hosts.  (orbax would add async
multi-host checkpointing; this framework's states are single-digit MB, so
the simple writer is deliberate.)
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(
    ckpt_dir: str,
    state: Any,
    step: int,
    metric: Optional[float] = None,
    keep_best_only: bool = False,
    prefix: str = "ckpt",
) -> str:
    """Save state pytree as npz + a json manifest; returns the path."""
    os.makedirs(ckpt_dir, exist_ok=True)
    name = f"{prefix}_{step:08d}"
    path = os.path.join(ckpt_dir, name + ".npz")
    payload = {}
    payload.update({f"params/{k}": v for k, v in _flatten(state.params).items()})
    payload.update({f"batch_stats/{k}": v for k, v in _flatten(state.batch_stats).items()})
    payload.update({f"opt_state/{k}": v for k, v in _flatten(state.opt_state).items()})
    payload["step"] = np.asarray(state.step)
    np.savez(path, **payload)
    manifest = {"step": int(step), "metric": metric, "file": name + ".npz"}
    with open(os.path.join(ckpt_dir, name + ".json"), "w") as f:
        json.dump(manifest, f)
    if keep_best_only:
        _prune_worse(ckpt_dir, prefix, keep=name)
    return path


def _manifests(ckpt_dir: str, prefix: str):
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for fn in os.listdir(ckpt_dir):
        if fn.startswith(prefix) and fn.endswith(".json"):
            with open(os.path.join(ckpt_dir, fn)) as f:
                m = json.load(f)
            m["_name"] = fn[:-5]
            out.append(m)
    return out


def _prune_worse(ckpt_dir: str, prefix: str, keep: str):
    for m in _manifests(ckpt_dir, prefix):
        if m["_name"] != keep:
            for ext in (".json", ".npz"):
                p = os.path.join(ckpt_dir, m["_name"] + ext)
                if os.path.exists(p):
                    os.remove(p)


def latest_checkpoint(ckpt_dir: str, prefix: str = "ckpt") -> Optional[str]:
    ms = _manifests(ckpt_dir, prefix)
    if not ms:
        return None
    best = max(ms, key=lambda m: m["step"])
    return os.path.join(ckpt_dir, best["file"])


def best_checkpoint(ckpt_dir: str, prefix: str = "ckpt") -> Optional[str]:
    ms = [m for m in _manifests(ckpt_dir, prefix) if m.get("metric") is not None]
    if not ms:
        return latest_checkpoint(ckpt_dir, prefix)
    best = max(ms, key=lambda m: m["metric"])
    return os.path.join(ckpt_dir, best["file"])


def restore_checkpoint(path: str, state: Any) -> Any:
    """Restore into a template TrainState (shapes/dtypes must match).

    The template's tree structure must match the checkpoint's exactly — in
    particular the optimizer tree: ``make_eval_state`` builds an
    adam-with-schedule state by convention, and a template built with a
    different optimizer would silently misalign.  On any mismatch this
    raises ``ValueError`` listing the differing paths instead of a bare
    ``KeyError``/silent reorder."""
    with np.load(path, allow_pickle=False) as z:
        data = {k: z[k] for k in z.files}

    def tree_keys(tree, section):
        paths = jax.tree_util.tree_flatten_with_path(tree)[0]
        out = []
        for path, leaf in paths:
            key = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            out.append((f"{section}/{key}", leaf))
        return out

    template_keys = {
        k for section, tree in (
            ("params", state.params),
            ("batch_stats", state.batch_stats),
            ("opt_state", state.opt_state),
        ) for k, _ in tree_keys(tree, section)
    }
    ckpt_keys = set(data) - {"step"}
    if template_keys != ckpt_keys:
        missing = sorted(ckpt_keys - template_keys)[:8]
        extra = sorted(template_keys - ckpt_keys)[:8]
        raise ValueError(
            f"checkpoint {path!r} tree structure does not match the template "
            f"state (did the model config or optimizer change?).\n"
            f"  in checkpoint but not template: {missing}\n"
            f"  in template but not checkpoint: {extra}"
        )

    def rebuild(tree, section):
        # Reassemble in original tree order via tree_unflatten.
        ordered = [
            data[k].astype(np.asarray(leaf).dtype)
            for k, leaf in tree_keys(tree, section)
        ]
        treedef = jax.tree_util.tree_structure(tree)
        return jax.tree_util.tree_unflatten(treedef, ordered)

    return state.replace(
        step=int(data["step"]),
        params=rebuild(state.params, "params"),
        batch_stats=rebuild(state.batch_stats, "batch_stats"),
        opt_state=rebuild(state.opt_state, "opt_state"),
    )


class BestKeeper:
    """Track the best validation metric and save on improvement
    (ref train.py:268-276)."""

    def __init__(self, ckpt_dir: str, prefix: str = "best"):
        self.ckpt_dir = ckpt_dir
        self.prefix = prefix
        # Seed from any existing best manifest so a resumed run cannot let a
        # worse first eval overwrite (and prune) a better prior best.
        self.best = -np.inf
        for manifest in _manifests(ckpt_dir, prefix):
            if manifest.get("metric") is not None:
                self.best = max(self.best, manifest["metric"])

    def maybe_save(self, state, step: int, metric: float) -> bool:
        if metric > self.best:
            self.best = metric
            save_checkpoint(
                self.ckpt_dir, state, step, metric=metric,
                keep_best_only=True, prefix=self.prefix,
            )
            return True
        return False
