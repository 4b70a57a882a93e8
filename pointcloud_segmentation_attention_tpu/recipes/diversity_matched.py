"""Matched-cost sampling-vs-replay diversity comparison (VERDICT r3 #5).

The r3 headline (0.795 vs 0.38 offline mIoU at 200 steps,
``RESULTS_zero_precompute.json``) compared fresh on-device sampling against
a shallow 4-epoch (32-distinct-chunk) replay corpus at equal STEPS — a
favorable snapshot: deeper precompute narrows the gap, and the precompute
pass itself costs wall-clock the sampler never pays.  This recipe levels
the field:

- both arms get the SAME total wall-clock budget,
- the replay arm's budget INCLUDES its precompute pass (a deep corpus —
  default 32 epochs, 8x the r3 snapshot's diversity),
- identical scenes, seeds, model, and stitched offline evaluation.

The result replaces the equal-steps snapshot in docs/performance.md; either
the diversity claim survives matched cost or it is re-scoped honestly.

Run: ``python -m pointcloud_segmentation_attention_tpu.recipes.diversity_matched``
(CPU mesh fine; quality-only).
"""
from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Optional

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet import (
    precompute, read_split, write_synthetic_dataset,
)
from pointcloud_segmentation_attention_tpu.data.scannet.scenes import (
    load_scene,
)
from pointcloud_segmentation_attention_tpu.eval import benchmark
from pointcloud_segmentation_attention_tpu.eval.resident_serving import (
    ResidentSceneServer,
)
from pointcloud_segmentation_attention_tpu.train import trainer
from pointcloud_segmentation_attention_tpu.train.checkpoints import (
    latest_checkpoint, restore_checkpoint,
)
from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig


def _offline_eval(config: TrainConfig, data_root: str, val_scenes,
                  workdir: str, arm: str) -> float:
    state = trainer.make_eval_state(config)
    ckpt = (latest_checkpoint(config.ckpt_dir)
            or latest_checkpoint(config.ckpt_dir, prefix="best"))
    if ckpt is None:
        return float("nan")
    state = restore_checkpoint(ckpt, state)
    server = ResidentSceneServer(state, config.n_points,
                                 batch_size=config.batch_size, layout="f32")
    pred_files, gt_files = [], []
    pred_dir = os.path.join(workdir, f"pred_{arm}")
    os.makedirs(pred_dir, exist_ok=True)
    for name in val_scenes:
        scene = load_scene(data_root, name)
        labels = server.predict_scene(scene)
        path = os.path.join(pred_dir, f"{name}.txt")
        benchmark.export_benchmark_txt(path, labels)
        pred_files.append(path)
        gt_path = os.path.join(pred_dir, f"{name}_gt.txt")
        benchmark.export_ids(gt_path, scene["labels"].astype(np.int64))
        gt_files.append(gt_path)
    return benchmark.evaluate(pred_files, gt_files)["mean_iou"]


def run_diversity_matched(
    workdir: Optional[str] = None,
    budget_s: float = 1200.0,
    n_train_scenes: int = 8,
    n_val_scenes: int = 2,
    scene_points: int = 16000,
    n_points: int = 2048,
    batch_size: int = 4,
    replay_epochs: int = 32,
    n_devices: Optional[int] = None,
    seed: int = 0,
    results_path: Optional[str] = None,
) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="psa_div_matched_")
    data_root = os.path.join(workdir, "scannet_synth")
    write_synthetic_dataset(
        data_root, n_train=n_train_scenes, n_val=n_val_scenes,
        n_points=scene_points, seed=seed, color_coded=True)
    val_scenes = read_split(f"{data_root}/splits", "val")
    train_scenes = read_split(f"{data_root}/splits", "train")
    # A step ceiling far above what the budget allows: the wall clock stops
    # both arms.
    huge_epochs = 100000

    arms = {}

    # Arm 1: zero-precompute on-device sampling, full budget on training.
    cfg_s = TrainConfig(
        data_root=data_root, model="sem_seg_features", input="sampler",
        log_dir=os.path.join(workdir, "logs_sampler"), n_points=n_points,
        batch_size=batch_size, epochs=huge_epochs, seed=seed,
        n_epochs_to_val=50, save_every_epochs=0, n_devices=n_devices)
    t0 = time.time()
    s = trainer.train(cfg_s, max_seconds=budget_s)
    arms["sampler"] = {
        "steps": s["final_step"], "precompute_s": 0.0,
        "train_wall_s": round(time.time() - t0, 1),
        "best_val_miou": s.get("best_val_miou"),
        "offline_mean_iou": _offline_eval(cfg_s, data_root, val_scenes,
                                          workdir, "sampler"),
    }

    # Arm 2: deep precomputed corpus + device-resident replay; the
    # precompute pass spends from the SAME budget.
    pre_dir = os.path.join(data_root, "precomputed")
    t0 = time.time()
    precompute.precompute_train_chunks(
        data_root, train_scenes, pre_dir, epochs=replay_epochs,
        npoints=n_points, seed=seed)
    precompute.precompute_val_chunks(
        data_root, val_scenes, pre_dir, npoints=n_points, seed=seed)
    t_pre = time.time() - t0
    cfg_r = TrainConfig(
        data_root=data_root, model="sem_seg_features", input="resident",
        wire_format="packed_q16", log_dir=os.path.join(workdir, "logs_replay"),
        n_points=n_points, batch_size=batch_size, epochs=huge_epochs,
        seed=seed, n_epochs_to_val=50, save_every_epochs=0,
        n_devices=n_devices)
    t0 = time.time()
    r = trainer.train(cfg_r, max_seconds=max(0.0, budget_s - t_pre))
    arms["replay_deep"] = {
        "steps": r["final_step"], "precompute_s": round(t_pre, 1),
        "train_wall_s": round(time.time() - t0, 1),
        "corpus_distinct_chunks": replay_epochs * n_train_scenes,
        "best_val_miou": r.get("best_val_miou"),
        "offline_mean_iou": _offline_eval(cfg_r, data_root, val_scenes,
                                          workdir, "replay"),
    }

    results = {
        "budget_s": budget_s,
        "arms": arms,
        "config": {
            "n_train_scenes": n_train_scenes, "scene_points": scene_points,
            "n_points": n_points, "batch_size": batch_size,
            "replay_epochs": replay_epochs, "seed": seed,
        },
    }
    if results_path:
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)
    return results


def main(argv=None):
    import argparse

    # Quality-only recipe: run on the CPU mesh and leave any accelerator
    # free (must be set before first backend use; on environments that
    # pre-register a TPU plugin, env vars alone are too late).
    import jax

    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None)
    p.add_argument("--budget_s", type=float, default=1200.0)
    p.add_argument("--replay_epochs", type=int, default=32)
    p.add_argument("--results_path", default=None)
    args = p.parse_args(argv)
    out = run_diversity_matched(
        args.workdir, budget_s=args.budget_s,
        replay_epochs=args.replay_epochs, results_path=args.results_path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
