"""End-to-end convergence recipe on synthetic ScanNet.

Proof that the FULL reference training recipe learns end to end — the round-1
framework had every component but no evidence the composition converges.
One command exercises, in order:

1. ``write_synthetic_dataset(color_coded=True)`` — ScanNet-layout scenes whose
   colors/normals encode the labels (the learnable analogue of real ScanNet's
   feature signal; geometry alone identifies floor/wall only).
2. ``precompute_train_chunks`` / ``precompute_val_chunks`` — the offline chunk
   corpus (ref ``precompute_dataset.py:15-78``).
3. ``train.trainer.train`` on ``sem_seg_features`` with the REAL schedules
   (exp-decay LR with floor, BN-EMA decay, class-weighted CE ignoring class 0,
   streaming mIoU, best-val checkpointing) —
   ref ``attention_points/train.py:288-388``.
4. Best-checkpoint restore -> sharded full-scene prediction with grid chunks,
   context margins, masked stitch (``eval/full_scene.py``) -> benchmark txt
   export (ref ``benchmark/generate_predictions.py``).
5. Ground-truth export + the offline confusion/IoU evaluator
   (ref ``benchmark/evaluate.py:111-191``), cross-checked against the
   trainer's streaming val mIoU.

Returns (and optionally writes) a results dict; the accompanying test asserts
val mIoU >= 0.8 and trainer-vs-evaluator agreement.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet import (
    load_scene,
    precompute,
    read_split,
    write_synthetic_dataset,
)
from pointcloud_segmentation_attention_tpu.eval import benchmark
from pointcloud_segmentation_attention_tpu.eval.full_scene import (
    generate_predictions,
    make_sharded_predict_fn,
)
from pointcloud_segmentation_attention_tpu.train import trainer as trainer_lib
from pointcloud_segmentation_attention_tpu.train.checkpoints import (
    best_checkpoint,
    restore_checkpoint,
)
from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig


def run_synthetic_convergence(
    workdir: str,
    n_train_scenes: int = 8,
    n_val_scenes: int = 2,
    scene_points: int = 16000,
    n_points: int = 2048,
    batch_size: int = 4,
    precompute_epochs: int = 4,
    epochs: int = 100,
    n_epochs_to_val: int = 10,
    n_devices: Optional[int] = None,
    seed: int = 0,
    results_path: Optional[str] = None,
    model: str = "sem_seg_features",
    use_colors: bool = True,
    use_normals: bool = True,
    wire_format: str = "f32",
    device_replay: bool = False,
    resident_augment: bool = False,
) -> dict:
    """Run the full pipeline; returns a results dict with
    ``trainer_best_val_miou`` (streaming metric on val chunks) and
    ``offline_mean_iou`` (benchmark evaluator on stitched full scenes)."""
    data_root = os.path.join(workdir, "scannet_synth")
    log_dir = os.path.join(workdir, "logs")
    pred_dir = os.path.join(workdir, "predictions")
    gt_dir = os.path.join(workdir, "groundtruth")

    # 1. dataset
    write_synthetic_dataset(
        data_root, n_train=n_train_scenes, n_val=n_val_scenes,
        n_points=scene_points, seed=seed, color_coded=True,
    )
    train_scenes = read_split(f"{data_root}/splits", "train")
    val_scenes = read_split(f"{data_root}/splits", "val")

    # 2. precompute
    pre_dir = os.path.join(data_root, "precomputed")
    precompute.precompute_train_chunks(
        data_root, train_scenes, pre_dir, epochs=precompute_epochs,
        npoints=n_points, seed=seed,
    )
    precompute.precompute_val_chunks(
        data_root, val_scenes, pre_dir, npoints=n_points, seed=seed,
    )

    # 3. train with the real recipe
    config = TrainConfig(
        data_root=data_root, n_points=n_points, model=model,
        use_colors=use_colors, use_normals=use_normals, epochs=epochs,
        batch_size=batch_size, n_epochs_to_val=n_epochs_to_val, seed=seed,
        log_dir=log_dir, n_devices=n_devices, save_every_epochs=0,
        wire_format=wire_format, device_replay=device_replay,
        resident_augment=resident_augment,
    )
    summary = trainer_lib.train(config)

    # 4. restore the best checkpoint and stitch full scenes
    ckpt = best_checkpoint(config.ckpt_dir, prefix="best")
    if ckpt is None:
        raise RuntimeError("training saved no best checkpoint")
    state = trainer_lib.make_eval_state(config)
    state = restore_checkpoint(ckpt, state)
    predict_fn, _ = make_sharded_predict_fn(state, n_devices)
    pred_files, gt_files = [], []
    for res in generate_predictions(
        predict_fn, data_root, val_scenes, pred_dir, use_colors=use_colors,
        use_normals=use_normals, batch_size=batch_size, npoints=n_points,
        save_npy=False,
    ):
        pred_files.append(os.path.join(pred_dir, f"{res['scene_name']}.txt"))

    # 5. GT export (stored labels are already NYU40 raw ids) + evaluator
    os.makedirs(gt_dir, exist_ok=True)
    for name in val_scenes:
        gt = load_scene(data_root, name)["labels"].astype(np.int64)
        path = os.path.join(gt_dir, f"{name}.txt")
        benchmark.export_ids(path, gt)
        gt_files.append(path)
    offline = benchmark.evaluate(
        pred_files, gt_files,
        output_file=os.path.join(workdir, "results.txt"),
    )

    results = {
        "trainer_best_val_miou": summary.get("best_val_miou"),
        "offline_mean_iou": offline["mean_iou"],
        "offline_per_class": {k: v for k, v in offline.items()
                              if k != "mean_iou" and not np.isnan(v)},
        "final_step": summary.get("final_step"),
        "config": {
            "model": model,
            "n_train_scenes": n_train_scenes, "n_val_scenes": n_val_scenes,
            "scene_points": scene_points, "n_points": n_points,
            "batch_size": batch_size, "epochs": epochs,
            "precompute_epochs": precompute_epochs, "seed": seed,
        },
    }
    if results_path:
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)
    return results


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="logs/synthetic_convergence")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--n_points", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=4)
    args = p.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)
    results = run_synthetic_convergence(
        args.workdir, epochs=args.epochs, n_points=args.n_points,
        batch_size=args.batch_size,
        results_path=os.path.join(args.workdir, "results.json"),
    )
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
