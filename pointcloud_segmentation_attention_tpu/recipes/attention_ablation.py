"""The Report Table 1 attention ablation, end to end through the framework.

The reference project's CENTRAL experiment (Report.pdf Table 1;
``attention_points/train.py:323-330`` is the 6-way model dispatch it drove):
train the PointNet++ baseline, the all-attention variant, the four
single-attention-layer variants (L1..L4), and the attention+pooling variant
on the SAME ⅓ train subset at matched steps, and compare val mIoU.  The
published ordering is the project's key negative result — attention pooling
*degrades* segmentation, and degrades hardest when it replaces max-pooling
everywhere:

    baseline .361 > att-L4 .337 > att-L2 .326 > att-L3 .325 > att-L1 .293
    > att-all .178        (val mIoU, ⅓ subset — BASELINE.md Table 1 row)

This recipe reproduces the experiment through THIS framework's paths: one
shared synthetic scene corpus, ``TrainConfig(use_subset=True)`` (the same
first-third subset rule, ref train.py:334), ``input='sampler'``
(zero-precompute on-device chunk sampling), xyz-only inputs exactly like the
reference's attention arms (no color/normal features, ref
pointnet2_sem_seg_attention.py:24 feeds points only), matched ``max_steps``
per arm, best-val checkpointing, and the stitched resident-serving offline
eval per arm.  Output: ``RESULTS_attention_ablation.json`` with the per-arm
metrics, the achieved ordering, and the reference numbers side by side.

Run: ``python -m pointcloud_segmentation_attention_tpu.recipes.attention_ablation``
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet import (
    read_split, write_synthetic_dataset,
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

# The six published arms (Report.pdf Table 1, val mIoU on the ⅓ subset) —
# att+pool appears in the report's text without a Table 1 row, so its
# reference value is None.
REFERENCE_TABLE1_VAL_MIOU = {
    "baseline": 0.361,
    "att_all": 0.178,
    "att_L1": 0.293,
    "att_L2": 0.326,
    "att_L3": 0.325,
    "att_L4": 0.337,
    "att_pool": None,
}

# arm -> (registry model name, extra TrainConfig fields)
ARMS = {
    "baseline": ("sem_seg", {}),
    "att_all": ("sem_seg_attention", {}),
    "att_L1": ("sem_seg_attention_single_layer", {"attention_single_layer": 0}),
    "att_L2": ("sem_seg_attention_single_layer", {"attention_single_layer": 1}),
    "att_L3": ("sem_seg_attention_single_layer", {"attention_single_layer": 2}),
    "att_L4": ("sem_seg_attention_single_layer", {"attention_single_layer": 3}),
    "att_pool": ("sem_seg_attention_and_pooling", {}),
}


def run_attention_ablation(
    workdir: str,
    n_train_scenes: int = 12,
    n_val_scenes: int = 3,
    scene_points: int = 40000,
    n_points: int = 2048,
    batch_size: int = 4,
    max_steps: int = 600,
    n_devices: Optional[int] = None,
    seed: int = 0,
    arms=None,
    results_path: Optional[str] = None,
    model_overrides: Optional[dict] = None,
) -> dict:
    """Train every ablation arm on the SAME corpus at matched steps and
    evaluate each through val + the stitched resident-serving pipeline.

    ``use_subset=True`` trains on the first third of the train split (the
    reference's subset rule); all arms are xyz-only like the reference's
    Table 1 runs.  Returns {arm: metrics} + ordering + reference numbers.
    """
    data_root = os.path.join(workdir, "scannet_synth")
    if not os.path.exists(os.path.join(data_root, "splits")):
        # geometry_coded: the ablation arms are xyz-only, so blob labels
        # must be predictable from geometry for held-out scenes to be
        # learnable at all (color-coded labels would leave every xyz arm
        # at floor/wall-only mIoU and compress the ablation's range).
        write_synthetic_dataset(
            data_root, n_train=n_train_scenes, n_val=n_val_scenes,
            n_points=scene_points, seed=seed, color_coded=True,
            geometry_coded=True,
        )
    val_scenes = read_split(f"{data_root}/splits", "val")

    results = {}
    for arm in (arms or ARMS):
        model, extra = ARMS[arm]
        t0 = time.time()
        config = TrainConfig(
            data_root=data_root, model=model, input="sampler",
            use_colors=False, use_normals=False, use_subset=True,
            log_dir=os.path.join(workdir, f"arm_{arm}"),
            n_points=n_points, batch_size=batch_size, seed=seed,
            epochs=10**6, save_every_epochs=0, n_devices=n_devices,
            # ~12 val passes per arm: with the tiny subset an epoch is a
            # few steps, so val cadence is keyed to the step budget.
            n_epochs_to_val=max(
                1, max_steps
                // max(1, (n_train_scenes // 3) // batch_size) // 12),
            model_overrides=model_overrides, **extra,
        )
        summary = trainer.train(config, max_steps=max_steps)

        # Offline stitched eval on the BEST-val checkpoint (falling back to
        # the final state for arms whose val never improved).
        state = trainer.make_eval_state(config)
        ckpt = (latest_checkpoint(config.ckpt_dir, prefix="best")
                or latest_checkpoint(config.ckpt_dir))
        if ckpt is not None:
            state = restore_checkpoint(ckpt, state)
        server = ResidentSceneServer(
            state, n_points, batch_size=batch_size, layout="q16",
            use_colors=False, use_normals=False)
        pred_dir = os.path.join(workdir, f"preds_{arm}")
        gt_dir = os.path.join(workdir, "groundtruth")
        os.makedirs(pred_dir, exist_ok=True)
        os.makedirs(gt_dir, exist_ok=True)
        pred_files, gt_files = [], []
        for name in val_scenes:
            scene = load_scene(data_root, name)
            scene["scene_name"] = name
            labels = server.predict_scene(scene)
            path = os.path.join(pred_dir, f"{name}.txt")
            benchmark.export_benchmark_txt(path, labels)
            pred_files.append(path)
            gt_path = os.path.join(gt_dir, f"{name}.txt")
            if not os.path.exists(gt_path):
                benchmark.export_ids(gt_path, scene["labels"].astype(np.int64))
            gt_files.append(gt_path)
        offline = benchmark.evaluate(pred_files, gt_files)

        results[arm] = {
            "model": model, **{k: v for k, v in extra.items()},
            "best_val_miou": summary.get("best_val_miou"),
            "offline_mean_iou": offline["mean_iou"],
            "final_train_loss": summary.get("final_train_loss"),
            "steps": max_steps,
            "wall_seconds": round(time.time() - t0, 1),
            "reference_val_miou": REFERENCE_TABLE1_VAL_MIOU.get(arm),
        }
        print(json.dumps({arm: results[arm]}), flush=True)

    order = sorted(results, key=lambda a: -(results[a]["offline_mean_iou"]))
    out = {
        "arms": results,
        "ordering_by_offline_miou": order,
        "reference_ordering": ["baseline", "att_L4", "att_L2", "att_L3",
                               "att_L1", "att_all"],
        "config": {
            "n_train_scenes": n_train_scenes, "use_subset": True,
            "n_val_scenes": n_val_scenes, "scene_points": scene_points,
            "n_points": n_points, "batch_size": batch_size,
            "max_steps": max_steps, "seed": seed,
            "features": "xyz only (like ref Table 1 arms)",
        },
    }
    if results_path:
        with open(results_path, "w") as f:
            json.dump(out, f, indent=1, default=float)
    return out


def main(argv=None):
    import argparse
    import tempfile

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None)
    p.add_argument("--max_steps", type=int, default=600)
    p.add_argument("--scene_points", type=int, default=40000)
    p.add_argument("--results_path", default=None)
    args = p.parse_args(argv)
    workdir = args.workdir or tempfile.mkdtemp(prefix="psa_ablation_")
    out = run_attention_ablation(
        workdir, max_steps=args.max_steps, scene_points=args.scene_points,
        results_path=args.results_path)
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
