"""The Report Table 4 context-margin ablation through the framework.

The reference's "smarter scene subsets" (``complete_scene_loader.py:31-42``)
enlarge every full-coverage eval cell by a context margin: each chunk then
carries neighboring-cell points as CONTEXT for the network while only
home-cell points are stitched back.  Report.pdf Table 4 credits this
mechanism with the project's +2.7-pt headline: val mIoU 0.490 without
context -> 0.517 with it, SAME trained model, eval-time only.

This recipe reproduces that experiment: train ONE flagship model (sampler
input, zero precompute), then run the stitched resident-serving eval twice —
``margin=0`` (naive subsets: cells only, no context) vs the default
``margin=0.2`` — and report both offline mIoUs.  The margin knob threads
through the device chunker and its host twin bit-identically
(``tests/test_resident_serving.py`` non-default-geometry parity).

Run: ``python -m pointcloud_segmentation_attention_tpu.recipes.context_margin``
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence

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

REFERENCE_TABLE4 = {"without_context": 0.490, "with_context": 0.517}


def run_context_margin(
    workdir: str,
    margins: Sequence[float] = (0.0, 0.2),
    n_train_scenes: int = 8,
    n_val_scenes: int = 3,
    scene_points: int = 40000,
    n_points: int = 2048,
    batch_size: int = 4,
    max_steps: int = 400,
    n_devices: Optional[int] = None,
    seed: int = 0,
    results_path: Optional[str] = None,
    model_overrides: Optional[dict] = None,
) -> dict:
    """Train once (default margin), stitch-eval at every ``margins`` value.

    Expected signature (matching Table 4): the with-margin eval >= the
    margin-0 eval, because margin-0 chunks predict their cell-boundary
    points without any cross-cell context."""
    data_root = os.path.join(workdir, "scannet_synth")
    if not os.path.exists(os.path.join(data_root, "splits")):
        write_synthetic_dataset(
            data_root, n_train=n_train_scenes, n_val=n_val_scenes,
            n_points=scene_points, seed=seed, color_coded=True,
        )
    val_scenes = read_split(f"{data_root}/splits", "val")

    config = TrainConfig(
        data_root=data_root, model="sem_seg_features", input="sampler",
        log_dir=os.path.join(workdir, "train"), n_points=n_points,
        batch_size=batch_size, seed=seed, epochs=10**6,
        n_epochs_to_val=max(1, max_steps
                            // max(1, n_train_scenes // batch_size) // 8),
        save_every_epochs=0, n_devices=n_devices,
        model_overrides=model_overrides,
    )
    summary = trainer.train(config, max_steps=max_steps)

    state = trainer.make_eval_state(config)
    ckpt = (latest_checkpoint(config.ckpt_dir, prefix="best")
            or latest_checkpoint(config.ckpt_dir))
    if ckpt is not None:
        state = restore_checkpoint(ckpt, state)

    gt_dir = os.path.join(workdir, "groundtruth")
    os.makedirs(gt_dir, exist_ok=True)
    per_margin = {}
    for m in margins:
        server = ResidentSceneServer(
            state, n_points, batch_size=batch_size, layout="q16", margin=m)
        pred_dir = os.path.join(workdir, f"preds_margin{m}")
        os.makedirs(pred_dir, exist_ok=True)
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
        per_margin[str(m)] = benchmark.evaluate(pred_files, gt_files)[
            "mean_iou"]

    out = {
        "offline_miou_by_margin": per_margin,
        "delta_with_minus_without": (per_margin[str(margins[-1])]
                                     - per_margin[str(margins[0])]),
        "best_val_miou": summary.get("best_val_miou"),
        "reference_table4": REFERENCE_TABLE4,
        "config": {
            "margins": list(margins), "n_train_scenes": n_train_scenes,
            "n_val_scenes": n_val_scenes, "scene_points": scene_points,
            "n_points": n_points, "batch_size": batch_size,
            "max_steps": max_steps, "seed": seed,
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
    p.add_argument("--max_steps", type=int, default=400)
    p.add_argument("--results_path", default=None)
    args = p.parse_args(argv)
    workdir = args.workdir or tempfile.mkdtemp(prefix="psa_margin_")
    out = run_context_margin(workdir, max_steps=args.max_steps,
                             results_path=args.results_path)
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
