"""Zero-precompute training: raw scenes -> device sampler -> stitched eval.

The reference's pipeline REQUIRES a precompute pass (pickle the chunks for
every epoch before any training happens, ``precompute_dataset.py``,
Report.pdf §3.3).  This recipe trains directly from the scene store with no
preprocessing at all: scenes upload to HBM once, every step cuts a fresh
validity-checked chunk on device (``train/device_sampler.py``), and the
standard full-scene stitched evaluator scores the result.

Run: ``python -m pointcloud_segmentation_attention_tpu.recipes.zero_precompute``
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet import (
    read_split, write_synthetic_dataset,
)
from pointcloud_segmentation_attention_tpu.data.scannet.scenes import (
    load_scene, load_scene_mapped,
)
from pointcloud_segmentation_attention_tpu.eval import benchmark
from pointcloud_segmentation_attention_tpu.eval.full_scene import (
    generate_predictions, make_sharded_predict_fn,
)
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.device_sampler import (
    ResidentScenes, make_sampling_train_step,
)


def run_zero_precompute(
    workdir: str,
    n_train_scenes: int = 8,
    n_val_scenes: int = 2,
    scene_points: int = 16000,
    n_points: int = 2048,
    batch_size: int = 4,
    epochs: int = 100,
    n_devices: Optional[int] = None,
    seed: int = 0,
    results_path: Optional[str] = None,
) -> dict:
    """Dataset -> resident scenes -> sampling train loop -> stitched eval.

    No precompute directory is ever created; the only host->device traffic
    after the one-time scene upload is a (B,) scene-id array per step.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from pointcloud_segmentation_attention_tpu import models, parallel
    from pointcloud_segmentation_attention_tpu.train import create_state

    data_root = os.path.join(workdir, "scannet_synth")
    write_synthetic_dataset(
        data_root, n_train=n_train_scenes, n_val=n_val_scenes,
        n_points=scene_points, seed=seed, color_coded=True,
    )
    train_scenes = read_split(f"{data_root}/splits", "train")
    val_scenes = read_split(f"{data_root}/splits", "val")

    mesh = parallel.make_mesh(n_devices)
    resident = ResidentScenes(
        [load_scene_mapped(data_root, s) for s in train_scenes], mesh=mesh)

    n_train = len(train_scenes)
    lr = lambda s: schedules.scannet_learning_rate(s, batch_size, n_train)
    bn = lambda s: schedules.scannet_bn_momentum(s, batch_size, n_train)
    model = models.get_model("sem_seg_features", num_classes=21)
    state = create_state(
        model, optax.adam(lr), jax.random.PRNGKey(seed),
        jnp.zeros((1, n_points, 3)), jnp.zeros((1, n_points, 6)),
        train=False)
    step = make_sampling_train_step(
        resident, n_points, mesh=mesh, bn_schedule=bn, lr_schedule=lr)

    # One chunk per scene per epoch, like the precomputed replay's epoch
    # semantics — but every visit samples a FRESH chunk.
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed + 1)
    steps_per_epoch = max(1, n_train // batch_size)
    losses = []
    m = None
    for epoch in range(epochs):
        order = rng.permutation(n_train)
        for i in range(steps_per_epoch):
            ids = order[i * batch_size:(i + 1) * batch_size].astype(np.int32)
            state, m = step(state, parallel.shard_batch(jnp.asarray(ids),
                                                        mesh), key)
        if (epoch + 1) % 10 == 0:
            losses.append(
                {"epoch": epoch + 1, "loss": float(m["loss"])})

    # Standard stitched full-scene eval (no precompute needed there either:
    # the eval stream chunks scenes on the fly).
    pred_dir = os.path.join(workdir, "predictions")
    gt_dir = os.path.join(workdir, "groundtruth")
    predict_fn, _ = make_sharded_predict_fn(state, n_devices,
                                            return_labels=True)
    pred_files, gt_files = [], []
    for res in generate_predictions(
            predict_fn, data_root, val_scenes, pred_dir, use_colors=True,
            use_normals=True, batch_size=batch_size, npoints=n_points,
            save_npy=False):
        pred_files.append(os.path.join(pred_dir, f"{res['scene_name']}.txt"))
    os.makedirs(gt_dir, exist_ok=True)
    for name in val_scenes:
        gt = load_scene(data_root, name)["labels"].astype(np.int64)
        path = os.path.join(gt_dir, f"{name}.txt")
        benchmark.export_ids(path, gt)
        gt_files.append(path)
    offline = benchmark.evaluate(pred_files, gt_files)

    results = {
        "offline_mean_iou": offline["mean_iou"],
        "loss_curve": losses,
        "final_loss": float(m["loss"]),
        "config": {
            "n_train_scenes": n_train_scenes, "scene_points": scene_points,
            "n_points": n_points, "batch_size": batch_size,
            "epochs": epochs, "seed": seed,
        },
    }
    if results_path:
        with open(results_path, "w") as f:
            json.dump(results, f, indent=1)
    return results


def main(argv=None):
    import argparse
    import tempfile

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--results_path", default=None)
    args = p.parse_args(argv)
    workdir = args.workdir or tempfile.mkdtemp(prefix="psa_zero_pre_")
    out = run_zero_precompute(workdir, epochs=args.epochs,
                              results_path=args.results_path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
