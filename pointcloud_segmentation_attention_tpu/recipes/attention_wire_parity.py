"""Attention-model wire/resident learning parity (VERDICT r3 #7).

The r3 evidence that the q16 wire + device-resident replay are
convergence-neutral covers only the flagship conv model
(``RESULTS_q16_convergence.json``); attention tensors could in principle be
more quantization-sensitive.  This recipe runs the SAME short convergence
probe for ``sem_seg_attention`` twice — ``packed_q16 + device_replay`` vs
the ``f32`` control — on identical scenes/seeds and vendors both results
(``RESULTS_attention_q16_convergence.json``).

Run: ``python -m pointcloud_segmentation_attention_tpu.recipes.attention_wire_parity``
(CPU mesh is fine; quality-only).
"""
from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Optional

from pointcloud_segmentation_attention_tpu.recipes.synthetic_convergence import (
    run_synthetic_convergence,
)


def run_attention_wire_parity(
    workdir: Optional[str] = None,
    n_train_scenes: int = 16,
    scene_points: int = 20000,
    n_points: int = 2048,
    batch_size: int = 4,
    epochs: int = 200,                 # 4 steps/epoch -> 800 steps
    precompute_epochs: int = 4,
    n_devices: Optional[int] = None,
    seed: int = 0,
    results_path: Optional[str] = None,
) -> dict:
    workdir = workdir or tempfile.mkdtemp(prefix="psa_att_parity_")
    arms = {}
    for name, kw in (
        ("f32", dict(wire_format="f32", device_replay=False)),
        ("q16_resident", dict(wire_format="packed_q16", device_replay=True)),
    ):
        t0 = time.time()
        out = run_synthetic_convergence(
            os.path.join(workdir, name),
            model="sem_seg_attention",
            n_train_scenes=n_train_scenes, n_val_scenes=2,
            scene_points=scene_points, n_points=n_points,
            batch_size=batch_size, precompute_epochs=precompute_epochs,
            epochs=epochs, n_epochs_to_val=max(1, epochs // 8),
            n_devices=n_devices, seed=seed, **kw,
        )
        arms[name] = {
            "trainer_best_val_miou": out["trainer_best_val_miou"],
            "offline_mean_iou": out["offline_mean_iou"],
            "final_step": out["final_step"],
            "wall_s": round(time.time() - t0, 1),
        }
    results = {
        "model": "sem_seg_attention",
        "arms": arms,
        "config": {
            "n_train_scenes": n_train_scenes, "scene_points": scene_points,
            "n_points": n_points, "batch_size": batch_size,
            "epochs": epochs, "precompute_epochs": precompute_epochs,
            "seed": seed,
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
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--n_train_scenes", type=int, default=16)
    p.add_argument("--results_path", default=None)
    args = p.parse_args(argv)
    out = run_attention_wire_parity(
        args.workdir, epochs=args.epochs,
        n_train_scenes=args.n_train_scenes, results_path=args.results_path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
