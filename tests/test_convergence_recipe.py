"""End-to-end convergence test (VERDICT #1): the FULL reference recipe —
precompute -> train (real schedules, weighted CE, BN-EMA, best-ckpt) ->
best-checkpoint restore -> full-scene stitched prediction -> benchmark
export -> offline confusion/IoU evaluator — demonstrably LEARNS on synthetic
color-coded ScanNet, and the trainer's streaming mIoU agrees with the
offline evaluator.

Scaled down for suite time (~150 steps at 1024-pt chunks); the full-scale
run (1600 steps, 32 scenes) is ``recipes/synthetic_convergence.py`` whose
committed results live in RESULTS_synthetic_convergence.json (val mIoU
trajectory 0.11 -> 0.40+ at 600 steps on 8 scenes, higher with 32).
"""
import json
import os

import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.recipes import (
    run_synthetic_convergence,
)


@pytest.mark.slow
def test_synthetic_convergence_end_to_end(tmp_path):
    results = run_synthetic_convergence(
        str(tmp_path),
        n_train_scenes=8,
        n_val_scenes=2,
        scene_points=12000,
        n_points=1024,
        batch_size=4,
        precompute_epochs=4,
        epochs=75,           # 150 steps
        n_epochs_to_val=25,
        n_devices=4,
        seed=0,
        results_path=str(tmp_path / "results.json"),
    )
    trainer_miou = results["trainer_best_val_miou"]
    offline_miou = results["offline_mean_iou"]
    # Chance on 21 classes with this label mix is ~0.03-0.05 mIoU (measured
    # 0.036 after 8 steps); after 150 steps the recipe must be well above it.
    assert trainer_miou is not None and trainer_miou >= 0.12, results
    assert offline_miou >= 0.10, results
    # Metric fidelity: the streaming val-chunk mIoU and the offline stitched
    # full-scene evaluator measure slightly different populations (chunks vs
    # vertices) but must broadly agree (measured deltas: 0.015 at step 120,
    # 0.009 at step 600).
    assert abs(trainer_miou - offline_miou) <= 0.10, results
    # The pipeline wrote its artifacts.
    assert os.path.exists(tmp_path / "results.txt")
    assert json.load(open(tmp_path / "results.json"))["final_step"] == 150


@pytest.mark.slow
def test_diversity_matched_recipe_smoke(tmp_path):
    """The matched-cost sampling-vs-replay recipe runs end to end on a tiny
    wall budget: both arms train under the SAME budget (the replay arm's
    precompute pass included), both produce finite offline mIoUs."""
    from pointcloud_segmentation_attention_tpu.recipes.diversity_matched import (
        run_diversity_matched,
    )

    out = run_diversity_matched(
        str(tmp_path), budget_s=240.0, n_train_scenes=2, n_val_scenes=1,
        scene_points=4000, n_points=128, batch_size=2, replay_epochs=2,
        n_devices=2)
    assert set(out["arms"]) == {"sampler", "replay_deep"}
    for arm in out["arms"].values():
        assert np.isfinite(arm["offline_mean_iou"])
        assert arm["steps"] >= 1
    # The replay arm's precompute cost is recorded (charged against its
    # budget); at this toy size it rounds to ~0 s.
    assert out["arms"]["replay_deep"]["precompute_s"] >= 0
    assert out["arms"]["sampler"]["precompute_s"] == 0.0
