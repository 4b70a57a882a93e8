"""Smoke tests for the round-5 experiment recipes: the Table 1 attention
ablation harness, the Table 4 context-margin harness, and the extended
family arms (AttentionNet through the unified trainer, v1 whole-scene).

Scaled to suite time (tiny models, a few steps); the full-scale runs vendor
RESULTS_attention_ablation.json / RESULTS_context_margin.json at repo root.
"""
import numpy as np
import pytest

TINY = {
    "sa_npoints": [64, 32, 16, 8], "sa_radii": [0.2, 0.4, 0.8, 1.2],
    "sa_nsample": 8, "sa_mlps": [[8, 8]] * 4,
    "fp_mlps": [[8], [8], [8], [8, 8]],
}


def test_attention_ablation_recipe_smoke(tmp_path):
    """Two arms (baseline + one single-layer) through the full harness:
    shared corpus, subset rule, sampler training, stitched offline eval,
    ordering + reference numbers in the output."""
    from pointcloud_segmentation_attention_tpu.recipes import (
        run_attention_ablation,
    )

    out = run_attention_ablation(
        str(tmp_path), n_train_scenes=6, n_val_scenes=1, scene_points=4000,
        n_points=128, batch_size=2, max_steps=2, n_devices=2,
        arms=("baseline", "att_L2"), model_overrides=TINY,
    )
    assert set(out["arms"]) == {"baseline", "att_L2"}
    for arm, r in out["arms"].items():
        assert np.isfinite(r["final_train_loss"]), (arm, r)
        assert 0.0 <= r["offline_mean_iou"] <= 1.0
    assert out["arms"]["att_L2"]["reference_val_miou"] == 0.326
    assert len(out["ordering_by_offline_miou"]) == 2


def test_feature_ablation_recipe_smoke(tmp_path):
    """Two arms (xyz-only baseline + normals-only features) through the full
    Table 3 harness: shared dual-signal corpus, per-arm feature flags in the
    trainer AND the stitched serving eval, ordering + reference numbers."""
    from pointcloud_segmentation_attention_tpu.recipes import (
        run_feature_ablation,
    )

    out = run_feature_ablation(
        str(tmp_path), n_train_scenes=6, n_val_scenes=1, scene_points=4000,
        n_points=128, batch_size=2, max_steps=3, n_devices=2,
        arms=("baseline", "normals"), model_overrides=TINY,
    )
    assert set(out["arms"]) == {"baseline", "normals"}
    for arm, r in out["arms"].items():
        assert np.isfinite(r["final_train_loss"]), (arm, r)
        assert 0.0 <= r["offline_mean_iou"] <= 1.0
    assert out["arms"]["normals"]["use_normals"] is True
    assert out["arms"]["normals"]["use_colors"] is False
    assert out["arms"]["normals"]["reference_val_miou"] == 0.509
    assert out["reference_ordering"][0] == "both"


def test_context_margin_recipe_smoke(tmp_path):
    """Train once, stitch-eval at margin 0 and 0.2 — both evals complete and
    the output carries the delta + the reference Table 4 numbers."""
    from pointcloud_segmentation_attention_tpu.recipes import (
        run_context_margin,
    )

    out = run_context_margin(
        str(tmp_path), margins=(0.0, 0.2), n_train_scenes=2, n_val_scenes=1,
        scene_points=4000, n_points=128, batch_size=2, max_steps=2,
        n_devices=2, model_overrides=TINY,
    )
    assert set(out["offline_miou_by_margin"]) == {"0.0", "0.2"}
    for v in out["offline_miou_by_margin"].values():
        assert 0.0 <= v <= 1.0
    assert out["reference_table4"]["with_context"] == 0.517


@pytest.mark.slow
def test_attention_net_unified_trainer(tmp_path):
    """The Keras-style AttentionNet rides the unified sampler trainer
    (fixed 1024/256/64/16 hierarchy -> needs >= 1024-pt chunks)."""
    from pointcloud_segmentation_attention_tpu.recipes import (
        run_attention_net_convergence,
    )

    out = run_attention_net_convergence(
        str(tmp_path), n_train_scenes=2, n_val_scenes=1, scene_points=6000,
        n_points=1024, batch_size=2, max_steps=2, n_devices=2,
    )
    assert np.isfinite(out["final_train_loss"])


def test_v1_scannet_whole_scene_recipe(tmp_path):
    """The v1 whole-scene trainer arm: trains and reports the calibrated
    surface-voxel accuracy metric."""
    from pointcloud_segmentation_attention_tpu.recipes import (
        run_v1_scannet_convergence,
    )

    out = run_v1_scannet_convergence(
        str(tmp_path), dataset_kind="whole", n_train_scenes=2,
        n_val_scenes=1, scene_points=3000, npoints=256, batch_size=2,
        epochs=1, n_devices=2, max_steps=2,
    )
    assert "eval_calibrated_vox_accuracy" in out
    assert np.isfinite(out["eval_miou"])
