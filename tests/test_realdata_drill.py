"""Real-data readiness drill (VERDICT r2 #6): the complete raw-ScanNet path
— fabricated binary ply + segs.json + aggregation.json + labels tsv ->
collect_scannet_scene -> precompute CLI -> train -> full-scene predict ->
GT export -> offline evaluate — with the perfect-predictor calibration."""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.recipes.realdata_drill import (
    build_fake_room, fabricate_raw_scan, run_drill, write_binary_ply,
)


def test_binary_ply_roundtrip(tmp_path):
    from pointcloud_segmentation_attention_tpu.data.scannet.preprocessing import (
        read_ply_mesh,
    )

    points, colors, faces, sids, names = build_fake_room(n_grid=6)
    path = str(tmp_path / "scene.ply")
    write_binary_ply(path, points, colors, faces)
    mesh = read_ply_mesh(path)
    np.testing.assert_allclose(mesh["points"], points, rtol=1e-6)
    np.testing.assert_array_equal(mesh["colors"], colors)
    np.testing.assert_array_equal(mesh["faces"], faces)


def test_fabricated_scan_label_resolution(tmp_path):
    from pointcloud_segmentation_attention_tpu.data.scannet.preprocessing import (
        collect_scannet_scene,
    )

    scan_dir = str(tmp_path / "scan")
    info = fabricate_raw_scan(scan_dir, "scene9999_00", n_grid=6)
    labels = collect_scannet_scene(
        scan_dir, "scene9999_00", str(tmp_path / "root"),
        label_map_tsv=info["tsv"])
    np.testing.assert_array_equal(labels, info["gt_nyu40"])


@pytest.mark.slow
def test_full_drill_perfect_predictor_scores_one(tmp_path):
    out = run_drill(str(tmp_path), n_grid=16, npoints=256, batch_size=2,
                    precompute_epochs=1)
    assert out["perfect_miou"] == 1.0
    assert np.isfinite(out["model_miou"])
    assert out["n_vertices"] > 500
