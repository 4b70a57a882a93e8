"""Resident-scene serving: deterministic chunker twin parity (host numpy vs
device program), coverage contract, and end-to-end stitched-output identity
with the host serving path."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (
    full_scene_chunks,
)
from pointcloud_segmentation_attention_tpu.eval.resident_serving import (
    ResidentSceneServer, SceneLayout, chunk_count, deterministic_scene_chunks,
    make_scene_chunker,
)

TINY = dict(
    sa_npoints=(64, 32, 16, 8), sa_radii=(0.2, 0.4, 0.8, 1.2), sa_nsample=8,
    sa_mlps=((8, 8),) * 4, fp_mlps=((8,), (8,), (8,), (8, 8)))


def _scene(n=3000, seed=0, extent=(6.0, 5.0, 2.5)):
    rng = np.random.RandomState(seed)
    return {
        "scene_name": f"scene{seed}",
        "points": (rng.rand(n, 3) * extent).astype(np.float32),
        "labels": rng.randint(0, 21, n).astype(np.int32),
        "colors": rng.randint(0, 256, (n, 3)).astype(np.uint8),
        "normals": rng.rand(n, 3).astype(np.float32),
    }


def test_twin_coverage_contract():
    """Every vertex is mask-True exactly once; tail fill is mask-False —
    the same contract full_scene_chunks satisfies (different composition)."""
    sc = _scene(2500, 1)
    cs = deterministic_scene_chunks(
        sc["points"], [sc["labels"]], npoints=512, seed=3)
    covered = np.zeros(len(sc["points"]), np.int64)
    np.add.at(covered, cs.orig_idx[cs.masks], 1)
    assert (covered == 1).all()
    ref = full_scene_chunks(sc["points"], [sc["labels"]], False, 512,
                            np.random.RandomState(0))
    ref_cov = np.zeros(len(sc["points"]), np.int64)
    np.add.at(ref_cov, ref.orig_idx[ref.masks], 1)
    assert (ref_cov == 1).all()
    # Chunk geometry: all points of a chunk lie inside SOME 1.9 m margin box
    # (cells + margins), i.e. xy spread per chunk is bounded.
    for x in range(len(cs.points)):
        spread = cs.points[x, :, :2].max(0) - cs.points[x, :, :2].min(0)
        assert (spread <= 1.5 + 2 * 0.2 + 1e-5).all()


def test_chunk_count_matches_twin():
    for seed in (0, 1, 2):
        sc = _scene(2000 + 500 * seed, seed)
        cs = deterministic_scene_chunks(sc["points"], [], 512, seed=0)
        assert chunk_count(sc["points"], 512) == len(cs.points)


def test_device_chunker_matches_twin_bitwise():
    """The jitted chunker reproduces the numpy twin's chunk composition
    EXACTLY (f32 layout): same chunk count, same point ids per slot, same
    masks."""
    sc = _scene(2200, 4)
    npoints = 256
    n_pad = 4096
    layout = SceneLayout("f32", n_pad)
    buf = layout.pack(sc["points"], sc["colors"], sc["normals"])
    x = chunk_count(sc["points"], npoints)
    x_cap = -(-x // 8) * 8
    chunker = make_scene_chunker(layout, x_cap, npoints, seed=5)
    idx, mask, n_chunks = chunker(jnp.asarray(buf), len(sc["points"]))
    cs = deterministic_scene_chunks(sc["points"], [], npoints, seed=5)
    assert int(n_chunks) == len(cs.points) == x
    np.testing.assert_array_equal(np.asarray(idx)[:x], cs.orig_idx)
    np.testing.assert_array_equal(np.asarray(mask)[:x], cs.masks)
    assert not np.asarray(mask)[x:].any()


@pytest.mark.parametrize("chunk_size,margin", [(1.5, 0.0), (1.0, 0.3)])
def test_device_chunker_matches_twin_nondefault_geometry(chunk_size, margin):
    """The chunk-geometry knob (VERDICT r4 #2, ref complete_scene_loader.py
    :31-42 margins / Report.pdf Table 4): host twin and device chunker stay
    bit-identical at margin 0 (the 'naive subsets' arm) and at a
    non-default cell size."""
    sc = _scene(2000, 12)
    npoints = 256
    layout = SceneLayout("f32", 2048)
    buf = layout.pack(sc["points"], sc["colors"], sc["normals"])
    x = chunk_count(sc["points"], npoints, chunk_size, margin)
    x_cap = -(-x // 8) * 8
    chunker = make_scene_chunker(layout, x_cap, npoints, seed=5,
                                 chunk_size=chunk_size, margin=margin)
    idx, mask, n_chunks = chunker(jnp.asarray(buf), len(sc["points"]))
    cs = deterministic_scene_chunks(sc["points"], [], npoints, seed=5,
                                    chunk_size=chunk_size, margin=margin)
    assert int(n_chunks) == len(cs.points) == x
    np.testing.assert_array_equal(np.asarray(idx)[:x], cs.orig_idx)
    np.testing.assert_array_equal(np.asarray(mask)[:x], cs.masks)
    # margin 0: chunks contain ONLY home-cell points (no context), so the
    # per-chunk xy spread is bounded by the cell alone.
    for c in range(len(cs.points)):
        pts = sc["points"][cs.orig_idx[c]][:, :2]
        assert (pts.max(0) - pts.min(0) <= chunk_size + 2 * margin + 1e-5).all()


def _tiny_state(npoints, seed=0):
    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.train import create_state

    model = models.get_model("sem_seg_features", num_classes=21, **TINY)
    return create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(seed),
        jnp.zeros((1, npoints, 3)), jnp.zeros((1, npoints, 6)), train=False)


def test_resident_serving_bit_identical_to_host_path():
    """Stitched per-vertex labels from the resident device path == the host
    path (predict_scene_chunks) fed the SAME deterministic chunks, f32
    layout (VERDICT r3 #1's acceptance test)."""
    from pointcloud_segmentation_attention_tpu.data.pipeline import (
        assemble_features,
    )
    from pointcloud_segmentation_attention_tpu.eval.full_scene import (
        make_sharded_predict_fn, predict_scene_chunks,
    )

    sc = _scene(2200, 6)
    npoints = 256
    state = _tiny_state(npoints)
    seed = 7

    server = ResidentSceneServer(
        state, npoints, batch_size=4, layout="f32", seed=seed,
        pad_multiple=4096)
    got = server.predict_scene(sc)

    cs = deterministic_scene_chunks(
        sc["points"], [sc["labels"], sc["colors"], sc["normals"]],
        npoints, seed=seed)
    host_scene = {
        "points": cs.points,
        "colors": cs.features[1],
        "normals": cs.features[2].astype(np.float32),
        "masks": cs.masks,
        "orig_idx": cs.orig_idx,
        "num_vertices": len(sc["points"]),
    }
    predict_fn, _ = make_sharded_predict_fn(state, n_devices=1,
                                            return_labels=True)
    want = predict_scene_chunks(predict_fn, host_scene, True, True,
                                batch_size=4)
    np.testing.assert_array_equal(got, want)


def test_resident_serving_q16_close_to_f32():
    """The q16 resident configuration (12 B/point upload) agrees with the
    f32 path on nearly every vertex — quantization noise is ~0.05 mm, far
    below any decision boundary that matters."""
    sc = _scene(2200, 8)
    npoints = 256
    state = _tiny_state(npoints)
    f32 = ResidentSceneServer(state, npoints, batch_size=4, layout="f32",
                              pad_multiple=4096).predict_scene(sc)
    q16 = ResidentSceneServer(state, npoints, batch_size=4, layout="q16",
                              pad_multiple=4096).predict_scene(sc)
    assert (f32 == q16).mean() > 0.98, (f32 == q16).mean()


def test_scene_layout_roundtrip():
    sc = _scene(500, 9)
    layout = SceneLayout("q16", 512)
    buf = layout.pack(sc["points"], sc["colors"], sc["normals"])
    host = layout.decode_host(buf)
    import jax.numpy as jnp

    from pointcloud_segmentation_attention_tpu.eval.resident_serving import (
        _decode_scene_jnp,
    )
    dev = jax.jit(lambda b: _decode_scene_jnp(b, layout))(jnp.asarray(buf))
    np.testing.assert_allclose(host["points"][:500], sc["points"], atol=2e-4)
    np.testing.assert_allclose(np.asarray(dev["points"]), host["points"],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev["colors"]), host["colors"])
    np.testing.assert_allclose(np.asarray(dev["normals"]), host["normals"],
                               atol=1e-6)


def test_generate_predictions_resident(tmp_path):
    """The resident twin of generate_predictions writes the same artifact
    set (npy + benchmark txt) for every scene."""
    import os

    from pointcloud_segmentation_attention_tpu.data.scannet import (
        read_split, write_synthetic_dataset,
    )
    from pointcloud_segmentation_attention_tpu.eval.resident_serving import (
        generate_predictions_resident,
    )

    root = str(tmp_path / "scannet")
    write_synthetic_dataset(root, n_train=0, n_val=2, n_test=0,
                            n_points=2000)
    val = read_split(os.path.join(root, "splits"), "val")
    state = _tiny_state(128)
    out_dir = str(tmp_path / "preds")
    results = list(generate_predictions_resident(
        state, root, val, out_dir, npoints=128, batch_size=4))
    assert {r["scene_name"] for r in results} == set(val)
    for name in val:
        assert os.path.exists(os.path.join(out_dir, f"{name}.txt"))
        assert os.path.exists(os.path.join(out_dir, f"{name}_labels.npy"))
        labels = np.load(os.path.join(out_dir, f"{name}_labels.npy"))
        assert labels.shape == (2000,)


def test_pipelined_multi_scene():
    npoints = 256
    state = _tiny_state(npoints)
    server = ResidentSceneServer(state, npoints, batch_size=4, layout="q16",
                                 pad_multiple=4096, pipeline_depth=2)
    scenes = [_scene(1500 + 300 * i, 20 + i) for i in range(3)]
    out = dict(server.predict_scenes(iter(scenes)))
    assert set(out) == {s["scene_name"] for s in scenes}
    for s in scenes:
        assert out[s["scene_name"]].shape == (len(s["points"]),)


def test_grouped_serving_bit_identical_to_unbatched():
    """group_size=3 on ONE device (K scenes per upload/dispatch/fetch — the
    RTT-amortizing mode for high-latency links) produces exactly the
    unbatched path's labels, odd scene count included."""
    npoints = 256
    state = _tiny_state(npoints)
    scenes = [_scene(1200 + 250 * i, 60 + i) for i in range(5)]
    single = dict(ResidentSceneServer(
        state, npoints, batch_size=4, layout="q16",
        pad_multiple=4096).predict_scenes(iter(scenes)))
    grouped = dict(ResidentSceneServer(
        state, npoints, batch_size=4, layout="q16", pad_multiple=4096,
        group_size=3).predict_scenes(iter(scenes)))
    assert set(grouped) == set(single)
    for name in single:
        np.testing.assert_array_equal(grouped[name], single[name])


@pytest.mark.parametrize("n_dev", [1, 2, 4])
def test_mesh_serving_bit_identical_to_single_device(n_dev):
    """Scene-per-device mesh serving (VERDICT r4 #4): the shard_map group
    program's stitched labels equal the single-device path's EXACTLY for
    n = 1/2/4 devices, including an odd scene count (tail group padded)."""
    from pointcloud_segmentation_attention_tpu import parallel

    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs {n_dev} devices")
    npoints = 256
    state = _tiny_state(npoints)
    scenes = [_scene(1200 + 250 * i, 40 + i) for i in range(5)]
    single = dict(ResidentSceneServer(
        state, npoints, batch_size=4, layout="q16",
        pad_multiple=4096).predict_scenes(iter(scenes)))
    mesh = parallel.make_mesh(n_dev)
    served = dict(ResidentSceneServer(
        state, npoints, batch_size=4, layout="q16", pad_multiple=4096,
        mesh=mesh).predict_scenes(iter(scenes)))
    assert set(served) == set(single)
    for name in single:
        np.testing.assert_array_equal(served[name], single[name])


def test_grid_geometry_guard_rejects_oversize_margin():
    """The grid chunkers enumerate a 2x2 cell neighborhood, valid only for
    2*margin <= chunk_size; a larger margin used to silently DROP context
    members (home coverage stays exact, so nothing errored) — every entry
    point now rejects it loudly."""
    sc = _scene(500, 9)
    with pytest.raises(ValueError, match="2\\*margin"):
        chunk_count(sc["points"], 128, chunk_size=1.5, margin=0.8)
    with pytest.raises(ValueError, match="2\\*margin"):
        deterministic_scene_chunks(sc["points"], [sc["labels"]], 128,
                                   chunk_size=1.5, margin=0.8)
    with pytest.raises(ValueError, match="2\\*margin"):
        full_scene_chunks(sc["points"], [sc["labels"]], False, 128,
                          np.random.RandomState(0), chunk_size=1.5,
                          margin=0.8)
    with pytest.raises(ValueError, match="2\\*margin"):
        ResidentSceneServer(_tiny_state(128), 128, batch_size=2,
                            chunk_size=1.5, margin=0.76)
    # The boundary case (exactly 2*margin == chunk_size) is valid.
    assert chunk_count(sc["points"], 128, chunk_size=1.5, margin=0.75) > 0


def test_mesh_serving_custom_axis_name_and_2d_rejection():
    """The mesh path derives the scene axis from the mesh instead of
    hardcoding 'data'; a 2-D mesh (scene sharding is 1-D by construction)
    is rejected at __init__ instead of failing at fetch time."""
    from jax.sharding import Mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    npoints = 256
    state = _tiny_state(npoints)
    scenes = [_scene(900 + 100 * i, 70 + i) for i in range(3)]
    single = dict(ResidentSceneServer(
        state, npoints, batch_size=4, layout="q16",
        pad_multiple=4096).predict_scenes(iter(scenes)))
    mesh = Mesh(np.array(jax.devices()[:2]), ("shard",))
    served = dict(ResidentSceneServer(
        state, npoints, batch_size=4, layout="q16", pad_multiple=4096,
        mesh=mesh).predict_scenes(iter(scenes)))
    for name in single:
        np.testing.assert_array_equal(served[name], single[name])

    if len(jax.devices()) >= 4:
        mesh2 = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                     ("data", "model"))
        with pytest.raises(ValueError, match="1-D"):
            ResidentSceneServer(state, npoints, batch_size=4, mesh=mesh2)
