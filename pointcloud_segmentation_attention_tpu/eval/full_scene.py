"""Full-scene stitched prediction.

TPU-native equivalent of ``attention_points/benchmark/generate_predictions.py``:
every scene is chunked to full coverage (context-margin grid), chunks are run
through the model in fixed-size batches (padded — shapes never change, so one
compiled program serves every scene), masked argmax predictions are gathered to
host, and the inverse-shuffle scatter (``map_back``) restores original vertex
order.  Where the reference streamed chunk-by-chunk through a tf.Session and
stitched on scene change (:139-186), here whole scenes are processed at once
and chunk batches can be sharded across a device mesh (batch axis = chunks).
"""
from __future__ import annotations

import os
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np

from pointcloud_segmentation_attention_tpu.data.pipeline import assemble_features
from pointcloud_segmentation_attention_tpu.data.scannet.chunks import map_back
from pointcloud_segmentation_attention_tpu.data.scannet import precompute


def make_sharded_predict_fn(state, n_devices=None):
    """Wrap ``seg_predict_step`` as a chunk-batch predictor sharded over a
    device mesh: cuboid chunks are scattered across chips, logits gathered —
    the TPU equivalent of 'sharded full-scene inference' (BASELINE.json
    north-star; no counterpart in the reference, which streamed chunks through
    one GPU).  Use a batch_size that is a multiple of the mesh size.
    """
    import jax

    from pointcloud_segmentation_attention_tpu import parallel
    from pointcloud_segmentation_attention_tpu.train.steps import seg_predict_step

    mesh = parallel.make_mesh(n_devices)

    step = parallel.data_parallel_jit(
        seg_predict_step, mesh, batch_argnums=(1, 2), donate_argnums=()
    )

    def predict(points, features=None):
        import jax.numpy as jnp

        pts = parallel.shard_batch(jnp.asarray(points), mesh)
        fts = (
            parallel.shard_batch(jnp.asarray(features), mesh)
            if features is not None else None
        )
        return step(state, pts, fts)

    return predict, mesh


def predict_scene_chunks(
    predict_fn: Callable,
    scene: Dict[str, np.ndarray],
    use_colors: bool,
    use_normals: bool,
    batch_size: int = 16,
) -> np.ndarray:
    """Run predict_fn over all chunks of one scene (padding the last batch)
    and return per-vertex predicted labels (num_vertices,).

    predict_fn(points (B,N,3), features (B,N,K)|None) -> logits (B,N,C).
    """
    points = scene["points"]
    feats = assemble_features(
        scene["colors"] if use_colors else None,
        scene["normals"] if use_normals else None,
        use_colors, use_normals,
    )
    x = len(points)
    preds = []
    for off in range(0, x, batch_size):
        pb = points[off:off + batch_size]
        fb = feats[off:off + batch_size] if feats is not None else None
        pad = batch_size - len(pb)
        if pad:
            pb = np.concatenate([pb, np.repeat(pb[-1:], pad, axis=0)])
            if fb is not None:
                fb = np.concatenate([fb, np.repeat(fb[-1:], pad, axis=0)])
        logits = np.asarray(predict_fn(pb, fb))
        preds.append(np.argmax(logits, axis=-1)[: len(points[off:off + batch_size])])
    chunk_preds = np.concatenate(preds).astype(np.int32)
    return map_back(
        chunk_preds, scene["orig_idx"], scene["masks"], scene["num_vertices"],
        fill_value=0,
    )


def generate_predictions(
    predict_fn: Callable,
    data_root: str,
    scene_names: Sequence[str],
    output_dir: str,
    use_colors: bool = True,
    use_normals: bool = True,
    batch_size: int = 16,
    with_labels: bool = True,
    npoints: int = 8192,
    save_npy: bool = True,
) -> Iterator[Dict]:
    """Predict all scenes; writes per-scene npy (points/labels/gt) plus the
    ScanNet-benchmark txt (NYU40 ids, one per line) like
    ``generate_predictions.py:151-186``.  Yields per-scene result dicts.
    """
    from pointcloud_segmentation_attention_tpu.eval.benchmark import (
        export_benchmark_txt,
    )

    os.makedirs(output_dir, exist_ok=True)
    stream = precompute.eval_scene_stream(
        data_root, scene_names, with_labels=with_labels, npoints=npoints
    )
    for scene in stream:
        name = scene["scene_name"]
        vertex_pred = predict_scene_chunks(
            predict_fn, scene, use_colors, use_normals, batch_size
        )
        if save_npy:
            np.save(os.path.join(output_dir, f"{name}_points.npy"), scene["vertex_points"])
            np.save(os.path.join(output_dir, f"{name}_labels.npy"), vertex_pred)
            if with_labels:
                np.save(os.path.join(output_dir, f"{name}_gt.npy"), scene["vertex_labels"])
        export_benchmark_txt(
            os.path.join(output_dir, f"{name}.txt"), vertex_pred
        )
        yield {
            "scene_name": name,
            "predictions": vertex_pred,
            "labels": scene["vertex_labels"] if with_labels else None,
        }
