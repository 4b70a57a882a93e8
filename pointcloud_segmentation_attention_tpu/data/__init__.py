"""Host-side data pipelines (numpy; devices only ever see fixed-shape arrays).

Submodules:

- ``scannet``       — the core ScanNet v2 pipeline: scene store, label map,
                      random-cuboid chunk sampler, precompute/replay, full-scene
                      grid chunker with context margins, PLY preprocessing,
                      and the upstream v1-compat dataset classes.
- ``modelnet``      — ModelNet40 txt-per-shape and HDF5-shard classification
                      loaders (ref ``modelnet_dataset.py`` / ``modelnet_h5_dataset.py``).
- ``shapenet_part`` — ShapeNet-Part normal dataset (ref ``part_dataset_all_normal.py``).
- ``s3dis``         — S3DIS room collection + 1 m block pipeline
                      (ref ``pointnet1/sem_seg/indoor3d_util.py``).
- ``augment``       — numpy batch augmentations (ref ``utils/provider.py``).
- ``pipeline``      — chunk-dict -> device-batch assembly, batching, threaded
                      prefetch (replaces the reference's tf.data stage).

Design note: all raggedness (variable scene sizes) is resolved on the host by
sample-with-replacement to fixed ``npoints`` — device code only ever compiles
one shape per geometry (SURVEY.md §7 "Ragged->fixed shapes").
"""
from pointcloud_segmentation_attention_tpu.data import (  # noqa: F401
    augment,
    modelnet,
    pipeline,
    s3dis,
    shapenet_part,
)
